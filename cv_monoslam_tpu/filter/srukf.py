"""Per-frame SRUKF pipeline orchestration (CSLAM::SLAM, SLAM.cpp:87-112).

One jit-able pure function ``slam_step(state, frame) -> (state, outputs)``
running the reference's fixed stage order:

    predictMotion -> predictMeasurement -> dataAssociation -> KalmanUpdate
    -> updateFeaturesInformation -> [addFeatures if matches < min_num]

Redirection frames (|dtheta| > 45 deg odometry steps, SLAM.cpp:1354-1428)
take a separate branch: snapshot -> robot-only reset -> re-detect with loop
re-insertion. The reference consumes two odometry rows inside one call;
here the redirect branch handles frame t and the next scan step processes
frame t+1 normally — the same net computation on a clean scan structure.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ..config import SlamConfig
from ..frontend.detect import (candidate_filters, escalate_raws,
                               gftt_candidates, select_new_corners)
from ..frontend.matching import data_association
from ..utils.watchdog import health_check
from .lifecycle import (integrate_features, project_stored, readd_stored,
                        redirect_reset, update_features)
from .measurement import measurement_predict
from .motion import motion_predict
from .state import FilterState, replace
from .update import kalman_update


def add_features(state: FilterState, image: jnp.ndarray, cfg: SlamConfig,
                 is_redirect: bool = False,
                 should_add: jnp.ndarray | bool = True,
                 is_initial: bool = False) -> FilterState:
    """Detection + filtering + integration (addFeatures, SLAM.cpp:552-562)
    including the insureEnoughFeatures raw-count escalation
    (SLAM.cpp:777-808).

    ``is_redirect``/``is_initial`` are static (separate trace per branch);
    ``should_add`` is a traced bool masking the whole operation.
    """
    lm = state.lm
    # proximity set: every active landmark's predicted + matched pixel.
    # The raw persisted fields are used (never-predicted/never-matched slots
    # hold zeros) — exactly the reference's stale-field semantics
    # (SLAM.cpp:663-705; the zero check feeds isThereNoZero)
    avoid = jnp.concatenate([lm.pred, lm.match_px], axis=0)
    avoid_valid = jnp.concatenate([lm.active, lm.active])
    n_matched = jnp.sum(lm.matched & lm.active)
    n_map = jnp.sum(lm.active)
    base = (cfg.n_initial_raws if (is_initial or is_redirect)
            else cfg.n_process_raws)

    pix, kept, raw_rank, resp = gftt_candidates(image, cfg)
    fok = candidate_filters(pix, cfg, avoid, avoid_valid, n_matched)

    if is_redirect:
        # loop-point detection: corners near a stored feature's projected
        # pixel re-add that feature instead of creating a new one
        # (SLAM.cpp:618-638, 699-729). Loop re-adds count toward the
        # escalation target like the reference's loop_ids.
        sp = project_stored(state, cfg)                      # (Ks, 2)
        sp_ok = state.stored.valid & jnp.any(sp != 0.0, axis=-1)
        d2 = jnp.sum((pix[:, None, :] - sp[None, :, :]) ** 2, axis=-1)
        near = (d2 < cfg.min_dist2) & sp_ok[None, :] \
            & (kept & fok)[:, None]                          # (K, Ks)
        new_ok = kept & fok & ~jnp.any(near, axis=1)

        max_raws = max(30, base)
        steps = max(1, -(-(max_raws - base) // max(cfg.min_num, 1)) + 1)
        ladder = jnp.minimum(base + cfg.min_num * jnp.arange(steps),
                             max_raws)
        in_r = raw_rank[None, :] < ladder[:, None]           # (steps, K)
        counts = jnp.sum(new_ok[None, :] & in_r, axis=1)
        loops = jnp.sum(
            jnp.any(near[None, :, :] & in_r[:, :, None], axis=1), axis=1)
        enough = (n_map + counts + loops) >= cfg.min_num
        idx = jnp.where(jnp.any(enough), jnp.argmax(enough), steps - 1)
        raws = ladder[idx]

        readd_mask = jnp.any(near & (raw_rank < raws)[:, None], axis=0)
        kept_final = new_ok & (raw_rank < raws)
        state = readd_stored(state, readd_mask, cfg)
    else:
        raws = escalate_raws(kept, raw_rank, fok, n_map,
                             jnp.asarray(0), base, cfg)
        kept_final = kept & fok & (raw_rank < raws)

    n_free = jnp.sum(~state.lm.active)
    corners, valid = select_new_corners(pix, kept_final, resp,
                                        cfg.max_new_per_frame, n_free)
    valid = valid & jnp.asarray(should_add)
    return integrate_features(state, image, corners, valid, cfg)


def initialize(state: FilterState, image: jnp.ndarray,
               cfg: SlamConfig) -> FilterState:
    """Initial map construction (initializeParameters -> addFeatures,
    SLAM.cpp:348-350)."""
    return add_features(state, image, cfg, is_redirect=False,
                        should_add=True, is_initial=True)


def slam_step(state: FilterState, image: jnp.ndarray, odo_prev: jnp.ndarray,
              odo_cur: jnp.ndarray, redirect: jnp.ndarray | bool,
              cfg: SlamConfig, *, allow_detect: bool = True):
    """One frame. Returns (new_state, outputs dict).

    ``redirect`` may be a traced bool (both branches live under one
    ``lax.cond``) or a Python bool — then the branch is selected at trace
    time. The static form matters on remote/tunneled TPU backends, where
    XLA's conditional of two filter-sized branches compiles ~25x slower
    than either branch alone; the host driver (api.SlamSession) segments
    frame chunks at redirection boundaries so the hot scan never carries
    the cond.

    ``allow_detect=False`` compiles the step WITHOUT the detection/
    integration pipeline at all — the host-gated detection cadence
    (api.SlamSession) alternates between the two executables based on
    live match telemetry, because at large state the detection lax.cond
    costs ~15 ms of pure conditional overhead inside a scan.
    """

    def normal(state):
        state, cache = motion_predict(state, odo_prev, odo_cur, cfg)
        state, cache = measurement_predict(state, cache, cfg)
        state = data_association(state, image, cfg)
        state = kalman_update(state, cache, cfg)
        state = update_features(state, cfg)
        if not allow_detect:
            return state
        n_matched = jnp.sum(state.lm.matched & state.lm.active)
        # reference trigger: detect only when matches < minNUM
        # (SLAM.cpp:552-562). Two executions: lax.cond skips the whole
        # detection+integration pipeline at runtime (gate_detection), or
        # detection always runs and only integration is masked — the cond
        # serializes badly inside scan on some backends, so it's opt-in.
        if cfg.gate_detection:
            state = jax.lax.cond(
                n_matched < cfg.min_num,
                lambda s: add_features(s, image, cfg, should_add=True),
                lambda s: s,
                state)
        else:
            state = add_features(state, image, cfg,
                                 should_add=n_matched < cfg.min_num)
        return state

    def redirected(state):
        state = redirect_reset(state, odo_cur[2], cfg)
        state = add_features(state, image, cfg, is_redirect=True,
                             should_add=True)
        return state

    # NOTE: covariance-path contractions pin Precision.HIGHEST at the op
    # level (ops.linalg.gram and friends) — TPU's default bf16-pass dots
    # made every covariance Gram indefinite at condition ~1e5 (measured
    # r3 at D=3076: a reset-grade Cholesky repair per frame, then
    # divergence; same failure and fix as the BA solver, backend/ba.py).
    # The vision/detection kernels keep the fast default precision.
    if isinstance(redirect, bool):
        state = redirected(state) if redirect else normal(state)
        redirect = jnp.asarray(redirect)
    else:
        state = jax.lax.cond(redirect, redirected, normal, state)
    state = replace(state, frame=state.frame + 1)
    lm = state.lm
    outputs = dict(
        pose=state.x[-4:],
        pose_sqrt_cov=jnp.sqrt(jnp.maximum(
            jnp.einsum("ij,ij->j", state.S[:, -4:], state.S[:, -4:]), 0.0)),
        n_map=jnp.sum(lm.active),
        n_visible=jnp.sum(lm.visible & lm.active),
        n_matched=jnp.sum(lm.matched & lm.active),
        redirected=redirect,
        # per-frame landmark telemetry so chunked scans can drive the
        # recorder / watchdog / keyframe backend at frame (not chunk)
        # granularity — the reference records every frame
        # (SLAM.cpp:3512-3562)
        lm_lid=lm.lid,
        lm_active=lm.active,
        lm_matched=lm.matched & lm.active,
        lm_match_px=lm.match_px,
        lm_xyz=lm.xyz,
        health=health_check(state, cfg),
        # cumulative covariance-repair counters (VERDICT r2 item 7):
        # jitter-escalated factorizations + skipped updates, surfaced per
        # frame so a run surviving on repairs is visibly unhealthy
        repairs=jnp.stack([state.n_repairs, state.n_escalations,
                           state.n_skipped]),
    )
    return state, outputs
