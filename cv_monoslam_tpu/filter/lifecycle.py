"""Landmark lifecycle: masked add / delete / store / loop re-add / redirect.

The reference resizes state and covariance on every event (SLAM.cpp:818-1334
add + permutation; 2397-2706 delete + Cholesky fold; 1343-1428 redirection
reset; 948-1015 loop re-insertion). Here every event is a masked write into
fixed slots plus one rank-structured QR, so shapes never change under jit:

  * DELETE k slots: T = S with the deleted slots' *columns* zeroed keeps
    T^T T = the marginal P (the reference's V-fold, SLAM.cpp:2637-2667, is
    implicit: deleted rows' remaining columns stay in T); stacking unit rows
    for the deleted slots restores the inactive-slot invariant. One QR of
    (2D, D) handles any number of simultaneous deletions.
  * ADD k features: augmented UT over [x; (u, v, rho) * K_ADD] exactly as
    the reference's mapping function (SLAM.cpp:1177-1250), but outputs are
    scattered straight into their slots — the reference's permutation fixup
    (SLAM.cpp:1260-1334) vanishes because slots, not appends, define order.
  * REDIRECT: snapshot -> robot-only reset -> re-detect, split across two
    scan steps (the reference advances two odometry rows inside one call,
    SLAM.cpp:1423-1427; the net computation is identical).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ..config import SlamConfig
from ..geometry import camera as cam_mod
from ..geometry import transforms as tf
from ..ops import qr_r
from .sigma import deviations, generate_sigma, ut_weights
from .state import (FilterState, LandmarkTable, StoredTable, count_repairs,
                    inactive_feature_defaults, replace)


# ---------------------------------------------------------------------------
# deletion (SLAM.cpp:2397-2706)
# ---------------------------------------------------------------------------


def delete_rules(state: FilterState, cfg: SlamConfig):
    """Per-slot delete + store masks (SLAM.cpp:2443-2459, 2494-2532)."""
    lm = state.lm
    M = cfg.max_landmarks
    feats = state.x[: 6 * M].reshape(M, 6)
    rho = feats[:, 5]
    hlr_z = rho * (feats[:, 2] - state.x[-2]) + jnp.cos(feats[:, 4]) * jnp.cos(
        feats[:, 3])
    b = cfg.dist_to_border
    Wd, Hd = cfg.camera.width, cfg.camera.height
    px, py = lm.pred[:, 0], lm.pred[:, 1]
    mx, my = lm.match_px[:, 0], lm.match_px[:, 1]

    starved = ((lm.n_predict > cfg.delete_predict_ratio * lm.n_match)
               & (lm.n_predict >= cfg.delete_predict_min))
    bad_depth = (rho < cfg.delete_rho_min) | (hlr_z < 0.0)
    pred_border = (px < b) | (py < b) | (Wd - px < b) | (Hd - py < b)
    match_border = lm.matched & ((mx < b) | (my < b) | (Wd - mx < b)
                                 | (Hd - my < b))
    delete = lm.active & (starved | bad_depth | pred_border | match_border)
    # store matched landmarks deleted purely for border reasons
    store = delete & lm.matched & (pred_border | match_border) \
        & ~(starved | bad_depth)
    return delete, store


def fold_delete(x: jnp.ndarray, S: jnp.ndarray, delete: jnp.ndarray,
                cfg: SlamConfig):
    """Marginalize deleted slots; restore the unit-diagonal invariant."""
    M = cfg.max_landmarks
    D = cfg.state_dim
    dtype = x.dtype
    row_mask = jnp.concatenate(
        [jnp.repeat(delete, 6), jnp.zeros(4, bool)])          # (D,)
    rep = jnp.int32(0)
    if cfg.qr_mode == "gram":
        # structured Gram: T = S diag(1-m), so [T; E]^T [T; E] is S^T S with
        # the masked rows+columns zeroed plus the unit diagonal — one D x D
        # Gram instead of a (2D x D) QR
        from ..ops.linalg import chol_psd_flagged, gram as _gram

        G = _gram(S)
        keep = ~row_mask
        G = jnp.where(keep[:, None] & keep[None, :], G, 0.0)
        G = G + jnp.diag(row_mask.astype(dtype))
        d = jnp.sqrt(jnp.maximum(jnp.diag(G), 0.0))
        d = jnp.where(d > 0, d, 1.0)
        r, rep = chol_psd_flagged(G / (d[:, None] * d[None, :]), 1e-6)
        S_new = r * d[None, :]
    else:
        T = jnp.where(row_mask[None, :], 0.0, S)
        E = jnp.diag(row_mask.astype(dtype))
        S_new = qr_r(jnp.concatenate([T, E], axis=0), cfg.qr_mode)
    defaults = jnp.concatenate(
        [jnp.tile(inactive_feature_defaults(dtype), M), jnp.zeros(4, dtype)])
    x_new = jnp.where(row_mask, defaults, x)
    return x_new, S_new, rep


def snapshot_records(state: FilterState, cfg: SlamConfig):
    """Per-slot StoredTable-shaped records of the current landmarks
    (reference FeatureInfo snapshot, SLAM.cpp:1359-1378, 2514-2530).

    Note: like the reference, the saved 6x6 sqrt block is the diagonal block
    of S (SLAM.cpp:2530 / 1373), i.e. the conditional — not marginal — sqrt.
    """
    M = cfg.max_landmarks
    lm = state.lm
    feats = state.x[: 6 * M].reshape(M, 6)
    idx = jnp.arange(M)
    rows = 6 * idx[:, None] + jnp.arange(6)[None, :]          # (M, 6)
    sr = state.S[rows[:, :, None], rows[:, None, :]]          # (M, 6, 6)
    return dict(
        lid=lm.lid, is_loop=lm.is_loop, n_predict=lm.n_predict,
        n_match=lm.n_match, state=feats, sr=sr,
        init_pixel=lm.init_pixel, init_trans=lm.init_trans,
        init_theta=lm.init_theta, init_patch=lm.init_patch, xyz=lm.xyz,
    )


def store_features(stored: StoredTable, recs: dict,
                   mask: jnp.ndarray) -> StoredTable:
    """Scatter mask-selected records into stored slots.

    Slot policy per record: (1) a valid slot already holding the same
    landmark id is overwritten (repeated redirects refresh, not duplicate);
    (2) else the first free slot; (3) else the OLDEST slot by insertion
    stamp is evicted."""
    mask = jnp.asarray(mask)
    # pin each record to its table field's dtype: an f64 record scattered
    # into an f32 table is a FutureWarning today and an error in future
    # jax (surfaced by the x64 test suite)
    recs = {k: jnp.asarray(v, dtype=getattr(stored, k).dtype)
            for k, v in recs.items()}

    def body(st, j):
        def do(st):
            dup = st.valid & (st.lid == recs["lid"][j])
            free = jnp.argmin(st.valid)            # first False (free)
            oldest = jnp.argmin(jnp.where(
                st.valid, st.stamp, jnp.iinfo(jnp.int32).max))
            slot = jnp.where(jnp.any(~st.valid), free, oldest)
            slot = jnp.where(jnp.any(dup), jnp.argmax(dup), slot)
            return replace(
                st,
                valid=st.valid.at[slot].set(True),
                stamp=st.stamp.at[slot].set(st.seq),
                seq=st.seq + 1,
                lid=st.lid.at[slot].set(recs["lid"][j]),
                is_loop=st.is_loop.at[slot].set(recs["is_loop"][j]),
                n_predict=st.n_predict.at[slot].set(recs["n_predict"][j]),
                n_match=st.n_match.at[slot].set(recs["n_match"][j]),
                state=st.state.at[slot].set(recs["state"][j]),
                sr=st.sr.at[slot].set(recs["sr"][j]),
                init_pixel=st.init_pixel.at[slot].set(recs["init_pixel"][j]),
                init_trans=st.init_trans.at[slot].set(recs["init_trans"][j]),
                init_theta=st.init_theta.at[slot].set(recs["init_theta"][j]),
                init_patch=st.init_patch.at[slot].set(recs["init_patch"][j]),
                xyz=st.xyz.at[slot].set(recs["xyz"][j]),
            )

        st = jax.lax.cond(mask[j], do, lambda s: s, st)
        return st, None

    stored, _ = jax.lax.scan(body, stored, jnp.arange(mask.shape[0]))
    return stored


def update_features(state: FilterState, cfg: SlamConfig) -> FilterState:
    """Deletion pass + Cartesian refresh (SLAM.cpp:2397-2706)."""
    M = cfg.max_landmarks
    delete, store = delete_rules(state, cfg)
    # most frames delete/store NOTHING: the refactorization (a D x D
    # Gram + Cholesky) and the per-slot store scan run under lax.cond so
    # quiet frames pay neither (measured ~4.5 ms/frame at M=512)
    stored = jax.lax.cond(
        jnp.any(store),
        lambda st: store_features(st, snapshot_records(state, cfg), store),
        lambda st: st,
        state.stored)

    x_new, S_new, rep = jax.lax.cond(
        jnp.any(delete),
        lambda: fold_delete(state.x, state.S, delete, cfg),
        lambda: (jnp.asarray(state.x), jnp.asarray(state.S), jnp.int32(0)))
    lm = state.lm
    keep = lm.active & ~delete
    feats = x_new[: 6 * M].reshape(M, 6)
    xyz = tf.inverse_depth_to_cartesian(feats)
    zero_i = jnp.zeros_like(lm.n_predict)
    # NOTE: ``visible`` is NOT cleared here (the reference clears it at the
    # end of updateFeaturesInformation, but the next measurement predict
    # recomputes it before any consumer reads it — keeping it makes the
    # per-frame n_visible telemetry meaningful)
    lm_new = replace(
        lm,
        active=keep,
        lid=jnp.where(keep, lm.lid, 0),
        is_loop=lm.is_loop & keep,
        n_predict=jnp.where(keep, lm.n_predict, zero_i),
        n_match=jnp.where(keep, lm.n_match, zero_i),
        visible=lm.visible & keep,
        matched=lm.matched & keep,
        xyz=jnp.where(keep[:, None], xyz, lm.xyz),
    )
    return count_repairs(
        replace(state, x=x_new, S=S_new, lm=lm_new, stored=stored), rep)


# ---------------------------------------------------------------------------
# addition (SLAM.cpp:818-1334)
# ---------------------------------------------------------------------------


def _fold_sqrt(S: jnp.ndarray, Ep: jnp.ndarray, Em: jnp.ndarray,
               ridx: jnp.ndarray, valid: jnp.ndarray, w, D: int):
    """Integrated sqrt WITHOUT a D x D refactorization (VERDICT r4 item 3).

    The augmented UT's output Gram (structured_gram_rows) differs from the
    posterior S^T S only in the 6*KA target rows/cols, and the posterior S
    has UNIT decoupled rows at those (inactive) slots. Splitting the
    target-row deviations into odd/even sigma-branch parts
    Es = (Ep - Em)/2, Ea = (Ep + Em)/2, the EXACT integrated covariance
    factorizes in closed form:

        S_new[:, F]    = S[:, F]                 (untouched columns)
        S_new[:, T]    = V  = 2 wi gamma Es[:D]  (state-row first-order part)
        S_new[T, T]   += R_d,  R_d^T R_d = Delta (conditional-given-state)

        Delta = 2 wi (Es[D:]^T Es[D:] + Ea^T Ea)
              + (2 wi - 4 wi^2 g^2) Es[:D]^T Es[:D]   [== 0 for UT weights]

    because rows T of S (unit rows of inactive slots) contribute nothing to
    the F-block Grams, V reproduces the cross block exactly, and the
    leftover T-block residue (the new features' own noise + the UT's
    second-order asymmetry) is the 6KA x 6KA PSD Delta — its Cholesky is
    ~30 us vs ~5 ms for the D x D refactorization it replaces (measured
    M=512 on v5e). S_new^T S_new equals the old path's Gram EXACTLY, so
    this is the same UT posterior through an orthogonally-different sqrt;
    S_new is NOT triangular (robot-row couplings land below the diagonal
    in the new columns), which the gram/implicit pipeline never needs —
    the next frame's joint-Schur update re-triangularizes. Delta is
    PSD-singular in exact arithmetic (new position rows are exact copies
    of the robot position), so the equilibrated repair's first jitter rung
    fires routinely — the same benign floor the old D x D path paid on
    integration frames (ops.linalg.chol_psd_flagged docstring).

    Invalid candidates: their Es columns are exactly gamma * e_t (the
    original unit sigma rows), so V already reproduces e_t outside the
    T-block; the T-block part is restored by adding diag(~valid) to Delta.
    """
    dtype = S.dtype
    hp = jax.lax.Precision.HIGHEST
    from .motion import equilibrated_chol

    wi = jnp.asarray(2.0 * w.wi_sr ** 2, dtype)
    g = jnp.asarray(w.gamma, dtype)
    Es = 0.5 * (Ep - Em)                                   # (na, 6KA)
    Ea = 0.5 * (Ep + Em)
    V = (wi * g) * Es[:D]                                  # (D, 6KA)
    coef = wi - wi * wi * g * g                            # 0 for UT weights
    delta = (wi * (jnp.matmul(Es[D:].T, Es[D:], precision=hp)
                   + jnp.matmul(Ea.T, Ea, precision=hp))
             + coef * jnp.matmul(Es[:D].T, Es[:D], precision=hp))
    # ridx order is [all pos rows, all ang rows] (3 per target per half)
    vmask3 = jnp.repeat(valid, 3)
    vmask = jnp.concatenate([vmask3, vmask3])
    delta = delta + jnp.diag((~vmask).astype(dtype))
    R_d, rep = equilibrated_chol(delta)
    V = V.at[ridx].set(0.0)          # T-block rows live in R_d only
    S_new = S.at[:, ridx].set(V)
    S_new = S_new.at[ridx[:, None], ridx[None, :]].add(R_d)
    return S_new, rep


def _integrate_implicit(state: FilterState, safe_c: jnp.ndarray,
                        valid: jnp.ndarray, targets: jnp.ndarray,
                        cfg: SlamConfig):
    """Row-space feature integration (sigma_mode="implicit").

    The augmented UT's outputs differ from the prior state only in the
    6*KA target-slot rows, and the mapping function (SLAM.cpp:1177-1250)
    reads only the robot rows + each candidate's own 3 noise rows. Every
    needed row of the sigma set is read straight off a COLUMN of S (the
    sigma rule chi_i = mu +- gamma*S_row_i) or a noise diagonal, so the
    (na, 2na+1) tensor — 83 MB at M=512 — is never built. Outputs are
    identical to the full path up to summation roundoff.

    Returns (x_new, S_new, rep).
    """
    dtype = state.x.dtype
    D = cfg.state_dim
    KA = cfg.max_new_per_frame
    na = D + 3 * KA
    ns = 2 * na + 1
    w = ut_weights(na, cfg)
    g = jnp.asarray(w.gamma, dtype)
    cam = cfg.camera

    def state_rows(idx):
        """(|idx|, ns) sigma-row values for state rows ``idx``."""
        cols = jnp.concatenate(
            [state.S[:, idx], jnp.zeros((3 * KA, idx.shape[0]), dtype)])
        mu_r = state.x[idx][:, None]
        return jnp.concatenate(
            [mu_r, mu_r + g * cols.T, mu_r - g * cols.T], axis=1)

    rob = state_rows(jnp.arange(D - 4, D))                 # (4, ns)
    pos = rob[:3]                                          # (3, ns)
    theta_r = rob[3]                                       # (ns,)

    # candidate noise rows: mean +- gamma*noise at their own column only
    noise = jnp.where(valid[:, None],
                      jnp.array([cfg.sigma_measure, cfg.sigma_measure,
                                 cfg.sigma_rho], dtype)[None, :],
                      jnp.ones((KA, 3), dtype))            # (KA, 3)
    mu2 = jnp.concatenate(
        [safe_c, jnp.full((KA, 1), cfg.rho0, dtype)], axis=1)  # (KA, 3)
    col_p = 1 + D + 3 * jnp.arange(KA)[:, None] + jnp.arange(3)[None, :]
    base_cols = jnp.zeros((KA, 3, ns), dtype)
    base_cols = base_cols.at[
        jnp.arange(KA)[:, None], jnp.arange(3)[None, :], col_p].set(
            g * noise)
    base_cols = base_cols.at[
        jnp.arange(KA)[:, None], jnp.arange(3)[None, :], col_p + na].set(
            -g * noise)
    uvr = mu2[:, :, None] + base_cols                      # (KA, 3, ns)

    # mapping function (identical math to the full path)
    uv = uvr[:, :2].transpose(0, 2, 1)                     # (KA, ns, 2)
    rho_in = uvr[:, 2]                                     # (KA, ns)
    rwc = tf.yaw_matrix(theta_r)                           # (ns, 3, 3)
    ray = cam_mod.image2camera(cam, cam_mod.undistort(cam, uv))
    hlw = jnp.einsum("sij,ksj->ksi", rwc, ray)             # (KA, ns, 3)
    ang = tf.world_to_angles(hlw)                          # (KA, ns, 2)
    if cfg.rho_init_mode == "ceiling":
        rho_out = rho_in * jnp.cos(ang[..., 1]) * jnp.cos(ang[..., 0])
    else:
        rho_out = rho_in

    pos_rows = (6 * targets[:, None] + jnp.arange(3)[None, :]).reshape(-1)
    ang_rows = (6 * targets[:, None] + 3 + jnp.arange(3)[None, :]).reshape(-1)
    pos_vals = jnp.broadcast_to(pos[None], (KA, 3, ns)).reshape(-1, ns)
    ang_vals = jnp.stack(
        [ang[..., 0], ang[..., 1], rho_out], axis=1).reshape(-1, ns)

    # invalid candidates keep their slots' ORIGINAL sigma rows (exact
    # no-op, matching the full path's masked scatter)
    ridx = jnp.concatenate([pos_rows, ang_rows])
    orig = state_rows(ridx)                                # (6KA, ns)
    vmask6 = jnp.repeat(valid, 3)
    vals = jnp.concatenate([pos_vals, ang_vals], axis=0)
    vals = jnp.where(jnp.concatenate([vmask6, vmask6])[:, None],
                     vals, orig)

    mw = w.mean_weights(dtype)
    x_new = jnp.asarray(state.x).at[ridx].set(vals @ mw)

    base = vals[:, :1]
    Ep = (vals[:, 1:na + 1] - base).T                      # (na, 6KA)
    Em = (vals[:, na + 1:] - base).T
    if cfg.integrate_fold and cfg.update_mode == "gram":
        S_new, rep = _fold_sqrt(state.S, Ep, Em, ridx, valid, w, D)
    else:
        from .motion import structured_sqrt_gram_rows

        S_new, rep = structured_sqrt_gram_rows(state.S, Ep, Em, ridx, w,
                                               with_flag=True)
    return x_new, S_new, rep


def integrate_features(state: FilterState, image: jnp.ndarray,
                       corners: jnp.ndarray, valid: jnp.ndarray,
                       cfg: SlamConfig) -> FilterState:
    """Initialize up to K_ADD new inverse-depth landmarks via augmented UT.

    corners: (K_ADD, 2) pixel positions; valid: (K_ADD,) mask. Invalid
    entries are exact no-ops (their slots keep the inactive invariant).
    """
    dtype = state.x.dtype
    D = cfg.state_dim
    M = cfg.max_landmarks
    KA = cfg.max_new_per_frame
    na = D + 3 * KA
    w = ut_weights(na, cfg)
    cam = cfg.camera

    # target slots: first KA inactive (argsort: False first, stable).
    # Replicated under SPMD: slot indices derived from the M-sharded
    # active mask otherwise drag degenerate shardings onto every KA-sized
    # update value (involuntary-remat warnings)
    from ..parallel.mesh import replicate_hint

    targets = replicate_hint(jnp.argsort(state.lm.active)[:KA])  # (KA,)
    valid = replicate_hint(valid & ~state.lm.active[targets])

    # augmented mean + sqrt (SLAM.cpp:847-869)
    safe_c = jnp.where(valid[:, None], corners,
                       jnp.array([cam.width / 2.0, cam.height / 2.0], dtype))
    if cfg.sigma_mode == "implicit":
        x_new, S_new, rep = _integrate_implicit(state, safe_c, valid,
                                                targets, cfg)
        return _integrate_records(state, image, corners, valid, targets,
                                  x_new, S_new, rep, cfg)
    mu2 = jnp.concatenate(
        [safe_c, jnp.full((KA, 1), cfg.rho0, dtype)], axis=1).reshape(-1)
    noise = jnp.where(valid[:, None],
                      jnp.array([cfg.sigma_measure, cfg.sigma_measure,
                                 cfg.sigma_rho], dtype)[None, :],
                      jnp.ones((KA, 3), dtype)).reshape(-1)
    mu = jnp.concatenate([state.x, mu2])
    sr = jnp.zeros((na, na), dtype)
    sr = sr.at[:D, :D].set(state.S)
    sr = sr.at[jnp.arange(D, na), jnp.arange(D, na)].set(noise)
    sig = generate_sigma(mu, sr, w.gamma)                     # (na, 2na+1)
    ns = sig.shape[1]

    # mapping function (SLAM.cpp:1177-1250): pixel -> world angles
    pos = sig[D - 4 : D - 1]                                  # (3, ns)
    theta_r = sig[D - 1]                                      # (ns,)
    rwc = tf.yaw_matrix(theta_r)                              # (ns, 3, 3)
    uvr = sig[D:].reshape(KA, 3, ns)                          # (KA, 3, ns)
    uv = uvr[:, :2].transpose(0, 2, 1)                        # (KA, ns, 2)
    rho_in = uvr[:, 2]                                        # (KA, ns)
    ray = cam_mod.image2camera(cam, cam_mod.undistort(cam, uv))
    hlw = jnp.einsum("sij,ksj->ksi", rwc, ray)                # (KA, ns, 3)
    ang = tf.world_to_angles(hlw)                             # (KA, ns, 2)
    if cfg.rho_init_mode == "ceiling":
        # rho = m_z / depth: exact for a flat ceiling (config docs)
        rho_out = rho_in * jnp.cos(ang[..., 1]) * jnp.cos(ang[..., 0])
    else:
        rho_out = rho_in

    # scatter outputs into target slot rows
    sig_out = sig[:D]
    pos_rows = (6 * targets[:, None] + jnp.arange(3)[None, :]).reshape(-1)
    ang_rows = (6 * targets[:, None] + 3 + jnp.arange(3)[None, :]).reshape(-1)
    pos_vals = jnp.broadcast_to(pos[None], (KA, 3, ns)).reshape(-1, ns)
    # symmetric stack (not concat-with-size-1-broadcast): a size-1 middle
    # axis picks up a degenerate GSPMD sharding under the landmark-sharded
    # layout, forcing an involuntary full rematerialization
    ang_vals = jnp.stack(
        [ang[..., 0], ang[..., 1], rho_out], axis=1).reshape(-1, ns)
    vmask6 = jnp.repeat(valid, 3)
    sig_out = sig_out.at[pos_rows].set(
        jnp.where(vmask6[:, None], pos_vals, sig_out[pos_rows]))
    sig_out = sig_out.at[ang_rows].set(
        jnp.where(vmask6[:, None], ang_vals, sig_out[ang_rows]))

    x_new = sig_out @ w.mean_weights(dtype)
    if cfg.qr_mode == "gram":
        # structured Gram (motion.structured_sqrt_gram): only the 6*KA
        # target-slot rows differ from the +-gamma*S sigma structure
        from .motion import structured_sqrt_gram

        ridx = jnp.concatenate([pos_rows, ang_rows])
        S_new, rep = structured_sqrt_gram(state.S, sig_out, ridx, w, na,
                                          with_flag=True)
    else:
        S_new = qr_r(deviations(sig_out, w.wi_sr), cfg.qr_mode)
        rep = jnp.int32(0)

    return _integrate_records(state, image, corners, valid, targets,
                              x_new, S_new, rep, cfg)


def _integrate_records(state: FilterState, image: jnp.ndarray,
                       corners: jnp.ndarray, valid: jnp.ndarray,
                       targets: jnp.ndarray, x_new: jnp.ndarray,
                       S_new: jnp.ndarray, rep, cfg: SlamConfig):
    """Shared tail of feature integration: landmark records + counters
    (SLAM.cpp:891-946), independent of how the UT was realized."""
    dtype = state.x.dtype
    M = cfg.max_landmarks
    KA = cfg.max_new_per_frame
    # landmark records (SLAM.cpp:891-946)
    lm = state.lm
    n_valid = jnp.sum(valid.astype(jnp.int32))
    lids = state.next_id + jnp.cumsum(valid.astype(jnp.int32)) - 1
    feats_new = x_new[: 6 * M].reshape(M, 6)[targets]
    xyz = tf.inverse_depth_to_cartesian(feats_new)            # (KA, 3)
    patches = extract_patches(image, corners, cfg.hp_init)    # (KA, P, P)
    robot_pos = x_new[-4:-1]
    theta_now = x_new[-1]

    def scatter(field, vals):
        return field.at[targets].set(
            jnp.where(valid.reshape((-1,) + (1,) * (vals.ndim - 1)),
                      vals, field[targets]))

    lm_new = replace(
        lm,
        active=lm.active.at[targets].set(valid | lm.active[targets]),
        lid=scatter(lm.lid, lids),
        is_loop=scatter(lm.is_loop, jnp.zeros(KA, bool)),
        n_predict=scatter(lm.n_predict, jnp.zeros(KA, jnp.int32)),
        n_match=scatter(lm.n_match, jnp.zeros(KA, jnp.int32)),
        visible=scatter(lm.visible, jnp.zeros(KA, bool)),
        matched=scatter(lm.matched, jnp.zeros(KA, bool)),
        pred=scatter(lm.pred, jnp.zeros((KA, 2), dtype)),
        match_px=scatter(lm.match_px, jnp.zeros((KA, 2), dtype)),
        init_pixel=scatter(lm.init_pixel, corners.astype(dtype)),
        init_trans=scatter(lm.init_trans,
                           jnp.broadcast_to(robot_pos, (KA, 3))),
        init_theta=scatter(lm.init_theta,
                           jnp.broadcast_to(theta_now, (KA,))),
        init_patch=scatter(lm.init_patch, patches),
        match_patch=scatter(
            lm.match_patch,
            jnp.zeros((KA,) + lm.match_patch.shape[1:], jnp.float32)),
        xyz=scatter(lm.xyz, xyz),
    )
    # keep the counter's dtype stable (int32): under x64 the sum promotes
    # to int64, which breaks lax.cond branch-type matching when the whole
    # add_features pipeline sits behind the gate_detection conditional
    return count_repairs(
        replace(state, x=x_new, S=S_new, lm=lm_new,
                next_id=(state.next_id + n_valid).astype(
                    state.next_id.dtype)), rep)


def extract_patches(image: jnp.ndarray, corners: jnp.ndarray,
                    hp: int) -> jnp.ndarray:
    """(K, 2) corner pixels -> (K, 2hp+1, 2hp+1) patches (float32)."""
    P = 2 * hp + 1
    H, W = image.shape

    def one(c):
        cu = jnp.clip(jnp.round(c[0]).astype(jnp.int32) - hp, 0, W - P)
        cv = jnp.clip(jnp.round(c[1]).astype(jnp.int32) - hp, 0, H - P)
        return jax.lax.dynamic_slice(image, (cv, cu), (P, P))

    return jax.vmap(one)(corners).astype(jnp.float32)


# ---------------------------------------------------------------------------
# loop re-insertion + redirection (SLAM.cpp:948-1015, 1343-1428)
# ---------------------------------------------------------------------------


def readd_stored(state: FilterState, readd_mask: jnp.ndarray,
                 cfg: SlamConfig) -> FilterState:
    """Splice stored features back into free slots with their saved 6-dim
    state and 6x6 sqrt block, decoupled from the rest (SLAM.cpp:948-1015)."""
    K = readd_mask.shape[0]

    def body(st, j):
        def do(st):
            slot = jnp.argmin(st.lm.active)          # first free slot
            free = jnp.any(~st.lm.active)
            rows = 6 * slot + jnp.arange(6)
            sd = st.stored
            x_new = st.x.at[rows].set(sd.state[j])
            # zero slot rows+cols then write the saved block (decoupled)
            S_new = st.S
            S_new = S_new.at[rows].set(0.0)
            S_new = S_new.at[:, rows].set(0.0)
            S_new = S_new.at[rows[:, None], rows[None, :]].set(sd.sr[j])
            lm = st.lm
            lm = replace(
                lm,
                active=lm.active.at[slot].set(True),
                lid=lm.lid.at[slot].set(sd.lid[j]),
                is_loop=lm.is_loop.at[slot].set(True),
                n_predict=lm.n_predict.at[slot].set(0),
                n_match=lm.n_match.at[slot].set(0),
                visible=lm.visible.at[slot].set(False),
                matched=lm.matched.at[slot].set(False),
                init_pixel=lm.init_pixel.at[slot].set(sd.init_pixel[j]),
                init_trans=lm.init_trans.at[slot].set(sd.init_trans[j]),
                init_theta=lm.init_theta.at[slot].set(sd.init_theta[j]),
                init_patch=lm.init_patch.at[slot].set(sd.init_patch[j]),
                xyz=lm.xyz.at[slot].set(sd.xyz[j]),
            )
            stored = replace(sd, valid=sd.valid.at[j].set(False))
            return jax.lax.cond(
                free,
                lambda: replace(st, x=x_new, S=S_new, lm=lm, stored=stored),
                lambda: st)

        st = jax.lax.cond(readd_mask[j], do, lambda s: s, st)
        return st, None

    state, _ = jax.lax.scan(body, state, jnp.arange(K))
    return state


def project_stored(state: FilterState, cfg: SlamConfig) -> jnp.ndarray:
    """Current-view pixels of stored features (SLAM.cpp:618-638), (K, 2)."""
    pos = state.x[-4:-1]
    rcw = tf.yaw_matrix(state.x[-1]).T
    hlw = tf.state_to_world(state.stored.state, pos)
    hlr = jnp.einsum("ij,kj->ki", rcw, hlw)
    return cam_mod.project(cfg.camera, hlr)


def redirect_reset(state: FilterState, theta_odo: jnp.ndarray,
                   cfg: SlamConfig) -> FilterState:
    """Snapshot everything, reset to robot-only state (SLAM.cpp:1354-1405).

    Feature re-detection / loop re-add happens right after via the normal
    add path with is_redirect=True.
    """
    dtype = state.x.dtype
    M = cfg.max_landmarks
    recs = snapshot_records(state, cfg)
    stored = store_features(state.stored, recs, state.lm.active)

    defaults = jnp.concatenate(
        [jnp.tile(inactive_feature_defaults(dtype), M), jnp.zeros(4, dtype)])
    x_new = defaults
    x_new = x_new.at[-4].set(state.x[-4])
    x_new = x_new.at[-3].set(state.x[-3])
    x_new = x_new.at[-1].set(theta_odo.astype(dtype))
    s_diag = jnp.ones(cfg.state_dim, dtype)
    s_diag = s_diag.at[-4:].set(jnp.array(
        [cfg.sigma_x, cfg.sigma_y, cfg.sigma_z, cfg.sigma_theta], dtype))
    lm = state.lm
    zero_i = jnp.zeros_like(lm.n_predict)
    lm_new = replace(
        lm,
        active=jnp.zeros_like(lm.active),
        lid=jnp.zeros_like(lm.lid),
        is_loop=jnp.zeros_like(lm.is_loop),
        n_predict=zero_i, n_match=zero_i,
        visible=jnp.zeros_like(lm.visible),
        matched=jnp.zeros_like(lm.matched),
    )
    return replace(state, x=x_new, S=jnp.diag(s_diag), lm=lm_new,
                   stored=stored)
