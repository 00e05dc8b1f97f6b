"""Shi-Tomasi corner detection + candidate filtering (JAX, conv-based).

Replaces the reference's GoodFeaturesToTrackDetector + serial filter loops
(SLAM.cpp:574-768) with convolutional structure tensors, windowed NMS, a
static top-K selection, and a masked greedy min-distance pass — all static
shapes, MXU-friendly.

Reference flow reproduced exactly (SLAM.cpp:574-808):
  1. GFTT: min-eigenvalue response, quality threshold = quality_level * max
     response over the FULL image, greedy min-dist separation over
     response-sorted peaks, capped at ``n_raws`` corners (SLAM.cpp:599-600).
     ``n_raws`` may be traced — the insureEnoughFeatures escalation
     (SLAM.cpp:777-808) re-runs with raws += minNUM up to 30 when the map
     would stay starved; here the whole ladder is evaluated in one pass
     (raw membership is a prefix of the greedy order, so survivors(r) is a
     masked count, not a re-detection).
  2. Downstream filters on the raw set: >= dist_to_border px inside the
     image (SLAM.cpp:650-651), >= min_dist px from every landmark's
     predicted AND matched pixel (SLAM.cpp:663-705; skipped entirely when
     nothing is matched, as the reference does).

Documented deviation (off by default, on for parity runs): the reference
rejects EVERY candidate whenever any landmark has a zero predicted/matched
pixel (SLAM.cpp:684-696's isThereNoZero flag) — ``cfg.detect_zero_blocks``
reproduces that; the default instead skips the proximity test against such
landmarks.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ..config import SlamConfig


def corner_response(image: jnp.ndarray, block_size: int = 3) -> jnp.ndarray:
    """Min-eigenvalue (Shi-Tomasi) response map, (H, W) float32.

    Edge-replicate padding (the reference's OpenCV borderType default and
    the oracle's scipy ``mode="nearest"``) so image borders don't produce
    artificial gradient peaks.
    """
    img = image.astype(jnp.float32)
    sob = jnp.array([[-1.0, 0.0, 1.0], [-2.0, 0.0, 2.0], [-1.0, 0.0, 1.0]],
                    jnp.float32) / 8.0

    def conv_same_edge(x, k):
        p = k.shape[0] // 2
        xp = jnp.pad(x, p, mode="edge")
        return jax.lax.conv_general_dilated(
            xp[None, None], k[None, None], (1, 1), "VALID",
            dimension_numbers=("NCHW", "OIHW", "NCHW"))[0, 0]

    gx = conv_same_edge(img, sob)
    gy = conv_same_edge(img, sob.T)
    box = jnp.ones((block_size, block_size), jnp.float32) / (block_size ** 2)
    ixx = conv_same_edge(gx * gx, box)
    iyy = conv_same_edge(gy * gy, box)
    ixy = conv_same_edge(gx * gy, box)
    tr = ixx + iyy
    disc = jnp.sqrt(jnp.maximum(((ixx - iyy) * 0.5) ** 2 + ixy * ixy, 0.0))
    return tr * 0.5 - disc


def gftt_candidates(image: jnp.ndarray, cfg: SlamConfig):
    """GoodFeaturesToTrack core: response-sorted, min-dist-separated peaks.

    Returns (pix (K, 2) float, kept (K,) bool, raw_rank (K,) int32, resp
    (K,)) where ``kept`` marks greedy min-dist survivors in response order
    and ``raw_rank`` is each survivor's 0-based position in the greedy
    sequence (the reference caps this list at its raws count). K =
    cfg.max_detections.
    """
    K = cfg.max_detections
    H, W = image.shape
    resp = corner_response(image, cfg.block_size)

    # 3x3 non-max suppression + quality threshold over the FULL map
    # (GoodFeaturesToTrack semantics, SLAM.cpp:599-600)
    mx = jax.lax.reduce_window(resp, -jnp.inf, jax.lax.max, (3, 3), (1, 1),
                               "SAME")
    is_peak = (resp >= mx) & (resp > cfg.quality_level * resp.max())
    score = jnp.where(is_peak, resp, -jnp.inf)

    top, idx = jax.lax.top_k(score.reshape(-1), K)
    py, px = jnp.divmod(idx, W)
    pix = jnp.stack([px, py], axis=1).astype(jnp.float32)
    cand = top > -jnp.inf

    # greedy min-dist in response order (GFTT's internal separation).
    # Inherently sequential; for small K the recurrence is unrolled over a
    # precomputed (K, K) clash matrix — pure scalar dataflow XLA schedules
    # tightly. For large K a flat K-step lax.scan pays ~20 us/step of TPU
    # loop overhead (~4 ms at K=192), so the recurrence is BLOCKED: the
    # chain unrolls inside 16-corner blocks and only the K/16 block
    # boundary crossings are sequential scan steps. Exact greedy
    # semantics either way.
    md2 = cfg.min_dist2
    d2 = jnp.sum((pix[:, None, :] - pix[None, :, :]) ** 2, axis=-1)
    close = d2 < md2
    if K <= 64:
        kept_list = [cand[0]]
        for i in range(1, K):
            prev = jnp.stack(kept_list)
            kept_list.append(cand[i] & ~jnp.any(prev & close[i, :i]))
        kept = jnp.stack(kept_list)
    else:
        B = 16
        K_pad = -(-K // B) * B
        cand_p = jnp.pad(cand, (0, K_pad - K))
        close_p = jnp.pad(close, ((0, K_pad - K), (0, K_pad - K)))

        def block(kept_c, b):
            idx = b * B + jnp.arange(B)
            rows = close_p[idx]                        # (B, K_pad)
            # clash against everything kept in earlier blocks
            base = jnp.any(rows & kept_c[None, :], axis=1)
            blk = rows[:, idx]                         # (B, B) in-block
            k_list = []
            for t in range(B):
                clash_in = (jnp.any(jnp.stack(k_list) & blk[t, :t])
                            if k_list else jnp.asarray(False))
                k_list.append(cand_p[idx[t]] & ~base[t] & ~clash_in)
            return kept_c.at[idx].set(jnp.stack(k_list)), None

        kept0 = jnp.zeros(K_pad, bool)
        kept, _ = jax.lax.scan(block, kept0, jnp.arange(K_pad // B))
        kept = kept[:K]
    raw_rank = jnp.cumsum(kept.astype(jnp.int32)) - 1
    return pix, kept, raw_rank, top


def candidate_filters(pix: jnp.ndarray, cfg: SlamConfig,
                      avoid: jnp.ndarray | None,
                      avoid_valid: jnp.ndarray | None,
                      n_matched: jnp.ndarray | int = 0) -> jnp.ndarray:
    """Border + landmark-proximity filters on raw corners (SLAM.cpp:650-705).

    Returns an acceptance mask (K,). The proximity test is skipped when
    ``n_matched`` is zero (the reference only filters against landmarks once
    something is matched, SLAM.cpp:663-671).
    """
    W, H = cfg.camera.width, cfg.camera.height
    b = cfg.dist_to_border
    ok = ((pix[:, 0] >= b) & (pix[:, 0] <= W - b)
          & (pix[:, 1] >= b) & (pix[:, 1] <= H - b))
    if avoid is not None:
        nz = avoid_valid & jnp.any(avoid != 0.0, axis=-1)
        d2 = jnp.sum((pix[:, None, :] - avoid[None, :, :]) ** 2, axis=-1)
        near = jnp.any((d2 < cfg.min_dist2) & nz[None, :], axis=1)
        any_matched = jnp.asarray(n_matched) > 0
        ok = ok & (~near | ~any_matched)
        if cfg.detect_zero_blocks:
            # reference isThereNoZero: any landmark with a zeroed pixel
            # rejects every candidate (SLAM.cpp:684-696)
            has_zero = jnp.any(avoid_valid & ~jnp.any(avoid != 0.0, axis=-1))
            ok = ok & (~has_zero | ~any_matched)
    return ok


def escalate_raws(kept: jnp.ndarray, raw_rank: jnp.ndarray,
                  filters_ok: jnp.ndarray, n_map: jnp.ndarray,
                  n_loop: jnp.ndarray, base_raws: int,
                  cfg: SlamConfig) -> jnp.ndarray:
    """insureEnoughFeatures (SLAM.cpp:777-808) in one pass.

    The reference re-detects with raws += minNUM (up to 30) until
    map + additions >= minNUM. Raw sets for increasing caps are prefixes of
    the same greedy sequence, so each ladder step's survivor count is a
    masked count; returns the chosen raw cap (traced scalar int32).
    """
    # the reference escalates to at most 30 raws (SLAM.cpp:777-808); a
    # configured base above 30 is honoured as-is (no escalation headroom)
    max_raws = max(30, base_raws)
    steps = max(1, -(-(max_raws - base_raws) // max(cfg.min_num, 1)) + 1)
    ladder = jnp.minimum(base_raws + cfg.min_num * jnp.arange(steps), max_raws)
    ok = kept & filters_ok
    counts = jnp.sum(
        ok[None, :] & (raw_rank[None, :] < ladder[:, None]), axis=1)
    enough = (n_map + n_loop + counts) >= cfg.min_num
    first = jnp.argmax(enough)
    idx = jnp.where(jnp.any(enough), first, steps - 1)
    return ladder[idx]


def detect_corners(image: jnp.ndarray, cfg: SlamConfig,
                   avoid: jnp.ndarray | None = None,
                   avoid_valid: jnp.ndarray | None = None,
                   n_matched: jnp.ndarray | int = 0,
                   n_map: jnp.ndarray | int = 0,
                   n_loop: jnp.ndarray | int = 0,
                   base_raws: int | None = None):
    """Full reference detection pipeline.

    Returns (pix (K, 2), valid (K,), resp (K,)) where ``valid`` marks
    corners inside the (possibly escalated) raw cap that pass every filter,
    in response order.
    """
    if base_raws is None:
        base_raws = cfg.n_process_raws
    pix, kept, raw_rank, resp = gftt_candidates(image, cfg)
    fok = candidate_filters(pix, cfg, avoid, avoid_valid, n_matched)
    raws = escalate_raws(kept, raw_rank, fok, jnp.asarray(n_map),
                         jnp.asarray(n_loop), base_raws, cfg)
    valid = kept & fok & (raw_rank < raws)
    return pix, valid, resp


def select_new_corners(pix: jnp.ndarray, kept: jnp.ndarray, resp: jnp.ndarray,
                       k_add: int, n_free: jnp.ndarray):
    """Pick the k_add best kept corners (capped by free slots).

    Returns (corners (k_add, 2), valid (k_add,)).
    """
    order = jnp.argsort(jnp.where(kept, -resp, jnp.inf))
    sel = order[:k_add]
    valid = kept[sel] & (jnp.arange(k_add) < n_free)
    return pix[sel], valid
