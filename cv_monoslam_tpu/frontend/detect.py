"""Shi-Tomasi corner detection + candidate filtering (JAX, conv-based).

Replaces the reference's GoodFeaturesToTrackDetector + serial filter loops
(SLAM.cpp:574-768) with convolutional structure tensors, windowed NMS, a
static top-K selection, and a masked greedy min-distance pass — all static
shapes, MXU-friendly.

Reference rules reproduced:
  * min-eigenvalue corner measure, quality threshold = quality_level * max
    response, min distance between corners (SLAM.cpp:599-600);
  * candidates at least dist_to_border px inside the image (SLAM.cpp:650);
  * candidates at least min_dist px from every active landmark's predicted
    AND matched pixel (SLAM.cpp:663-705).

Documented deviation: the reference rejects every candidate whenever any
landmark has a zero predicted/matched pixel (SLAM.cpp:684-696's
isThereNoZero flag); we instead simply skip the proximity test against such
landmarks.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ..config import SlamConfig


def corner_response(image: jnp.ndarray, block_size: int = 3) -> jnp.ndarray:
    """Min-eigenvalue (Shi-Tomasi) response map, (H, W) float32."""
    img = image.astype(jnp.float32)
    sob = jnp.array([[-1.0, 0.0, 1.0], [-2.0, 0.0, 2.0], [-1.0, 0.0, 1.0]],
                    jnp.float32) / 8.0

    def conv(x, k):
        return jax.lax.conv_general_dilated(
            x[None, None], k[None, None], (1, 1), "SAME",
            dimension_numbers=("NCHW", "OIHW", "NCHW"))[0, 0]

    gx = conv(img, sob)
    gy = conv(img, sob.T)
    box = jnp.ones((block_size, block_size), jnp.float32) / (block_size ** 2)
    ixx = conv(gx * gx, box)
    iyy = conv(gy * gy, box)
    ixy = conv(gx * gy, box)
    tr = ixx + iyy
    disc = jnp.sqrt(jnp.maximum(((ixx - iyy) * 0.5) ** 2 + ixy * ixy, 0.0))
    return tr * 0.5 - disc


def detect_corners(image: jnp.ndarray, cfg: SlamConfig,
                   avoid: jnp.ndarray | None = None,
                   avoid_valid: jnp.ndarray | None = None):
    """Detect up to cfg.max_detections corners.

    avoid: (Q, 2) pixels new corners must keep min_dist from (e.g. active
    landmarks' predicted + matched positions); avoid_valid: (Q,) mask.
    Returns (pix (K, 2) float, valid (K,) bool, response (K,)) sorted by
    response, already border-filtered, NMS'd, min-dist-separated.
    """
    K = cfg.max_detections
    H, W = image.shape
    resp = corner_response(image, cfg.block_size)

    # border filter first (DIST_2_BORDER, SLAM.cpp:650) — also keeps the
    # zero-pad convolution artefacts at the image edge out of the
    # quality-threshold max
    b = cfg.dist_to_border
    vv, uu = jnp.meshgrid(jnp.arange(H), jnp.arange(W), indexing="ij")
    inside = (uu >= b) & (uu <= W - b) & (vv >= b) & (vv <= H - b)
    resp = jnp.where(inside, resp, 0.0)

    # 3x3 non-max suppression + quality threshold (SLAM.cpp:599-600)
    mx = jax.lax.reduce_window(resp, -jnp.inf, jax.lax.max, (3, 3), (1, 1),
                               "SAME")
    is_peak = (resp >= mx) & (resp > cfg.quality_level * resp.max())
    score = jnp.where(is_peak, resp, -jnp.inf)

    top, idx = jax.lax.top_k(score.reshape(-1), K)
    py, px = jnp.divmod(idx, W)
    pix = jnp.stack([px, py], axis=1).astype(jnp.float32)
    valid = top > -jnp.inf

    # proximity to existing landmarks (pred & match)
    if avoid is not None:
        d2 = jnp.sum((pix[:, None, :] - avoid[None, :, :]) ** 2, axis=-1)
        nz = avoid_valid & jnp.any(avoid != 0.0, axis=-1)
        near = jnp.any((d2 < cfg.min_dist2) & nz[None, :], axis=1)
        valid = valid & ~near

    # greedy min-dist among candidates (ordered by response)
    md2 = cfg.min_dist2

    def body(kept, i):
        d2 = jnp.sum((pix - pix[i]) ** 2, axis=1)
        clash = jnp.any(kept & (d2 < md2))
        keep_i = valid[i] & ~clash
        return kept.at[i].set(keep_i), keep_i

    kept0 = jnp.zeros(K, bool)
    _, kept = jax.lax.scan(body, kept0, jnp.arange(K))
    return pix, kept, top


def select_new_corners(pix: jnp.ndarray, kept: jnp.ndarray, resp: jnp.ndarray,
                       k_add: int, n_free: jnp.ndarray):
    """Pick the k_add best kept corners (capped by free slots).

    Returns (corners (k_add, 2), valid (k_add,)).
    """
    order = jnp.argsort(jnp.where(kept, -resp, jnp.inf))
    sel = order[:k_add]
    valid = kept[sel] & (jnp.arange(k_add) < n_free)
    return pix[sel], valid
