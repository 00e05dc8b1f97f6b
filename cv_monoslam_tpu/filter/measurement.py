"""SRUKF measurement prediction — fully batched over sigma points x slots.

Reference semantics (SLAM.cpp:1604-1795): push every propagated sigma point
through state->world->camera->image->distort for EVERY landmark (reusing the
motion-propagated augmented sigma set), weighted-mean the pixels, mark
landmarks visible when the mean pixel is non-sentinel, and form each
feature's 2x2 sqrt innovation from the sqrt(wi)-scaled pixel deviations.

TPU design: a single (M, n_sigma) broadcast replaces the reference's
per-landmark per-point double loop (its 100-iteration Newton distortion per
projection, SLAM.cpp:3186-3193, becomes a fixed small iteration count). The
2x2 QR per feature (SLAM.cpp:1775-1795) becomes a closed-form 2x2 Cholesky
of the Gram matrix — identical S^T S, batch-friendly.
"""

from __future__ import annotations

import jax.numpy as jnp

from ..config import SlamConfig
from ..geometry import camera as cam_mod
from ..geometry import transforms as tf
from .sigma import ut_weights
from .state import FilterState, PredictCache, replace


def chol2x2_upper(g: jnp.ndarray, eps: float = 0.0) -> jnp.ndarray:
    """Batched upper-triangular S with S^T S = G for PSD 2x2 G (..., 2, 2)."""
    g00 = jnp.maximum(g[..., 0, 0], eps)
    a = jnp.sqrt(g00)
    safe_a = jnp.where(a == 0, 1.0, a)
    b = g[..., 0, 1] / safe_a
    c = jnp.sqrt(jnp.maximum(g[..., 1, 1] - b * b, eps))
    z = jnp.zeros_like(a)
    return jnp.stack([
        jnp.stack([a, b], axis=-1),
        jnp.stack([z, c], axis=-1),
    ], axis=-2)


def project_all(sigma: jnp.ndarray, cfg: SlamConfig) -> jnp.ndarray:
    """Project every slot through every sigma point.

    sigma: (Na, n_sigma) augmented motion-propagated points.
    Returns pixels (M, 2, n_sigma) with the (0, 0) invisible sentinel.
    """
    M = cfg.max_landmarks
    D = cfg.state_dim
    feats = sigma[: 6 * M].reshape(M, 6, -1).transpose(0, 2, 1)  # (M, ns, 6)
    pos = sigma[D - 4 : D - 1].T                                  # (ns, 3)
    theta = sigma[D - 1]                                          # (ns,)
    err = sigma[D + 3 : D + 5].T                                  # (ns, 2)
    rcw = jnp.swapaxes(tf.yaw_matrix(theta), -1, -2)              # (ns, 3, 3)
    hlw = tf.state_to_world(feats, pos[None, :, :])               # (M, ns, 3)
    hlr = jnp.einsum("sij,msj->msi", rcw, hlw)
    pix = cam_mod.project(cfg.camera, hlr, err[None, :, :])       # (M, ns, 2)
    return pix.transpose(0, 2, 1)                                 # (M, 2, ns)


def measurement_predict(state: FilterState, cache: PredictCache,
                        cfg: SlamConfig):
    """Returns (new_state, cache with sigma_pix/pred filled)."""
    dtype = state.x.dtype
    D = cfg.state_dim
    w = ut_weights(D + 5, cfg)

    pix = project_all(cache.sigma, cfg)                 # (M, 2, ns)
    mean = pix @ w.mean_weights(dtype)                  # (M, 2)

    lm = state.lm
    visible = lm.active & (mean[:, 0] != 0) & (mean[:, 1] != 0)

    dev = w.wi_sr * (pix[:, :, 1:] - pix[:, :, :1])     # (M, 2, 2Na)
    gram = jnp.einsum("mis,mjs->mij", dev, dev)
    # independent per-landmark measurement noise: Pyy = geo + sigma^2 I
    # (equals the reference's augmented-Qt contribution, SLAM.cpp:1462)
    gram = gram + (cfg.sigma_measure ** 2) * jnp.eye(2, dtype=dtype)
    si = chol2x2_upper(gram)

    lm_new = replace(
        lm,
        visible=visible,
        matched=jnp.zeros_like(lm.matched),
        n_predict=lm.n_predict + visible.astype(jnp.int32),
        pred=jnp.where(visible[:, None], mean, lm.pred),
        si=jnp.where(visible[:, None, None], si, lm.si),
    )
    return (
        replace(state, lm=lm_new),
        replace(cache, sigma_pix=pix, pred=jnp.where(
            visible[:, None], mean, lm.pred)),
    )
