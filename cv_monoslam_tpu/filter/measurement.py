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


def measurement_predict_reduced(state: FilterState, cache: PredictCache,
                                cfg: SlamConfig):
    """Per-landmark reduced-subspace UT (sigma_mode="implicit").

    Each landmark's measurement depends on EXACTLY 10 state dims: its own
    6-dim inverse-depth block plus the robot pose (x, y, z, theta). The
    full-state UT pushes all 2(6M+5)+1 sigma points through the camera
    for every landmark (SLAM.cpp:1615-1691 batched); here each landmark
    gets a 21-point UT of its 10-dim marginal — at M=512 that is 21
    projections per landmark instead of 6163 (~300x less), agreeing with
    the full UT to second order (both match the marginal mean/cov
    exactly; they differ in 4th-order terms of the mild projection
    nonlinearity — bounded in tests/test_implicit.py).

    Also emits the UT-implied linearization H_m (2 x 10) per landmark
    (cross-covariance against the subspace, solved against the subspace
    covariance) — the update path rebuilds the full-state innovation
    structure from it via Grams of S.
    """
    dtype = state.x.dtype
    D = cfg.state_dim
    M = cfg.max_landmarks

    # subspace covariance of z_m = [feat6_m, robot4]
    if cache.g_pred is not None:
        # one-chol pipeline: blocks gathered straight from the motion-
        # predicted covariance Gram (state.S is stale here by design)
        G = cache.g_pred
        idx6 = 6 * jnp.arange(M)[:, None] + jnp.arange(6)[None, :]
        FF = G[idx6[:, :, None], idx6[:, None, :]]         # (M, 6, 6)
        FR = G[idx6][:, :, D - 4:]                         # (M, 6, 4)
        RR = G[D - 4:, D - 4:]
    else:
        import jax as _jax

        hp = _jax.lax.Precision.HIGHEST    # covariance path: full f32
        S = state.S
        S_feat = S[:, : 6 * M].reshape(D, M, 6)
        S_rob = S[:, D - 4:]
        FF = jnp.einsum("dmi,dmj->mij", S_feat, S_feat, precision=hp)
        FR = jnp.einsum("dmi,dj->mij", S_feat, S_rob, precision=hp)
        RR = jnp.matmul(S_rob.T, S_rob, precision=hp)
    cov = jnp.concatenate([
        jnp.concatenate([FF, FR], axis=2),
        jnp.concatenate([jnp.swapaxes(FR, 1, 2),
                         jnp.broadcast_to(RR, (M, 4, 4))], axis=2),
    ], axis=1)                                             # (M, 10, 10)
    scale = jnp.maximum(jnp.einsum("mii->m", cov) / 10.0, 1e-12)
    L = jnp.linalg.cholesky(
        cov + (1e-7 * scale)[:, None, None] * jnp.eye(10, dtype=dtype))
    L = jnp.where(jnp.isfinite(L), L, 0.0)

    w_r = ut_weights(10, cfg)
    g = jnp.asarray(w_r.gamma, dtype)
    mu_z = jnp.concatenate([
        state.x[: 6 * M].reshape(M, 6),
        jnp.broadcast_to(state.x[D - 4:], (M, 4))], axis=1)  # (M, 10)
    offs = g * jnp.swapaxes(L, 1, 2)                       # (M, 10pt, 10)
    pts = jnp.concatenate([mu_z[:, None, :],
                           mu_z[:, None, :] + offs,
                           mu_z[:, None, :] - offs], axis=1)  # (M, 21, 10)

    feats = pts[..., :6]
    pos = pts[..., 6:9]
    theta = pts[..., 9]
    rcw = jnp.swapaxes(tf.yaw_matrix(theta), -1, -2)       # (M, 21, 3, 3)
    hlw = tf.state_to_world(feats, pos)                    # (M, 21, 3)
    hlr = jnp.einsum("msij,msj->msi", rcw, hlw)
    pix = cam_mod.project(cfg.camera, hlr)                 # (M, 21, 2)
    # sentinel guard: sigma points whose projection leaves the image get
    # the CENTER projection (zero deviation) instead of (0,0). A border
    # landmark with live sentinel points otherwise produces a garbage
    # linearization H with ~1e4-scale entries, and the f32 cancellation
    # G - W^T W then loses PSD by O(1) — measured r3 as ~1.5 escalated
    # covariance repairs per frame at D=3076 before this guard.
    live = jnp.any(pix != 0.0, axis=-1, keepdims=True)     # (M, 21, 1)
    pix = jnp.where(live, pix, pix[:, :1])

    mean = jnp.einsum("msi,s->mi", pix, w_r.mean_weights(dtype))
    lm = state.lm
    visible = lm.active & (mean[:, 0] != 0) & (mean[:, 1] != 0)

    dz = w_r.wi_sr * (pts[:, 1:] - pts[:, :1])             # (M, 20, 10)
    dh = w_r.wi_sr * (pix[:, 1:] - pix[:, :1])             # (M, 20, 2)
    gram_r = jnp.einsum("msi,msj->mij", dh, dh)
    # rescale to the FULL-state UT's deviation normalization so Si (which
    # gates the chi^2 ellipse and sizes the search window) matches the
    # full path's scale across weight schemes
    w_full = ut_weights(D + 5, cfg)
    c_ratio = (2.0 * (w_full.wi_sr * w_full.gamma) ** 2
               / (2.0 * (w_r.wi_sr * w_r.gamma) ** 2))
    gram_geo = c_ratio * gram_r
    gram_geo = gram_geo + (cfg.sigma_measure ** 2) * jnp.eye(2, dtype=dtype)
    si = chol2x2_upper(gram_geo)

    # implied linearization: H = (Szz^-1 Pzy)^T, batched 10x10 solves
    szz = jnp.einsum("msi,msj->mij", dz, dz)
    pzy = jnp.einsum("msi,msk->mik", dz, dh)
    jit_i = (1e-9 * jnp.einsum("mii->m", szz) / 10.0 + 1e-20)
    h_lin = jnp.swapaxes(jnp.linalg.solve(
        szz + jit_i[:, None, None] * jnp.eye(10, dtype=dtype), pzy), 1, 2)
    h_lin = jnp.where(jnp.isfinite(h_lin), h_lin, 0.0)     # (M, 2, 10)

    lm_new = replace(
        lm,
        visible=visible,
        matched=jnp.zeros_like(lm.matched),
        n_predict=lm.n_predict + visible.astype(jnp.int32),
        pred=jnp.where(visible[:, None], mean, lm.pred),
        si=jnp.where(visible[:, None, None], si, lm.si),
    )
    pred = jnp.where(visible[:, None], mean, lm.pred)
    return (
        replace(state, lm=lm_new),
        replace(cache, pred=pred, h_lin=h_lin),
    )


def measurement_predict(state: FilterState, cache: PredictCache,
                        cfg: SlamConfig):
    """Returns (new_state, cache with sigma_pix/pred filled)."""
    if cfg.sigma_mode == "implicit":
        return measurement_predict_reduced(state, cache, cfg)
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
