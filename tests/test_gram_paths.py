"""Structured-Gram fast paths (qr_mode="gram") vs the Householder reference.

The TPU config forms predicted covariances directly as Grams (motion
predict, deletion fold — see filter/motion._motion_sqrt_gram and
lifecycle.fold_delete) instead of QR-factorizing (2Na x D) deviation
stacks. These tests pin S'^T S' equality against the reference-faithful
Householder path at f64 tolerance and check f32 conditioning behaviour at
large D (BASELINE config 3 prerequisite).
"""

import dataclasses

import jax.numpy as jnp
import numpy as np
import pytest

from cv_monoslam_tpu.config import SlamConfig
from cv_monoslam_tpu.filter.lifecycle import fold_delete
from cv_monoslam_tpu.filter.motion import motion_predict
from cv_monoslam_tpu.filter.state import init_state, replace


def _populated_state(cfg, seed=0, n_active=None):
    rng = np.random.default_rng(seed)
    state = init_state(cfg)
    M = cfg.max_landmarks
    D = cfg.state_dim
    n_active = M if n_active is None else n_active
    x = np.array(state.x)
    for i in range(n_active):
        x[6 * i : 6 * i + 6] = [rng.normal(0, 0.5), rng.normal(0, 0.5), 0.0,
                                rng.normal(0, 0.4), rng.normal(0, 0.3),
                                1.0 / 3.0 + rng.normal(0, 0.02)]
    x[-4:] = [0.1, -0.2, 0.0, 0.3]
    # well-scaled random upper-triangular sqrt factor on the active block
    A = rng.normal(size=(2 * D, D)) * 0.02
    S = np.linalg.qr(A, mode="r")
    # keep inactive slots decoupled at unit diagonal
    for i in range(n_active, M):
        rows = slice(6 * i, 6 * i + 6)
        S[rows, :] = 0.0
        S[:, rows] = 0.0
        S[rows, rows] = np.eye(6) * 0.0
        for j in range(6 * i, 6 * i + 6):
            S[j, j] = 1.0
    lm = replace(state.lm,
                 active=np.arange(M) < n_active,
                 lid=np.where(np.arange(M) < n_active,
                              np.arange(M) + 1, 0).astype(np.int32))
    dt = np.dtype(cfg.dtype)
    return replace(state, x=jnp.asarray(x.astype(dt)),
                   S=jnp.asarray(S.astype(dt)), lm=lm)


@pytest.mark.parametrize("n_active", [2, 8])
def test_motion_gram_matches_householder(n_active):
    cfg_h = SlamConfig(max_landmarks=8, dtype="float64",
                       qr_mode="householder")
    cfg_g = dataclasses.replace(cfg_h, qr_mode="gram")
    state = _populated_state(cfg_h, n_active=n_active)
    op = jnp.array([0.0, 0.0, 0.0])
    oc = jnp.array([0.05, 0.01, 0.02])

    s_h, cache_h = motion_predict(state, op, oc, cfg_h)
    s_g, cache_g = motion_predict(state, op, oc, cfg_g)

    np.testing.assert_allclose(np.asarray(s_g.x), np.asarray(s_h.x),
                               rtol=1e-10, atol=1e-12)
    p_h = np.asarray(s_h.S.T @ s_h.S)
    p_g = np.asarray(s_g.S.T @ s_g.S)
    np.testing.assert_allclose(p_g, p_h, rtol=1e-8, atol=1e-11)
    # the cached sigma set is identical (the Gram path only changes S')
    np.testing.assert_allclose(np.asarray(cache_g.sigma),
                               np.asarray(cache_h.sigma))


def test_fold_delete_gram_matches_householder():
    cfg_h = SlamConfig(max_landmarks=8, dtype="float64",
                       qr_mode="householder")
    cfg_g = dataclasses.replace(cfg_h, qr_mode="gram")
    state = _populated_state(cfg_h, n_active=6)
    delete = jnp.asarray(np.array([1, 0, 1, 0, 0, 1, 0, 0], bool))

    x_h, S_h, _ = fold_delete(state.x, state.S, delete, cfg_h)
    x_g, S_g, _ = fold_delete(state.x, state.S, delete, cfg_g)

    np.testing.assert_allclose(np.asarray(x_g), np.asarray(x_h))
    np.testing.assert_allclose(np.asarray(S_g.T @ S_g),
                               np.asarray(S_h.T @ S_h),
                               rtol=1e-8, atol=1e-11)


def test_integrate_gram_matches_householder():
    import jax

    cfg_h = SlamConfig(max_landmarks=8, max_new_per_frame=4,
                       dtype="float64", qr_mode="householder")
    cfg_g = dataclasses.replace(cfg_h, qr_mode="gram")
    state = _populated_state(cfg_h, n_active=4)
    rng = np.random.default_rng(3)
    image = jnp.asarray(rng.uniform(0, 255, (cfg_h.camera.height,
                                             cfg_h.camera.width)))
    corners = jnp.asarray([[120.0, 90.0], [300.0, 220.0],
                           [500.0, 400.0], [50.0, 50.0]])
    valid = jnp.asarray([True, True, False, True])

    import jax as _jax

    state = _jax.tree.map(jnp.asarray, state)   # eager call needs jnp leaves

    from cv_monoslam_tpu.filter.lifecycle import integrate_features

    s_h = integrate_features(state, image, corners, valid, cfg_h)
    s_g = integrate_features(state, image, corners, valid, cfg_g)
    np.testing.assert_allclose(np.asarray(s_g.x), np.asarray(s_h.x),
                               rtol=1e-10, atol=1e-12)
    # feature init makes the augmented covariance exactly rank-deficient
    # (new-slot positions duplicate the robot position — the reference's
    # pivoted-Cholesky rank handling exists for this, SLAM.cpp:2158-2179);
    # the Gram path repairs with a 1e-6-scaled diagonal, hence the atol
    np.testing.assert_allclose(np.asarray(s_g.S.T @ s_g.S),
                               np.asarray(s_h.S.T @ s_h.S),
                               rtol=1e-5, atol=3e-6)


def test_motion_gram_f32_large_state():
    """BASELINE config 3 prerequisite: the structured Gram stays finite and
    accurate at a large state dim in float32 (where a Householder QR of the
    (2Na x D) stack is the path being replaced)."""
    cfg = SlamConfig(max_landmarks=64, dtype="float32", qr_mode="gram")
    cfg64 = dataclasses.replace(cfg, dtype="float64", qr_mode="householder")
    state32 = _populated_state(cfg, n_active=64)
    state64 = replace(state32, x=state32.x.astype(jnp.float64),
                      S=state32.S.astype(jnp.float64))
    op = jnp.array([0.0, 0.0, 0.0])
    oc = jnp.array([0.05, 0.01, 0.02])

    s32, _ = motion_predict(state32, op.astype(jnp.float32),
                            oc.astype(jnp.float32), cfg)
    s64, _ = motion_predict(state64, op, oc, cfg64)

    assert np.all(np.isfinite(np.asarray(s32.S)))
    p32 = np.asarray(s32.S, np.float64).T @ np.asarray(s32.S, np.float64)
    p64 = np.asarray(s64.S.T @ s64.S)
    rel = np.linalg.norm(p32 - p64) / np.linalg.norm(p64)
    assert rel < 1e-4, rel
