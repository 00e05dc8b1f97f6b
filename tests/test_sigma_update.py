"""UT weights / sigma points / joint QR-Schur update identities
(SURVEY.md §4 property tests: 'P_from_qr ≈ Σ wᵢ δδᵀ', posterior PSD)."""

import dataclasses

import jax.numpy as jnp
import numpy as np

from cv_monoslam_tpu.config import SlamConfig
from cv_monoslam_tpu.filter.sigma import (deviations, generate_sigma,
                                          ut_weights)
from cv_monoslam_tpu.filter.state import init_state, replace
from cv_monoslam_tpu.filter.update import kalman_update
from cv_monoslam_tpu.filter.state import PredictCache

CFG64 = SlamConfig(max_landmarks=4, dtype="float64")


def test_murray_weights_reference_formulas():
    """weightType 0 (SLAM.cpp:1066-1078): wm0 = 1 - Na/3, gamma = sqrt(3)."""
    w = ut_weights(20, CFG64)
    assert abs(w.wm0 - (1 - 20 / 3)) < 1e-12
    assert abs(w.gamma - np.sqrt(3)) < 1e-12
    assert abs(w.wi - (1 - w.wm0) / 40) < 1e-12
    # mean weights sum to 1
    assert abs(w.wm0 + 40 * w.wi - 1) < 1e-12


def test_ukf2000_and_2004_weights():
    cfg1 = dataclasses.replace(CFG64, weight_type=1)
    w1 = ut_weights(10, cfg1)
    lam = cfg1.alpha ** 2 * 10 - 10
    assert abs(w1.wm0 - lam / (10 + lam)) < 1e-9
    cfg2 = dataclasses.replace(CFG64, weight_type=2)
    w2 = ut_weights(10, cfg2)
    assert abs(w2.gamma - np.sqrt(15.0)) < 1e-12
    assert abs(w2.wm0 - 1 / 3) < 1e-12


def test_sigma_covariance_recovery(rng):
    """QR of sqrt(wi)-scaled deviations reproduces S^T S = P exactly for
    linear propagation (the reference's commented verification blocks,
    SLAM.cpp:1560-1594)."""
    n = 12
    A = rng.normal(size=(n, n))
    S = np.linalg.qr(A)[1]
    mu = rng.normal(size=n)
    w = ut_weights(n, CFG64)
    sig = generate_sigma(jnp.asarray(mu), jnp.asarray(S), w.gamma)
    R = np.linalg.qr(np.asarray(deviations(sig, w.wi_sr)), mode="r")
    assert np.abs(R.T @ R - S.T @ S).max() < 1e-9
    # mean recovery
    m = np.asarray(sig) @ np.asarray(w.mean_weights(jnp.float64))
    assert np.abs(m - mu).max() < 1e-9


def make_cache(cfg, state, rng, matched_slots):
    """Synthetic sigma cloud + pixel projections for update tests."""
    D = cfg.state_dim
    na = D + 5
    ns = 2 * na + 1
    M = cfg.max_landmarks
    w = ut_weights(na, cfg)
    S_aug = np.zeros((na, na))
    S_aug[:D, :D] = np.asarray(state.S)
    S_aug[D : D + 3, D : D + 3] = np.eye(3) * 0.01
    mu = np.concatenate([np.asarray(state.x), np.zeros(5)])
    sig = np.asarray(generate_sigma(jnp.asarray(mu), jnp.asarray(S_aug),
                                    w.gamma))
    # linear pixel map per slot: z = H x (noise handled as independent
    # sigma_measure rows inside the update, not via shared aug dims)
    Hs = rng.normal(size=(M, 2, D)) * 0.5
    pix = np.einsum("mij,js->mis", Hs, sig[:D])
    pred = pix @ np.asarray(w.mean_weights(jnp.float64))
    lm = state.lm
    matched = np.zeros(M, bool)
    matched[matched_slots] = True
    z = pred + rng.normal(size=pred.shape) * 0.5
    lm = replace(lm, matched=jnp.asarray(matched),
                 active=jnp.asarray(np.ones(M, bool)),
                 pred=jnp.asarray(pred), match_px=jnp.asarray(z))
    state = replace(state, lm=lm)
    cache = PredictCache(sigma=jnp.asarray(sig), sigma_pix=jnp.asarray(pix),
                         pred=jnp.asarray(pred))
    return state, cache, w


def test_joint_update_matches_dense_conditional(rng):
    """QR-Schur result == dense Gram-based conditional Gaussian."""
    cfg = CFG64
    state = init_state(cfg)
    A0 = rng.normal(size=(cfg.state_dim, cfg.state_dim)) * 0.1
    S0 = np.linalg.qr(A0)[1]
    state = replace(state, x=jnp.asarray(rng.normal(size=cfg.state_dim)),
                    S=jnp.asarray(S0))
    state, cache, w = make_cache(cfg, state, rng, [0, 2])
    out = kalman_update(state, cache, cfg)

    # dense reference
    D = cfg.state_dim
    A = w.wi_sr * (np.asarray(cache.sigma)[:D, 1:]
                   - np.asarray(cache.sigma)[:D, :1]).T
    rows = [0, 1, 4, 5]
    Z = w.wi_sr * (np.asarray(cache.sigma_pix).reshape(2 * cfg.max_landmarks,
                                                       -1)[rows, 1:]
                   - np.asarray(cache.sigma_pix).reshape(
                       2 * cfg.max_landmarks, -1)[rows, :1]).T
    P = A.T @ A
    Pyy = Z.T @ Z + cfg.sigma_measure ** 2 * np.eye(len(rows))
    Pxy = A.T @ Z
    nu = (np.asarray(state.lm.match_px) - np.asarray(state.lm.pred))[
        [0, 2]].reshape(-1)
    K = Pxy @ np.linalg.inv(Pyy)
    x_ref = np.asarray(state.x) + K @ nu
    P_ref = P - K @ Pyy @ K.T

    assert np.abs(np.asarray(out.x) - x_ref).max() < 1e-8
    P_new = np.asarray(out.S).T @ np.asarray(out.S)
    assert np.abs(P_new - P_ref).max() < 1e-8
    # posterior PSD
    assert np.linalg.eigvalsh(P_new).min() > -1e-10


def test_update_no_matches_is_noop(rng):
    cfg = CFG64
    state = init_state(cfg)
    state, cache, _ = make_cache(cfg, state, rng, [])
    out = kalman_update(state, cache, cfg)
    assert np.abs(np.asarray(out.x) - np.asarray(state.x)).max() == 0
    assert np.abs(np.asarray(out.S) - np.asarray(state.S)).max() == 0


def test_update_mask_excludes_unmatched(rng):
    """Unmatched slots are exact no-ops: posterior equals the update run
    with only the matched columns present."""
    cfg = CFG64
    state = init_state(cfg)
    S0 = np.linalg.qr(rng.normal(size=(cfg.state_dim, cfg.state_dim)))[1]
    state = replace(state, S=jnp.asarray(S0 * 0.1))
    state1, cache, _ = make_cache(cfg, state, rng, [1])
    out = kalman_update(state1, cache, cfg)
    # corrupt the unmatched slots' pixel deviations — must not change result
    pix = np.asarray(cache.sigma_pix).copy()
    pix[0] += 1000.0
    pix[3] -= 777.0
    cache2 = dataclasses.replace(cache, sigma_pix=jnp.asarray(pix))
    out2 = kalman_update(state1, cache2, cfg)
    assert np.abs(np.asarray(out.x) - np.asarray(out2.x)).max() < 1e-8
