"""Kernel unit tests (SURVEY.md §4 item 2): CholeskyQR2 vs jnp QR,
hyperbolic downdate / Givens update vs recompose-refactor oracle, and the
three measurement-update strategies against each other."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from cv_monoslam_tpu.ops import (chol_downdate, chol_update, cholqr2, gram,
                                 qr_r)


def _rand_tall(n, d, seed=0, cond=1e3):
    rng = np.random.default_rng(seed)
    u, _ = np.linalg.qr(rng.normal(size=(n, d)))
    v, _ = np.linalg.qr(rng.normal(size=(d, d)))
    s = np.logspace(0, -np.log10(cond), d)
    return (u * s) @ v.T


@pytest.mark.parametrize("shape", [(64, 16), (200, 40), (130, 130)])
def test_cholqr2_matches_householder(shape):
    a = jnp.asarray(_rand_tall(*shape), jnp.float64)
    r_chol = cholqr2(a)
    g_ref = np.asarray(a.T @ a)
    g_new = np.asarray(r_chol.T @ r_chol)
    np.testing.assert_allclose(g_new, g_ref, rtol=1e-9, atol=1e-12)
    # upper triangular
    assert np.allclose(np.tril(np.asarray(r_chol), -1), 0.0)


def test_cholqr2_f32_conditioning():
    a = jnp.asarray(_rand_tall(256, 64, cond=1e4), jnp.float32)
    r = cholqr2(a)
    g_ref = np.asarray(a.T @ a, np.float64)
    g_new = np.asarray(r, np.float64).T @ np.asarray(r, np.float64)
    scale = np.linalg.norm(g_ref)
    assert np.linalg.norm(g_new - g_ref) / scale < 1e-5


def test_chol_update_rank_k():
    rng = np.random.default_rng(1)
    n, k = 24, 3
    a = _rand_tall(3 * n, n, seed=2)
    r0 = np.linalg.qr(a, mode="r")
    u = rng.normal(size=(k, n))
    r1 = chol_update(jnp.asarray(r0), jnp.asarray(u))
    want = r0.T @ r0 + u.T @ u
    got = np.asarray(r1.T @ r1)
    np.testing.assert_allclose(got, want, rtol=1e-9, atol=1e-12)
    assert np.all(np.diag(np.asarray(r1)) != 0)
    assert np.allclose(np.tril(np.asarray(r1), -1), 0.0, atol=1e-12)


def test_chol_downdate_rank_k():
    n, k = 24, 3
    a = _rand_tall(3 * n, n, seed=4)
    p = a.T @ a
    r0 = np.linalg.qr(a, mode="r")
    # downdating by scaled rows of R provably preserves PD
    u = 0.3 * r0[:k]
    want = p - u.T @ u
    assert np.linalg.eigvalsh(want).min() > 0
    r1 = chol_downdate(jnp.asarray(r0), jnp.asarray(u))
    got = np.asarray(r1.T @ r1)
    np.testing.assert_allclose(got, want, rtol=1e-8, atol=1e-10)


def test_chol_downdate_pd_clamp():
    """A downdate that would destroy PD is clamped, not NaN (the jit
    analogue of the reference's Gill-Murray-Wright repair)."""
    n = 8
    r0 = jnp.eye(n, dtype=jnp.float64)
    u = 2.0 * jnp.eye(n, dtype=jnp.float64)[:1]   # P - u u^T indefinite
    r1 = chol_downdate(r0, u)
    assert bool(jnp.all(jnp.isfinite(r1)))
    assert float(r1[0, 0]) > 0


def test_qr_r_modes_agree():
    a = jnp.asarray(_rand_tall(100, 30, seed=5), jnp.float64)
    g1 = gram(qr_r(a, "householder"))
    g2 = gram(qr_r(a, "cholqr2"))
    np.testing.assert_allclose(np.asarray(g1), np.asarray(g2),
                               rtol=1e-9, atol=1e-12)


# ---------------------------------------------------------------------------
# update-mode equivalence on a live filter state
# ---------------------------------------------------------------------------


def _mini_state_with_matches(update_mode, n_match=4):
    from cv_monoslam_tpu.config import CameraConfig, SlamConfig
    from cv_monoslam_tpu.filter.motion import motion_predict
    from cv_monoslam_tpu.filter.measurement import measurement_predict
    from cv_monoslam_tpu.filter.state import init_state, replace
    from cv_monoslam_tpu.filter.update import kalman_update

    cfg = SlamConfig(max_landmarks=4, max_new_per_frame=2, max_detections=8,
                     dtype="float64", update_mode=update_mode,
                     camera=CameraConfig(width=128, height=96, cx=64.0,
                                         cy=48.0))
    state = init_state(cfg)
    x = np.asarray(state.x).copy()
    # f ~ 776 px: keep angles ~0.02 rad so projections stay inside the
    # 128x96 test image (offset ~ f * angle)
    for i in range(3):
        x[6 * i: 6 * i + 6] = [0, 0, 0, 0.02 * i - 0.02, 0.015, 1.0 / 3.0]
    lm = state.lm
    act = np.zeros(cfg.max_landmarks, bool)
    act[:3] = True
    state = replace(state, x=jnp.asarray(x),
                    lm=replace(lm, active=jnp.asarray(act),
                               lid=jnp.asarray(np.arange(1, 5, dtype=np.int32))))

    odo_prev = jnp.zeros(3, jnp.float64)
    odo_cur = jnp.asarray([0.05, 0.01, 0.02], jnp.float64)
    state, cache = motion_predict(state, odo_prev, odo_cur, cfg)
    state, cache = measurement_predict(state, cache, cfg)
    # fabricate matches: observed = predicted + small offset
    lm = state.lm
    offs = jnp.asarray([[1.0, -0.5], [0.3, 0.8], [-0.7, 0.2], [0, 0]],
                       jnp.float64)
    matched = lm.visible & (jnp.arange(cfg.max_landmarks) < n_match)
    state = replace(state, lm=replace(
        lm, matched=matched,
        match_px=jnp.where(matched[:, None], lm.pred + offs, lm.match_px)))
    new_state = kalman_update(state, cache, cfg)
    return state, new_state


def test_update_modes_batched_vs_gram():
    """batched QR-Schur and gram (normal-equations) give the same posterior."""
    s0b, sb = _mini_state_with_matches("batched")
    _, sg = _mini_state_with_matches("gram")

    assert bool(jnp.any(s0b.lm.matched)), "fixture must produce matches"
    np.testing.assert_allclose(np.asarray(sb.x), np.asarray(sg.x),
                               rtol=1e-6, atol=1e-9)
    pb = np.asarray(sb.S.T @ sb.S)
    pg = np.asarray(sg.S.T @ sg.S)
    np.testing.assert_allclose(pg, pb, rtol=1e-5, atol=1e-9)


def test_update_sequential_single_match_equals_batched():
    """For one match the sequential (reference) update and the joint update
    are the same Gaussian conditioning — must agree to roundoff."""
    _, sb = _mini_state_with_matches("batched", n_match=1)
    _, ss = _mini_state_with_matches("sequential", n_match=1)
    np.testing.assert_allclose(np.asarray(ss.x), np.asarray(sb.x),
                               rtol=1e-8, atol=1e-11)
    pb = np.asarray(sb.S.T @ sb.S)
    ps = np.asarray(ss.S.T @ ss.S)
    np.testing.assert_allclose(ps, pb, rtol=1e-7, atol=1e-10)


def test_update_sequential_multi_match_stays_bounded():
    """Multi-match sequential updates reuse stale sigma points (the
    reference's information double-counting, SLAM.cpp:2063-2095). With
    near-identical bearings this drives P indefinite — the engine's
    PD-skip repair must keep S finite and the correction direction must
    agree with the joint update."""
    s0b, sb = _mini_state_with_matches("batched", n_match=3)
    s0s, ss = _mini_state_with_matches("sequential", n_match=3)
    dxb = np.asarray(sb.x - s0b.x)[-4:]
    dxs = np.asarray(ss.x - s0s.x)[-4:]
    assert np.all(np.isfinite(np.asarray(ss.S)))
    assert np.all(np.isfinite(np.asarray(ss.x)))
    assert np.dot(dxb, dxs) > 0
    # repaired posterior stays within an order of magnitude of the prior
    p0 = np.asarray(s0s.S.T @ s0s.S)
    ps = np.asarray(ss.S.T @ ss.S)
    assert np.trace(ps) < 10 * np.trace(p0)


@pytest.mark.parametrize("n", [16, 96, 256, 260])
def test_tri_inv_upper_matches_solve(n):
    """Blocked divide-and-conquer triangular inverse == direct solve
    (used by parallel/dist_chol.py for the panel factor inverse; the
    non-power-of-two case exercises the uneven split)."""
    from cv_monoslam_tpu.ops.linalg import tri_inv_upper

    rng = np.random.default_rng(3)
    g = rng.normal(size=(n, n))
    r = np.linalg.cholesky(g @ g.T + n * np.eye(n)).T
    ri = np.asarray(tri_inv_upper(jnp.asarray(r)))
    np.testing.assert_allclose(ri @ r, np.eye(n), atol=1e-5)
    # stays upper triangular
    assert np.allclose(np.tril(ri, -1), 0.0)
