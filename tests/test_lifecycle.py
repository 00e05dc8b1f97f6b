"""Lifecycle tests: masked delete = marginalization; add preserves
invariants; motion parity vs oracle math (SURVEY.md §4.2-4.3)."""

import jax.numpy as jnp
import numpy as np

from cv_monoslam_tpu.config import SlamConfig
from cv_monoslam_tpu.filter.lifecycle import fold_delete, integrate_features
from cv_monoslam_tpu.filter.motion import motion_predict
from cv_monoslam_tpu.filter.state import init_state, replace

CFG = SlamConfig(max_landmarks=4, max_new_per_frame=2, dtype="float64")


def dense_state(rng, cfg, n_active):
    """State with n_active correlated landmark slots."""
    state = init_state(cfg)
    D = cfg.state_dim
    d_act = 6 * n_active
    rows = list(range(d_act)) + list(range(D - 4, D))
    A = rng.normal(size=(len(rows), len(rows))) * 0.1
    S_act = np.linalg.qr(A)[1]
    S = np.eye(D)
    S[np.ix_(rows, rows)] = S_act
    x = np.asarray(state.x).copy()
    x[:d_act] = rng.normal(size=d_act)
    x[-4:] = rng.normal(size=4)
    active = np.zeros(cfg.max_landmarks, bool)
    active[:n_active] = True
    return replace(state, x=jnp.asarray(x), S=jnp.asarray(S),
                   lm=replace(state.lm, active=jnp.asarray(active))), rows


def test_fold_delete_is_marginalization(rng):
    state, rows = dense_state(rng, CFG, 3)
    D = CFG.state_dim
    P = np.asarray(state.S).T @ np.asarray(state.S)
    delete = np.array([False, True, False, False])
    x_new, S_new, _ = fold_delete(state.x, state.S, jnp.asarray(delete), CFG)
    P_new = np.asarray(S_new).T @ np.asarray(S_new)
    keep = [r for r in range(D) if not (6 <= r < 12)]
    # kept block equals the original marginal
    assert np.abs(P_new[np.ix_(keep, keep)] - P[np.ix_(keep, keep)]).max() \
        < 1e-9
    # deleted slot returns to the unit-diagonal invariant, decoupled
    del_rows = list(range(6, 12))
    assert np.abs(P_new[np.ix_(del_rows, del_rows)] - np.eye(6)).max() < 1e-9
    assert np.abs(P_new[np.ix_(del_rows, keep)]).max() < 1e-9
    # x defaults restored
    assert np.allclose(np.asarray(x_new)[6:12], [0, 0, 0, 0, 0, 1])


def test_integrate_assigns_slots_and_preserves_invariants(rng, tiny_sequence):
    seq, track, _, _ = tiny_sequence
    img = jnp.asarray(seq.get(0).astype(np.float64))
    state, _ = dense_state(rng, CFG, 1)
    # place the robot at origin so projections are sane
    x = np.asarray(state.x).copy()
    x[-4:] = [0, 0, 0, 0]
    state = replace(state, x=jnp.asarray(x))
    corners = jnp.asarray(np.array([[300.0, 250.0], [350.0, 200.0]]))
    valid = jnp.asarray(np.array([True, True]))
    import jax
    out = jax.jit(lambda s, i, c, v: integrate_features(s, i, c, v, CFG))(
        state, img, corners, valid)
    active = np.asarray(out.lm.active)
    assert active.sum() == 3
    assert int(out.next_id) == int(state.next_id) + 2
    # new slots: anchor == robot position, angles finite, rho > 0
    M = CFG.max_landmarks
    feats = np.asarray(out.x)[: 6 * M].reshape(M, 6)
    new_slots = np.where(active & ~np.asarray(state.lm.active))[0]
    for s in new_slots:
        assert np.allclose(feats[s, :3], x[-4:-1], atol=1e-9)
        assert feats[s, 5] > 0.05
    # S stays a valid sqrt factor: P PSD, inactive slot decoupled
    P = np.asarray(out.S).T @ np.asarray(out.S)
    assert np.linalg.eigvalsh(P).min() > -1e-9
    inactive = np.where(~active)[0]
    for s in inactive:
        r = slice(6 * s, 6 * s + 6)
        # 1e-6 headroom: the gram path's PD repair fires on the exactly
        # rank-deficient augmented covariance at feature init (new
        # positions duplicate the robot position, SLAM.cpp:2158-2179)
        assert np.abs(P[r, r] - np.eye(6)).max() < 1e-5
    # patches captured from the image at the corners
    patch = np.asarray(out.lm.init_patch[new_slots[0]])
    hp = CFG.hp_init
    ref = seq.get(0)[250 - hp : 250 + hp + 1, 300 - hp : 300 + hp + 1]
    assert np.abs(patch - ref).max() < 1e-5


def test_motion_predict_matches_oracle_math(rng):
    """Engine motion step == straight NumPy transcription on the same state
    (robot-only; landmarks inactive)."""
    cfg = CFG
    state = init_state(cfg, theta0=0.3)
    odo0 = np.array([0.0, 0.0, 0.3])
    odo1 = np.array([0.05, 0.01, 0.35])
    new_state, cache = motion_predict(state, jnp.asarray(odo0),
                                      jnp.asarray(odo1), cfg)
    # oracle-style dense computation
    from cv_monoslam_tpu.filter.sigma import ut_weights
    D = cfg.state_dim
    na = D + 5
    w = ut_weights(na, cfg)
    dx, dy = odo1[0] - odo0[0], odo1[1] - odo0[1]
    rot1 = np.arctan2(dy, dx) - odo0[2]
    trans = np.hypot(dx, dy)
    rot2 = odo1[2] - odo0[2] - rot1
    mt = np.minimum([cfg.a1 * rot1**2 + cfg.a2 * trans**2,
                     cfg.a3 * trans**2 + cfg.a4 * rot1**2
                     + cfg.a4 * rot2**2,
                     cfg.a1 * rot2**2 + cfg.a2 * trans**2],
                    cfg.motion_noise_cap)
    sr = np.zeros((na, na))
    sr[:D, :D] = np.asarray(state.S)
    sr[D:D+3, D:D+3] = np.diag(mt)
    # measurement-noise dims stay zero (independent noise enters the
    # innovation/update instead — see motion.py)
    mu = np.concatenate([np.asarray(state.x), np.zeros(5)])
    sig = np.empty((na, 2 * na + 1))
    sig[:, 0] = mu
    sig[:, 1:na+1] = mu[:, None] + w.gamma * sr.T
    sig[:, na+1:] = mu[:, None] - w.gamma * sr.T
    r1 = rot1 - sig[D]; tr = trans - sig[D+1]; r2 = rot2 - sig[D+2]
    th = sig[D-1].copy()
    sig[D-4] += tr * np.cos(th + r1)
    sig[D-3] += tr * np.sin(th + r1)
    sig[D-1] += r1 + r2
    wv = np.full(2 * na + 1, w.wi); wv[0] = w.wm0
    x_ref = sig[:D] @ wv
    dev = w.wi_sr * (sig[:D, 1:] - sig[:D, :1]).T
    R = np.linalg.qr(dev, mode="r")
    assert np.abs(np.asarray(new_state.x) - x_ref).max() < 1e-10
    assert np.abs(np.asarray(new_state.S).T @ np.asarray(new_state.S)
                  - R.T @ R).max() < 1e-10
    assert np.abs(np.asarray(cache.sigma) - sig).max() < 1e-10
