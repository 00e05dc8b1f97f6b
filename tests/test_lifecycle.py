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


def test_integrate_fold_matches_refactorization(rng):
    """The closed-form integration fold (lifecycle._fold_sqrt) produces the
    SAME posterior covariance as the structured-Gram refactorization —
    the sqrt differs by an orthogonal transform only (VERDICT r4 item 3).
    Tolerance is the repair-rung floor: both paths pay one benign jitter
    rung (the new position rows are exact copies of the robot position,
    so the integrated covariance is PSD-singular by construction)."""
    from cv_monoslam_tpu.filter.lifecycle import integrate_features

    base = dict(max_landmarks=6, max_new_per_frame=3, dtype="float64",
                qr_mode="gram", update_mode="gram", sigma_mode="implicit")
    import jax

    cfg_ref = SlamConfig(**base, integrate_fold=False)
    cfg_fold = SlamConfig(**base, integrate_fold=True)
    state, _ = dense_state(rng, cfg_ref, 2)
    state = jax.tree.map(jnp.asarray, state)
    img = jnp.asarray(rng.uniform(0, 255, (cfg_ref.camera.height,
                                           cfg_ref.camera.width)))
    corners = jnp.asarray(np.array([[300.0, 220.0], [350.0, 260.0],
                                    [280.0, 200.0]]))
    valid = jnp.array([True, False, True])     # mixed: one masked no-op

    s_ref = integrate_features(state, img, corners, valid, cfg_ref)
    s_fold = integrate_features(state, img, corners, valid, cfg_fold)

    assert np.abs(np.asarray(s_ref.x) - np.asarray(s_fold.x)).max() == 0.0
    P_ref = np.asarray(s_ref.S).T @ np.asarray(s_ref.S)
    P_fold = np.asarray(s_fold.S).T @ np.asarray(s_fold.S)
    assert np.abs(P_ref - P_fold).max() < 3e-6 * np.abs(P_ref).max()
    # invalid candidate's slot stays at the decoupled unit invariant
    targets = np.argsort(np.asarray(state.lm.active), kind="stable")[:3]
    inv_rows = 6 * targets[1] + np.arange(6)
    assert np.abs(P_fold[np.ix_(inv_rows, inv_rows)] - np.eye(6)).max() \
        < 3e-6
    other = [r for r in range(cfg_ref.state_dim) if r not in set(inv_rows)]
    assert np.abs(P_fold[np.ix_(inv_rows, other)]).max() < 3e-6
    # the folded sqrt is deliberately NOT triangular (robot-row couplings
    # below the diagonal); the next joint-Schur update re-triangularizes
    new_rows = 6 * targets[0] + np.arange(6)
    assert np.abs(np.tril(np.asarray(s_fold.S), -1)).max() > 0.0


def test_integrate_fold_end_to_end(tiny_sequence):
    """Full session with the fold on vs off: the non-triangular S flows
    through motion -> measurement -> joint-Schur update (which
    re-triangularizes) across real frames with detection, deletion and
    matching; trajectories must agree to UT-roundoff."""
    from cv_monoslam_tpu.api import SlamSession

    seq, track, gt_xy, _ = tiny_sequence
    base = dict(max_landmarks=8, max_new_per_frame=4, max_detections=16,
                dtype="float64", qr_mode="gram", update_mode="gram",
                sigma_mode="implicit")
    traj = {}
    for fold in (False, True):
        cfg = SlamConfig(**base, integrate_fold=fold)
        s = SlamSession(cfg, seq, track)
        s.run()
        assert len(s.records) == len(track) - 1
        traj[fold] = np.asarray(s.trajectory)
    # identical UT posterior every frame => identical trajectory up to the
    # different (smaller) jitter floor the fold pays on repair rungs
    err = np.abs(traj[True][:, :2] - traj[False][:, :2]).max()
    assert err < 1e-4, err
