"""Row-sharded blocked Cholesky (parallel/dist_chol.py).

Pins: numerical agreement with the reference factorization, exact
upper-triangularity, device-count invariance, the identity-padded
arbitrary-n path, and the in-filter dispatch (dist_chol_panel under an
ambient mesh produces the same posterior as the replicated path).
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from cv_monoslam_tpu.parallel.dist_chol import (chol_rowsharded,
                                                chol_rowsharded_padded)
from cv_monoslam_tpu.parallel.mesh import make_mesh

pytestmark = pytest.mark.skipif(
    len(jax.devices()) < 8, reason="needs the virtual 8-device mesh")


def _spd(n, seed=0):
    rng = np.random.default_rng(seed)
    a = rng.normal(size=(n, n)).astype(np.float32)
    return (a @ a.T + n * np.eye(n)).astype(np.float32)


@pytest.mark.parametrize("n,ndev,panel", [(512, 8, 64), (512, 4, 64),
                                          (256, 8, 32), (256, 2, 128)])
def test_matches_reference_cholesky(n, ndev, panel):
    spd = _spd(n)
    R = np.asarray(chol_rowsharded(jnp.asarray(spd), make_mesh(ndev),
                                   panel))
    ref = np.linalg.cholesky(spd).T
    assert np.abs(np.tril(R, -1)).max() == 0.0
    np.testing.assert_allclose(R, ref, rtol=2e-4, atol=2e-4 * n)


def test_device_count_invariance():
    spd = _spd(384, seed=3)
    outs = [np.asarray(chol_rowsharded_padded(jnp.asarray(spd),
                                              make_mesh(nd), 64))
            for nd in (1, 2, 8)]
    for o in outs[1:]:
        np.testing.assert_allclose(o, outs[0], rtol=1e-4, atol=1e-2)


def test_padded_arbitrary_n():
    # 300 divides by neither 8 nor 64: identity-padded embedding
    spd = _spd(300, seed=5)
    R = np.asarray(chol_rowsharded_padded(jnp.asarray(spd), make_mesh(8),
                                          64))
    assert R.shape == (300, 300)
    np.testing.assert_allclose(R.T @ R, spd, rtol=1e-4, atol=1e-2 * 300)


def test_panel_spanning_devices():
    # rows_loc (n/ndev = 48) not a multiple of panel (64): panels span
    # device boundaries; the masked-scatter psum must reassemble them
    spd = _spd(384, seed=7)
    R = np.asarray(chol_rowsharded(jnp.asarray(spd), make_mesh(8), 64))
    ref = np.linalg.cholesky(spd).T
    np.testing.assert_allclose(R, ref, rtol=2e-4, atol=2e-4 * 384)


def test_filter_update_dist_matches_replicated():
    """Full slam_step under the shard_sqrt layout: dist_chol_panel=64
    must produce the same posterior as the replicated factorization."""
    from jax.sharding import NamedSharding, PartitionSpec as P

    from cv_monoslam_tpu.config import CameraConfig, SlamConfig
    from cv_monoslam_tpu.filter.srukf import slam_step
    from cv_monoslam_tpu.filter.state import init_state
    from cv_monoslam_tpu.parallel.mesh import state_shardings

    rng = np.random.default_rng(2)

    def run(dist_panel):
        cfg = SlamConfig(max_landmarks=10, max_new_per_frame=4,
                         max_detections=16, update_mode="gram",
                         qr_mode="gram", sigma_mode="implicit",
                         gate_detection=False, dist_chol_panel=dist_panel,
                         camera=CameraConfig(width=128, height=96,
                                             cx=64.0, cy=48.0))
        state = init_state(cfg)
        state.lm.active[:4] = True
        state.lm.lid[:4] = np.arange(1, 5)
        for i in range(4):
            state.x[6 * i: 6 * i + 6] = [0, 0, 0, 0.1 * i - 0.15, 0.05,
                                         1.0 / cfg.deep]
        img = np.asarray(
            rng.uniform(0, 255, (cfg.camera.height, cfg.camera.width)),
            np.float32)
        mesh = make_mesh(8)
        sh = state_shardings(mesh, cfg, shard_sqrt=True)
        rep = NamedSharding(mesh, P())
        with jax.sharding.set_mesh(mesh):
            step = jax.jit(
                lambda st, im, a, b: slam_step(st, im, a, b, False, cfg,
                                               allow_detect=False),
                in_shardings=(sh, rep, rep, rep), out_shardings=(sh, rep))
            st, out = step(
                jax.device_put(state, sh), jax.device_put(img, rep),
                jax.device_put(np.zeros(3, np.float32), rep),
                jax.device_put(np.array([0.02, 0.0, 0.01], np.float32),
                               rep))
            jax.block_until_ready(st)
        return np.asarray(st.x), np.asarray(st.S)

    x0, s0 = run(0)
    x1, s1 = run(64)
    np.testing.assert_allclose(x1, x0, rtol=1e-3, atol=1e-4)
    np.testing.assert_allclose(s1, s0, rtol=1e-2, atol=1e-3)
