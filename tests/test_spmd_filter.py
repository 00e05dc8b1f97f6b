"""SPMD filter-step shard invariance (SURVEY.md §4 item 5, VERDICT item 5a).

The full slam_step under the landmark-axis sharding layout must reproduce
the single-device result on an 8-fake-device CPU mesh — masks, lifecycle
scatters, NCC association, and the joint update all have to commute with
GSPMD partitioning for this to hold.
"""

import numpy as np
import jax
import jax.numpy as jnp
from jax.sharding import NamedSharding, PartitionSpec as P

from cv_monoslam_tpu.config import CameraConfig, SlamConfig
from cv_monoslam_tpu.filter.srukf import slam_step
from cv_monoslam_tpu.filter.state import init_state
from cv_monoslam_tpu.parallel.mesh import make_mesh, state_shardings


def _cfg(m=16):
    return SlamConfig(max_landmarks=m, max_new_per_frame=4,
                      max_detections=16, dtype="float32",
                      camera=CameraConfig(width=160, height=120,
                                          cx=80.0, cy=60.0))


def _inputs(cfg, seed=0):
    rng = np.random.default_rng(seed)
    state = init_state(cfg)
    lm = state.lm
    n_act = 6
    lm.active[:n_act] = True
    lm.lid[:n_act] = np.arange(1, n_act + 1)
    x = state.x
    for i in range(n_act):
        x[6 * i: 6 * i + 6] = [0.0, 0.0, 0.0,
                               rng.normal(0, 0.3), rng.normal(0, 0.2),
                               1.0 / cfg.deep]
        lm.init_patch[i] = rng.uniform(0, 255, lm.init_patch.shape[1:])
    img = rng.uniform(0, 255,
                      (cfg.camera.height, cfg.camera.width)).astype(
                          np.float32)
    odo_prev = np.zeros(3, np.float32)
    odo_cur = np.array([0.03, 0.005, 0.01], np.float32)
    return state, img, odo_prev, odo_cur


def test_filter_step_shard_invariance():
    cfg = _cfg()
    state, img, op, oc = _inputs(cfg)

    # single device
    step1 = jax.jit(lambda st, im, a, b: slam_step(st, im, a, b, False, cfg))
    s1, out1 = step1(state, jnp.asarray(img), jnp.asarray(op),
                     jnp.asarray(oc))

    # 8-device mesh, landmark table sharded
    mesh = make_mesh(8)
    sh = state_shardings(mesh, cfg)
    rep = NamedSharding(mesh, P())
    state8 = jax.device_put(state, sh)
    step8 = jax.jit(lambda st, im, a, b: slam_step(st, im, a, b, False, cfg),
                    in_shardings=(sh, rep, rep, rep),
                    out_shardings=(sh, rep))
    s8, out8 = step8(state8, jax.device_put(jnp.asarray(img), rep),
                     jax.device_put(jnp.asarray(op), rep),
                     jax.device_put(jnp.asarray(oc), rep))

    np.testing.assert_allclose(np.asarray(out8["pose"]),
                               np.asarray(out1["pose"]), rtol=1e-5,
                               atol=1e-6)
    np.testing.assert_allclose(np.asarray(s8.x), np.asarray(s1.x),
                               rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(s8.S), np.asarray(s1.S),
                               rtol=1e-3, atol=1e-4)
    for k in ("lm_active", "lm_matched", "lm_lid"):
        np.testing.assert_array_equal(np.asarray(out8[k]),
                                      np.asarray(out1[k]))


def test_sqrt_sharded_step_invariance():
    """shard_sqrt layout: S row-sharded over the map axis (the large-state
    scaling layout — Gram contractions become psum-of-local-Grams). Must
    reproduce the replicated result."""
    import pytest

    cfg = _cfg(m=18)        # M ≡ 2 mod 4 -> D = 112 divisible by 8
    state, img, op, oc = _inputs(cfg, seed=1)

    step1 = jax.jit(lambda st, im, a, b: slam_step(st, im, a, b, False, cfg))
    s1, out1 = step1(state, jnp.asarray(img), jnp.asarray(op),
                     jnp.asarray(oc))

    mesh = make_mesh(8)
    sh = state_shardings(mesh, cfg, shard_sqrt=True)
    rep = NamedSharding(mesh, P())
    step8 = jax.jit(lambda st, im, a, b: slam_step(st, im, a, b, False, cfg),
                    in_shardings=(sh, rep, rep, rep),
                    out_shardings=(sh, rep))
    with jax.sharding.set_mesh(mesh):
        s8, out8 = step8(jax.device_put(state, sh),
                         jax.device_put(jnp.asarray(img), rep),
                         jax.device_put(jnp.asarray(op), rep),
                         jax.device_put(jnp.asarray(oc), rep))
        jax.block_until_ready(s8)

    np.testing.assert_allclose(np.asarray(out8["pose"]),
                               np.asarray(out1["pose"]), rtol=1e-5,
                               atol=1e-6)
    np.testing.assert_allclose(np.asarray(s8.x), np.asarray(s1.x),
                               rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(s8.S), np.asarray(s1.S),
                               rtol=1e-3, atol=1e-4)

    # layout precondition is enforced
    bad = _cfg(m=16)        # D = 100, not divisible by 8
    with pytest.raises(ValueError, match="divisible"):
        state_shardings(mesh, bad, shard_sqrt=True)


def test_redirect_step_shard_invariance():
    cfg = _cfg()
    state, img, op, oc = _inputs(cfg, seed=3)
    oc = np.array([0.02, 0.0, 1.2], np.float32)   # big turn

    step1 = jax.jit(lambda st, im, a, b: slam_step(st, im, a, b, True, cfg))
    s1, out1 = step1(state, jnp.asarray(img), jnp.asarray(op),
                     jnp.asarray(oc))

    mesh = make_mesh(8)
    sh = state_shardings(mesh, cfg)
    rep = NamedSharding(mesh, P())
    step8 = jax.jit(lambda st, im, a, b: slam_step(st, im, a, b, True, cfg),
                    in_shardings=(sh, rep, rep, rep),
                    out_shardings=(sh, rep))
    s8, out8 = step8(jax.device_put(state, sh),
                     jax.device_put(jnp.asarray(img), rep),
                     jax.device_put(jnp.asarray(op), rep),
                     jax.device_put(jnp.asarray(oc), rep))

    np.testing.assert_allclose(np.asarray(out8["pose"]),
                               np.asarray(out1["pose"]), rtol=1e-5,
                               atol=1e-6)
    np.testing.assert_array_equal(np.asarray(s8.lm.active),
                                  np.asarray(s1.lm.active))
