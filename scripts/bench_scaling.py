"""BASELINE config 5: distributed-BA scaling curve on the virtual mesh.

Real multi-chip hardware is unavailable in this environment (one tunneled
TPU), so the achievable substitute is wall-clock scaling of
``ba_solve_sharded`` over 1/2/4/8 VIRTUAL CPU devices plus the
communication-volume model. To make mesh parallelism the only
parallelism, intra-op threading is disabled (single-threaded Eigen);
the host has a hard ceiling of physical cores (``nproc``), so the curve
saturates there — per-device work (which is what maps to real chips)
is reported alongside.

Communication model (see parallel/dist_ba.py): the Schur reduction
all-reduces ONE pose-shaped payload per GN iteration —
U (W,3,3) + Hred (W,W,3,3) + bp (W,3) + cost ≈ (9W + 9W² + 3W + 1)·4 B,
independent of L. At W=8 that is ~2.6 KB/iteration vs O(L/N) landmark
compute, so on real ICI (100+ GB/s) communication is sub-microsecond and
scaling efficiency is bounded by compute balance, not bandwidth.

Must run in its own process (device count is fixed at jax import):
  XLA_FLAGS="--xla_force_host_platform_device_count=8 \
             --xla_cpu_multi_thread_eigen=false" \
  JAX_PLATFORMS=cpu PALLAS_AXON_POOL_IPS= python scripts/bench_scaling.py
Prints one JSON line.
"""

import json
import os
import sys
import time
from functools import partial

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
sys.path.insert(0, os.path.dirname(__file__))

os.environ.setdefault("JAX_PLATFORMS", "cpu")

# Pin the whole process (and every XLA pool thread it spawns — affinity
# is inherited) to ONE core BEFORE jax initializes its thread pool. The
# r4/r5 PERF-vs-artifact contradictions (9.2% vs 42%, then 61.8% vs
# 12.9% modeled efficiency for the same nominal measurement) traced to
# exactly this: on a small host the 1-device baseline's ops can use the
# whole intra-op pool while the serialized 8-virtual-device executable
# interleaves differently, so T_1/T_8_serial compared different machine
# states. One core makes both sides single-threaded by construction and
# the ratio a pure work+overhead model.
try:
    os.sched_setaffinity(0, {0})
except (AttributeError, OSError):  # non-Linux / restricted sandbox
    pass

import jax

from cv_monoslam_tpu.utils.compile_cache import enable as _enable_cache

_enable_cache(os.path.join(os.path.dirname(__file__), "..", ".cache",
                           "jax-cpu"))

jax.config.update("jax_enable_x64", True)   # f32 Schur sums over 32k
#                                             landmarks are reduction-
#                                             order-dependent AND diverge
import jax.numpy as jnp
import numpy as np

W = 8           # keyframe window
L = 32768       # landmarks: large enough to be compute-bound per shard
ITERS = 4


def make_problem(rng):
    """Vectorized synthetic window-BA problem (W poses, L landmarks)."""
    from cv_monoslam_tpu.backend.ba import BAProblem, project_planar
    from cv_monoslam_tpu.config import SlamConfig

    cfg = SlamConfig(dtype="float64")
    poses_gt = np.stack([0.05 * np.arange(W), 0.01 * np.arange(W),
                         0.02 * np.arange(W)], axis=1).astype(np.float64)
    lms = np.stack([rng.uniform(-0.8, 1.2, L), rng.uniform(-0.6, 0.8, L),
                    np.full(L, 3.0)], axis=1).astype(np.float64)
    proj = jax.vmap(jax.vmap(lambda p, l: project_planar(p, l, cfg),
                             in_axes=(None, 0)), in_axes=(0, None))
    obs = np.asarray(proj(jnp.asarray(poses_gt), jnp.asarray(lms)))
    mask = ((obs[..., 0] > 20) & (obs[..., 0] < 620)
            & (obs[..., 1] > 20) & (obs[..., 1] < 460))
    obs = obs + rng.normal(0, 0.3, obs.shape).astype(np.float64)
    odo_rel = np.zeros((W - 1, 3), np.float64)
    for w in range(W - 1):
        c, s = np.cos(poses_gt[w, 2]), np.sin(poses_gt[w, 2])
        d = poses_gt[w + 1, :2] - poses_gt[w, :2]
        odo_rel[w] = [c * d[0] + s * d[1], -s * d[0] + c * d[1],
                      poses_gt[w + 1, 2] - poses_gt[w, 2]]
    poses0 = poses_gt + rng.normal(0, 0.01, poses_gt.shape).astype(
        np.float64)
    poses0[0] = poses_gt[0]
    prob = BAProblem(
        poses=jnp.asarray(poses0),
        landmarks=jnp.asarray(lms + rng.normal(0, 0.01, lms.shape)
                              .astype(np.float64)),
        obs=jnp.asarray(obs), obs_mask=jnp.asarray(mask),
        odo_rel=jnp.asarray(odo_rel),
        kf_mask=jnp.ones(W, bool),
        lm_mask=jnp.asarray(mask.sum(0) >= 2),
        prior_poses=jnp.asarray(poses0),
        prior_iw=jnp.full((W, 3), 1e-6, jnp.float64))
    return prob, cfg


def time_solve(prob, cfg, n_dev, repeats=3):
    from cv_monoslam_tpu.parallel.dist_ba import ba_solve_sharded
    from cv_monoslam_tpu.parallel.mesh import make_mesh

    mesh = make_mesh(n_dev)
    # warm (compile)
    out = ba_solve_sharded(prob, cfg, mesh, iters=ITERS)
    jax.block_until_ready(out)
    best = float("inf")
    for _ in range(repeats):
        t0 = time.perf_counter()
        out = ba_solve_sharded(prob, cfg, mesh, iters=ITERS)
        jax.block_until_ready(out)
        best = min(best, time.perf_counter() - t0)
    return best, out


def filter_scaling(n_iters=1, m=510):
    """Replicated vs row-sharded full filter step (no-detect executable)
    on the serialized virtual mesh. M=510 -> D=3064 divisible by 8.

    Same serialized-execution semantics as the BA curve: T_N_serial ~=
    N * T_N_par. Three variants:

      replicated_1dev          — the single-device baseline
      row_sharded_8dev_replchol — r4 layout: Grams psum'd but the
                                  (2M+D)^2 joint Cholesky REPLICATED on
                                  every device (recorded 9.2% in r4)
      row_sharded_8dev         — r5: the joint factorization itself runs
                                  as the row-sharded blocked panel
                                  Cholesky (parallel/dist_chol.py,
                                  cfg.dist_chol_panel)

    Measurement discipline (r4 reconciliation, VERDICT weak #2): every
    variant is timed by the SAME scan harness in the SAME process with
    single-threaded Eigen, warmed compile, best-of-3 — the r4 PERF.md
    narrative (6.31 s/step 1-dev) and the r4 artifact (1.52 s/step) came
    from different processes/thread settings and disagreed 4x; this
    function is now the single source of truth.
    """
    from jax.sharding import NamedSharding, PartitionSpec as P

    from cv_monoslam_tpu.config import SlamConfig
    from cv_monoslam_tpu.filter.srukf import slam_step
    from cv_monoslam_tpu.filter.state import init_state
    from cv_monoslam_tpu.parallel.mesh import make_mesh, state_shardings

    def make_cfg(dist_panel):
        return SlamConfig(max_landmarks=m, update_mode="gram",
                          qr_mode="gram", sigma_mode="implicit",
                          dtype="float32", dist_chol_panel=dist_panel)

    cfg = make_cfg(0)
    rng = np.random.default_rng(1)
    state = init_state(cfg)
    n_act = 128
    state.lm.active[:n_act] = True
    state.lm.lid[:n_act] = np.arange(1, n_act + 1)
    x = state.x
    for i in range(n_act):
        x[6 * i: 6 * i + 6] = [0.0, 0.0, 0.0, rng.normal(0, 0.3),
                               rng.normal(0, 0.2), 1.0 / cfg.deep]
    img = rng.uniform(0, 255, (cfg.camera.height,
                               cfg.camera.width)).astype(np.float32)
    op = np.zeros(3, np.float32)
    oc = np.array([0.01, 0.002, 0.003], np.float32)

    def scan_step(cfg):
        def run(st, im, a, b):
            def body(s, _):
                s, _o = slam_step(s, im, a, b, False, cfg,
                                  allow_detect=False)
                return s, None
            return jax.lax.scan(body, st, None, length=n_iters)[0]
        return run

    out = {}
    # panel=64 measured best on the PINNED serialized mesh (chol-only at
    # n=4096: 64 -> 65.7%, 128 -> 38%, 256 -> 23% modeled efficiency) —
    # the residual serialized overheads (full-rows panel solve, trailing
    # block overhang) all scale with nb. On real ICI the per-panel
    # collective latency instead favors larger panels; nb is a deploy-
    # time knob, this is the measurement operating point.
    variants = (("replicated_1dev", 1, 0),
                ("row_sharded_8dev_replchol", 8, 0),
                ("row_sharded_8dev", 8, 64))
    for name, n_dev, dist_panel in variants:
        vcfg = make_cfg(dist_panel)
        mesh = make_mesh(n_dev)
        sh = state_shardings(mesh, vcfg, shard_sqrt=(n_dev > 1))
        rep = NamedSharding(mesh, P())
        st_dev = jax.device_put(state, sh)
        args = [jax.device_put(np.asarray(v), rep) for v in (img, op, oc)]
        with jax.sharding.set_mesh(mesh):
            fn = jax.jit(scan_step(vcfg), in_shardings=(sh, rep, rep, rep),
                         out_shardings=sh)
            res = fn(st_dev, *args)
            jax.block_until_ready(res)
            # sanity: sharded variants must not grossly diverge from the
            # baseline (f32 psum reduction order legitimately perturbs
            # the pose at the ~1e-3 level after 2 steps; bit-level shard
            # invariance is pinned by tests/test_spmd_filter.py on
            # smaller states)
            if name == "replicated_1dev":
                pose_ref = np.asarray(res.x)[-4:]
            else:
                np.testing.assert_allclose(np.asarray(res.x)[-4:],
                                           pose_ref, rtol=0.2, atol=5e-3)
            best = float("inf")
            # serialized 8-dev walls run minutes per step: best-of-2
            # there, best-of-3 on the 1-dev baseline (time-budget bound)
            for _ in range(3 if n_dev == 1 else 2):
                t0 = time.perf_counter()
                jax.block_until_ready(fn(st_dev, *args))
                best = min(best, (time.perf_counter() - t0) / n_iters)
        out[name] = round(best, 4)
    t1 = out["replicated_1dev"]
    out["modeled_efficiency_replchol_pct"] = round(
        100 * t1 / out["row_sharded_8dev_replchol"], 1)
    out["modeled_efficiency_pct"] = round(
        100 * t1 / out["row_sharded_8dev"], 1)
    out["chol_only"] = chol_only_scaling()
    return out


def chol_only_scaling(n=4096, panel=64):
    """Factorization-only decomposition of the filter-step curve: times
    chol(n) alone — replicated on 1 device vs the row-sharded blocked
    panel factorization (parallel/dist_chol.py) serialized on the
    8-virtual-device mesh. Separates "does the distributed Cholesky
    itself scale" from the full step's Gram stages + collectives."""
    from jax.sharding import NamedSharding, PartitionSpec as P

    from cv_monoslam_tpu.parallel.dist_chol import chol_rowsharded
    from cv_monoslam_tpu.parallel.mesh import MAP_AXIS, make_mesh

    rng = np.random.default_rng(7)
    G = rng.standard_normal((n, n)).astype(np.float32)
    A = (G @ G.T + n * np.eye(n, dtype=np.float32)).astype(np.float32)

    def time_best(fn, arg, repeats=3):
        r = jax.block_until_ready(fn(arg))
        del r
        best = float("inf")
        for _ in range(repeats):
            t0 = time.perf_counter()
            jax.block_until_ready(fn(arg))
            best = min(best, time.perf_counter() - t0)
        return best

    out = {}
    mesh1 = make_mesh(1)
    rep = NamedSharding(mesh1, P())
    A1 = jax.device_put(jnp.asarray(A), rep)
    with jax.sharding.set_mesh(mesh1):
        f1 = jax.jit(lambda a: jnp.linalg.cholesky(a, upper=True))
        out["replicated_1dev_s"] = round(time_best(f1, A1), 4)

    mesh8 = make_mesh(8)
    sh = NamedSharding(mesh8, P(MAP_AXIS, None))
    A8 = jax.device_put(jnp.asarray(A), sh)
    with jax.sharding.set_mesh(mesh8):
        f8 = jax.jit(partial(chol_rowsharded, panel=panel),
                     in_shardings=sh, out_shardings=sh)
        out["row_sharded_8dev_serial_s"] = round(time_best(f8, A8), 4)
    out["panel"] = panel
    out["modeled_efficiency_pct"] = round(
        100 * out["replicated_1dev_s"] / out["row_sharded_8dev_serial_s"],
        1)
    return out


def main():
    rng = np.random.default_rng(0)
    prob, cfg = make_problem(rng)
    cores = os.cpu_count()
    rows = {}
    ref_cost = None
    t1 = None
    for n in (1, 2, 4, 8):
        t, out = time_solve(prob, cfg, n)
        costs = np.asarray(out[2])
        if ref_cost is None:
            ref_cost = costs
            t1 = t
        else:
            # shard-invariance alongside the timing (same solve, any mesh)
            assert np.allclose(costs, ref_cost, rtol=1e-8), (n, costs,
                                                             ref_cost)
        # The virtual CPU devices execute SERIALLY (measured: wall time is
        # flat in N), so T_N_serial = sum of per-device shards + the total
        # decomposition overhead (collectives + replicated pose solve).
        # Flat total work proves the sharding adds no redundant compute;
        # on parallel hardware each device runs its shard + its own
        # overhead concurrently, so T_N_par ~= T_N_serial / N and modeled
        # efficiency = T_1 / T_N_serial (assumes the 2.7 KB/iter
        # all-reduce is latency-trivial on ICI, which it is).
        rows[n] = dict(
            wall_serial_s=round(t, 4),
            overhead_vs_1dev_pct=round(100 * (t / t1 - 1), 2),
            modeled_efficiency_pct=round(100 * t1 / t, 1),
            per_device_landmarks=L // n)
    comm_bytes = (9 * W + 9 * W * W + 3 * W + 1) * 4
    try:
        filt = filter_scaling()
    except Exception as e:  # noqa: BLE001
        filt = {"error": repr(e)[:200]}
    print(json.dumps(dict(
        L=L, W=W, iters=ITERS, physical_cores=cores,
        note=("virtual CPU devices execute serially; "
              "modeled_efficiency_pct = T_1/T_N_serial — see comment"),
        comm_bytes_per_iter=comm_bytes,
        curve=rows,
        filter_step=filt)))


if __name__ == "__main__":
    main()
