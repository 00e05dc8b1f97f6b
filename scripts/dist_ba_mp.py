"""Multi-process distributed-BA worker (SURVEY.md §4 item 5).

Launched N times by tests/test_multiprocess.py (and usable manually):

    python scripts/dist_ba_mp.py --coord localhost:PORT --nproc 2 --pid 0

Each process contributes ``--local-devices`` fake CPU devices to a global
``jax.distributed`` mesh; the sharded Schur-complement BA solves over the
global landmark axis and every process checks the replicated pose result
against the locally-computed dense reference. This is the DCN-analogue
test for BASELINE config 5 (multi-host): the same psum path that rides ICI
within a slice rides the distributed backend across processes here.
"""

import argparse
import os
import sys


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--coord", required=True)
    p.add_argument("--nproc", type=int, required=True)
    p.add_argument("--pid", type=int, required=True)
    p.add_argument("--local-devices", type=int, default=4)
    args = p.parse_args()

    os.environ["XLA_FLAGS"] = (
        f"--xla_force_host_platform_device_count={args.local_devices} "
        + os.environ.get("XLA_FLAGS", ""))
    os.environ["JAX_PLATFORMS"] = "cpu"
    os.environ.setdefault(
        "JAX_COMPILATION_CACHE_DIR",
        os.path.join(os.path.dirname(__file__), "..", ".cache", "jax-cpu"))
    sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
    sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..",
                                    "tests"))

    import jax

    jax.config.update("jax_platforms", "cpu")   # the axon TPU plugin
    # ignores the env var; the config update is authoritative
    jax.config.update("jax_enable_x64", True)
    jax.config.update("jax_num_cpu_devices", args.local_devices)
    jax.distributed.initialize(coordinator_address=args.coord,
                               num_processes=args.nproc,
                               process_id=args.pid)

    import numpy as np
    from jax.sharding import Mesh

    from cv_monoslam_tpu.backend.ba import ba_solve
    from cv_monoslam_tpu.parallel.dist_ba import ba_solve_sharded
    from cv_monoslam_tpu.parallel.mesh import MAP_AXIS
    from test_backend import _make_problem, CFG

    n_dev = len(jax.devices())
    assert n_dev == args.nproc * args.local_devices, n_dev
    mesh = Mesh(np.array(jax.devices()), (MAP_AXIS,))

    rng = np.random.default_rng(0)
    prob, poses_gt, lms_gt = _make_problem(rng, W=5, L=16, perturb=0.02)

    poses_s, lms_s, costs_s = ba_solve_sharded(prob, CFG, mesh)
    poses_ref, _, _ = ba_solve(prob, CFG)   # dense local reference

    poses_s = np.asarray(poses_s)
    np.testing.assert_allclose(poses_s, np.asarray(poses_ref),
                               rtol=1e-8, atol=1e-10)
    print(f"proc {args.pid}: OK over {n_dev} devices, "
          f"final cost {float(np.asarray(costs_s)[-1]):.3e}")


if __name__ == "__main__":
    main()
