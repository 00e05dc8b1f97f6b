"""Per-stage device profile at LARGE state (M=512, D=3076) — VERDICT r3
item 2: the M=32 table in PERF.md does not transfer to config 3.

Times each pipeline stage jitted in isolation on the current backend,
plus micro-timings of the primitives that dominate at this size (D x D
Gram, D x D Cholesky, triangular solves) so the optimization target is
measured, not guessed.

Usage: python scripts/profile_large.py [--landmarks 512] [--stages-only]
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
sys.path.insert(0, os.path.dirname(__file__))

import jax

from cv_monoslam_tpu.utils.compile_cache import enable as _enable_cache

_enable_cache(os.path.join(os.path.dirname(__file__), "..", ".cache",
                           "jax"))

import jax.numpy as jnp
import numpy as np

from bench_large import dense_sequence
from cv_monoslam_tpu.api import SlamSession
from cv_monoslam_tpu.config import SlamConfig


def time_fn(fn, args, n=10, warmup=2):
    for _ in range(warmup):
        jax.block_until_ready(fn(*args))
    t0 = time.perf_counter()
    for _ in range(n):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / n


def micro(cfg: SlamConfig):
    """Primitive costs at D = state_dim."""
    D = cfg.state_dim
    dtype = cfg.dtype
    rng = np.random.default_rng(0)
    S = jnp.asarray(np.triu(rng.normal(size=(D, D))).astype(dtype)) \
        + 3.0 * jnp.eye(D, dtype=dtype)
    A = jnp.asarray(rng.normal(size=(D, D)).astype(dtype))
    B = jnp.asarray(rng.normal(size=(D, 2 * cfg.max_landmarks))
                    .astype(dtype))
    G = jax.jit(lambda a: jax.lax.dot_general(
        a, a, dimension_numbers=(((0,), (0,)), ((), ()))))
    C = jax.jit(lambda g: jnp.linalg.cholesky(g, upper=True))
    T = jax.jit(lambda r, b: jax.scipy.linalg.solve_triangular(
        r.T, b, lower=True))
    g = G(A)
    g = g + D * jnp.eye(D, dtype=dtype)
    out = {
        f"gram DxD (D={D})": time_fn(G, (A,)),
        f"cholesky DxD": time_fn(C, (g,)),
        f"tri_solve Dx{2 * cfg.max_landmarks}": time_fn(T, (S, B)),
    }
    m2 = 2 * cfg.max_landmarks
    P = jnp.asarray(rng.normal(size=(m2, m2)).astype(dtype))
    Pg = G(P) + m2 * jnp.eye(m2, dtype=dtype)
    out[f"cholesky {m2}x{m2}"] = time_fn(C, (Pg,))
    return out


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--landmarks", type=int, default=512)
    p.add_argument("--frames", type=int, default=10)
    p.add_argument("--stages-only", action="store_true")
    args = p.parse_args()

    print(f"backend: {jax.default_backend()}")
    M = args.landmarks
    sigma_mode = os.environ.get("CVMS_SIGMA_MODE", "implicit")
    cfg = SlamConfig(max_landmarks=M, max_new_per_frame=48,
                     max_detections=192, update_mode="gram", qr_mode="gram",
                     sigma_mode=sigma_mode,
                     min_dist=8.0, min_num=min(96, M // 2),
                     n_initial_raws=96, n_process_raws=96)
    print(f"sigma_mode={sigma_mode}")
    print(f"M={M}, D={cfg.state_dim}")

    if not args.stages_only:
        for k, v in micro(cfg).items():
            print(f"  {k:28s} {v * 1e3:8.2f} ms")

    from cv_monoslam_tpu.filter.motion import motion_predict
    from cv_monoslam_tpu.filter.measurement import measurement_predict
    from cv_monoslam_tpu.frontend.matching import data_association
    from cv_monoslam_tpu.filter.update import kalman_update
    from cv_monoslam_tpu.filter.lifecycle import update_features
    from cv_monoslam_tpu.filter.srukf import add_features

    seq, track, gt_xy = dense_sequence(24)
    sess = SlamSession(cfg, seq, track)
    for _ in range(4):
        sess.step()
    state = sess.state
    k = sess.counter
    img = jax.device_put(
        sess.images.get(int(track.frame_id[k])).astype(sess._dtype))
    op = jax.device_put(sess._odo[k - 1])
    oc = jax.device_put(sess._odo[k])

    mp = jax.jit(lambda st, a, b: motion_predict(st, a, b, cfg))
    state1, cache1 = mp(state, op, oc)
    me = jax.jit(lambda st, c: measurement_predict(st, c, cfg))
    state2, cache2 = me(state1, cache1)
    da = jax.jit(lambda st, im: data_association(st, im, cfg))
    state3 = da(state2, img)
    ku = jax.jit(lambda st, c: kalman_update(st, c, cfg))
    state4 = ku(state3, cache2)
    uf = jax.jit(lambda st: update_features(st, cfg))
    state5 = uf(state4)
    af = jax.jit(lambda st, im: add_features(st, im, cfg))

    times = {
        "motion_predict": time_fn(mp, (state, op, oc)),
        "measurement_predict": time_fn(me, (state1, cache1)),
        "data_association": time_fn(da, (state2, img)),
        "kalman_update": time_fn(ku, (state3, cache2)),
        "update_features": time_fn(uf, (state4,)),
        "add_features": time_fn(af, (state5, img)),
    }
    times["sum_stages"] = sum(times.values())
    times["full_step"] = time_fn(sess._step_normal, (state, img, op, oc))
    n_map = int(np.asarray(state.lm.active).sum())
    print(f"map occupancy at profile point: {n_map}")
    for name, t in times.items():
        print(f"  {name:22s} {t * 1e3:8.2f} ms")


if __name__ == "__main__":
    main()
