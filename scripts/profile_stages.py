"""Per-stage device profile of the SRUKF step on the current JAX backend.

Times each pipeline stage jitted in isolation (block_until_ready) plus the
full step and chunked scans, across config variants (qr_mode, update_mode,
gate_detection). Produces the per-stage timing table VERDICT.md item 2
requires.

Usage: python scripts/profile_stages.py [--config NAME ...]
"""

import argparse
import os
import sys
import time

_CACHE_SUBDIR = "jax"  # persistent compile cache (set after jax import)
sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
sys.path.insert(0, os.path.dirname(__file__))

import jax

from cv_monoslam_tpu.utils.compile_cache import enable as _enable_cache  # noqa: E402

_enable_cache(os.path.join(os.path.dirname(__file__), "..", ".cache",
                           _CACHE_SUBDIR))
import numpy as np

from experiment import get_sequence
from cv_monoslam_tpu.api import SlamSession
from cv_monoslam_tpu.config import SlamConfig


def time_fn(fn, args, n=20, warmup=2):
    for _ in range(warmup):
        jax.block_until_ready(fn(*args))
    t0 = time.perf_counter()
    for _ in range(n):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / n


def profile_stages(cfg: SlamConfig, label: str):
    from cv_monoslam_tpu.filter.motion import motion_predict
    from cv_monoslam_tpu.filter.measurement import measurement_predict
    from cv_monoslam_tpu.frontend.matching import data_association
    from cv_monoslam_tpu.filter.update import kalman_update
    from cv_monoslam_tpu.filter.lifecycle import update_features
    from cv_monoslam_tpu.filter.srukf import add_features

    seq, track, gt_xy, gt_th = get_sequence("arc", 41, 0)
    sess = SlamSession(cfg, seq, track)
    # advance a few frames so the map is populated
    for _ in range(6):
        sess.step()
    state = sess.state
    k = sess.counter
    img = sess.images.get(int(track.frame_id[k])).astype(sess._dtype)
    img = jax.device_put(img)
    op, oc = jax.device_put(sess._odo[k - 1]), jax.device_put(sess._odo[k])

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
    times["full_step"] = time_fn(
        sess._step_normal, (state, img, op, oc), n=20)

    print(f"\n=== {label} (M={cfg.max_landmarks}, D={cfg.state_dim}) ===")
    for name, t in times.items():
        print(f"  {name:22s} {t * 1e3:8.2f} ms")
    return times


def profile_chunks(cfg: SlamConfig, label: str, chunks=(8, 16, 32)):
    print(f"\n=== chunked scan, {label} ===")
    for ch in chunks:
        seq, track, _, _ = get_sequence("arc", 80, 0)
        sess = SlamSession(cfg, seq, track)
        sess.step_chunk(ch)                        # compile
        t0 = time.perf_counter()
        n = 0
        while n + ch <= 64:
            recs = sess.step_chunk(ch)
            if not recs:
                break
            n += len(recs)
        dt = (time.perf_counter() - t0) / max(n, 1)
        print(f"  chunk={ch:3d}  {dt * 1e3:8.2f} ms/frame "
              f"({1.0 / dt:7.1f} f/s, {n} frames)")


CONFIGS = {
    "default": dict(),
    "cholqr2": dict(qr_mode="cholqr2"),
    "gram": dict(update_mode="gram"),
    "gram+cholqr2": dict(update_mode="gram", qr_mode="cholqr2"),
    "mxu": dict(update_mode="gram", qr_mode="gram"),
    "mxu+gate": dict(update_mode="gram", qr_mode="gram",
                     gate_detection=True),
}


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--configs", default="default,gram+cholqr2")
    p.add_argument("--chunks", action="store_true")
    p.add_argument("--landmarks", type=int, default=32)
    args = p.parse_args()

    print(f"backend: {jax.default_backend()}, devices: {jax.devices()}")
    for name in args.configs.split(","):
        ov = CONFIGS[name]
        cfg = SlamConfig(max_landmarks=args.landmarks, max_new_per_frame=8,
                         max_detections=48, **ov)
        profile_stages(cfg, name)
        if args.chunks:
            profile_chunks(cfg, name)


if __name__ == "__main__":
    main()
