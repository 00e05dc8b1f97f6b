"""Scan-amortized per-stage profile at large state (VERDICT r3 item 2).

Isolated per-stage jits carry ~5 ms of tunnel/per-call overhead at this
pytree size, which swamps the in-scan truth. Here each stage runs as an
8-iteration lax.scan inside ONE jit (carry-threaded so XLA cannot CSE),
giving the per-iteration device cost the chunked pipeline actually pays.

Usage: python scripts/profile_scan.py [--landmarks 512]
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

N_ITER = 8


def time_scan(fn, *args, n=6, warmup=2):
    for _ in range(warmup):
        jax.block_until_ready(fn(*args))
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        for _ in range(n):
            out = fn(*args)
        jax.block_until_ready(out)
        best = min(best, (time.perf_counter() - t0) / n / N_ITER)
    return best


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--landmarks", type=int, default=512)
    p.add_argument("--sigma-mode", default="implicit")
    args = p.parse_args()

    M = args.landmarks
    cfg = SlamConfig(max_landmarks=M, max_new_per_frame=48,
                     max_detections=192, update_mode="gram", qr_mode="gram",
                     sigma_mode=args.sigma_mode,
                     min_dist=8.0, min_num=min(96, M // 2),
                     n_initial_raws=96, n_process_raws=96)
    print(f"backend={jax.default_backend()} M={M} D={cfg.state_dim} "
          f"sigma_mode={args.sigma_mode}")

    from cv_monoslam_tpu.filter.motion import motion_predict
    from cv_monoslam_tpu.filter.measurement import measurement_predict
    from cv_monoslam_tpu.frontend.matching import data_association
    from cv_monoslam_tpu.filter.update import kalman_update
    from cv_monoslam_tpu.filter.lifecycle import (delete_rules, fold_delete,
                                                  snapshot_records,
                                                  store_features,
                                                  update_features)
    from cv_monoslam_tpu.filter.srukf import add_features

    seq, track, gt_xy = dense_sequence(16)
    sess = SlamSession(cfg, seq, track)
    for _ in range(4):
        sess.step()
    state = sess.state
    k = sess.counter
    img = jax.device_put(
        sess.images.get(int(track.frame_id[k])).astype(sess._dtype))
    op = jax.device_put(sess._odo[k - 1])
    oc = jax.device_put(sess._odo[k])

    def scan_stage(body):
        def run(st, *extra):
            def step(s, _):
                return body(s, *extra), None
            return jax.lax.scan(step, st, None, length=N_ITER)[0]
        return jax.jit(run)

    # stage bodies threaded on state only (fixed side inputs)
    mp = scan_stage(lambda s, a, b: motion_predict(s, a, b, cfg)[0])
    me = scan_stage(
        lambda s, a, b: measurement_predict(
            s, motion_predict(s, a, b, cfg)[1], cfg)[0])
    da = scan_stage(lambda s, im: data_association(s, im, cfg))
    uf = scan_stage(lambda s: update_features(s, cfg))
    af = scan_stage(lambda s, im: add_features(s, im, cfg))

    def ku_body(s, a, b):
        s2, c = motion_predict(s, a, b, cfg)
        s2, c = measurement_predict(s2, c, cfg)
        return kalman_update(s2, c, cfg)

    ku = scan_stage(ku_body)

    # lifecycle sub-pieces
    def fold_only(s):
        d, _ = delete_rules(s, cfg)
        x, S, _ = fold_delete(s.x, s.S, d, cfg)
        from cv_monoslam_tpu.filter.state import replace
        return replace(s, x=x, S=S)

    def store_only(s):
        d, st_mask = delete_rules(s, cfg)
        recs = snapshot_records(s, cfg)
        from cv_monoslam_tpu.filter.state import replace
        return replace(s, stored=store_features(s.stored, recs, st_mask))

    fo = scan_stage(fold_only)
    so = scan_stage(store_only)

    t_mp = time_scan(mp, state, op, oc)
    t_me = time_scan(me, state, op, oc)
    t_da = time_scan(da, state, img)
    t_ku = time_scan(ku, state, op, oc)
    t_uf = time_scan(uf, state)
    t_fo = time_scan(fo, state)
    t_so = time_scan(so, state)
    t_af = time_scan(af, state, img)

    from cv_monoslam_tpu.filter.srukf import slam_step

    fs = scan_stage(
        lambda s, im, a, b: slam_step(s, im, a, b, False, cfg)[0])
    t_fs = time_scan(fs, state, img, op, oc)
    print(f"  FULL slam_step        {t_fs * 1e3:8.2f} ms")
    print(f"  motion_predict        {t_mp * 1e3:8.2f} ms")
    print(f"  +measurement          {t_me * 1e3:8.2f} ms  "
          f"(delta {(t_me - t_mp) * 1e3:.2f})")
    print(f"  +kalman_update        {t_ku * 1e3:8.2f} ms  "
          f"(delta {(t_ku - t_me) * 1e3:.2f})")
    print(f"  data_association      {t_da * 1e3:8.2f} ms")
    print(f"  update_features       {t_uf * 1e3:8.2f} ms")
    print(f"    fold_delete only    {t_fo * 1e3:8.2f} ms")
    print(f"    store_features only {t_so * 1e3:8.2f} ms")
    print(f"  add_features          {t_af * 1e3:8.2f} ms")


if __name__ == "__main__":
    main()
