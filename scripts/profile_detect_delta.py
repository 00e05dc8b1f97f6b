"""Composed detect-vs-track executable cost (VERDICT r4 item 3 evidence).

Times the FULL slam_step scan with allow_detect=True vs False at the
config-3 operating point, plus the same with the integration fold
(cfg.integrate_fold) toggled, so the detect-frame delta and what the fold
buys are measured on the composed executable — the only number the
pipelined session actually pays.

Usage: python scripts/profile_detect_delta.py [--landmarks 512]
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
from cv_monoslam_tpu.filter.srukf import slam_step

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
    args = p.parse_args()

    M = args.landmarks
    # config-3 bench operating point (bench_large defaults)
    cfg = SlamConfig(max_landmarks=M, max_new_per_frame=48,
                     max_detections=512, update_mode="gram",
                     qr_mode="gram", sigma_mode="implicit",
                     min_dist=8.0, min_num=400, gate_detection=False,
                     n_initial_raws=96, n_process_raws=96)
    print(f"backend={jax.default_backend()} M={M} D={cfg.state_dim}")

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

    def scan_step(allow_detect):
        def run(st, im, a, b):
            def step(s, _):
                s, _o = slam_step(s, im, a, b, False, cfg,
                                  allow_detect=allow_detect)
                return s, None
            return jax.lax.scan(step, st, None, length=N_ITER)[0]
        return jax.jit(run)

    t_track = time_scan(scan_step(False), state, img, op, oc)
    t_detect = time_scan(scan_step(True), state, img, op, oc)
    print(f"  track-only step   {t_track * 1e3:8.2f} ms")
    print(f"  detect step       {t_detect * 1e3:8.2f} ms  "
          f"(delta {(t_detect - t_track) * 1e3:.2f})")


if __name__ == "__main__":
    main()
