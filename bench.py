"""Benchmark: engine frames/sec on the current JAX backend vs the serial
NumPy oracle baseline (BASELINE.md: the reference publishes no numbers, so
the baseline is the oracle transcription of its serial math on this host).

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
"""

import json
import os
import sys
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR",
                      os.path.join(os.path.dirname(__file__), ".cache",
                                   "jax"))
sys.path.insert(0, os.path.join(os.path.dirname(__file__), "scripts"))

import numpy as np


def main():
    from experiment import get_sequence
    from cv_monoslam_tpu.config import SlamConfig
    from cv_monoslam_tpu.api import SlamSession
    from cv_monoslam_tpu.models.oracle import OracleSLAM

    n_frames = 41
    chunk = 8
    seq, track, gt_xy, gt_th = get_sequence("arc", n_frames, 0)

    cfg = SlamConfig(max_landmarks=32, max_new_per_frame=8,
                     max_detections=48)
    sess = SlamSession(cfg, seq, track)
    sess.step_chunk(chunk)                      # warmup: compile the scan
    t0 = time.perf_counter()
    n = len(sess.run(chunk=chunk)) - chunk
    engine_dt = (time.perf_counter() - t0) / max(n, 1)
    ate = sess.ate(gt_xy)

    # oracle baseline: serial NumPy math, same sequence prefix
    ocfg = SlamConfig(max_landmarks=32, dtype="float64")
    oracle = OracleSLAM(ocfg, seq, track)
    t0 = time.perf_counter()
    k = 0
    for _ in range(6):
        if oracle.counter >= len(track):
            break
        oracle.step()
        k += 1
    oracle_dt = (time.perf_counter() - t0) / max(k, 1)

    fps = 1.0 / engine_dt
    result = {
        "metric": "slam_frames_per_sec",
        "value": round(fps, 3),
        "unit": f"frames/s (ATE {ate:.4f} m, {n} frames, "
                f"oracle {1.0 / oracle_dt:.2f} f/s)",
        "vs_baseline": round(fps * oracle_dt, 3),
    }
    print(json.dumps(result))


if __name__ == "__main__":
    main()
