"""Break a chunked-scan frame budget into upload / compute / fetch / host.

The per-stage profile (profile_stages.py) showed the jitted step at ~12-18
ms while the end-to-end chunked loop pays ~90 ms/frame — this isolates
where the difference goes on tunneled TPU backends (transfer latency).
"""

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


def main(chunk=8, n_rounds=6, **overrides):
    cfg = SlamConfig(max_landmarks=32, max_new_per_frame=8,
                     max_detections=48, **overrides)
    seq, track, _, _ = get_sequence("arc", chunk * (n_rounds + 2) + 8, 0)
    sess = SlamSession(cfg, seq, track)
    fn = sess._chunk_fn(chunk)

    # compile
    ks = sess.counter
    imgs = np.stack([seq.get(int(track.frame_id[i])).astype(np.float32)
                     for i in range(ks, ks + chunk)])
    state, outs = fn(sess.state, imgs, sess._odo[ks - 1:ks - 1 + chunk],
                     sess._odo[ks:ks + chunk])
    jax.block_until_ready(state)

    t_up = t_run = t_fetch = 0.0
    state = sess.state
    for r in range(n_rounds):
        ks = sess.counter + (r + 1) * chunk
        t0 = time.perf_counter()
        imgs = np.stack([seq.get(int(track.frame_id[i])).astype(np.float32)
                         for i in range(ks, ks + chunk)])
        d_imgs = jax.device_put(imgs)
        d_op = jax.device_put(sess._odo[ks - 1:ks - 1 + chunk])
        d_oc = jax.device_put(sess._odo[ks:ks + chunk])
        jax.block_until_ready((d_imgs, d_op, d_oc))
        t1 = time.perf_counter()
        state, outs = fn(state, d_imgs, d_op, d_oc)
        jax.block_until_ready(state)
        t2 = time.perf_counter()
        outs_np = {k: np.asarray(v) for k, v in outs.items()}
        t3 = time.perf_counter()
        t_up += t1 - t0
        t_run += t2 - t1
        t_fetch += t3 - t2
    n = n_rounds * chunk
    print(f"chunk={chunk} over {n} frames:")
    print(f"  upload (stack+device_put): {t_up / n * 1e3:7.2f} ms/frame")
    print(f"  scan compute:              {t_run / n * 1e3:7.2f} ms/frame")
    print(f"  telemetry fetch:           {t_fetch / n * 1e3:7.2f} ms/frame")
    nbytes = sum(np.asarray(v).nbytes for v in outs_np.values())
    print(f"  telemetry bytes/chunk: {nbytes}, "
          f"n_leaves: {len(outs_np)}")


if __name__ == "__main__":
    import argparse

    p = argparse.ArgumentParser()
    p.add_argument("--chunk", type=int, default=8)
    p.add_argument("--qr", default="gram")
    p.add_argument("--update", default="gram")
    args = p.parse_args()
    print("backend:", jax.default_backend())
    main(chunk=args.chunk, qr_mode=args.qr, update_mode=args.update)
