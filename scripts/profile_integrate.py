"""Decompose the detect-frame delta (VERDICT r4 item 3): where do the
~26 ms between the no-detect (13.5 ms) and detect (39.8 ms) executables
go, stage by stage, inside the scan?

Pieces timed (each an 8-iteration state-threaded lax.scan in ONE jit):
  * detection front-end alone (gftt + filters + select)
  * integrate_features alone (implicit UT + structured Gram + chol)
  * integrate's structured Gram WITHOUT the Cholesky
  * the Cholesky alone on a representative Gram
  * _integrate_records alone (scatters + patch extraction)

Usage: python scripts/profile_integrate.py [--landmarks 512]
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
    args = p.parse_args()

    M = args.landmarks
    cfg = SlamConfig(max_landmarks=M, max_new_per_frame=48,
                     max_detections=512, update_mode="gram", qr_mode="gram",
                     sigma_mode="implicit",
                     min_dist=8.0, min_num=min(96, M // 2),
                     n_initial_raws=96, n_process_raws=96)
    print(f"backend={jax.default_backend()} M={M} D={cfg.state_dim}")

    from cv_monoslam_tpu.filter.lifecycle import (_integrate_implicit,
                                                  _integrate_records,
                                                  integrate_features)
    from cv_monoslam_tpu.filter.motion import (equilibrated_chol,
                                               structured_gram_rows)
    from cv_monoslam_tpu.filter.sigma import ut_weights
    from cv_monoslam_tpu.filter.state import replace
    from cv_monoslam_tpu.frontend.detect import (candidate_filters,
                                                 escalate_raws,
                                                 gftt_candidates,
                                                 select_new_corners)
    from cv_monoslam_tpu.filter.srukf import add_features

    seq, track, gt_xy = dense_sequence(16)
    sess = SlamSession(cfg, seq, track)
    for _ in range(4):
        sess.step()
    state = sess.state
    k = sess.counter
    img = jax.device_put(
        sess.images.get(int(track.frame_id[k])).astype(sess._dtype))

    KA = cfg.max_new_per_frame
    corners = jnp.tile(jnp.array([[320.0, 240.0]], state.x.dtype), (KA, 1))
    valid = jnp.ones(KA, bool)

    def scan_stage(body):
        def run(st, *extra):
            def step(s, _):
                return body(s, *extra), None
            return jax.lax.scan(step, st, None, length=N_ITER)[0]
        return jax.jit(run)

    # detection front-end only (no state change -> thread a counter)
    def det_only(s, im):
        lm = s.lm
        avoid = jnp.concatenate([lm.pred, lm.match_px], axis=0)
        avoid_valid = jnp.concatenate([lm.active, lm.active])
        n_matched = jnp.sum(lm.matched & lm.active)
        n_map = jnp.sum(lm.active)
        pix, kept, raw_rank, resp = gftt_candidates(im, cfg)
        fok = candidate_filters(pix, cfg, avoid, avoid_valid, n_matched)
        raws = escalate_raws(kept, raw_rank, fok, n_map, jnp.asarray(0),
                             cfg.n_process_raws, cfg)
        kf = kept & fok & (raw_rank < raws)
        n_free = jnp.sum(~s.lm.active)
        c, v = select_new_corners(pix, kf, resp, KA, n_free)
        return replace(s, x=s.x.at[-4].add(1e-9 * jnp.sum(c)))

    def integ_only(s, im):
        return integrate_features(s, im, corners, valid, cfg)

    def gram_only(s):
        # implicit UT + structured Gram, NO factorization
        targets = jnp.argsort(s.lm.active)[:KA]
        v = valid & ~s.lm.active[targets]
        safe_c = jnp.where(v[:, None], corners,
                           jnp.array([320.0, 240.0], s.x.dtype))
        # replicate the internals of _integrate_implicit up to the Gram
        D = cfg.state_dim
        na = D + 3 * KA
        w = ut_weights(na, cfg)
        # cheap: reuse _integrate_implicit but strip the chol by timing
        # difference instead (structured_gram_rows on the same row count)
        ridx = jnp.concatenate([
            (6 * targets[:, None] + jnp.arange(3)[None, :]).reshape(-1),
            (6 * targets[:, None] + 3 + jnp.arange(3)[None, :]).reshape(-1)])
        Ep = jnp.ones((na, 6 * KA), s.x.dtype) * 1e-3
        Em = -Ep
        G = structured_gram_rows(s.S, Ep, Em, ridx, w)
        return replace(s, x=s.x.at[-4].add(1e-9 * jnp.sum(G[0])))

    def chol_only(s):
        G = jax.lax.dot_general(
            s.S, s.S, dimension_numbers=(((0,), (0,)), ((), ())),
            preferred_element_type=s.S.dtype,
            precision=jax.lax.Precision.HIGHEST)
        R, rep = equilibrated_chol(G)
        return replace(s, S=R)

    def records_only(s, im):
        targets = jnp.argsort(s.lm.active)[:KA]
        v = valid & ~s.lm.active[targets]
        return _integrate_records(s, im, corners, v, targets, s.x, s.S,
                                  jnp.int32(0), cfg)

    def af(s, im):
        return add_features(s, im, cfg)

    stages = [
        ("detect front-end only", scan_stage(det_only), (state, img)),
        ("integrate_features", scan_stage(integ_only), (state, img)),
        ("  structured Gram only", scan_stage(gram_only), (state,)),
        ("  equilibrated chol only", scan_stage(chol_only), (state,)),
        ("  records only", scan_stage(records_only), (state, img)),
        ("add_features (full)", scan_stage(af), (state, img)),
    ]
    for name, fn, a in stages:
        t = time_scan(fn, *a)
        print(f"  {name:26s} {t * 1e3:8.2f} ms")


if __name__ == "__main__":
    main()
