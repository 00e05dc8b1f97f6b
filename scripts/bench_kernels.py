"""BASELINE config 2: vision-kernel throughput vs roofline.

Microbenchmarks the fused Pallas kernels (ncc_score_map, warp_bilinear)
against the XLA grouped-conv/gather formulations across landmark counts,
reporting achieved FLOP/s and the fraction of the chip's f32 matmul peak
(TPU v5e: ~197 TFLOP/s bf16 -> ~49 TFLOP/s f32 assumed; HBM ~819 GB/s).

These are the engine's replacements for the reference's hottest serial
loops: the exhaustive NCC search (SLAM.cpp:1960-1984, 3141-3166) and the
homography patch warp (SLAM.cpp:1804-1906).

Usage: python scripts/bench_kernels.py [--sizes 32,128,512]
"""

import argparse
import os
import sys
import time

_CACHE_SUBDIR = "jax"  # persistent compile cache (set after jax import)
sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax

from cv_monoslam_tpu.utils.compile_cache import enable as _enable_cache  # noqa: E402

_enable_cache(os.path.join(os.path.dirname(__file__), "..", ".cache",
                           _CACHE_SUBDIR))
import jax.numpy as jnp
import numpy as np

F32_PEAK = 49.2e12          # TPU v5e assumed f32 MXU peak (FLOP/s)
HBM_PEAK = 819e9            # TPU v5e HBM bandwidth peak (bytes/s)
HBM_BW = 819e9              # bytes/s


def time_fn(fn, *args, n=100, warmup=3, repeats=3):
    """Best-of-repeats mean over n queued host dispatches. On the tunneled
    backend this is DISPATCH-bound for microsecond kernels (~1-2 ms/call
    floor), so it measures the per-call launch path, NOT device time —
    use device_time_scan for the kernel itself. (This discrepancy is the
    r3 verdict's 80x contradiction: 2.4 ms queued-dispatch vs 0.03 ms
    device time for the same kernel.)"""
    for _ in range(warmup):
        jax.block_until_ready(fn(*args))
    best = float("inf")
    for _ in range(repeats):
        t0 = time.perf_counter()
        for _ in range(n):
            out = fn(*args)
        jax.block_until_ready(out)
        best = min(best, (time.perf_counter() - t0) / n)
    return best


def device_time_scan(make_body, k=64, repeats=5):
    """Device time per kernel application, robust to tunnel latency:
    K applications run inside ONE jitted lax.scan, so the dispatch cost
    (milliseconds through the tunnel) is paid once and amortized 1/K.

    ``make_body(carry, i)`` must apply the kernel with inputs PERTURBED by
    the loop carry and iteration index — a loop whose body has constant
    inputs gets hoisted out by LICM and the scan times nothing (measured
    r3, PERF.md) — and return a scalar depending on the output (serial
    chain, no overlap/DCE)."""

    @jax.jit
    def loop():
        return jax.lax.scan(make_body, jnp.float32(0.0),
                            jnp.arange(k))[0]

    jax.block_until_ready(loop())          # compile + warm
    best = float("inf")
    for _ in range(repeats):
        t0 = time.perf_counter()
        jax.block_until_ready(loop())
        best = min(best, (time.perf_counter() - t0) / k)
    return best


def bench_ncc(m, hp_match=8, hp_init=10):
    """Both paths timed through ncc_scores (region gather included) so the
    comparison is the one the pipeline dispatch actually faces."""
    from cv_monoslam_tpu.config import SlamConfig
    from cv_monoslam_tpu.frontend.matching import ncc_scores

    pm = 2 * hp_match + 1
    w1 = 2 * hp_init + 1
    rng = np.random.default_rng(0)
    patches = jnp.asarray(rng.uniform(0, 255, (m, pm, pm)), jnp.float32)
    image = jnp.asarray(rng.uniform(0, 255, (480, 640)), jnp.float32)
    centers = jnp.asarray(rng.integers(40, 400, (m, 2)), jnp.int32)

    kk, taps = w1 * w1, pm * pm
    flops = m * (2 * kk * taps * 2      # windows @ [p_hat, ones]
                 + 2 * kk * taps        # wsq contraction
                 + 6 * kk)              # normalization

    def timed(backend):
        cfg = SlamConfig(vision_backend=backend, hp_match=hp_match,
                         hp_init=hp_init)

        def body(carry, i):
            # perturb by carry (serial chain, defeats LICM/DCE); rotate
            # centers so the gather pattern is iteration-dependent
            im = image + carry
            c = jnp.roll(centers, i, axis=0)
            out = ncc_scores(im, c, patches, cfg)[0]
            return out.ravel()[0] * jnp.float32(1e-30), None

        dev = device_time_scan(body)
        fn = jax.jit(lambda im, c, p: ncc_scores(im, c, p, cfg)[0])
        disp = time_fn(fn, image, centers, patches, n=30)
        return dev, disp

    t_pal, d_pal = timed("pallas")
    t_xla, d_xla = timed("xla")

    # bandwidth roofline (VERDICT r4 item 5): this op is gather/bandwidth
    # bound (~0.13 GFLOP at M=512 — the FLOP-peak fraction can never be
    # large), so the honest roofline is achieved GB/s against HBM peak.
    # Minimum traffic for ncc_scores: the source image read once, the
    # templates read once, the gathered (M, Rg, Rg) regions written+read
    # once (the gather materializes on any backend), scores written once.
    rg = w1 + pm - 1
    bytes_min = 4 * (image.size + m * taps + 2 * m * rg * rg + m * kk)
    return dict(kernel="ncc", M=m, flops=flops,
                pallas_ms=t_pal * 1e3, xla_ms=t_xla * 1e3,
                pallas_dispatch_ms=d_pal * 1e3,
                xla_dispatch_ms=d_xla * 1e3,
                pallas_gflops=flops / t_pal / 1e9,
                xla_gflops=flops / t_xla / 1e9,
                pallas_peak_frac=flops / t_pal / F32_PEAK,
                bytes_min_mb=bytes_min / 1e6,
                pallas_gbps=bytes_min / t_pal / 1e9,
                xla_gbps=bytes_min / t_xla / 1e9,
                pallas_bw_pct=100 * bytes_min / t_pal / HBM_PEAK,
                xla_bw_pct=100 * bytes_min / t_xla / HBM_PEAK)


def bench_warp(m, hp_match=8, hp_init=10):
    from cv_monoslam_tpu.frontend.matching import _bilinear_batch
    from cv_monoslam_tpu.ops.pallas_vision import warp_bilinear

    pi = 2 * hp_init + 1
    po = 2 * hp_match + 1
    rng = np.random.default_rng(1)
    patches = jnp.asarray(rng.uniform(0, 255, (m, pi, pi)), jnp.float32)
    su = jnp.asarray(rng.uniform(1, pi - 2, (m, po, po)), jnp.float32)
    sv = jnp.asarray(rng.uniform(1, pi - 2, (m, po, po)), jnp.float32)

    kk = po * po
    flops = m * (2 * kk * pi * pi + 3 * kk * pi + 8 * kk)

    def timed(fn):
        def body(carry, i):
            p = patches + carry
            s = jnp.roll(su, i, axis=0)
            out = fn(p, s, sv)
            return out.ravel()[0] * jnp.float32(1e-30), None

        return device_time_scan(body)

    t_pal = timed(warp_bilinear)
    t_xla = timed(_bilinear_batch)
    return dict(kernel="warp", M=m, flops=flops,
                pallas_ms=t_pal * 1e3, xla_ms=t_xla * 1e3,
                pallas_gflops=flops / t_pal / 1e9,
                xla_gflops=flops / t_xla / 1e9,
                pallas_peak_frac=flops / t_pal / F32_PEAK)


def main(sizes=(32, 128, 512), quiet=False):
    results = []
    for m in sizes:
        for fn in (bench_ncc, bench_warp):
            r = fn(m)
            results.append(r)
            if not quiet:
                print(f"{r['kernel']:5s} M={r['M']:4d}  "
                      f"pallas {r['pallas_ms']:7.3f} ms "
                      f"({r['pallas_gflops']:8.1f} GF/s, "
                      f"{r['pallas_peak_frac'] * 100:5.2f}% peak)   "
                      f"xla {r['xla_ms']:7.3f} ms "
                      f"({r['xla_gflops']:8.1f} GF/s)")
    return results


if __name__ == "__main__":
    p = argparse.ArgumentParser()
    p.add_argument("--sizes", default="32,128,512")
    args = p.parse_args()
    print("backend:", jax.default_backend())
    main(tuple(int(s) for s in args.sizes.split(",")))
