"""Cholesky roofline probe: how far is XLA's chol from the chip's matmul
rate at the filter's joint-factorization size?

The one-chol pipeline's single D+2M factorization (4100 at M=512) is the
dominant stage of the no-detect step (7.2 of 13.5 ms, PERF.md r4). A
blocked right-looking Cholesky is ~1/3 matmul-shaped SYRK work, so the
achievable time is bounded below by the GEMM rate; this probe measures
chol(N) vs an equal-FLOP matmul and a hand-blocked JAX chol (panel
chol + triangular solve + SYRK trailing update via lax.fori_loop) to see
whether XLA's built-in blocking leaves anything on the table.

Usage: python scripts/bench_chol.py [--n 4100]
"""

import argparse
import functools
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax

from cv_monoslam_tpu.utils.compile_cache import enable as _enable_cache

_enable_cache(os.path.join(os.path.dirname(__file__), "..", ".cache", "jax"))

import jax.numpy as jnp
import numpy as np


def device_time(fn, *args, k=16, repeats=3):
    """Scan-amortized device time (see bench_kernels.device_time_scan)."""

    @jax.jit
    def loop():
        def body(carry, i):
            out = fn(*[a + carry if a.dtype.kind == "f" else a
                       for a in args])
            first = jax.tree_util.tree_leaves(out)[0]
            return first.ravel()[0] * jnp.asarray(1e-30, first.dtype), None

        return jax.lax.scan(body, jnp.float32(0.0), jnp.arange(k))[0]

    jax.block_until_ready(loop())
    best = float("inf")
    for _ in range(repeats):
        t0 = time.perf_counter()
        jax.block_until_ready(loop())
        best = min(best, (time.perf_counter() - t0) / k)
    return best


def blocked_chol(a, block: int):
    """Hand-blocked right-looking Cholesky (lower), fori over panels."""
    n = a.shape[0]
    assert n % block == 0
    nb = n // block
    hp = jax.lax.Precision.HIGHEST

    def body(kb, a):
        k = kb * block
        akk = jax.lax.dynamic_slice(a, (k, k), (block, block))
        lkk = jnp.linalg.cholesky(akk)
        a = jax.lax.dynamic_update_slice(a, lkk, (k, k))
        # panel solve: rows below the diagonal block, full remaining width
        # is handled with a fixed max shape + masking (static shapes)
        panel = jax.lax.dynamic_slice(a, (0, k), (n, block))
        rows = jnp.arange(n)
        below = rows >= k + block
        sol = jax.lax.linalg.triangular_solve(
            lkk, panel, left_side=False, lower=True, transpose_a=True)
        panel = jnp.where(below[:, None], sol, panel)
        a = jax.lax.dynamic_update_slice(a, panel, (0, k))
        # trailing SYRK on the masked below-panel (MXU)
        lp = jnp.where(below[:, None], panel, 0.0)
        a = a - jnp.matmul(lp, lp.T, precision=hp) * (
            below[:, None] & below[None, :])
        return a

    a = jax.lax.fori_loop(0, nb, body, a)
    return jnp.tril(a)


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--n", type=int, default=4096)
    args = p.parse_args()
    n = args.n
    rng = np.random.default_rng(0)
    g = rng.normal(size=(n, n)).astype(np.float32) / np.sqrt(n)
    a = jnp.asarray(g @ g.T + 2.0 * np.eye(n, dtype=np.float32))

    flops_chol = n ** 3 / 3
    t = device_time(jax.jit(jnp.linalg.cholesky), a)
    print(f"XLA chol({n}):      {t * 1e3:7.2f} ms  "
          f"{flops_chol / t / 1e12:6.2f} TF/s-equiv")

    m = int(round((flops_chol / 2) ** (1 / 3)))
    m = (m // 128) * 128
    x = jnp.asarray(rng.normal(size=(m, m)).astype(np.float32))
    tm = device_time(
        jax.jit(functools.partial(jnp.matmul,
                                  precision=jax.lax.Precision.HIGHEST)),
        x, x)
    print(f"GEMM f32 ({m}^3):  {tm * 1e3:7.2f} ms  "
          f"{2 * m ** 3 / tm / 1e12:6.2f} TF/s  (equal-FLOP reference)")

    for block in (256, 512):
        if n % block:
            continue
        fn = jax.jit(functools.partial(blocked_chol, block=block))
        # correctness
        l = np.asarray(fn(a))
        err = np.abs(l @ l.T - np.asarray(a)).max()
        tb = device_time(fn, a)
        print(f"blocked chol b={block}: {tb * 1e3:7.2f} ms  "
              f"{flops_chol / tb / 1e12:6.2f} TF/s-equiv  (recon err {err:.2e})")


if __name__ == "__main__":
    main()
