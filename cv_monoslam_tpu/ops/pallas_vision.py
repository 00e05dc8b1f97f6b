"""Pallas TPU kernels for the vision front-end hot loops.

The reference's hottest code is the per-landmark exhaustive NCC search
(SLAM.cpp:1960-1984 calling calculateCrossCorrelation, SLAM.cpp:3141-3166):
a serial quadruple loop (landmarks x window offsets x patch rows x cols).
:func:`ncc_score_map` computes every landmark's full (W1, W1) zero-mean NCC
score map in ONE fused kernel pass: the sliding cross-correlation, window
sum, and window energy accumulate together in VMEM and the normalization
happens in-register — no intermediate HBM traffic (the XLA grouped-conv
formulation in frontend/matching.py materializes cross/wsum/wsq as three
separate HBM arrays).

Also here: :func:`warp_bilinear` — the batched homography patch warp
(wrapPatch, SLAM.cpp:1804-1906) as a Pallas gather-free bilinear kernel
using one-hot matmuls (MXU-friendly on TPU, where scatter/gather is slow).

All kernels run `interpret=True` off-TPU so the same code path is exercised
by the CPU test suite.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _on_tpu() -> bool:
    return jax.default_backend() == "tpu"


def _ncc_kernel(windows_ref, rhs_ref, out_ref, *, n_taps: int):
    """One landmark block: fused NCC over im2col windows.

    windows_ref: (Mb, K, T) — K = W1^2 window positions, T = Pm^2 taps;
    rhs_ref:     (Mb, T, 2) — column 0 = normalized zero-mean patch
                 (pc / pnorm), column 1 = ones;
    out_ref:     (Mb, K, 1) — final NCC scores.

    Two batched MXU contractions + VPU normalization, all VMEM-resident:
        d[..., 0] = sum_t win * p_hat   (= num / pnorm)
        d[..., 1] = sum_t win           (window sum)
        wsq       = sum_t win^2
        score     = d0 * rsqrt(max(wsq - wsum^2/T, 0))
    """
    win = windows_ref[:]
    d = jax.lax.dot_general(
        win, rhs_ref[:], dimension_numbers=(((2,), (1,)), ((0,), (0,))),
        preferred_element_type=win.dtype)                      # (Mb, K, 2)
    ones = jnp.ones((win.shape[0], n_taps, 1), win.dtype)
    wsq = jax.lax.dot_general(
        win * win, ones, dimension_numbers=(((2,), (1,)), ((0,), (0,))),
        preferred_element_type=win.dtype)                      # (Mb, K, 1)
    num = d[:, :, 0:1]
    wsum = d[:, :, 1:2]
    wvar = jnp.maximum(wsq - wsum * wsum * (1.0 / n_taps), 0.0)
    den = jnp.sqrt(wvar)
    out_ref[:] = jnp.where(den > 0.0,
                           num / jnp.where(den == 0.0, 1.0, den), 0.0)


@functools.partial(jax.jit, static_argnames=("pm", "w1", "block_m",
                                             "interpret"))
def ncc_score_map(regions: jnp.ndarray, patches: jnp.ndarray, *, pm: int,
                  w1: int, block_m: int = 2,
                  interpret: bool | None = None) -> jnp.ndarray:
    """Fused zero-mean NCC score maps for all landmarks.

    regions: (M, Rg, Rg) float32 search regions (Rg = w1 + pm - 1);
    patches: (M, pm, pm) float32 warped templates.
    Returns (M, w1, w1) scores in [-1, 1].

    The patch statistics fold into the RHS outside the kernel
    (p_hat = (p - mean) / ||p - mean||, so windows @ p_hat = num / pnorm),
    leaving the kernel two batched MXU contractions over one VMEM-resident
    im2col block — XLA's grouped-conv formulation reads the region three
    times (cross/wsum/wsq convs) and round-trips three HBM intermediates.
    """
    m, rg, _ = regions.shape
    assert rg == w1 + pm - 1, (rg, w1, pm)
    if interpret is None:
        interpret = not _on_tpu()
    dtype = regions.dtype
    n_taps = pm * pm
    kk = w1 * w1

    # im2col: (M, 1, Rg, Rg) -> (M, taps, W1, W1) -> (M, K, T)
    windows = jax.lax.conv_general_dilated_patches(
        regions[:, None], (pm, pm), (1, 1), "VALID",
        dimension_numbers=("NCHW", "OIHW", "NCHW"))
    windows = windows.reshape(m, n_taps, kk).transpose(0, 2, 1)

    # zero-mean, unit-norm patch taps; flat patches give p_hat = 0 -> score 0
    pflat = patches.reshape(m, n_taps)
    pc = pflat - jnp.mean(pflat, axis=1, keepdims=True)
    pn = jnp.sqrt(jnp.sum(pc * pc, axis=1, keepdims=True))
    p_hat = jnp.where(pn > 0, pc / jnp.where(pn == 0, 1.0, pn), 0.0)
    rhs = jnp.stack([p_hat, jnp.ones_like(p_hat)], axis=-1)   # (M, T, 2)

    mb = min(block_m, m)
    m_pad = -(-m // mb) * mb
    if m_pad != m:
        windows = jnp.pad(windows, ((0, m_pad - m), (0, 0), (0, 0)))
        rhs = jnp.pad(rhs, ((0, m_pad - m), (0, 0), (0, 0)))
    out = pl.pallas_call(
        functools.partial(_ncc_kernel, n_taps=n_taps),
        grid=(m_pad // mb,),
        in_specs=[
            pl.BlockSpec((mb, kk, n_taps), lambda i: (i, 0, 0),
                         memory_space=pltpu.ANY if interpret else pltpu.VMEM),
            pl.BlockSpec((mb, n_taps, 2), lambda i: (i, 0, 0),
                         memory_space=pltpu.ANY if interpret else pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((mb, kk, 1), lambda i: (i, 0, 0),
                               memory_space=pltpu.ANY if interpret
                               else pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((m_pad, kk, 1), dtype),
        interpret=interpret,
    )(windows, rhs)
    return out[:m, :, 0].reshape(m, w1, w1)


def _warp_kernel(patches_ref, roww_ref, colw_ref, out_ref):
    """Separable-form bilinear resample via two matmuls per landmark block.

    patches_ref: (Mb, Pi, Pi) source patches;
    roww_ref:    (Mb, Po*Po, Pi) row interpolation weights;
    colw_ref:    (Mb, Po*Po, Pi) column interpolation weights;
    out_ref:     (Mb, Po, Po).

    out[m, k] = sum_{r, c} roww[m, k, r] * colw[m, k, c] * patch[m, r, c]
              = sum_r roww[m, k, r] * (patch[m] @ colw[m, k])  — expressed as
    one batched matmul (MXU) plus a weighted row reduction (VPU).
    """
    patches = patches_ref[:]
    # (Mb, Po*Po, Pi) x (Mb, Pi, Pi) -> (Mb, Po*Po, Pi): t[m,k,r] =
    # sum_c colw[m,k,c] * patch[m,r,c]
    t = jax.lax.dot_general(
        colw_ref[:], patches,
        dimension_numbers=(((2,), (2,)), ((0,), (0,))),
        preferred_element_type=patches.dtype)
    s = jnp.sum(t * roww_ref[:], axis=2, keepdims=True)       # (Mb, Po*Po, 1)
    po = out_ref.shape[-1]
    out_ref[:] = s.reshape(s.shape[0], po, po)


@functools.partial(jax.jit, static_argnames=("block_m", "interpret"))
def warp_bilinear(patches: jnp.ndarray, su: jnp.ndarray, sv: jnp.ndarray,
                  *, block_m: int = 2,
                  interpret: bool | None = None) -> jnp.ndarray:
    """Batched bilinear resample of (M, Pi, Pi) patches at (M, Po, Po)
    fractional coordinates (su = column, sv = row), zero outside.

    TPU-first formulation: the scattered 4-tap gather becomes two dense
    one-hot interpolation-weight matrices contracted on the MXU — gathers
    don't vectorize on TPU, matmuls do.
    """
    m, pi, _ = patches.shape
    po = su.shape[-1]
    if interpret is None:
        interpret = not _on_tpu()
    dtype = patches.dtype

    u = su.reshape(m, po * po)
    v = sv.reshape(m, po * po)
    u0 = jnp.floor(u)
    v0 = jnp.floor(v)
    du = (u - u0).astype(dtype)
    dv = (v - v0).astype(dtype)
    valid = ((u0 >= 0) & (u0 + 1 <= pi - 1) & (v0 >= 0) & (v0 + 1 <= pi - 1))
    u0c = jnp.clip(u0, 0, pi - 2).astype(jnp.int32)
    v0c = jnp.clip(v0, 0, pi - 2).astype(jnp.int32)

    idx = jnp.arange(pi, dtype=jnp.int32)
    # one-hot interpolation weights: rowW[m,k,r] = (1-dv)[v0] + dv[v0+1]
    roww = ((idx[None, None, :] == v0c[:, :, None]) * (1.0 - dv)[:, :, None]
            + (idx[None, None, :] == v0c[:, :, None] + 1) * dv[:, :, None])
    colw = ((idx[None, None, :] == u0c[:, :, None]) * (1.0 - du)[:, :, None]
            + (idx[None, None, :] == u0c[:, :, None] + 1) * du[:, :, None])
    roww = (roww * valid[:, :, None]).astype(dtype)
    colw = colw.astype(dtype)

    mb = min(block_m, m)
    m_pad = -(-m // mb) * mb
    if m_pad != m:
        patches = jnp.pad(patches, ((0, m_pad - m), (0, 0), (0, 0)))
        roww = jnp.pad(roww, ((0, m_pad - m), (0, 0), (0, 0)))
        colw = jnp.pad(colw, ((0, m_pad - m), (0, 0), (0, 0)))

    kk = po * po
    out = pl.pallas_call(
        _warp_kernel,
        grid=(m_pad // mb,),
        in_specs=[
            pl.BlockSpec((mb, pi, pi), lambda i: (i, 0, 0),
                         memory_space=pltpu.ANY if interpret else pltpu.VMEM),
            pl.BlockSpec((mb, kk, pi), lambda i: (i, 0, 0),
                         memory_space=pltpu.ANY if interpret else pltpu.VMEM),
            pl.BlockSpec((mb, kk, pi), lambda i: (i, 0, 0),
                         memory_space=pltpu.ANY if interpret else pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((mb, po, po), lambda i: (i, 0, 0),
                               memory_space=pltpu.ANY if interpret
                               else pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((m_pad, po, po), dtype),
        interpret=interpret,
    )(patches, roww, colw)
    return out[:m]
