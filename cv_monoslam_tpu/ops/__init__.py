"""TPU-native compute kernels (linear algebra + Pallas vision ops)."""

from __future__ import annotations

import jax.numpy as jnp

from .linalg import (chol_downdate, chol_update, cholqr, cholqr2, gmw_chol,
                     gram, tri_solve)


def qr_r(a: jnp.ndarray, mode: str = "householder") -> jnp.ndarray:
    """R factor of tall-skinny ``a``: R^T R = A^T A, R upper triangular.

    mode "householder": XLA's QR (sequential reflections, reference-faithful
    to GSL QR, SLAM.cpp:2330-2353). mode "cholqr2": MXU-dominant CholeskyQR2.
    mode "gram": single-pass equilibrated CholeskyQR — one Gram matmul +
    small Cholesky, the fastest TPU path; structured Gram shortcuts in
    motion/lifecycle also key off this mode.
    """
    if mode == "cholqr2":
        return cholqr2(a)
    if mode == "gram":
        return cholqr(a)
    if mode == "householder":
        return jnp.linalg.qr(a, mode="r")
    raise ValueError(f"unknown qr mode {mode!r}")


__all__ = ["chol_downdate", "chol_update", "cholqr", "cholqr2", "gmw_chol",
           "gram", "tri_solve", "qr_r"]
