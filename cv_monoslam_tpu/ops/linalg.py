"""TPU-native square-root linear algebra kernels.

The reference leans on GSL Householder QR (SLAM.cpp:2330-2353) and a
recompose-refactor "Cholesky update" (SLAM.cpp:2106-2327, Gill-Murray-Wright
repair at 2197-2327). Householder QR is a sequential, rank-1-update
algorithm — the worst possible shape for the MXU. This module provides the
TPU-first replacements:

  * :func:`cholqr2` — tall-skinny R factor via CholeskyQR2: two rounds of
    Gram matmul (MXU) + small Cholesky. O(n d^2) FLOPs land on the systolic
    array instead of O(n d^2) sequential Householder reflections. The second
    round removes the single-pass method's kappa^2 error, giving
    backward error comparable to Householder QR for kappa(A) < ~1e7 in f32
    (and essentially always in f64).
  * :func:`chol_update` / :func:`chol_downdate` — true rank-k Givens /
    hyperbolic-rotation sqrt updates (what SURVEY.md §2.1 C9 says the
    reference's recompose-refactor should have been). One `lax.scan` over
    rows, full-width vector ops per step: O(k n^2) with VPU-wide inner work.
  * :func:`tri_solve` — thin wrapper over triangular solve.

All functions are jit-safe (static shapes, no data-dependent Python control
flow) and dtype-polymorphic (f32 on TPU, f64 on CPU oracle paths).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def gram(a: jnp.ndarray) -> jnp.ndarray:
    """A^T A with MXU-preferred accumulation at FULL f32 precision.

    TPU dot_general defaults to bf16-pass precision (eps ~8e-3); a
    covariance Gram computed that way is indefinite at condition ~1e5
    and forced reset-grade Cholesky repairs every frame at D=3076
    (measured r3). Covariance-path contractions pin HIGHEST; the vision
    kernels keep the fast default."""
    return jax.lax.dot_general(
        a, a, dimension_numbers=(((0,), (0,)), ((), ())),
        preferred_element_type=a.dtype,
        precision=jax.lax.Precision.HIGHEST)


def chol_psd_flagged(g: jnp.ndarray, jitter: float):
    """Upper Cholesky of a (near-)PSD matrix with escalating repair.

    The reference hits the same failure mode (indefinite recomposed P) and
    repairs it with Gill-Murray-Wright (SLAM.cpp:2197-2327); here an
    escalating scaled diagonal shift (jitter, 1e3x, 1e6x) keeps the
    factorization PD. Repair attempts run under lax.cond so the common
    PD case pays exactly one factorization.

    Returns ``(R, level)`` where ``level`` (int32) is the number of
    jitter rungs the factorization needed: 0 = clean; 1-3 = MINOR floors
    (1x / 1e2x / 1e3x jitter — on an equilibrated unit-diagonal matrix a
    1e-4..1e-3 relative floor is benign regularization of directions f32
    cannot resolve; near-singular directions occur in normal operation,
    e.g. the motion-predicted Gram's ~1e-11 eigenvalue right after
    feature init); 4 = an ESCALATED repair (the 1e6x rung — effectively
    a partial covariance reset, the pathological case). The reference at
    least PRINTS its GMW interventions; silent repairs make a run
    surviving on covariance resets indistinguishable from a healthy one,
    so callers accumulate these levels into the per-frame health
    telemetry (VERDICT r2 weak #4).
    """
    n = g.shape[0]
    eye = jnp.eye(n, dtype=g.dtype)
    scale = jnp.maximum(jnp.max(jnp.abs(jnp.diag(g))), 1.0)
    r = jnp.linalg.cholesky(g, upper=True)
    level = jnp.int32(0)
    for mult in (1.0, 1e2, 1e3, 1e6):
        shift = (mult * jitter) * scale
        bad = ~jnp.all(jnp.isfinite(r))
        level = level + bad.astype(jnp.int32)
        r = jax.lax.cond(
            bad,
            lambda s=shift: jnp.linalg.cholesky(g + s * eye, upper=True),
            lambda r=r: r)
    return r, level


def _chol_psd(g: jnp.ndarray, jitter: float) -> jnp.ndarray:
    return chol_psd_flagged(g, jitter)[0]


def cholqr(a: jnp.ndarray, jitter: float = 1e-6) -> jnp.ndarray:
    """Single-pass CholeskyQR: R with R^T R = A^T A (columns equilibrated)."""
    d = jnp.sqrt(jnp.sum(a * a, axis=0))
    d = jnp.where(d > 0, d, 1.0)
    r = _chol_psd(gram(a / d[None, :]), jitter)
    return r * d[None, :]


def cholqr2(a: jnp.ndarray, jitter: float = 1e-6) -> jnp.ndarray:
    """CholeskyQR2 R factor of tall-skinny ``a`` (n >= d).

    Round 1: R1 = chol(A^T A) on column-equilibrated A.
    Round 2: Q = A R1^{-1}, R2 = chol(Q^T Q), R = R2 R1.
    Q^T Q is within O(eps kappa(A)^2 / kappa(R1)^2) of I, so round 2 restores
    orthogonality lost to the Gram squaring. All heavy ops are matmuls.
    """
    r1 = cholqr(a, jitter)
    q = jax.scipy.linalg.solve_triangular(
        r1.T, a.T, lower=True).T          # A R1^{-1}
    r2 = _chol_psd(gram(q), jitter)
    return r2 @ r1


def tri_solve(r: jnp.ndarray, b: jnp.ndarray, *, trans: bool = False,
              lower: bool = False) -> jnp.ndarray:
    """Solve R x = b (or R^T x = b with trans=True) for triangular R."""
    if trans:
        return jax.scipy.linalg.solve_triangular(r.T, b, lower=not lower)
    return jax.scipy.linalg.solve_triangular(r, b, lower=lower)


def tri_inv_upper(r: jnp.ndarray, base: int = 32) -> jnp.ndarray:
    """Explicit inverse of upper-triangular ``r`` by divide-and-conquer:

        inv([[A, B], [0, C]]) = [[A^-1, -A^-1 B C^-1], [0, C^-1]]

    Back-substitution (``triangular_solve``) is a sequential scalar
    recurrence on both CPU and TPU; above the ``base`` size this
    restructures all but the leaf solves into matmuls (MXU-shaped, and
    the two half-size inverses at each level are independent). Measured
    single-core at n=256: 14x over ``triangular_solve(r, eye)``
    (PERF.md r5 — it was the dominant per-panel cost of the distributed
    blocked Cholesky). Backward error matches the solve to f32 eps; the
    conditioning caveat of any explicit triangular inverse applies
    unchanged (callers feed equilibrated SPD panel factors)."""
    n = r.shape[0]
    if n <= base:
        return jax.scipy.linalg.solve_triangular(
            r, jnp.eye(n, dtype=r.dtype), lower=False)
    m = n // 2
    ai = tri_inv_upper(r[:m, :m], base)
    ci = tri_inv_upper(r[m:, m:], base)
    hp = jax.lax.Precision.HIGHEST
    top = jnp.concatenate(
        [ai, -jnp.dot(jnp.dot(ai, r[:m, m:], precision=hp), ci,
                      precision=hp)], axis=1)
    bot = jnp.concatenate(
        [jnp.zeros((n - m, m), r.dtype), ci], axis=1)
    return jnp.concatenate([top, bot], axis=0)


def gmw_chol(a: jnp.ndarray) -> jnp.ndarray:
    """Gill-Murray-Wright modified Cholesky: upper-triangular S with
    S^T S = A + E, E a minimal diagonal making A PD — the reference's
    forced-PD refactorization (SLAM.cpp:2197-2327), jit-compiled as a
    right-looking LDL^T scan (one rank-1 trailing update per pivot).

    Matches models.oracle.gmw_cholesky bit-for-bit in float64: identical
    delta / beta^2 pivot floors, so the engine's reference-faithful
    sequential update (downdate_mode="gmw") reproduces the reference's
    covariance repair exactly.
    """
    import numpy as np

    n = a.shape[0]
    dtype = a.dtype
    eps = float(np.finfo(np.dtype(dtype.name)).eps)
    diag = jnp.diag(a)
    gamma = jnp.maximum(jnp.max(jnp.abs(diag)), eps)
    off = a - jnp.diag(diag)
    xi = jnp.maximum(jnp.max(jnp.abs(off)) if n > 1 else jnp.asarray(0.0),
                     eps)
    delta = eps * jnp.maximum(gamma + xi, 1.0)
    beta2 = jnp.maximum(jnp.maximum(
        gamma, xi / max(float(np.sqrt(n * n - 1.0)), 1.0)), eps)
    idx = jnp.arange(n)

    def body(carry, j):
        aw, s = carry
        cjj = aw[j, j]
        col = jnp.where(idx > j, aw[:, j], 0.0)
        theta = jnp.max(jnp.abs(col))
        dj = jnp.maximum(jnp.maximum(jnp.abs(cjj), theta * theta / beta2),
                         delta)
        low = col / dj                       # L[:, j] strictly below diag
        lfull = low.at[j].set(1.0)
        aw = aw - dj * jnp.outer(low, low)
        s = s.at[j].set(jnp.sqrt(dj) * lfull)
        return (aw, s), None

    (_, s), _ = jax.lax.scan(body, (a, jnp.zeros_like(a)), jnp.arange(n))
    return s


def _rank1_rotate(r: jnp.ndarray, u: jnp.ndarray, downdate: bool,
                  eps: float) -> jnp.ndarray:
    """One rank-1 sqrt update/downdate by a scan of plane rotations.

    Upper-triangular ``r`` (n, n), vector ``u`` (n,). Returns R' with
    R'^T R' = R^T R ± u u^T. Downdates that would lose positive definiteness
    are clamped (diag^2 floored at eps * diag^2) — the jit analogue of the
    reference's forced-PD repair (SLAM.cpp:2197-2327).
    """
    n = r.shape[0]
    cols = jnp.arange(n)

    def body(carry, k):
        r, u = carry
        rk = r[k]                          # row k, (n,)
        rkk = rk[k]
        uk = u[k]
        if downdate:
            t2 = rkk * rkk - uk * uk
            # PD-loss guard: a column whose downdate would make the pivot
            # imaginary SKIPS its rotation (that u component is dropped) —
            # the bounded analogue of the reference's Gill-Murray-Wright
            # minimal-diagonal repair (SLAM.cpp:2197-2327). Scaling through
            # a clamped pivot would multiply the trailing row by 1/sqrt(eps).
            pd_ok = t2 >= eps * rkk * rkk
            rho = jnp.sqrt(jnp.maximum(t2, eps * rkk * rkk))
        else:
            pd_ok = jnp.asarray(True)
            rho = jnp.sqrt(rkk * rkk + uk * uk)
        inv_rho = jnp.where(rho == 0, 0.0,
                            1.0 / jnp.where(rho == 0, 1.0, rho))
        tail = cols > k
        # plane rotation zeroing u[k] against the pivot rkk:
        #   hyperbolic H = [[ch,-sh],[-sh,ch]] (ch^2 - sh^2 = 1) preserves
        #   R^T R - u u^T; Givens preserves R^T R + u u^T.
        c = rkk * inv_rho
        s = uk * inv_rho
        if downdate:
            new_rk = c * rk - s * u
            new_u = c * u - s * rk
        else:
            new_rk = c * rk + s * u
            new_u = c * u - s * rk
        new_rk = jnp.where(tail, new_rk, rk).at[k].set(rho)
        new_u = jnp.where(tail, new_u, u).at[k].set(0.0)
        # no-op guard: exactly-zero uk, or PD-loss skip (u[k] still dropped)
        noop = (uk == 0.0) | ~pd_ok
        new_rk = jnp.where(noop, rk, new_rk)
        new_u = jnp.where(noop, u.at[k].set(0.0), new_u)
        r = jax.lax.dynamic_update_index_in_dim(r, new_rk, k, axis=0)
        return (r, new_u), None

    (r, _), _ = jax.lax.scan(body, (r, u), jnp.arange(n))
    return r


def chol_update(r: jnp.ndarray, u: jnp.ndarray) -> jnp.ndarray:
    """Rank-k sqrt update: R' with R'^T R' = R^T R + U^T U, U (k, n)."""
    u = jnp.atleast_2d(u)

    def body(r, uk):
        return _rank1_rotate(r, uk, downdate=False, eps=0.0), None

    r, _ = jax.lax.scan(body, r, u)
    return r


def chol_downdate(r: jnp.ndarray, u: jnp.ndarray,
                  eps: float = 1e-12) -> jnp.ndarray:
    """Rank-k sqrt downdate: R' with R'^T R' = R^T R - U^T U, U (k, n).

    The true hyperbolic-rotation downdate the reference approximates by
    recompose-refactor (SLAM.cpp:2106-2155); PD loss is clamped, not fatal.
    """
    u = jnp.atleast_2d(u)

    def body(r, uk):
        return _rank1_rotate(r, uk, downdate=True, eps=eps), None

    r, _ = jax.lax.scan(body, r, u)
    return r
