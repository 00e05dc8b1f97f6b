"""Distributed blocked Cholesky: row-sharded right-looking panel
factorization (SURVEY.md §2.3 "map blocks of X/S sharded over devices").

The r4 shard_sqrt filter layout psum'd local Grams but REPLICATED the
D x D Cholesky on every device, so 8 chips ran the large-state filter
step at 9.2% modeled efficiency — the factorization was the whole
non-scaling residue (VERDICT r4 missing #2). This module shards the
factorization itself.

Algorithm (upper Cholesky R, A = R^T R), rows block-distributed over the
mesh axis, panels of ``nb`` columns, right-looking:

  per panel k = [k0, k1):
    1. psum a masked row-scatter        -> the updated panel rows,
                                           replicated          (nb x n comm)
    2. nb x nb Cholesky of A[k0:k1,k0:k1]  replicated, tiny
    3. W^T_local = A_loc[:, k0:k1] R_kk^{-1}  -- the panel triangular
       solve, SHARDED over trailing rows (the trailing matrix is
       symmetric, so each device's local ROWS of A[:, k0:k1] are the
       panel's trailing COLUMNS)
    4. all_gather W^T                   -> W replicated     (n x nb comm)
    5. trailing update A_loc -= W^T_loc W, column-blocked by an inner
       fori_loop over blocks [k+1, last block containing this device's
       rows] — the left bound tracks the shrinking trailing submatrix,
       the right bound drops the strictly-upper off-diagonal blocks a
       device's rows never need (only diagonal blocks A_kk read above
       the diagonal; the panel solve reads trailing columns from their
       symmetric LOWER position) — and the whole step lax.cond-gated OFF
       for devices whose rows are all finalized (no collectives inside
       the gate). Summed over devices this keeps trailing work at the
       ideal n^3/6 MACs instead of n^3/3 (full-square updates) or n^3/2
       (full-width masked updates).

Communication: n*nb + nb*n floats per panel -> ~2 n^2 total, vs n^3/3
compute — the collective cost vanishes as n grows (ICI >100 GB/s moves
the 4096^2 f32 case's ~134 MB in ~1.3 ms against ~23 GFLOP of compute).

The replicated work per device is the nb^3/3 panel Cholesky per panel
(n*nb^2/3 total — 0.2% of compute at n=4096, nb=64) plus the sharded
panel solves; everything else scales 1/P.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from ..ops.linalg import tri_inv_upper
from .mesh import MAP_AXIS


def _chol_local(A_loc, *, axis, n, nb, rows_loc):
    """Per-device body: A_loc is this device's (rows_loc, n) row block."""
    dtype = A_loc.dtype
    d = jax.lax.axis_index(axis)
    row0 = d * rows_loc
    idx = row0 + jnp.arange(rows_loc)            # global row ids
    nblocks = n // nb
    cols = jnp.arange(n)

    # When panels never span devices (rows_loc % nb == 0, the production
    # layout), the panel extraction and the R write are O(nb x n)
    # dynamic slices at the owner's local offset instead of O(rows_loc
    # x n) masked scatters/gathers — per-panel plumbing is what
    # dominates the serialized-mesh measurement once trailing work is
    # ideal (PERF.md r5: chol-only 4.22 s with the scatter path at
    # n=4096), so this is the difference between the decomposition
    # scaling and not.
    aligned = rows_loc % nb == 0

    def panel_step(i, carry):
        A_loc, R_loc = carry
        k0 = i * nb
        k1 = k0 + nb
        sel = (idx >= k0) & (idx < k1)
        z0 = jnp.zeros((), jnp.int32)
        owner = (k0 >= row0) & (k0 < row0 + rows_loc)
        off = jnp.clip(k0 - row0, 0, rows_loc - nb).astype(jnp.int32)
        # (1) replicated, fully-updated panel rows: owner-sliced when
        # aligned, masked row scatter + psum otherwise (panels may span
        # devices when rows_loc % nb != 0)
        if aligned:
            P_loc = jnp.where(
                owner, jax.lax.dynamic_slice(A_loc, (off, z0), (nb, n)),
                0.0)
        else:
            P_loc = jnp.zeros((nb, n), dtype).at[
                jnp.clip(idx - k0, 0, nb - 1)].add(
                jnp.where(sel[:, None], A_loc, 0.0))
        panel = jax.lax.psum(P_loc, axis)
        # (2) tiny replicated panel Cholesky + explicit triangular
        # inverse: a (rows_loc, nb) triangular_solve is latency-bound on
        # TPU (sequential substitution over 4096 rows measured 0.59-1.5
        # TF/s end to end); inverting the nb x nb factor once (nb RHS
        # instead of rows_loc) turns the panel solve into a full-MXU
        # matmul. R_kk comes from an equilibrated SPD diagonal block, so
        # the explicit inverse's conditioning hit is bounded and the
        # factorization's backward error stays ~eps*cond(panel) (pinned
        # against the reference factorization in tests/test_dist_chol.py)
        A_kk = jax.lax.dynamic_slice(panel, (0, k0), (nb, nb))
        # Only the panel's OWNER factorizes + inverts (small-nb chol and
        # triangular work run far below the big-matmul FLOP rate, so
        # replicating them on every device was the dominant nb-scaled
        # overhead of the serialized measurement); the psum broadcasts
        # the owner's result, which also keeps numerics bit-identical
        # across device counts. No collectives inside the cond.
        def _factor(a):
            rkk = jnp.linalg.cholesky(a).T       # upper: R^T R = A_kk
            return rkk, tri_inv_upper(rkk)       # blocked inv: matmuls,
            #                                      not substitution
        R_kk, R_inv = jax.lax.cond(
            owner, _factor,
            lambda a: (jnp.zeros((nb, nb), dtype),) * 2, A_kk)
        R_kk, R_inv = jax.lax.psum((R_kk, R_inv), axis)
        # (3) sharded panel solve over this device's trailing rows
        B_loc = jax.lax.dynamic_slice(A_loc, (0, k0), (rows_loc, nb))
        W_locT = jax.lax.dot(B_loc, R_inv, preferred_element_type=dtype,
                             precision=jax.lax.Precision.HIGHEST)
        W_locT = jnp.where((idx >= k1)[:, None], W_locT, 0.0)
        # (4) W replicated: rows of Wall are global COLUMN ids of W
        Wall = jax.lax.all_gather(W_locT, axis, axis=0, tiled=True)
        # write the panel's R rows (owner keeps its slice)
        Rrow = jax.lax.dynamic_update_slice(
            jnp.zeros((nb, n), dtype), R_kk, (0, k0))
        Rrow = jnp.where(cols[None, :] >= k1, Wall.T, Rrow)
        if aligned:
            R_loc = jax.lax.cond(
                owner,
                lambda r: jax.lax.dynamic_update_slice(r, Rrow, (off, z0)),
                lambda r: r, R_loc)
        else:
            mine = Rrow[jnp.clip(idx - k0, 0, nb - 1)]
            R_loc = jnp.where(sel[:, None], mine, R_loc)

        # (5) trailing update, finalized devices skip entirely (the gate
        # contains no collectives, so per-device divergence is legal).
        # Column blocks are bounded at this device's LAST row block: the
        # only strictly-upper entries ever read are the within-panel
        # diagonal blocks (A_kk) — the panel solve reads trailing columns
        # from their symmetric LOWER position (B_loc) — so blocks right
        # of a device's rows are write-only garbage. Skipping them halves
        # trailing MACs to the ideal n^3/6 (measured: 61.8% -> see
        # PERF.md modeled-efficiency table).
        def trailing(A_loc):
            def col_block(j, A_loc):
                c0 = j * nb
                z = jnp.zeros((), c0.dtype)
                Wj = jax.lax.dynamic_slice(Wall, (c0, z), (nb, nb))
                blk = jax.lax.dynamic_slice(A_loc, (z, c0),
                                            (rows_loc, nb))
                blk = blk - jax.lax.dot(
                    W_locT, Wj.T,
                    preferred_element_type=dtype,
                    precision=jax.lax.Precision.HIGHEST)
                return jax.lax.dynamic_update_slice(A_loc, blk, (z, c0))

            j_end = jnp.minimum(nblocks,
                                (row0 + rows_loc + nb - 1) // nb)
            return jax.lax.fori_loop(i + 1, j_end, col_block, A_loc)

        A_loc = jax.lax.cond(row0 + rows_loc > k1, trailing,
                             lambda a: a, A_loc)
        return A_loc, R_loc

    _, R_loc = jax.lax.fori_loop(0, nblocks, panel_step,
                                 (A_loc, jnp.zeros_like(A_loc)))
    return R_loc


def chol_rowsharded(A, mesh=None, panel: int = 64, axis: str = MAP_AXIS):
    """Upper Cholesky of SPD ``A`` with rows sharded over ``axis``.

    ``A.shape[0]`` must be divisible by both the mesh size and ``panel``
    (use :func:`chol_rowsharded_padded` otherwise). ``mesh=None`` uses
    the ambient mesh (callable inside jit under ``set_mesh``); pass a
    concrete Mesh for eager use.
    """
    n = A.shape[0]
    m = mesh if mesh is not None else jax.sharding.get_abstract_mesh()
    n_dev = m.shape[axis]
    if n % n_dev or n % panel:
        raise ValueError(f"n={n} must divide by devices={n_dev} and "
                         f"panel={panel}")
    fn = jax.shard_map(
        partial(_chol_local, axis=axis, n=n, nb=panel,
                rows_loc=n // n_dev),
        mesh=mesh,
        in_specs=jax.sharding.PartitionSpec(axis, None),
        out_specs=jax.sharding.PartitionSpec(axis, None),
        check_vma=False,
    )
    return fn(A)


def chol_rowsharded_padded(A, mesh=None, panel: int = 64,
                           axis: str = MAP_AXIS):
    """As :func:`chol_rowsharded` for arbitrary ``n``: embeds ``A`` in the
    top-left of a blockdiag(A, I) of the next valid size — the factor of
    the padding block is I, so R[:n, :n] is exactly chol(A) (the trailing
    rows/cols never feed back into the leading block in a right-looking
    factorization)."""
    n = A.shape[0]
    m = mesh if mesh is not None else jax.sharding.get_abstract_mesh()
    n_dev = m.shape[axis]
    step = _lcm(n_dev, panel)
    n_pad = -(-n // step) * step
    if n_pad == n:
        return chol_rowsharded(A, mesh, panel, axis)
    Ap = jnp.zeros((n_pad, n_pad), A.dtype)
    Ap = Ap.at[:n, :n].set(A)
    Ap = Ap.at[jnp.arange(n, n_pad), jnp.arange(n, n_pad)].set(1.0)
    return chol_rowsharded(Ap, mesh, panel, axis)[:n, :n]


def _lcm(a: int, b: int) -> int:
    import math

    return a * b // math.gcd(a, b)
