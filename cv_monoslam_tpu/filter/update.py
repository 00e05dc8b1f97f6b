"""SRUKF measurement update — joint masked QR-Schur (TPU-native).

This replaces the reference's sequential per-landmark 2D updates
(SLAM.cpp:2048-2104) — whose stale sigma-point reuse makes successive gains
overcount information, forcing its Gill-Murray-Wright covariance repair
(SLAM.cpp:2106-2327) — with the single batched update BASELINE.json calls
for. All matched landmarks are processed in ONE QR:

    A  = sqrt(wi) (chi_i - chi_0)^T            state deviations  (2Na, D)
    Z  = sqrt(wi) (z_i  - z_0 )^T              pixel deviations  (2Na, 2M)
    M  = [[Z_masked, A], [Pad, 0]]             (2Na + 2M, 2M + D)
    R  = qr(M) = [[Ryy, Ryx], [0, Rxx]]
    dx = Ryx^T Ryy^-T nu_masked                gain applied to innovation
    S' = Rxx                                   exact Schur complement

Masking: unmatched slots get zeroed Z columns plus a unit "Pad" row of their
own (rows 2Na..2Na+2M), making them independent dummy measurements with zero
innovation — exact no-ops that keep every shape static. Matched slots get a
zero Pad row. The dummy block is diagonal and decoupled, so Ryy stays
invertible for any match pattern.

P' = S'^T S' equals the posterior of the joint Gaussian defined by the
sigma-point Gram — always PSD, no downdate, no PD repair needed.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ..config import SlamConfig
from .sigma import ut_weights
from .state import FilterState, PredictCache, replace


def kalman_update(state: FilterState, cache: PredictCache, cfg: SlamConfig):
    dtype = state.x.dtype
    D = cfg.state_dim
    M = cfg.max_landmarks
    w = ut_weights(D + 5, cfg)
    lm = state.lm

    matched = lm.matched                                    # (M,)
    any_match = jnp.any(matched)

    A = w.wi_sr * (cache.sigma[:D, 1:] - cache.sigma[:D, :1]).T  # (2Na, D)
    # pixel deviations per slot -> (2Na, 2M), columns [u_0, v_0, u_1, ...]
    dz = w.wi_sr * (cache.sigma_pix[:, :, 1:] - cache.sigma_pix[:, :, :1])
    Z = dz.reshape(2 * M, -1).T                             # (2Na, 2M)
    cmask = jnp.repeat(matched, 2)                          # (2M,)
    Z = jnp.where(cmask[None, :], Z, 0.0)

    # matched columns get an independent sigma_measure noise row (additive
    # pixel noise, uncorrelated across landmarks); unmatched columns get a
    # unit dummy row
    pad = jnp.diag(jnp.where(cmask, cfg.sigma_measure, 1.0).astype(dtype))
    top = jnp.concatenate([Z, A], axis=1)
    bot = jnp.concatenate([pad, jnp.zeros((2 * M, D), dtype)], axis=1)
    R = jnp.linalg.qr(jnp.concatenate([top, bot], axis=0), mode="r")

    m2 = 2 * M
    ryy = R[:m2, :m2]
    ryx = R[:m2, m2:]
    rxx = R[m2:, m2:]

    nu = (lm.match_px - lm.pred).reshape(-1)                # (2M,)
    nu = jnp.where(cmask, nu, 0.0)
    dx = ryx.T @ jax.scipy.linalg.solve_triangular(ryy.T, nu, lower=True)

    x_new = jnp.where(any_match, state.x + dx, state.x)
    S_new = jnp.where(any_match, rxx, state.S)
    return replace(state, x=x_new, S=S_new)
