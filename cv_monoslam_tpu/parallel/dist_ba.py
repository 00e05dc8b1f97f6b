"""Distributed bundle adjustment: landmark blocks sharded over the device
mesh, Schur complement reduced with explicit collectives (BASELINE config 5;
SURVEY.md §2.3 "Collectives over ICI/DCN ... Schur-complement reduction").

Parallel decomposition (the landmark axis is embarrassingly parallel until
the pose system):

  per-shard (local landmarks only, no communication):
      residuals, Jacobians, V_l^{-1}, W_wl, b_l
  psum over the mesh (the ONLY communication, 4 small pose-shaped terms):
      U        = sum_l Jp^T Jp                  (W,3,3)
      Hred     = sum_l W V^{-1} W^T             (W,W,3,3)
      bp       = sum_l (-Jp^T r - W V^{-1} b_l) (W,3)
      cost_obs = sum_l r^T W r                  ()
  replicated on every device (tiny, 3W x 3W):
      odometry factors + gauge prior + dense solve
  local again:
      landmark back-substitution

Communication volume per GN iteration is O(W^2) — independent of the number
of landmarks, so scaling efficiency approaches the compute ratio as L grows.
Collectives ride whatever the mesh axis maps to (ICI within a slice, DCN
across hosts); XLA lowers the psum to the right all-reduce.
"""

from __future__ import annotations

from functools import partial
from typing import Tuple

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..backend.ba import (BAProblem, _obs_blocks, _pose_system,
                          back_substitute)
from ..config import SlamConfig
from .mesh import MAP_AXIS


def ba_solve_sharded(prob: BAProblem, cfg: SlamConfig, mesh: Mesh, *,
                     iters: int | None = None,
                     pix_sigma: float | None = None,
                     odo_sigma: Tuple[float, float, float] = (0.02, 0.02,
                                                              0.01),
                     damping: float = 1e-4,
                     prior_pose: Tuple[float, float, float] = (1e6, 1e6,
                                                               1e6)):
    """Drop-in distributed ba_solve: identical math, landmark axis sharded.

    L must be divisible by the mesh size (pad the problem if needed).
    Returns (poses (W,3) replicated, landmarks (L,3) sharded, costs).
    """
    iters = cfg.ba_iters if iters is None else iters
    pix_sigma = cfg.sigma_measure if pix_sigma is None else pix_sigma
    dtype = prob.poses.dtype
    odo_s = jnp.asarray(odo_sigma, dtype)
    prior = jnp.asarray(prior_pose, dtype)

    lm_spec = P(MAP_AXIS)
    rep = P()

    @partial(
        jax.shard_map, mesh=mesh,
        in_specs=(rep, lm_spec, P(None, MAP_AXIS, None),
                  P(None, MAP_AXIS), rep, rep, lm_spec, rep),
        out_specs=(rep, lm_spec, rep),
        check_vma=False,
    )
    def gn_sharded(poses, lms_l, obs_l, obs_mask_l, kf_mask, odo_rel,
                   lm_mask_l, poses0):
        # local landmark blocks
        U, Hred, bp, Vinv, Wc, bl, cost_obs = _obs_blocks(
            poses, lms_l, obs_l, obs_mask_l, kf_mask, lm_mask_l,
            cfg, pix_sigma, damping)
        # the Schur reduction: one all-reduce of pose-shaped terms
        U, Hred, bp, cost_obs = jax.lax.psum(
            (U, Hred, bp, cost_obs), MAP_AXIS)
        # replicated tiny pose solve (odometry + prior handled inside).
        # Filter-marginal anchors are replicated pose-shaped terms, so they
        # pass straight through for parity with the unsharded solve.
        sub = BAProblem(poses=poses0, landmarks=lms_l, obs=obs_l,
                        obs_mask=obs_mask_l, odo_rel=odo_rel,
                        kf_mask=kf_mask, lm_mask=lm_mask_l,
                        prior_poses=prob.prior_poses,
                        prior_iw=prob.prior_iw)
        dxp, cost_odo = _pose_system(poses, U, Hred, bp, sub, cfg,
                                     odo_s, damping, prior)
        # local back-substitution
        dxl = back_substitute(dxp, Vinv, Wc, bl, lm_mask_l)
        return poses + dxp, lms_l + dxl, cost_obs + cost_odo

    shard_lm = NamedSharding(mesh, lm_spec)
    rep_sh = NamedSharding(mesh, rep)
    init = (jax.device_put(prob.poses, rep_sh),
            jax.device_put(prob.landmarks, shard_lm))

    @jax.jit
    def run(init, obs, obs_mask, kf_mask, odo_rel, lm_mask, poses0):
        def body(carry, _):
            poses, lms = carry
            poses, lms, cost = gn_sharded(poses, lms, obs, obs_mask,
                                          kf_mask, odo_rel, lm_mask, poses0)
            return (poses, lms), cost

        return jax.lax.scan(body, init, None, length=iters)

    (poses, lms), costs = run(
        init,
        jax.device_put(prob.obs, NamedSharding(mesh, P(None, MAP_AXIS,
                                                       None))),
        jax.device_put(prob.obs_mask, NamedSharding(mesh, P(None,
                                                            MAP_AXIS))),
        jax.device_put(prob.kf_mask, rep_sh),
        jax.device_put(prob.odo_rel, rep_sh),
        jax.device_put(prob.lm_mask, shard_lm),
        jax.device_put(prob.poses, rep_sh))
    return poses, lms, costs
