"""Sliding-window bundle adjustment (SURVEY.md §7 step 5, BASELINE config 4).

New capability: the reference has no backend — its only trajectory estimate
is the filter, and its only "loop closure" is the redirection splice
(SLAM.cpp:948-1015, 1354-1428). This module is a TPU-first square-root
Gauss-Newton BA over a fixed window of keyframes:

  * **Static shapes**: W keyframes x L landmark slots, observation mask for
    validity — one jit, any fill level.
  * **Batched residual/Jacobian**: every (keyframe, landmark) pair in one
    vmap — reprojection through the reference camera model (yaw-only pose,
    ceiling camera, distortion included).
  * **Schur complement over landmarks**: the landmark-block inverse is a
    batched 3x3 solve; the reduced (3W, 3W) pose system is dense and tiny.
    The landmark axis is the SPMD axis — parallel/dist_ba.py shards it and
    psums exactly the two reduction terms formed here.
  * **Odometry factors** between consecutive keyframes + a first-pose prior
    pin gauge and scale (monocular BA alone is scale-free).

Poses are planar (x, y, theta) with z = 0 — the reference's robot state
(SLAM.cpp:226-231 keeps z nominally zero).
"""

from __future__ import annotations

import dataclasses
from typing import Tuple

import jax
import jax.numpy as jnp

from ..config import SlamConfig
from ..geometry import camera as cam_mod
from ..geometry import transforms as tf


def project_planar(pose3: jnp.ndarray, xyz: jnp.ndarray,
                   cfg: SlamConfig) -> jnp.ndarray:
    """Project world point through a planar (x, y, theta) camera pose."""
    t = jnp.stack([pose3[0], pose3[1], jnp.zeros_like(pose3[0])])
    rcw = tf.yaw_matrix(pose3[2]).T
    hlr = rcw @ (xyz - t)
    return cam_mod.project_smooth(cfg.camera, hlr)


def _make_res_jac(cfg: SlamConfig):
    """Batched (W, L) residuals + pose/landmark Jacobians."""

    def one(p, x, z):
        res = lambda pp, xx: project_planar(pp, xx, cfg) - z  # noqa: E731
        return (res(p, x),
                jax.jacfwd(lambda pp: res(pp, x))(p),
                jax.jacfwd(lambda xx: res(p, xx))(x))

    return jax.vmap(jax.vmap(one, in_axes=(None, 0, 0)),
                    in_axes=(0, None, 0))


def _res_jac(poses, landmarks, obs, cfg):
    return _make_res_jac(cfg)(poses, landmarks, obs)


def _relpose(p0: jnp.ndarray, p1: jnp.ndarray) -> jnp.ndarray:
    """Relative planar pose of p1 in p0's frame: (dx, dy, dtheta)."""
    c, s = jnp.cos(p0[2]), jnp.sin(p0[2])
    d = p1[:2] - p0[:2]
    return jnp.stack([c * d[0] + s * d[1],
                      -s * d[0] + c * d[1],
                      tf.wrap_angle(p1[2] - p0[2])])


@dataclasses.dataclass(frozen=True)
class BAProblem:
    """One window. All arrays static-shape; mask encodes validity."""

    poses: jnp.ndarray      # (W, 3) initial keyframe poses (x, y, theta)
    landmarks: jnp.ndarray  # (L, 3) initial world points
    obs: jnp.ndarray        # (W, L, 2) observed pixels
    obs_mask: jnp.ndarray   # (W, L) bool
    odo_rel: jnp.ndarray    # (W-1, 3) measured relative poses
    kf_mask: jnp.ndarray    # (W,) bool — filled keyframe slots
    lm_mask: jnp.ndarray    # (L,) bool — filled landmark slots
    #: (W, 3) filter marginal anchors — the ORIGINAL filter pose estimate
    #: per keyframe (not the last refinement, so repeated window solves
    #: cannot compound drift). Zeros + zero weight = no prior.
    prior_poses: jnp.ndarray | None = None
    #: (W, 3) inverse variances of the anchors (0 disables per-component)
    prior_iw: jnp.ndarray | None = None


def _obs_blocks(poses, landmarks, obs, obs_mask, kf_mask, lm_mask,
                cfg: SlamConfig, pix_sigma: float, damping: float):
    """Landmark-indexed Hessian blocks for one GN iteration.

    This is the part that shards over the landmark axis (parallel/dist_ba):
    every return value is either pose-shaped (summed over local landmarks —
    the distributed caller psums it) or landmark-sharded.

    Returns (U, Hred, bp_obs, Vinv, Wc, bl, cost_obs):
      U     (W,3,3)    sum_l Jp^T Jp                         [psum]
      Hred  (W,W,3,3)  sum_l W_wl Vinv_l W_w'l^T (Schur)     [psum]
      bp    (W,3)      -sum_l Jp^T r - sum_l W Vinv bl       [psum]
      Vinv  (L,3,3)    damped landmark block inverses        [local]
      Wc    (W,L,3,3)  pose-landmark coupling                [local]
      bl    (L,3)      -Jl^T r                               [local]
      cost  ()         0.5 sum r^T W r                       [psum]
    """
    dtype = poses.dtype
    # sanitize: unfilled landmark slots hold (0,0,0), which sits in the
    # camera plane (Z=0) and NaNs the distortion Newton solve; masked
    # entries must be zeroed with where (0 * NaN = NaN would leak through
    # a multiplicative mask)
    safe_lms = jnp.where(lm_mask[:, None], landmarks,
                         jnp.array([0.0, 0.0, 3.0], dtype))
    r, Jp, Jl = _res_jac(poses, safe_lms, obs, cfg)        # (W,L,2[,3])
    wmask = (obs_mask & kf_mask[:, None] & lm_mask[None, :]).astype(dtype)
    on = wmask[..., None] > 0
    iw = wmask / (pix_sigma ** 2)
    Jp = jnp.where(on[..., None], Jp, 0.0)
    Jl = jnp.where(on[..., None], Jl, 0.0)
    r = jnp.where(on, r, 0.0)

    # blocks (einsum = MXU):           shard axis = l (landmarks)
    U = jnp.einsum("wlki,wlkj,wl->wij", Jp, Jp, iw)        # (W,3,3)
    V = jnp.einsum("wlki,wlkj,wl->lij", Jl, Jl, iw)        # (L,3,3)
    Wc = jnp.einsum("wlki,wlkj,wl->wlij", Jp, Jl, iw)      # (W,L,3,3)
    bp = -jnp.einsum("wlki,wlk,wl->wi", Jp, r, iw)         # (W,3)
    bl = -jnp.einsum("wlki,wlk,wl->li", Jl, r, iw)         # (L,3)

    # landmark block inverse (damped; empty slots get identity)
    eye3 = jnp.eye(3, dtype=dtype)
    V = V + damping * eye3[None]
    V = jnp.where(lm_mask[:, None, None], V, eye3[None])
    Vinv = jnp.linalg.inv(V)                                # (L,3,3)

    # Schur reduction over landmarks (the distributed psum term):
    #   H_ww' -= sum_l W_wl Vinv_l W_w'l^T ; b_p -= sum_l W_wl Vinv_l b_l
    WV = jnp.einsum("wlij,ljk->wlik", Wc, Vinv)             # (W,L,3,3)
    Hred = jnp.einsum("wlik,vlmk->wvim", WV, Wc)            # (W,W,3,3)
    bp = bp - jnp.einsum("wlik,lk->wi", WV, bl)
    cost = 0.5 * jnp.sum(r * r * iw[..., None])
    return U, Hred, bp, Vinv, Wc, bl, cost


def _pose_system(poses, U, Hred, bp_obs, prob: BAProblem, cfg: SlamConfig,
                 odo_sigma: jnp.ndarray, damping: float,
                 prior_pose: jnp.ndarray):
    """Assemble + solve the reduced pose system (replicated everywhere)."""
    W = prob.kf_mask.shape[0]
    dtype = poses.dtype
    eye3 = jnp.eye(3, dtype=dtype)

    H = -Hred
    H = H.at[jnp.arange(W), jnp.arange(W)].add(U + damping * eye3[None])
    bp = bp_obs

    # odometry relative-pose factors between consecutive filled keyframes
    def odo_terms(w):
        p0, p1 = poses[w], poses[w + 1]
        res = _relpose(p0, p1) - prob.odo_rel[w]
        res = res.at[2].set(tf.wrap_angle(res[2]))
        J0 = jax.jacfwd(lambda p: _relpose(p, p1))(p0)
        J1 = jax.jacfwd(lambda p: _relpose(p0, p))(p1)
        on = (prob.kf_mask[w] & prob.kf_mask[w + 1]).astype(dtype)
        iw = on / (odo_sigma ** 2)                          # (3,)
        return res, J0, J1, iw

    res_o, J0, J1, iw_o = jax.vmap(odo_terms)(jnp.arange(W - 1))
    H = H.at[jnp.arange(W - 1), jnp.arange(W - 1)].add(
        jnp.einsum("eki,ek,ekj->eij", J0, iw_o, J0))
    H = H.at[jnp.arange(1, W), jnp.arange(1, W)].add(
        jnp.einsum("eki,ek,ekj->eij", J1, iw_o, J1))
    H = H.at[jnp.arange(W - 1), jnp.arange(1, W)].add(
        jnp.einsum("eki,ek,ekj->eij", J0, iw_o, J1))
    H = H.at[jnp.arange(1, W), jnp.arange(W - 1)].add(
        jnp.einsum("eki,ek,ekj->eij", J1, iw_o, J0))
    bp = bp.at[:-1].add(-jnp.einsum("eki,ek,ek->ei", J0, iw_o, res_o))
    bp = bp.at[1:].add(-jnp.einsum("eki,ek,ek->ei", J1, iw_o, res_o))

    # gauge prior on the first pose
    H = H.at[0, 0].add(jnp.diag(prior_pose))
    bp = bp.at[0].add(-prior_pose * (poses[0] - prob.poses[0]))
    # filter-marginal anchors: every keyframe is softly tied to the pose
    # the FILTER estimated when the keyframe was created, weighted by the
    # (inflated) filter pose covariance. BA then only moves poses where
    # reprojection/odometry evidence genuinely disagrees — without this,
    # repeated window refinements walk off in the weakly-observable
    # directions of the ceiling-camera geometry and degrade a good
    # trajectory instead of improving a drifting one.
    if prob.prior_poses is not None and prob.prior_iw is not None:
        iw_a = jnp.where(prob.kf_mask[:, None], prob.prior_iw, 0.0)
        H = H.at[jnp.arange(W), jnp.arange(W)].add(
            jax.vmap(jnp.diag)(iw_a))
        res_a = poses - prob.prior_poses
        res_a = res_a.at[:, 2].set(tf.wrap_angle(res_a[:, 2]))
        bp = bp + (-iw_a * res_a)
    # empty keyframe slots: identity rows
    kf_off = ~prob.kf_mask
    H = jnp.where((kf_off[:, None] | kf_off[None, :])[..., None, None],
                  0.0, H)
    H = H.at[jnp.arange(W), jnp.arange(W)].add(
        jnp.where(kf_off[:, None, None], eye3[None], 0.0))
    bp = jnp.where(kf_off[:, None], 0.0, bp)

    Hd = H.transpose(0, 2, 1, 3).reshape(3 * W, 3 * W)
    dxp = jnp.linalg.solve(Hd, bp.reshape(-1)).reshape(W, 3)
    dxp = jnp.where(prob.kf_mask[:, None], dxp, 0.0)
    cost_odo = 0.5 * jnp.sum(res_o * res_o * iw_o)
    return dxp, cost_odo


def back_substitute(dxp, Vinv, Wc, bl, lm_mask):
    """Landmark updates from the pose solution (local to each shard):
    dxl = Vinv (bl - sum_w W_wl^T dxp_w)."""
    dxl = jnp.einsum("lij,lj->li",
                     Vinv, bl - jnp.einsum("wlki,wk->li", Wc, dxp))
    return jnp.where(lm_mask[:, None], dxl, 0.0)


def _gn_step(poses, landmarks, prob: BAProblem, cfg: SlamConfig,
             pix_sigma: float, odo_sigma: jnp.ndarray, damping: float,
             prior_pose: jnp.ndarray):
    """One damped Gauss-Newton iteration with landmark-Schur elimination."""
    U, Hred, bp, Vinv, Wc, bl, cost_obs = _obs_blocks(
        poses, landmarks, prob.obs, prob.obs_mask, prob.kf_mask,
        prob.lm_mask, cfg, pix_sigma, damping)
    dxp, cost_odo = _pose_system(poses, U, Hred, bp, prob, cfg,
                                 odo_sigma, damping, prior_pose)
    dxl = back_substitute(dxp, Vinv, Wc, bl, prob.lm_mask)
    return poses + dxp, landmarks + dxl, cost_obs + cost_odo


def ba_solve(prob: BAProblem, cfg: SlamConfig, *, iters: int | None = None,
             pix_sigma: float | None = None,
             odo_sigma: Tuple[float, float, float] = (0.02, 0.02, 0.01),
             damping: float = 1e-4,
             prior_pose: Tuple[float, float, float] = (1e6, 1e6, 1e6)):
    """Gauss-Newton sliding-window BA. Returns (poses, landmarks, costs)."""
    iters = cfg.ba_iters if iters is None else iters
    pix_sigma = cfg.sigma_measure if pix_sigma is None else pix_sigma
    dtype = prob.poses.dtype
    odo_s = jnp.asarray(odo_sigma, dtype)
    prior = jnp.asarray(prior_pose, dtype)

    def body(carry, _):
        poses, landmarks = carry
        poses, landmarks, cost = _gn_step(
            poses, landmarks, prob, cfg, pix_sigma, odo_s, damping, prior)
        return (poses, landmarks), cost

    # full f32 matmul precision: TPU dot_general defaults to reduced
    # (bf16-pass) precision, which is enough to make the normal-equation
    # Schur solve diverge — Gauss-Newton amplifies the factorization error
    # every iteration (observed: corrections growing to 1e3 m on-chip while
    # the identical f32 solve converges on CPU)
    with jax.default_matmul_precision("highest"):
        (poses, landmarks), costs = jax.lax.scan(
            body, (prob.poses, prob.landmarks), None, length=iters)
    return poses, landmarks, costs


def reprojection_rmse(poses, landmarks, prob: BAProblem,
                      cfg: SlamConfig) -> jnp.ndarray:
    safe_lms = jnp.where(prob.lm_mask[:, None], landmarks,
                         jnp.array([0.0, 0.0, 3.0], poses.dtype))
    r, _, _ = _res_jac(poses, safe_lms, prob.obs, cfg)
    m = (prob.obs_mask & prob.kf_mask[:, None]
         & prob.lm_mask[None, :])
    r = jnp.where(m[..., None], r, 0.0)
    md = m.astype(poses.dtype)
    num = jnp.sum(jnp.sum(r * r, axis=-1) * md)
    return jnp.sqrt(num / jnp.maximum(jnp.sum(md), 1.0))
