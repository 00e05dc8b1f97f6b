"""Active-search NCC matching — batched over landmarks (JAX).

Replaces the reference's serial per-landmark loops (SURVEY.md §2.3):
  * patch warp (SLAM.cpp:1804-1906): plane-induced ceiling homography,
    linearized at each feature into a 2x2 affine map (translation-invariant,
    like the reference's re-centred sample grid), applied as one batched
    bilinear gather over all landmarks;
  * exhaustive NCC search (SLAM.cpp:1915-2009, 3141-3166): all landmarks x
    all (2*10+1)^2 window offsets scored at once. The cross/mean/energy sums
    are grouped convolutions of per-landmark search regions with their
    warped patches — MXU work instead of scalar loops;
  * chi^2 ellipse gate err^T (Si^T Si)^-1 err < chi2inv(0.95, 6)
    (SLAM.cpp:1975-1977) and the per-landmark window half-sizes
    min(10, max(8, ceil(2*Si_00))) (SLAM.cpp:1952-1955) become masks;
  * acceptance: max masked NCC > 0.8 (SLAM.cpp:184, 1989), with optional
    parabolic sub-pixel refinement (new; the reference's integer matches
    carry a constant rounding bias straight into the pose).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ..config import SlamConfig
from ..geometry import camera as cam_mod
from ..geometry import transforms as tf
from .. import filter as _  # noqa: F401  (package init order)
from ..filter.state import FilterState, replace
from ..ops.pallas_vision import ncc_score_map, warp_bilinear


def _use_pallas(cfg: SlamConfig, kernel: str = "warp") -> bool:
    """Data-driven backend dispatch (scripts/bench_kernels.py on TPU v5e,
    r5, scan-amortized DEVICE time):

        ncc   M=32  pallas 0.427 ms | xla 0.531 ms   -> pallas
        ncc   M=128 pallas 0.515 ms | xla 0.640 ms   -> pallas
        ncc   M=512 pallas 0.955 ms | xla 1.391 ms   -> pallas
        warp  M=512 pallas 1.10 ms  | xla 6.80 ms    -> pallas

    Pallas wins at every M for both kernels since the r5 shifted-FMA
    NCC rewrite (landmarks-on-lanes, no HBM intermediates) closed the
    M>=128 deficit the r4 banded formulation carried (its ~27 MB banded
    RHS was 6x the useful traffic). The XLA paths remain as the CPU/
    fallback implementations and for A/B measurement."""
    if cfg.vision_backend == "pallas":
        return True
    if cfg.vision_backend == "xla":
        return False
    return jax.default_backend() == "tpu"


def warp_matrices(state: FilterState, cfg: SlamConfig) -> jnp.ndarray:
    """Batched 2x2 affine warps d(init pix)/d(current pix), (M, 2, 2).

    Ceiling-plane homography between each landmark's init view and the
    current view, linearized at the landmark (cf SLAM.cpp:1804-1860).
    Operates in (v, u, 1) pixel vectors — see geometry.camera for the
    reference's axis pairing.
    """
    cam = cfg.camera
    lm = state.lm
    theta1 = state.x[-1]
    c1 = state.x[-4:-1]
    r1 = tf.yaw_matrix(theta1)                       # (3,3)
    r0 = tf.yaw_matrix(lm.init_theta)                # (M,3,3)
    c0 = lm.init_trans                               # (M,3)
    d0 = lm.xyz[:, 2] - c0[:, 2]
    d0 = jnp.where(jnp.abs(d0) < 1e-6, 1e-6, d0)
    ez = jnp.array([0.0, 0.0, 1.0], state.x.dtype)
    n0 = jnp.einsum("mji,j->mi", r0, ez)             # r0^T ez
    R10 = jnp.einsum("ji,mjk->mik", r1, r0)          # r1^T r0
    t10 = jnp.einsum("ji,mj->mi", r1, c0 - c1)
    K = jnp.array([[cam.f1, 0.0, cam.cx],
                   [0.0, cam.f2, cam.cy],
                   [0.0, 0.0, 1.0]], state.x.dtype)
    Kinv = jnp.array([[1.0 / cam.f1, 0.0, -cam.cx / cam.f1],
                      [0.0, 1.0 / cam.f2, -cam.cy / cam.f2],
                      [0.0, 0.0, 1.0]], state.x.dtype)
    H = jnp.einsum("ij,mjk,kl->mil",
                   K, R10 + t10[:, :, None] * n0[:, None, :] / d0[:, None, None],
                   Kinv)                             # (M,3,3) cam0 -> cam1
    uv0 = cam_mod.undistort(cam, lm.init_pixel)      # (M,2) (u,v)
    p0 = jnp.stack([uv0[:, 1], uv0[:, 0], jnp.ones_like(uv0[:, 0])], axis=-1)
    q = jnp.einsum("mij,mj->mi", H, p0)
    qz = jnp.where(q[:, 2] == 0, 1e-13, q[:, 2])
    J10 = (H[:, :2, :2] * qz[:, None, None]
           - q[:, :2, None] * H[:, 2:3, :2]) / (qz ** 2)[:, None, None]
    return jnp.linalg.inv(J10)                       # (M,2,2) (dv,du) basis


def warp_patches(state: FilterState, cfg: SlamConfig) -> jnp.ndarray:
    """Warp every landmark's init patch to the current view: (M, Pm, Pm)."""
    hp_m, hp_i = cfg.hp_match, cfg.hp_init
    A = warp_matrices(state, cfg)                    # (M,2,2)
    d = jnp.arange(-hp_m, hp_m + 1, dtype=state.x.dtype)
    dv, du = jnp.meshgrid(d, d, indexing="ij")       # (Pm,Pm)
    # sample position inside the (Pi,Pi) init patch, centre at (hp_i, hp_i)
    sv = hp_i + A[:, 0, 0, None, None] * dv + A[:, 0, 1, None, None] * du
    su = hp_i + A[:, 1, 0, None, None] * dv + A[:, 1, 1, None, None] * du
    patches = state.lm.init_patch.astype(state.x.dtype)
    if _use_pallas(cfg):
        return warp_bilinear(patches, su, sv)
    return _bilinear_batch(patches, su, sv)


def _bilinear_batch(img: jnp.ndarray, u: jnp.ndarray,
                    v: jnp.ndarray) -> jnp.ndarray:
    """img (M,H,W), u/v (M,...) -> samples (M,...), zero outside."""
    h, w = img.shape[-2:]
    u0 = jnp.floor(u).astype(jnp.int32)
    v0 = jnp.floor(v).astype(jnp.int32)
    du, dv = u - u0, v - v0
    valid = (u0 >= 0) & (u0 + 1 < w) & (v0 >= 0) & (v0 + 1 < h)
    u0c = jnp.clip(u0, 0, w - 2)
    v0c = jnp.clip(v0, 0, h - 2)

    def gather(im, vv, uu):
        return im[vv, uu]

    gv = jax.vmap(gather)
    s = (gv(img, v0c, u0c) * (1 - du) * (1 - dv)
         + gv(img, v0c, u0c + 1) * du * (1 - dv)
         + gv(img, v0c + 1, u0c) * (1 - du) * dv
         + gv(img, v0c + 1, u0c + 1) * du * dv)
    return jnp.where(valid, s, 0.0)


def ncc_scores(image: jnp.ndarray, centers: jnp.ndarray,
               patches: jnp.ndarray, cfg: SlamConfig):
    """Zero-mean NCC of every window offset for every landmark.

    image: (H, W) float; centers: (M, 2) int (u, v) window centres;
    patches: (M, Pm, Pm) warped templates.
    Returns (scores (M, W1, W1), base (M, 2) region origin (u, v)) where
    W1 = 2*hp_init + 1 offsets and scores[m, dy, dx] corresponds to match
    centre (base + (dx, dy) + hp_match).
    """
    hp_m, hs = cfg.hp_match, cfg.hp_init        # max half-window = hp_init
    Pm = 2 * hp_m + 1
    W1 = 2 * hs + 1
    Rg = W1 + Pm - 1                            # region side
    H, W = image.shape
    M = centers.shape[0]
    dtype = patches.dtype

    # region origin so that offset (dx,dy) window centre = base + off + hp_m
    base = centers - (hs + hp_m)
    base = jnp.clip(base, 0, jnp.array([W - Rg, H - Rg]))
    def slice_region(b):
        return jax.lax.dynamic_slice(image, (b[1], b[0]), (Rg, Rg))
    regions = jax.vmap(slice_region)(base).astype(dtype)     # (M, Rg, Rg)

    if cfg is not None and _use_pallas(cfg, kernel="ncc"):
        return ncc_score_map(regions, patches, pm=Pm, w1=W1), base

    # XLA:TPU miscompiles the grouped conv below when its input chain
    # carries an integer->float convert fused through the region gather
    # (uint8-transported frames, api._prep_image): every score comes back
    # 0.0 while the same executable with a float32 image input is correct
    # (measured r5 on v5e — matched collapsed 549 -> 0 at M=576; the
    # Pallas path is immune). The barrier pins the f32 materialization of
    # the regions so the convert cannot fuse into the conv.
    regions = jax.lax.optimization_barrier(regions)

    # grouped conv: input (1, M, Rg, Rg), kernels (M, 1, Pm, Pm)
    def gconv(x, k):
        return jax.lax.conv_general_dilated(
            x[None], k[:, None], window_strides=(1, 1), padding="VALID",
            dimension_numbers=("NCHW", "OIHW", "NCHW"),
            feature_group_count=M,
        )[0]                                                  # (M, W1, W1)

    ones = jnp.ones((M, Pm, Pm), dtype)
    n = Pm * Pm
    cross = gconv(regions, patches)
    wsum = gconv(regions, ones)
    wsq = gconv(regions * regions, ones)
    pmean = jnp.mean(patches, axis=(1, 2))
    pc = patches - pmean[:, None, None]
    pnorm = jnp.sqrt(jnp.sum(pc * pc, axis=(1, 2)))
    num = cross - wsum * pmean[:, None, None]
    wvar = jnp.maximum(wsq - wsum * wsum / n, 0.0)
    den = jnp.sqrt(wvar) * pnorm[:, None, None]
    return jnp.where(den > 0, num / jnp.where(den == 0, 1.0, den), 0.0), base


def data_association(state: FilterState, image: jnp.ndarray,
                     cfg: SlamConfig) -> FilterState:
    """Warp + gated NCC search + acceptance for all landmarks at once."""
    dtype = state.x.dtype
    lm = state.lm
    hp_m, hs = cfg.hp_match, cfg.hp_init
    W1 = 2 * hs + 1
    H, W = image.shape

    patches = warp_patches(state, cfg)                        # (M,Pm,Pm)
    centers = jnp.stack([lm.pred[:, 0], lm.pred[:, 1]], axis=1)
    centers_i = centers.astype(jnp.int32)                     # trunc, as ref
    scores, base = ncc_scores(image.astype(dtype), centers_i, patches, cfg)

    # offset grid -> absolute window centre pixels
    offs = jnp.arange(W1)
    ou, ov = jnp.meshgrid(offs, offs, indexing="xy")          # (W1,W1)
    au = base[:, 0, None, None] + ou[None] + hp_m             # (M,W1,W1)
    av = base[:, 1, None, None] + ov[None] + hp_m

    # per-landmark half-window (SLAM.cpp:1952-1955)
    half_x = jnp.ceil(2.0 * jnp.abs(lm.si[:, 0, 0])).astype(jnp.int32)
    half_y = jnp.ceil(2.0 * jnp.abs(lm.si[:, 1, 1])).astype(jnp.int32)
    half_x = jnp.clip(half_x, hp_m, hs)
    half_y = jnp.clip(half_y, hp_m, hs)

    eu = au.astype(dtype) - lm.pred[:, 0, None, None]
    ev = av.astype(dtype) - lm.pred[:, 1, None, None]
    pi = jnp.einsum("mki,mkj->mij", lm.si, lm.si)             # (M,2,2)
    det = pi[:, 0, 0] * pi[:, 1, 1] - pi[:, 0, 1] * pi[:, 1, 0]
    det_ok = jnp.abs(det) > 1e-12
    safe_det = jnp.where(det_ok, det, 1.0)
    inv00 = pi[:, 1, 1] / safe_det
    inv11 = pi[:, 0, 0] / safe_det
    inv01 = -pi[:, 0, 1] / safe_det
    maha = (inv00[:, None, None] * eu * eu
            + 2 * inv01[:, None, None] * eu * ev
            + inv11[:, None, None] * ev * ev)

    in_win = ((jnp.abs(au - centers_i[:, 0, None, None]) <=
               half_x[:, None, None])
              & (jnp.abs(av - centers_i[:, 1, None, None]) <=
                 half_y[:, None, None]))
    in_img = ((au >= hp_m) & (au <= W - hp_m - 1)
              & (av >= hp_m) & (av <= H - hp_m - 1))
    ok = (lm.visible & det_ok)[:, None, None] & in_win & in_img \
        & (maha < cfg.chi2_gate)
    masked = jnp.where(ok, scores, -1.0)

    flat = masked.reshape(masked.shape[0], -1)
    best_idx = jnp.argmax(flat, axis=1)
    best = jnp.take_along_axis(flat, best_idx[:, None], axis=1)[:, 0]
    by, bx = jnp.divmod(best_idx, W1)
    accepted = lm.visible & det_ok & (best > cfg.threshold_match_patch)

    mu = (base[:, 0] + bx + hp_m).astype(dtype)
    mv = (base[:, 1] + by + hp_m).astype(dtype)
    if cfg.subpixel_match:
        du = _parabolic(masked, by, bx, axis=1)
        dv = _parabolic(masked, by, bx, axis=0)
        mu = mu + du
        mv = mv + dv

    match_px = jnp.stack([mu, mv], axis=1)
    if cfg.use_ransac:
        accepted = one_point_ransac(accepted, match_px, lm.pred, cfg)
    lm_new = replace(
        lm,
        matched=accepted,
        match_px=jnp.where(accepted[:, None], match_px, lm.match_px),
        match_patch=jnp.where(accepted[:, None, None],
                              patches.astype(jnp.float32), lm.match_patch),
        n_match=lm.n_match + accepted.astype(jnp.int32),
    )
    return replace(state, lm=lm_new)


def one_point_ransac(accepted: jnp.ndarray, match_px: jnp.ndarray,
                     pred: jnp.ndarray, cfg: SlamConfig) -> jnp.ndarray:
    """1-point RANSAC over innovation consensus (SLAM.cpp:2097-2103's
    commented-out branch; helper sketches 3900-3988).

    The odometry prior already fixes the pose up to its residual error; for
    a ceiling camera observing a quasi-planar scene, that residual induces
    an approximately COMMON pixel innovation across all landmarks — one
    match (one point) therefore determines the hypothesis. Each accepted
    match m proposes its own innovation nu_m; inliers agree within
    ``threshold_ransac`` pixels; the largest consensus wins and
    non-consenting matches are rejected (mis-associations from NCC
    ambiguity). All pairs evaluated at once — (M, M) distance matrix
    instead of sampling.

    With <= 2 accepted matches consensus is meaningless: all kept.
    """
    nu = match_px - pred                                   # (M, 2)
    d2 = jnp.sum((nu[:, None, :] - nu[None, :, :]) ** 2, axis=-1)
    thr2 = cfg.threshold_ransac ** 2
    agree = (d2 < thr2) & accepted[None, :] & accepted[:, None]
    votes = jnp.sum(agree, axis=1)                         # (M,)
    best = jnp.argmax(jnp.where(accepted, votes, -1))
    inlier = agree[best]
    n_acc = jnp.sum(accepted)
    return jnp.where(n_acc > 2, accepted & inlier, accepted)


def _parabolic(scores: jnp.ndarray, by: jnp.ndarray, bx: jnp.ndarray,
               axis: int) -> jnp.ndarray:
    """Batched 1-D parabolic sub-pixel offset around (by, bx)."""
    W1 = scores.shape[-1]
    m = jnp.arange(scores.shape[0])
    if axis == 1:   # along x
        xm = jnp.clip(bx - 1, 0, W1 - 1)
        xp = jnp.clip(bx + 1, 0, W1 - 1)
        s0 = scores[m, by, bx]
        sm = jnp.where(bx > 0, scores[m, by, xm], -1.0)
        sp = jnp.where(bx < W1 - 1, scores[m, by, xp], -1.0)
    else:
        ym = jnp.clip(by - 1, 0, W1 - 1)
        yp = jnp.clip(by + 1, 0, W1 - 1)
        s0 = scores[m, by, bx]
        sm = jnp.where(by > 0, scores[m, ym, bx], -1.0)
        sp = jnp.where(by < W1 - 1, scores[m, yp, bx], -1.0)
    usable = (sm > -1.0) & (sp > -1.0)
    denom = sm - 2 * s0 + sp
    off = jnp.where(denom < -1e-12,
                    0.5 * (sm - sp) / jnp.where(denom == 0, 1.0, denom), 0.0)
    return jnp.where(usable, jnp.clip(off, -0.5, 0.5), 0.0)
