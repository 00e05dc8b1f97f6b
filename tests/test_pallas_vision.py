"""Pallas vision kernels vs direct-formula oracles (SURVEY.md §4 item 2).

On CPU the kernels run in interpreter mode — same code path the TPU
compiles, numerically identical semantics.
"""

import jax.numpy as jnp
import numpy as np

from cv_monoslam_tpu.ops.pallas_vision import ncc_score_map, warp_bilinear


def _ncc_direct(regions, patches, w1):
    """Direct zero-mean NCC (reference formula, SLAM.cpp:3141-3166)."""
    m, rg, _ = regions.shape
    pm = patches.shape[-1]
    n = pm * pm
    out = np.zeros((m, w1, w1))
    for k in range(m):
        p = patches[k]
        pc = p - p.mean()
        pn = np.sqrt((pc * pc).sum())
        for dy in range(w1):
            for dx in range(w1):
                w = regions[k, dy:dy + pm, dx:dx + pm]
                wc = w - w.mean()
                den = np.sqrt((wc * wc).sum()) * pn
                out[k, dy, dx] = (wc * pc).sum() / den if den > 0 else 0.0
    return out


def test_ncc_kernel_matches_direct():
    rng = np.random.default_rng(0)
    m, pm, w1 = 5, 7, 9
    rg = w1 + pm - 1
    regions = rng.uniform(0, 255, (m, rg, rg)).astype(np.float32)
    patches = rng.uniform(0, 255, (m, pm, pm)).astype(np.float32)
    # plant an exact copy of patch 0 at offset (3, 4): NCC == 1 there
    regions[0, 3:3 + pm, 4:4 + pm] = patches[0]

    got = np.asarray(ncc_score_map(jnp.asarray(regions), jnp.asarray(patches),
                                   pm=pm, w1=w1, block_m=2))
    want = _ncc_direct(regions, patches, w1)
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-4)
    assert got[0, 3, 4] > 0.999
    assert np.all(got <= 1.0 + 1e-5) and np.all(got >= -1.0 - 1e-5)


def test_ncc_kernel_flat_window_zero():
    """Constant windows have zero variance -> score must be 0, not NaN."""
    m, pm, w1 = 2, 5, 5
    rg = w1 + pm - 1
    regions = np.full((m, rg, rg), 7.0, np.float32)
    patches = np.random.default_rng(1).uniform(0, 1, (m, pm, pm)).astype(
        np.float32)
    got = np.asarray(ncc_score_map(jnp.asarray(regions), jnp.asarray(patches),
                                   pm=pm, w1=w1))
    assert np.all(np.isfinite(got))
    np.testing.assert_allclose(got, 0.0, atol=5e-3)  # f32 variance roundoff


def _bilinear_direct(patches, su, sv):
    m, pi, _ = patches.shape
    out = np.zeros_like(su)
    for k in range(m):
        for idx in np.ndindex(su.shape[1:]):
            u, v = su[(k,) + idx], sv[(k,) + idx]
            u0, v0 = int(np.floor(u)), int(np.floor(v))
            if u0 < 0 or v0 < 0 or u0 + 1 > pi - 1 or v0 + 1 > pi - 1:
                continue
            du, dv = u - u0, v - v0
            p = patches[k]
            out[(k,) + idx] = (p[v0, u0] * (1 - du) * (1 - dv)
                               + p[v0, u0 + 1] * du * (1 - dv)
                               + p[v0 + 1, u0] * (1 - du) * dv
                               + p[v0 + 1, u0 + 1] * du * dv)
    return out


def test_warp_bilinear_matches_direct():
    rng = np.random.default_rng(2)
    m, pi, po = 4, 11, 7
    patches = rng.uniform(0, 255, (m, pi, pi)).astype(np.float32)
    # affine-ish sample grids incl. out-of-bounds corners
    base = np.stack(np.meshgrid(np.linspace(-1, pi, po),
                                np.linspace(-1, pi, po), indexing="ij"), 0)
    su = np.stack([base[1] * (0.8 + 0.1 * k) + 0.3 for k in range(m)])
    sv = np.stack([base[0] * (0.9 + 0.05 * k) - 0.2 for k in range(m)])
    su = su.astype(np.float32)
    sv = sv.astype(np.float32)

    got = np.asarray(warp_bilinear(jnp.asarray(patches), jnp.asarray(su),
                                   jnp.asarray(sv), block_m=2))
    want = _bilinear_direct(patches, su, sv)
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-3)


def test_warp_identity():
    rng = np.random.default_rng(3)
    pi = 9
    patches = rng.uniform(0, 255, (1, pi, pi)).astype(np.float32)
    g = np.arange(pi, dtype=np.float32)
    su, sv = np.meshgrid(g, g, indexing="xy")
    got = np.asarray(warp_bilinear(jnp.asarray(patches), jnp.asarray(su[None]),
                                   jnp.asarray(sv[None])))
    # interior exact; the +1 neighbour rule zeroes the last row/col edge
    np.testing.assert_allclose(got[0, :-1, :-1], patches[0, :-1, :-1],
                               rtol=1e-6, atol=1e-3)


def test_matching_pallas_vs_xla_paths():
    """Full data_association agrees between the Pallas and XLA backends."""
    import dataclasses

    import jax
    from cv_monoslam_tpu.config import CameraConfig, SlamConfig
    from cv_monoslam_tpu.filter.state import init_state, replace
    from cv_monoslam_tpu.frontend.matching import warp_patches, ncc_scores

    cfg = SlamConfig(max_landmarks=4, dtype="float64",
                     camera=CameraConfig(width=128, height=96, cx=64.0,
                                         cy=48.0))
    rng = np.random.default_rng(4)
    state = init_state(cfg)
    x = np.asarray(state.x).copy()
    for i in range(3):
        x[6 * i: 6 * i + 6] = [0, 0, 0, 0.02 * i - 0.02, 0.015, 1.0 / 3.0]
    lm = state.lm
    act = np.zeros(4, bool)
    act[:3] = True
    P = lm.init_patch.shape[-1]
    patches = rng.uniform(0, 255, (4, P, P)).astype(np.float32)
    pred = np.array([[60, 40], [70, 50], [64, 44], [0, 0]], np.float64)
    state = replace(
        state, x=jnp.asarray(x),
        lm=replace(lm, active=jnp.asarray(act),
                   visible=jnp.asarray(act),
                   init_patch=jnp.asarray(patches),
                   init_theta=jnp.zeros(4, jnp.float64),
                   xyz=jnp.asarray(np.tile([0, 0, 3.0], (4, 1))),
                   pred=jnp.asarray(pred)))
    image = rng.uniform(0, 255, (96, 128)).astype(np.float64)

    cfg_p = dataclasses.replace(cfg, vision_backend="pallas")
    cfg_x = dataclasses.replace(cfg, vision_backend="xla")
    wp = np.asarray(warp_patches(state, cfg_p))
    wx = np.asarray(warp_patches(state, cfg_x))
    np.testing.assert_allclose(wp, wx, rtol=1e-4, atol=1e-3)

    centers = pred.astype(np.int32)
    sp, bp = ncc_scores(jnp.asarray(image), jnp.asarray(centers),
                        jnp.asarray(wp, np.float64), cfg_p)
    sx, bx = ncc_scores(jnp.asarray(image), jnp.asarray(centers),
                        jnp.asarray(wx, np.float64), cfg_x)
    np.testing.assert_array_equal(np.asarray(bp), np.asarray(bx))
    np.testing.assert_allclose(np.asarray(sp), np.asarray(sx),
                               rtol=1e-4, atol=1e-4)


def test_ncc_scores_uint8_image_input_matches_f32():
    """Regression: XLA:TPU returned all-zero NCC scores when the frame
    entered the jit as uint8 and was cast in-graph (the convert fused
    through the region gather into the grouped conv) — matching collapsed
    to 0 of 549 at M=576 on v5e, r5. ncc_scores now pins the f32 regions
    behind an optimization barrier; this pins u8-input == f32-input
    through a jit boundary on every backend, both dispatch paths."""
    import dataclasses

    import jax

    from cv_monoslam_tpu.config import SlamConfig
    from cv_monoslam_tpu.frontend.matching import ncc_scores

    rng = np.random.default_rng(7)
    img_u8 = rng.integers(0, 256, (120, 160), dtype=np.uint8)
    m = 24
    cfg = SlamConfig()
    pm = 2 * cfg.hp_match + 1
    centers = np.stack([rng.integers(30, 130, m),
                        rng.integers(30, 90, m)], axis=1).astype(np.int32)
    # templates cut from the image itself -> strong true matches
    patches = np.stack([
        img_u8[v - cfg.hp_match:v + cfg.hp_match + 1,
               u - cfg.hp_match:u + cfg.hp_match + 1].astype(np.float32)
        for u, v in centers])
    for backend in ("xla", "pallas"):
        c2 = dataclasses.replace(cfg, vision_backend=backend)
        fn = jax.jit(lambda im, c, p: ncc_scores(
            im.astype(jnp.float32), c, p, c2)[0])
        s_u8 = np.asarray(fn(img_u8, jnp.asarray(centers),
                             jnp.asarray(patches)))
        s_f32 = np.asarray(fn(img_u8.astype(np.float32),
                              jnp.asarray(centers), jnp.asarray(patches)))
        best = s_u8.reshape(m, -1).max(axis=1)
        assert np.abs(s_u8 - s_f32).max() < 1e-4, backend
        assert (best > 0.95).all(), (backend, best.min())
