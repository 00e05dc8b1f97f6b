"""Diagnose loop-closure detection on a genuine-revisit sequence.

Runs the filter + backend over the big-loop trajectory (circle whose
diameter exceeds the camera's ceiling footprint, so the start region
leaves the view and re-enters at the end) and prints, per keyframe, the
evidence the loop detector sees: landmark ids, xyz estimates, pose sigma,
and for each candidate old keyframe why the pairing/fit did or did not
fire. Run on CPU:  PALLAS_AXON_POOL_IPS= JAX_PLATFORMS=cpu python
scripts/diag_loop.py
"""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
sys.path.insert(0, os.path.dirname(__file__))

import numpy as np

from experiment import get_sequence
from cv_monoslam_tpu.api import SlamSession
from cv_monoslam_tpu.backend.session import BackendSession
from cv_monoslam_tpu.config import SlamConfig


def main():
    n = int(os.environ.get("DIAG_N", 240))
    noise = float(os.environ.get("DIAG_NOISE", 0.03))
    kind = os.environ.get("DIAG_KIND", "lap@0.06")
    seq, track, gt_xy, gt_th = get_sequence(kind, n, 0, noise=noise)
    print(f"track frames: {len(track)}, redirects: "
          f"{int(np.asarray(track.redirect).sum())}")
    cfg = SlamConfig(max_landmarks=16, max_new_per_frame=4,
                     max_detections=32, keyframe_every=5, ba_window=4)
    backend = BackendSession(cfg)
    sess = SlamSession(cfg, seq, track, backend=backend)
    sess.run(chunk=8)
    ate_f = sess.ate(gt_xy)
    ate_r = sess.ate(gt_xy, refined=True)
    print(f"ATE filter={ate_f:.4f} refined={ate_r:.4f} "
          f"keyframes={len(backend.keyframes)} "
          f"loop_edges={len(backend.loop_edges)} "
          f"ba_solves={len(sess.refinements)}")
    for (i, j, rel, w) in backend.loop_edges:
        print(f"  loop edge {i}->{j}: rel=({rel[0]:+.3f},{rel[1]:+.3f},"
              f"{rel[2]:+.3f}) sig={w}")
    print("\nedge candidates (accepted + rejected):")
    for e in backend.edge_log:
        print(f"  {e}")
    import json as _json
    print("summary:", _json.dumps(backend.summary(sess.refinements),
                                  default=str))
    applied = [r for r in sess.refinements if r.get("applied")]
    zs = [round(r["max_z"], 2) for r in sess.refinements if "max_z" in r]
    print(f"window BA: {len(applied)} applied of {len(sess.refinements)}; "
          f"max_z values: {zs}")

    # keyframe table: frame, filter drift vs refined drift
    print("\nkf  frame   filter_drift  refined_drift  nlm map sigma_xy")
    for i, kf in enumerate(backend.keyframes):
        fid = int(track.frame_id[kf.frame])
        g = gt_xy[fid]
        pf = kf.pose_filter
        d_f = float(np.hypot(pf[0] - g[0], pf[1] - g[1]))
        d_r = float(np.hypot(kf.pose[0] - g[0], kf.pose[1] - g[1]))
        sig = kf.pose_sigma if kf.pose_sigma is not None else [0, 0, 0]
        print(f"{i:3d} {kf.frame:5d}   {d_f:8.3f}     {d_r:8.3f}    "
              f"{len(kf.lids):3d} {len(kf.map_lids):3d} {sig[0]:.4f}")

    # pairwise candidate diagnosis between last few and first few keyframes
    from cv_monoslam_tpu.backend.session import _constellation_align
    kfs = backend.keyframes
    print("\nloop candidates (old i vs new j): map sizes | constellation "
          "inliers@min3 | gt-overlap")
    for j in range(max(0, len(kfs) - 8), len(kfs)):
        for i in range(0, min(10, len(kfs))):
            if j - i <= backend.loop_min_sep:
                continue
            old, new = kfs[i], kfs[j]
            _, a = backend._place_constellation(i, j)
            b = np.asarray(new.map_xyz)[:, :2]
            fit = _constellation_align(a, b, backend.loop_fit_tol,
                                       backend.loop_geo_min_inliers)
            gi = gt_xy[int(track.frame_id[old.frame])]
            gj = gt_xy[int(track.frame_id[new.frame])]
            sep = float(np.hypot(*(gi - gj)))
            if fit is None:
                desc = "no-fit"
            else:
                dth, t, (ra, rb), rms = fit
                desc = (f"inl={len(ra)} dth={dth:+.3f} "
                        f"t=({t[0]:+.2f},{t[1]:+.2f}) rms={rms:.3f}")
            print(f"  i={i:2d}({len(a):2d}) j={j:2d}({len(b):2d}): "
                  f"gt_sep={sep:.2f} {desc}")


if __name__ == "__main__":
    main()
