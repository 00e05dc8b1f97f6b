"""Golden-trace dump + compare (SURVEY.md §4: the build analogue of the
reference's debug print family, SLAM.cpp:3715-3820).

``dump`` runs the engine or the serial oracle over a synthetic sequence and
writes one JSON line per frame: pose, 2x2 pose covariance, match set
(lid -> pixel), map ids. ``compare`` diffs two trace files with stated
tolerances — the regression harness for "did semantics drift".

Usage:
  python scripts/golden_trace.py dump --who engine --out eng.jsonl
  python scripts/golden_trace.py dump --who oracle --out ora.jsonl
  python scripts/golden_trace.py compare eng.jsonl ora.jsonl --pose-tol 1e-6
"""

import argparse
import json
import os
import sys

os.environ.setdefault("JAX_PLATFORM_NAME", "cpu")
os.environ.setdefault("JAX_PLATFORMS", "cpu")
_CACHE_SUBDIR = "jax-cpu"  # persistent compile cache (set after jax import)
sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
sys.path.insert(0, os.path.dirname(__file__))

import jax

from cv_monoslam_tpu.utils.compile_cache import enable as _enable_cache  # noqa: E402

_enable_cache(os.path.join(os.path.dirname(__file__), "..", ".cache",
                           _CACHE_SUBDIR))

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

import numpy as np

from experiment import get_sequence
from cv_monoslam_tpu.config import SlamConfig

FAITHFUL = dict(max_landmarks=16, dtype="float64", update_mode="sequential",
                rho_init_mode="flat", subpixel_match=False,
                qr_mode="householder", detect_zero_blocks=True,
                downdate_mode="gmw")


def dump(who: str, out_path: str, kind: str = "straight", frames: int = 12,
         seed: int = 0, faithful: bool = True):
    seq, track, gt_xy, _ = get_sequence(kind, frames + 4, seed)
    cfg = SlamConfig(**FAITHFUL) if faithful else SlamConfig(
        max_landmarks=16, dtype="float64")
    rows = []
    if who == "oracle":
        from cv_monoslam_tpu.models.oracle import OracleSLAM

        o = OracleSLAM(cfg, seq, track)
        for k in range(frames):
            if o.counter >= len(track):
                break
            o.step()
            pp = o.S.T @ o.S
            rows.append(dict(
                frame=k + 1,
                pose=[float(v) for v in o.x[-4:]],
                pose_cov2=[float(pp[-4, -4]), float(pp[-3, -3])],
                matches={str(l.lid): [float(l.match[0]), float(l.match[1])]
                         for l in o.landmarks if l.matched},
                map_ids=sorted(int(l.lid) for l in o.landmarks)))
    else:
        from cv_monoslam_tpu.api import SlamSession

        sess = SlamSession(cfg, seq, track)
        for k in range(frames):
            rec = sess.step()
            if rec is None:
                break
            lm = sess.state.lm
            act = np.asarray(lm.active)
            lid = np.asarray(lm.lid)
            mt = np.asarray(lm.matched)
            mp = np.asarray(lm.match_px)
            rows.append(dict(
                frame=k + 1,
                pose=[float(v) for v in rec.pose],
                pose_cov2=[float(rec.pose_sqrt_cov[0] ** 2),
                           float(rec.pose_sqrt_cov[1] ** 2)],
                matches={str(int(l)): [float(u), float(v)]
                         for l, (u, v), a, m in zip(lid, mp, act, mt)
                         if a and m},
                map_ids=sorted(int(l) for l, a in zip(lid, act) if a)))
    with open(out_path, "w") as f:
        for r in rows:
            f.write(json.dumps(r) + "\n")
    print(f"{who}: {len(rows)} frames -> {out_path}")


def compare(path_a: str, path_b: str, pose_tol: float, n_frames: int):
    a = [json.loads(l) for l in open(path_a)]
    b = [json.loads(l) for l in open(path_b)]
    n = min(len(a), len(b), n_frames) if n_frames else min(len(a), len(b))
    worst = 0.0
    fails = 0
    for ra, rb in zip(a[:n], b[:n]):
        d = max(abs(x - y) for x, y in zip(ra["pose"], rb["pose"]))
        worst = max(worst, d)
        same_map = ra["map_ids"] == rb["map_ids"]
        same_match = sorted(ra["matches"]) == sorted(rb["matches"])
        ok = d < pose_tol and same_map and same_match
        fails += not ok
        print(f"frame {ra['frame']:3d}: pose_d={d:.2e} "
              f"map={'SAME' if same_map else 'DIFF'} "
              f"matches={'SAME' if same_match else 'DIFF'}"
              f"{'' if ok else '   <-- FAIL'}")
    print(f"{n - fails}/{n} frames within tolerance "
          f"(worst pose diff {worst:.2e})")
    return fails


def main():
    p = argparse.ArgumentParser()
    sub = p.add_subparsers(dest="cmd", required=True)
    pd = sub.add_parser("dump")
    pd.add_argument("--who", choices=["engine", "oracle"], required=True)
    pd.add_argument("--out", required=True)
    pd.add_argument("--kind", default="straight")
    pd.add_argument("--frames", type=int, default=12)
    pd.add_argument("--seed", type=int, default=0)
    pd.add_argument("--default-mode", action="store_true",
                    help="engine defaults instead of reference-faithful")
    pc = sub.add_parser("compare")
    pc.add_argument("a")
    pc.add_argument("b")
    pc.add_argument("--pose-tol", type=float, default=1e-6)
    pc.add_argument("--frames", type=int, default=0)
    args = p.parse_args()
    if args.cmd == "dump":
        dump(args.who, args.out, args.kind, args.frames, args.seed,
             faithful=not args.default_mode)
    else:
        sys.exit(1 if compare(args.a, args.b, args.pose_tol,
                              args.frames) else 0)


if __name__ == "__main__":
    main()
