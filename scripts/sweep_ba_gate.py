"""Window-BA apply-gate sweep on the frozen config-4 fixture (VERDICT r4
item 4: at gate 3.0 the bench committed 1 of 20 solves — measure what the
window stage actually contributes and ship the measured optimum).

One filter run (capture), then replay through BackendSession variants:

  gate in {2.0, 2.5, 3.0, inf}   (inf = pose-graph only, window BA inert)

Prints a JSON table: per gate, refined ATE + window-BA commit stats.
Run on the TPU (or CPU with JAX_PLATFORMS=cpu for a slower check).
"""

import json
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax

from cv_monoslam_tpu.utils.compile_cache import enable as _enable_cache

_enable_cache(os.path.join(os.path.dirname(__file__), "..", ".cache",
                           "jax" if jax.default_backend() != "cpu"
                           else "jax-cpu"))

import numpy as np

from cv_monoslam_tpu.api import SlamSession
from cv_monoslam_tpu.backend.replay import TelemetryCapture, replay
from cv_monoslam_tpu.config import SlamConfig
from cv_monoslam_tpu.io import fixtures

GATES = (2.0, 2.5, 3.0, float("inf"))


def main():
    seq, track, gt_xy, _ = fixtures.load("bench4_lap")
    cfg = SlamConfig(max_landmarks=16, max_new_per_frame=4,
                     max_detections=32, keyframe_every=5, ba_window=4)
    cap = TelemetryCapture()
    sess = SlamSession(cfg, seq, track, backend=cap)
    sess.run(chunk=8)
    ate_f = float(sess.ate(gt_xy))

    out = {"ate_filter": round(ate_f, 4), "gates": {}}
    for gate in GATES:
        be, refinements = replay(cap.calls, cfg, ba_apply_gate=gate)
        sess.backend = be
        ate_r = float(sess.ate(gt_xy, refined=True))
        solves = [r for r in refinements if "applied" in r]
        out["gates"][str(gate)] = dict(
            ate_refined=round(ate_r, 4),
            ba_solves=len(solves),
            ba_applied=sum(1 for r in solves if r["applied"]),
            graph_solves=len(refinements) - len(solves),
            loop_edges=len(be.loop_edges),
            max_z=round(max((r["max_z"] for r in solves),
                            default=float("nan")), 3),
        )
    best = min(out["gates"], key=lambda g: out["gates"][g]["ate_refined"])
    out["best_gate"] = best
    print(json.dumps(out))


if __name__ == "__main__":
    main()
