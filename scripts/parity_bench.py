"""Engine-vs-oracle ATE for BENCH (BASELINE.json metric: "ATE (m) vs C++
SRUKF semantics"). Prints ONE JSON dict.

Runs both the serial oracle (the transcription of the reference's math)
and the engine in default f64 mode on the same >=64-frame sequences, two
trajectories. Must run on CPU (the oracle is NumPy; f64 state is not a
TPU dtype) — bench.py invokes this as a subprocess with JAX_PLATFORMS=cpu.
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

from experiment import get_sequence
from cv_monoslam_tpu.api import SlamSession
from cv_monoslam_tpu.config import SlamConfig
from cv_monoslam_tpu.models.oracle import OracleSLAM


def run_pair(kind: str, n: int):
    seq, track, gt_xy, _ = get_sequence(kind, n, 0)
    cfg = SlamConfig(max_landmarks=16, dtype="float64")
    oracle = OracleSLAM(cfg, seq, track)
    while oracle.counter < len(track):
        oracle.step()
    otraj = np.stack(oracle.traj)
    ids = track.frame_id[1:len(otraj) + 1]
    o_ate = float(np.sqrt(((otraj[:, :2] - gt_xy[ids]) ** 2).sum(1).mean()))
    sess = SlamSession(cfg, seq, track)
    sess.run()
    return dict(frames=len(otraj), ate_oracle=round(o_ate, 5),
                ate_engine=round(float(sess.ate(gt_xy)), 5))


def main():
    out = {}
    for kind, n in (("arc", 105), ("loop@0.06", 105)):
        out[kind] = run_pair(kind, n)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
