"""Large-state SRUKF path (BASELINE config 3 prerequisite): the M=128
(D=772) engine with the structured-Gram fast paths runs end-to-end on CPU,
stays finite, and tracks. The 512-slot on-chip numbers come from
scripts/bench_large.py / bench.py on the TPU."""

import numpy as np
import pytest

from cv_monoslam_tpu.api import SlamSession
from cv_monoslam_tpu.config import SlamConfig


@pytest.mark.slow
def test_m128_gram_end_to_end():
    import os
    import sys
    sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..",
                                    "scripts"))
    from bench_large import dense_sequence

    from bench_large import run_large

    out = run_large(landmarks=128, frames=8, chunk=4, quiet=True)
    assert out["finite"]
    assert out["frames"] == 8
    assert out["peak_map"] > 40, out            # the big map actually fills
    assert out["ate_m"] < 0.1, out
