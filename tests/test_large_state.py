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

    seq, track, gt_xy = dense_sequence(12)
    cfg = SlamConfig(max_landmarks=128, max_new_per_frame=16,
                     max_detections=64, update_mode="gram", qr_mode="gram",
                     min_dist=10.0, min_num=24)
    sess = SlamSession(cfg, seq, track)
    sess.run(8)
    assert len(sess.records) == 8
    for r in sess.records:
        assert np.isfinite(r.pose).all()
    peak = max(r.n_map for r in sess.records)
    assert peak > 24, peak                      # the big map actually fills
    assert sess.ate(gt_xy) < 0.1
