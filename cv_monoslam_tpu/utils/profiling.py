"""Tracing / profiling (SURVEY.md §5).

The reference has per-frame wall-clock TickMeter timers surfaced in the UI
(SLAM.cpp:122-151, MonoSLAMView.cpp:92-93). Here:

  * :class:`FrameTimer` — the same per-frame + cumulative timers;
  * :class:`StageTimer` — named per-stage accumulators (the reference's
    commented-out per-stage timing lines, SLAM.cpp:89-111, made real);
  * :func:`trace` — context manager around ``jax.profiler`` for device-level
    traces viewable in TensorBoard/Perfetto.

Stage timings around jitted calls measure host-observed latency; for device
truth use :func:`trace`.
"""

from __future__ import annotations

import contextlib
import time
from collections import defaultdict
from typing import Dict, Iterator


class FrameTimer:
    """Per-frame + cumulative wall clock (SLAM.cpp:122-151 semantics)."""

    def __init__(self):
        self.frame_time = 0.0
        self.total_time = 0.0
        self.n_frames = 0
        self._t0 = None

    def start(self) -> None:
        self._t0 = time.perf_counter()

    def stop(self) -> float:
        self.frame_time = time.perf_counter() - self._t0
        self.total_time += self.frame_time
        self.n_frames += 1
        return self.frame_time

    def record(self, elapsed: float, frames: int = 1) -> float:
        """Account an externally-measured interval (pipelined chunk loops
        carry their own dispatch timestamps — the single ``_t0`` slot
        would be overwritten by the next chunk's ``start``)."""
        self.frame_time = elapsed
        self.total_time += elapsed
        self.n_frames += frames
        return elapsed

    @property
    def mean_time(self) -> float:
        return self.total_time / max(self.n_frames, 1)


class StageTimer:
    """Named stage accumulators: ``with stages.time("predict"): ...``"""

    def __init__(self):
        self.totals: Dict[str, float] = defaultdict(float)
        self.counts: Dict[str, int] = defaultdict(int)

    @contextlib.contextmanager
    def time(self, name: str) -> Iterator[None]:
        t0 = time.perf_counter()
        try:
            yield
        finally:
            self.totals[name] += time.perf_counter() - t0
            self.counts[name] += 1

    def summary(self) -> Dict[str, float]:
        return {k: self.totals[k] / max(self.counts[k], 1)
                for k in self.totals}


@contextlib.contextmanager
def trace(logdir: str) -> Iterator[None]:
    """Device-level profiler trace (open in TensorBoard / Perfetto)."""
    import jax

    jax.profiler.start_trace(logdir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()
