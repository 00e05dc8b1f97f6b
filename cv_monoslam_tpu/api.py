"""Host-side session API: the engine analogue of the reference's GUI driver.

``SlamSession`` replaces CMonoSLAMView's STEP/AUTO buttons
(MonoSLAMView.cpp:499-572): feed frames one at a time (``step``) or run to
the end of the odometry track (``run``), collecting per-frame telemetry.
The per-frame math is one jitted pure function; the host loop only moves
images to the device and accumulates records.
"""

from __future__ import annotations

import dataclasses
import time
from typing import List, Optional

import jax
import jax.numpy as jnp
import numpy as np

from .config import SlamConfig
from .filter.srukf import initialize, slam_step
from .filter.state import FilterState, init_state
from .io.dataset import ImageSequence, OdometryTrack


@dataclasses.dataclass
class FrameRecord:
    frame: int
    pose: np.ndarray
    pose_sqrt_cov: np.ndarray
    n_map: int
    n_visible: int
    n_matched: int
    redirected: bool
    wall_time: float


class SlamSession:
    """One SLAM run over an image sequence + odometry track."""

    def __init__(self, cfg: SlamConfig, images: ImageSequence,
                 track: OdometryTrack, max_stored: int = 64):
        self.cfg = cfg
        self.images = images
        self.track = track
        self.counter = 1                      # m_frame.counter semantics
        self.records: List[FrameRecord] = []
        self._dtype = np.dtype(cfg.dtype)

        # host-side numpy (never index device arrays eagerly — on tunneled
        # backends every eager op is a fresh device compile)
        self._odo = np.concatenate(
            [track.xy, track.theta[:, None]], axis=1).astype(self._dtype)
        self._redirect = np.asarray(track.redirect)

        self._step = jax.jit(
            lambda st, img, op, oc, rd: slam_step(st, img, op, oc, rd, cfg))
        self._init = jax.jit(lambda st, img: initialize(st, img, cfg))

        state = init_state(cfg, theta0=float(track.theta[0]),
                           max_stored=max_stored)
        img0 = self.images.get(int(track.frame_id[0])).astype(self._dtype)
        self.state: FilterState = self._init(state, img0)

    def step(self) -> Optional[FrameRecord]:
        k = self.counter
        if k >= len(self.track):
            return None
        t0 = time.perf_counter()
        img = self.images.get(int(self.track.frame_id[k])).astype(self._dtype)
        self.state, out = self._step(
            self.state, img, self._odo[k - 1], self._odo[k],
            bool(self._redirect[k]))
        pose = np.asarray(out["pose"])
        rec = FrameRecord(
            frame=k,
            pose=pose,
            pose_sqrt_cov=np.asarray(out["pose_sqrt_cov"]),
            n_map=int(out["n_map"]),
            n_visible=int(out["n_visible"]),
            n_matched=int(out["n_matched"]),
            redirected=bool(out["redirected"]),
            wall_time=time.perf_counter() - t0,
        )
        self.records.append(rec)
        self.counter += 1
        return rec

    def run(self, n_frames: Optional[int] = None) -> np.ndarray:
        """AUTO mode: run to the end (or n_frames); returns (T, 4) poses."""
        n = (len(self.track) - self.counter if n_frames is None
             else n_frames)
        for _ in range(n):
            if self.step() is None:
                break
        return self.trajectory

    @property
    def trajectory(self) -> np.ndarray:
        return np.stack([r.pose for r in self.records]) if self.records \
            else np.zeros((0, 4))

    def ate(self, gt_xy: np.ndarray) -> float:
        """RMSE of estimated vs ground-truth (x, y) per processed frame."""
        ids = [r.frame for r in self.records]
        err = self.trajectory[:, :2] - gt_xy[ids]
        return float(np.sqrt((err ** 2).sum(axis=1).mean()))
