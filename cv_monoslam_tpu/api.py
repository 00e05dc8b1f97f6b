"""Host-side session API: the engine analogue of the reference's GUI driver.

``SlamSession`` replaces CMonoSLAMView's STEP/AUTO buttons
(MonoSLAMView.cpp:499-572): feed frames one at a time (``step``) or run to
the end of the odometry track (``run``), collecting per-frame telemetry.
The per-frame math is one jitted pure function; the host loop only moves
images to the device and accumulates records.
"""

from __future__ import annotations

import dataclasses
from typing import List, Optional

import jax
import jax.numpy as jnp
import numpy as np

from .config import SlamConfig
from .filter.srukf import initialize, slam_step
from .filter.state import FilterState, init_state
from .io.dataset import ImageSequence, OdometryTrack
from .io.recording import RunRecorder
from .utils.profiling import FrameTimer
from .utils.watchdog import Watchdog


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
                 track: OdometryTrack, max_stored: int = 64,
                 recorder: Optional[RunRecorder] = None,
                 checkpoint_dir: Optional[str] = None,
                 checkpoint_every: int = 50,
                 watchdog: Optional[Watchdog] = None,
                 backend: Optional["object"] = None):
        self.cfg = cfg
        self.images = images
        self.track = track
        self.counter = 1                      # m_frame.counter semantics
        self.records: List[FrameRecord] = []
        self._dtype = np.dtype(cfg.dtype)
        self.recorder = recorder
        self.checkpoint_dir = checkpoint_dir
        self.checkpoint_every = checkpoint_every
        self.watchdog = watchdog
        self.backend = backend            # BackendSession (keyframes + BA)
        self.refinements: List[dict] = []
        self.timer = FrameTimer()

        # host-side numpy (never index device arrays eagerly — on tunneled
        # backends every eager op is a fresh device compile)
        self._odo = np.concatenate(
            [track.xy, track.theta[:, None]], axis=1).astype(self._dtype)
        self._redirect = np.asarray(track.redirect)

        # separate jits per redirect branch: selecting the branch at trace
        # time (static bool) instead of lax.cond keeps remote-TPU compile
        # times sane (the conditional of two filter-sized branches compiles
        # ~25x slower than both branches separately)
        self._step_normal = jax.jit(
            lambda st, img, op, oc: slam_step(st, img, op, oc, False, cfg))
        self._step_redirect = jax.jit(
            lambda st, img, op, oc: slam_step(st, img, op, oc, True, cfg))
        self._init = jax.jit(lambda st, img: initialize(st, img, cfg))
        self._chunk_steps: dict = {}   # chunk length -> jitted scan

        state = init_state(cfg, theta0=float(track.theta[0]),
                           max_stored=max_stored)
        img0 = self.images.get(int(track.frame_id[0])).astype(self._dtype)
        self.state: FilterState = self._init(state, img0)

    def step(self) -> Optional[FrameRecord]:
        k = self.counter
        if k >= len(self.track):
            return None
        self.timer.start()
        img = self.images.get(int(self.track.frame_id[k])).astype(self._dtype)
        step = (self._step_redirect if self._redirect[k]
                else self._step_normal)
        self.state, out = step(
            self.state, img, self._odo[k - 1], self._odo[k])
        pose = np.asarray(out["pose"])
        rec = FrameRecord(
            frame=k,
            pose=pose,
            pose_sqrt_cov=np.asarray(out["pose_sqrt_cov"]),
            n_map=int(out["n_map"]),
            n_visible=int(out["n_visible"]),
            n_matched=int(out["n_matched"]),
            redirected=bool(out["redirected"]),
            wall_time=self.timer.stop(),
        )
        self.records.append(rec)
        self.counter += 1
        self._post_frame(rec)
        return rec

    def _post_frame(self, rec: FrameRecord) -> None:
        """Recording, health checks, periodic checkpoints (host side)."""
        if self.recorder is not None:
            sc = rec.pose_sqrt_cov[:2]
            self.recorder.record_frame(
                rec.frame,
                odo_xy=self._odo[rec.frame, :2],
                pose=rec.pose,
                pose_cov2=np.diag(sc * sc),
                lids=np.asarray(self.state.lm.lid),
                xyz=np.asarray(self.state.lm.xyz),
                valid=np.asarray(self.state.lm.active),
                n_map=rec.n_map, n_visible=rec.n_visible,
                n_matched=rec.n_matched, redirected=rec.redirected,
                wall_time=rec.wall_time,
            )
        if (self.watchdog is not None
                and self.watchdog.should_check(rec.frame)):
            report = self.watchdog.check(self.state)
            if not report.ok:
                self.state = self.watchdog.recover(
                    self.state, float(self._odo[rec.frame, 2]))
        if (self.checkpoint_dir is not None
                and rec.frame % self.checkpoint_every == 0):
            self.save_checkpoint()
        if self.backend is not None:
            kf = self.backend.maybe_add(rec.frame, self.state,
                                        self._odo[rec.frame])
            if kf is not None and len(self.backend.keyframes) >= 2:
                out = self.backend.refine_window()
                if out is not None:
                    self.refinements.append(out)

    def save_checkpoint(self) -> str:
        from .utils.checkpoint import save_checkpoint
        import os

        path = os.path.join(self.checkpoint_dir,
                            f"ckpt_{self.counter:06d}.npz")
        save_checkpoint(path, self.state, self.counter, self.cfg)
        return path

    @classmethod
    def resume(cls, ckpt_path: str, images: ImageSequence,
               track: OdometryTrack, **kw) -> "SlamSession":
        """Rebuild a session from a checkpoint (SURVEY.md §5: new
        capability; the reference can only restart from scratch)."""
        from .utils.checkpoint import load_checkpoint

        state, counter, cfg, _ = load_checkpoint(ckpt_path)
        sess = cls(cfg, images, track, **kw)
        sess.state = state
        sess.counter = counter
        return sess

    def _chunk_fn(self, k: int):
        """Jitted ``lax.scan`` over k frames (compiled once per length)."""
        if k not in self._chunk_steps:
            cfg = self.cfg

            def chunk(st, imgs, odo_prev, odo_cur):
                def body(s, inp):
                    img, op, oc = inp
                    s, out = slam_step(s, img, op, oc, False, cfg)
                    return s, out

                return jax.lax.scan(body, st, (imgs, odo_prev, odo_cur))

            self._chunk_steps[k] = jax.jit(chunk)
        return self._chunk_steps[k]

    def step_chunk(self, k: int) -> List[FrameRecord]:
        """Process up to ``k`` frames in ONE device dispatch.

        The per-frame host loop in :meth:`step` pays a host<->device
        round-trip per frame for the image upload and each telemetry
        fetch — dominant on tunneled/remote TPU backends. Here K frames
        are stacked, scanned on-device, and telemetry is fetched once.
        Host-side per-frame work (recorder/watchdog/backend) runs at
        chunk granularity on the final state.
        """
        k = min(k, len(self.track) - self.counter)
        if k <= 0:
            return []
        ks = self.counter
        # the scan body is the redirect-free branch; segment at redirection
        # frames (rare: |dtheta| > 45 deg) and run those via the dedicated
        # single-step jit instead of carrying a giant lax.cond in the scan
        if self._redirect[ks]:
            rec = self.step()
            return [rec] if rec is not None else []
        nxt = np.flatnonzero(self._redirect[ks:ks + k])
        if nxt.size:
            # odd-length remainder before a redirect: single steps, so the
            # per-length scan cache holds only the caller's chunk size
            recs = []
            for _ in range(int(nxt[0])):
                rec = self.step()
                if rec is None:
                    break
                recs.append(rec)
            return recs
        self.timer.start()
        imgs = np.stack([
            self.images.get(int(self.track.frame_id[i])).astype(self._dtype)
            for i in range(ks, ks + k)])
        self.state, outs = self._chunk_fn(k)(
            self.state, imgs, self._odo[ks - 1:ks - 1 + k],
            self._odo[ks:ks + k])
        wall = self.timer.stop()
        poses = np.asarray(outs["pose"])
        scovs = np.asarray(outs["pose_sqrt_cov"])
        n_map = np.asarray(outs["n_map"])
        n_vis = np.asarray(outs["n_visible"])
        n_mat = np.asarray(outs["n_matched"])
        redir = np.asarray(outs["redirected"])
        recs = [FrameRecord(frame=ks + i, pose=poses[i],
                            pose_sqrt_cov=scovs[i], n_map=int(n_map[i]),
                            n_visible=int(n_vis[i]),
                            n_matched=int(n_mat[i]),
                            redirected=bool(redir[i]), wall_time=wall / k)
                for i in range(k)]
        self.records.extend(recs)
        self.counter += k
        self._post_frame(recs[-1])
        return recs

    def run(self, n_frames: Optional[int] = None,
            chunk: int = 1) -> np.ndarray:
        """AUTO mode: run to the end (or n_frames); returns (T, 4) poses.

        ``chunk > 1`` scans that many frames per device dispatch
        (fastest; telemetry/recording at chunk granularity).
        """
        n = (len(self.track) - self.counter if n_frames is None
             else n_frames)
        if chunk > 1:
            done = 0
            while done < n:
                if n - done < chunk:        # tail: avoid a fresh scan compile
                    if self.step() is None:
                        break
                    done += 1
                    continue
                recs = self.step_chunk(chunk)
                if not recs:
                    break
                done += len(recs)
            return self.trajectory
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
