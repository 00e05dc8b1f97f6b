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


# Telemetry packing: the per-frame outputs of slam_step are merged into ONE
# flat f32 row on-device so a chunked scan (or single step) pays exactly one
# device->host transfer for telemetry. On tunneled TPU backends every
# transfer carries round-trip latency that dwarfs the 7 KB payload — 12
# separate np.asarray fetches were the dominant cost of the whole frame.
_SCALAR_FIELDS = 18          # pose 4 + sqrt_cov 4 + 3 counters + redirect
#                              + health 3 + repair counters 3


def _pack_row(out: dict, M: int) -> jnp.ndarray:
    f32 = jnp.float32
    return jnp.concatenate([
        out["pose"].astype(f32),
        out["pose_sqrt_cov"].astype(f32),
        jnp.stack([out["n_map"], out["n_visible"],
                   out["n_matched"]]).astype(f32),
        out["redirected"].astype(f32)[None],
        out["health"].astype(f32),
        out["repairs"].astype(f32),
        out["lm_lid"].astype(f32),
        out["lm_active"].astype(f32),
        out["lm_matched"].astype(f32),
        out["lm_match_px"].reshape(-1).astype(f32),
        out["lm_xyz"].reshape(-1).astype(f32),
    ])


def _unpack_row(row: np.ndarray, M: int) -> dict:
    k = _SCALAR_FIELDS
    return dict(
        pose=row[0:4].astype(np.float64),
        pose_sqrt_cov=row[4:8].astype(np.float64),
        n_map=row[8], n_visible=row[9], n_matched=row[10],
        redirected=row[11],
        health=row[12:15] != 0.0,
        repairs=row[15:18].astype(np.int64),
        lm_lid=row[k:k + M].astype(np.int32),
        lm_active=row[k + M:k + 2 * M] != 0.0,
        lm_matched=row[k + 2 * M:k + 3 * M] != 0.0,
        lm_match_px=row[k + 3 * M:k + 5 * M].reshape(M, 2),
        lm_xyz=row[k + 5 * M:k + 8 * M].reshape(M, 3),
    )


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
    #: cumulative covariance-repair counters up to this frame: minor
    #: first-rung floors / escalated (reset-grade) repairs / skipped
    #: updates
    n_repairs: int = 0
    n_escalations: int = 0
    n_skipped: int = 0


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
        #: chunk-level detect-when-starved gating (see _dispatch_chunk).
        #: Off by default: single-step and in-graph gating keep exact
        #: per-frame reference semantics; large-state configs enable it.
        self.detect_host_gate = False
        #: opt-in: keep PIPELINING while host-gated (the gate then reads
        #: telemetry one chunk stale — a mid-chunk collapse could run
        #: starved for up to 2*chunk frames, which is why gating disables
        #: pipelining by default). Set to an int margin M to re-enable:
        #: detection triggers at matched < min_num + M, absorbing the
        #: staleness. M=0 is VALID but means pipelining with NO cushion —
        #: the stale-gate hazard is accepted as-is; sound only when the
        #: config hovers far above true starvation (capacity configs at
        #: ~400 matched of min_num=400, where a one-chunk-late detection
        #: merely dips occupancy — bench_large runs exactly this), NEVER
        #: for reference-default min_num=5 runs, where two starved chunks
        #: can drop the map below redetection's reach. A warning fires on
        #: the dangerous combination (see run()).
        self.detect_gate_margin: Optional[int] = None
        self._last_matched = 0            # latest n_matched seen

        # host-side numpy (never index device arrays eagerly — on tunneled
        # backends every eager op is a fresh device compile)
        self._odo = np.concatenate(
            [track.xy, track.theta[:, None]], axis=1).astype(self._dtype)
        self._redirect = np.asarray(track.redirect)

        # separate jits per redirect branch: selecting the branch at trace
        # time (static bool) instead of lax.cond keeps remote-TPU compile
        # times sane (the conditional of two filter-sized branches compiles
        # ~25x slower than both branches separately). Outputs are packed
        # into one flat row (see _pack_row) — one D2H transfer per step.
        M = cfg.max_landmarks

        def packed_step(st, img, op, oc, redirect):
            st, out = slam_step(st, img.astype(cfg.dtype), op, oc,
                                redirect, cfg)
            return st, _pack_row(out, M)

        self._step_normal = jax.jit(
            lambda st, img, op, oc: packed_step(st, img, op, oc, False))
        self._step_redirect = jax.jit(
            lambda st, img, op, oc: packed_step(st, img, op, oc, True))
        self._init = jax.jit(
            lambda st, img: initialize(st, img.astype(cfg.dtype), cfg))
        self._chunk_steps: dict = {}   # chunk length -> jitted scan
        #: transport images as uint8 when lossless (4x fewer bytes over
        #: the host->device link); decided from the first frame
        self._img_u8: Optional[bool] = None

        state = init_state(cfg, theta0=float(track.theta[0]),
                           max_stored=max_stored)
        img0 = self._prep_image(self.images.get(int(track.frame_id[0])))
        self.state: FilterState = self._init(state, img0)

    def _prep_image(self, img: np.ndarray) -> np.ndarray:
        if self._img_u8 is None:
            self._img_u8 = bool(
                img.min() >= 0 and img.max() <= 255
                and np.all(img == np.round(img)))
        if self._img_u8:
            return np.asarray(img, dtype=np.uint8)
        return np.asarray(img, dtype=self._dtype)

    def step(self) -> Optional[FrameRecord]:
        k = self.counter
        if k >= len(self.track):
            return None
        self.timer.start()
        img = self._prep_image(self.images.get(int(self.track.frame_id[k])))
        step = (self._step_redirect if self._redirect[k]
                else self._step_normal)
        self.state, row = step(
            self.state, img, self._odo[k - 1], self._odo[k])
        out = _unpack_row(np.asarray(row), self.cfg.max_landmarks)
        rec = FrameRecord(
            frame=k,
            pose=out["pose"],
            pose_sqrt_cov=out["pose_sqrt_cov"],
            n_map=int(out["n_map"]),
            n_visible=int(out["n_visible"]),
            n_matched=int(out["n_matched"]),
            redirected=bool(out["redirected"]),
            wall_time=self.timer.stop(),
            n_repairs=int(out["repairs"][0]),
            n_escalations=int(out["repairs"][1]),
            n_skipped=int(out["repairs"][2]),
        )
        self.records.append(rec)
        self.counter += 1
        self._last_matched = rec.n_matched
        self._post_frame(rec, out)
        return rec

    def _post_frame(self, rec: FrameRecord, tele: dict) -> None:
        """Recording, health checks, keyframes, periodic checkpoints.

        ``tele`` is the per-frame telemetry dict (numpy) from the jitted
        step outputs — single steps and chunked scans both route every
        frame through here, so recording stays per-frame in the fast path
        (the reference records every frame, SLAM.cpp:3512-3562)."""
        if self.recorder is not None:
            sc = rec.pose_sqrt_cov[:2]
            self.recorder.record_frame(
                rec.frame,
                odo_xy=self._odo[rec.frame, :2],
                pose=rec.pose,
                pose_cov2=np.diag(sc * sc),
                lids=tele["lm_lid"],
                xyz=tele["lm_xyz"],
                valid=tele["lm_active"],
                n_map=rec.n_map, n_visible=rec.n_visible,
                n_matched=rec.n_matched, redirected=rec.redirected,
                wall_time=rec.wall_time,
            )
        if (self.watchdog is not None
                and self.watchdog.should_check(rec.frame)):
            report = self.watchdog.check_flags(tele["health"])
            if not report.ok:
                self.state = self.watchdog.recover(
                    self.state, float(self._odo[rec.frame, 2]))
        if (self.checkpoint_dir is not None
                and rec.frame % self.checkpoint_every == 0):
            self.save_checkpoint()
        if self.backend is not None:
            n_loops = len(self.backend.loop_edges)
            kf = self.backend.maybe_add_telemetry(
                rec.frame, tele["pose"], self._odo[rec.frame],
                tele["lm_lid"], tele["lm_matched"], tele["lm_match_px"],
                tele["lm_xyz"], pose_sqrt_cov=tele["pose_sqrt_cov"],
                active=tele["lm_active"])
            if kf is not None and len(self.backend.keyframes) >= 2:
                if len(self.backend.loop_edges) > n_loops:
                    # a loop edge appeared: global pose-graph relaxation
                    # (the engine's real loop closure — the analogue of the
                    # reference's redirection splice, SLAM.cpp:948-1015)
                    out = self.backend.optimize_graph()
                else:
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

    def _window_images(self, ks: int, k: int):
        """Stacked (k, H, W) window images, from the prefetch cache when
        the previous chunk already shipped them to the device."""
        key = (ks, k)
        if getattr(self, "_img_prefetch", None) is not None:
            pkey, dev = self._img_prefetch
            self._img_prefetch = None
            if pkey == key:
                return dev
        return self._stack_window(ks, k)

    def _stack_window(self, ks: int, k: int) -> np.ndarray:
        return np.stack([
            self._prep_image(self.images.get(int(self.track.frame_id[i])))
            for i in range(ks, ks + k)])

    def _prefetch_images(self, ks: int, k: int) -> None:
        self._img_prefetch = (
            (ks, k), jax.device_put(self._stack_window(ks, k)))

    def _chunk_fn(self, k: int, detect: bool = True):
        """Jitted ``lax.scan`` over k frames (compiled once per
        (length, detect) pair).

        Scan outputs are the packed telemetry rows — the host fetches one
        (k, row) array per chunk. ``detect=False`` compiles the scan
        WITHOUT the detection pipeline (host-gated detection cadence —
        see ``detect_host_gate``)."""
        key = (k, detect)
        if key not in self._chunk_steps:
            cfg = self.cfg
            M = cfg.max_landmarks

            def chunk(st, imgs, odo_prev, odo_cur):
                def body(s, inp):
                    img, op, oc = inp
                    s, out = slam_step(s, img.astype(cfg.dtype), op, oc,
                                       False, cfg, allow_detect=detect)
                    return s, _pack_row(out, M)

                return jax.lax.scan(body, st, (imgs, odo_prev, odo_cur))

            self._chunk_steps[key] = jax.jit(chunk)
        return self._chunk_steps[key]

    def _dispatch_chunk(self, k: int) -> Optional[dict]:
        """Dispatch ONE k-frame scan without materializing its telemetry.

        Returns a pending descriptor (device rows still in flight) or None
        when a redirect boundary / end of track prevents a full-chunk
        dispatch. The counter advances immediately (the scan consumed the
        frames); records appear when :meth:`_finish_chunk` materializes."""
        k = min(k, len(self.track) - self.counter)
        if k <= 0 or self._redirect[self.counter:self.counter + k].any():
            return None
        ks = self.counter
        import time as _time
        t0 = _time.perf_counter()
        imgs = self._window_images(ks, k)
        # host-gated detection cadence: the reference's detect-when-
        # starved trigger (SLAM.cpp:552-562) decided per CHUNK from the
        # latest materialized match telemetry — at large state the
        # in-graph lax.cond costs ~15 ms/frame of conditional overhead,
        # while two specialized executables cost one extra compile
        detect = True
        if self.detect_host_gate:
            detect = self._last_matched < (
                self.cfg.min_num + (self.detect_gate_margin or 0))
        self.state, rows = self._chunk_fn(k, detect)(
            self.state, imgs, self._odo[ks - 1:ks - 1 + k],
            self._odo[ks:ks + k])
        # prefetch the NEXT window's images while the device computes —
        # jax dispatch is async, so the H2D upload overlaps the scan
        ns = ks + k
        if (ns + k <= len(self.track)
                and not self._redirect[ns:ns + k].any()):
            self._prefetch_images(ns, k)
        self.counter += k
        return dict(rows=rows, ks=ks, k=k, t0=t0)

    def _finish_chunk(self, pending: dict) -> List[FrameRecord]:
        """Materialize a dispatched chunk's telemetry (ONE device->host
        transfer) and run the per-frame host side effects."""
        import time as _time

        ks, k = pending["ks"], pending["k"]
        rows = np.asarray(pending["rows"])
        # wall time from THIS chunk's dispatch timestamp (the shared
        # FrameTimer slot is overwritten when the next chunk dispatches
        # before this one finishes in the pipelined loop)
        wall = self.timer.record(_time.perf_counter() - pending["t0"],
                                 frames=k)
        recs = []
        for i in range(k):
            tele = _unpack_row(rows[i], self.cfg.max_landmarks)
            rec = FrameRecord(frame=ks + i, pose=tele["pose"],
                              pose_sqrt_cov=tele["pose_sqrt_cov"],
                              n_map=int(tele["n_map"]),
                              n_visible=int(tele["n_visible"]),
                              n_matched=int(tele["n_matched"]),
                              redirected=bool(tele["redirected"]),
                              wall_time=wall / k,
                              n_repairs=int(tele["repairs"][0]),
                              n_escalations=int(tele["repairs"][1]),
                              n_skipped=int(tele["repairs"][2]))
            recs.append(rec)
            self.records.append(rec)
            self._post_frame(rec, tele)
        if recs:
            self._last_matched = recs[-1].n_matched
        return recs

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
        pending = self._dispatch_chunk(k)
        return self._finish_chunk(pending) if pending else []

    def run(self, n_frames: Optional[int] = None,
            chunk: int = 1, drop_tail: bool = False) -> np.ndarray:
        """AUTO mode: run to the end (or n_frames); returns (T, 4) poses.

        ``chunk > 1`` scans that many frames per device dispatch and
        PIPELINES the telemetry fetch: chunk i's device->host transfer
        overlaps chunk i+1's on-device scan (dispatch is async), hiding
        the round-trip latency that dominates tunneled backends.
        ``drop_tail`` stops before an incomplete final chunk instead of
        single-stepping it (benchmarks: a tail would compile fresh
        single-step executables inside the timed region).
        """
        n = (len(self.track) - self.counter if n_frames is None
             else n_frames)
        # pipelining defers each chunk's host side effects until the next
        # chunk is already in flight — a watchdog recovery (or a backend
        # loop-closure) would then act one chunk late, on a state that
        # already consumed the following frames; likewise the host-gated
        # detection decision would read match telemetry up to TWO chunks
        # stale, so a mid-chunk map collapse could run starved for
        # 2*chunk frames (advisor r3). With stateful host observers or
        # host-gated detection, finish each chunk before dispatching the
        # next.
        pipelined = (self.watchdog is None and self.backend is None
                     and (not self.detect_host_gate
                          or self.detect_gate_margin is not None))
        if (pipelined and self.detect_host_gate
                and (self.detect_gate_margin or 0) < chunk
                and self.cfg.min_num <= self.cfg.max_new_per_frame):
            # margin below the per-chunk staleness AND a min_num small
            # enough that one starved stretch can drop the map below
            # redetection's reach (reference-default min_num=5 regime)
            import warnings

            warnings.warn(
                f"pipelined host-gated detection with margin "
                f"{self.detect_gate_margin} < chunk {chunk} at "
                f"min_num={self.cfg.min_num}: the stale gate can run "
                f"starved for up to 2*chunk frames with no cushion",
                stacklevel=2)
        if chunk > 1:
            done = 0          # frames with records materialized
            dispatched = 0    # frames consumed by the device
            pending = None
            while True:
                if not pipelined and pending is not None:
                    done += len(self._finish_chunk(pending))
                    pending = None
                nxt = (self._dispatch_chunk(chunk)
                       if n - dispatched >= chunk else None)
                if pending is not None:
                    done += len(self._finish_chunk(pending))
                pending = nxt
                if nxt is not None:
                    dispatched += nxt["k"]
                    continue
                # no dispatch: end of track, redirect boundary, or tail
                if dispatched < n and self.counter < len(self.track):
                    at_redirect = bool(self._redirect[self.counter])
                    if at_redirect or not drop_tail:
                        # single-step through redirects (then resume
                        # chunking) and through the odd tail
                        if self.step() is None:
                            break
                        done += 1
                        dispatched += 1
                        continue
                break
            return self.trajectory
        for _ in range(n):
            if self.step() is None:
                break
        return self.trajectory

    @property
    def trajectory(self) -> np.ndarray:
        return np.stack([r.pose for r in self.records]) if self.records \
            else np.zeros((0, 4))

    @property
    def trajectory_refined(self) -> np.ndarray:
        """Trajectory with backend (BA / pose-graph) keyframe corrections.

        Each frame's filter pose is re-anchored to the latest refined
        keyframe at or before it: the filter's relative motion since that
        keyframe is composed onto the keyframe's optimized pose — the
        engine analogue of the reference splicing loop corrections back
        into the live state (SLAM.cpp:948-1015). Frames before the first
        keyframe are returned unchanged."""
        traj = self.trajectory.copy()
        if self.backend is None or not self.backend.keyframes:
            return traj
        kfs = sorted(self.backend.keyframes, key=lambda f: f.frame)
        kf_frames = np.array([f.frame for f in kfs])
        for t, rec in enumerate(self.records):
            j = int(np.searchsorted(kf_frames, rec.frame, side="right")) - 1
            if j < 0:
                continue
            kf = kfs[j]
            # IMMUTABLE filter pose at keyframe time (pose0 is the BA
            # anchor and gets rebased by loop corrections — composing the
            # live filter pose against a rebased anchor double-applies
            # the correction)
            p0 = getattr(kf, "pose_filter", kf.pose0)
            pr = kf.pose                      # refined pose
            # relative SE(2) motion since the keyframe, in the kf frame
            c0, s0 = np.cos(p0[2]), np.sin(p0[2])
            d = rec.pose[[0, 1]] - p0[:2]
            rel = np.array([c0 * d[0] + s0 * d[1], -s0 * d[0] + c0 * d[1]])
            dth = rec.pose[3] - p0[2]
            cr, sr = np.cos(pr[2]), np.sin(pr[2])
            traj[t, 0] = pr[0] + cr * rel[0] - sr * rel[1]
            traj[t, 1] = pr[1] + sr * rel[0] + cr * rel[1]
            traj[t, 3] = pr[2] + dth
        return traj

    def ate(self, gt_xy: np.ndarray, refined: bool = False) -> float:
        """RMSE of estimated vs ground-truth (x, y) per processed frame.

        ``gt_xy`` is indexed by RAW frame id (the odometry file's image
        index), so frames dropped by the min-step filter are skipped
        consistently (SLAM.cpp:419-432)."""
        ids = [int(self.track.frame_id[r.frame]) for r in self.records]
        traj = self.trajectory_refined if refined else self.trajectory
        err = traj[:, :2] - gt_xy[ids]
        return float(np.sqrt((err ** 2).sum(axis=1).mean()))
