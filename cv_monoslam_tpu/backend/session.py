"""Keyframe manager: filter -> sliding-window BA -> pose graph.

Host-side bookkeeping (association by landmark ID, window assembly) around
the jitted solvers in :mod:`ba` and :mod:`pose_graph`. The reference has no
analogue — its redirection snapshot (SLAM.cpp:1354-1428) is the semantic
seed of the keyframe here (a frame where the map is snapshotted), but the
optimization is new capability per BASELINE config 4.
"""

from __future__ import annotations

import dataclasses
from typing import List, Optional

import jax.numpy as jnp
import numpy as np

from ..config import SlamConfig
from ..filter.state import FilterState
from .ba import BAProblem, ba_solve, reprojection_rmse
from .pose_graph import PoseGraph, pose_graph_solve


@dataclasses.dataclass
class Keyframe:
    frame: int
    pose: np.ndarray          # (3,) x, y, theta — refined in place by BA
    odo: np.ndarray           # (3,) odometry x, y, theta at this frame
    lids: np.ndarray          # (K,) matched landmark ids
    pixels: np.ndarray        # (K, 2) matched pixel observations
    xyz: np.ndarray           # (K, 3) landmark world estimates
    pose0: Optional[np.ndarray] = None  # original filter estimate

    def __post_init__(self):
        if self.pose0 is None:
            self.pose0 = np.asarray(self.pose, dtype=np.float64).copy()


def make_keyframe(frame: int, pose4: np.ndarray, odo: np.ndarray,
                  lid: np.ndarray, matched: np.ndarray,
                  match_px: np.ndarray, xyz: np.ndarray) -> Keyframe:
    """Build a keyframe from raw per-frame arrays (the ``lm_*`` telemetry
    fields of ``slam_step`` outputs, or a live FilterState)."""
    sel = np.flatnonzero(np.asarray(matched))
    pose = np.asarray(pose4)
    return Keyframe(
        frame=frame,
        pose=np.array([pose[0], pose[1], pose[3]]),
        odo=np.asarray(odo, dtype=np.float64),
        lids=np.asarray(lid)[sel],
        pixels=np.asarray(match_px)[sel],
        xyz=np.asarray(xyz)[sel],
    )


def keyframe_from_state(frame: int, state: FilterState,
                        odo: np.ndarray) -> Keyframe:
    lm = state.lm
    return make_keyframe(frame, state.x[-4:], odo, lm.lid,
                         lm.matched & lm.active, lm.match_px, lm.xyz)


def _relpose_np(p0, p1):
    c, s = np.cos(p0[2]), np.sin(p0[2])
    d = p1[:2] - p0[:2]
    dth = np.arctan2(np.sin(p1[2] - p0[2]), np.cos(p1[2] - p0[2]))
    return np.array([c * d[0] + s * d[1], -s * d[0] + c * d[1], dth])


class BackendSession:
    """Collects keyframes; solves window BA and the global pose graph."""

    def __init__(self, cfg: SlamConfig, max_nodes: int = 64,
                 max_lms: int = 64, loop_min_shared: int = 3):
        self.cfg = cfg
        self.max_nodes = max_nodes
        self.max_lms = max_lms
        self.loop_min_shared = loop_min_shared
        self.keyframes: List[Keyframe] = []
        self.loop_edges: List[tuple] = []     # (i, j, rel, weight)

    # -- collection --------------------------------------------------------

    def maybe_add(self, frame: int, state: FilterState,
                  odo: np.ndarray) -> Optional[Keyframe]:
        if frame % self.cfg.keyframe_every != 0:
            return None
        return self._add(keyframe_from_state(frame, state, odo))

    def maybe_add_telemetry(self, frame: int, pose4, odo, lid, matched,
                            match_px, xyz) -> Optional[Keyframe]:
        """Keyframe from chunked-scan telemetry (no FilterState needed)."""
        if frame % self.cfg.keyframe_every != 0:
            return None
        return self._add(make_keyframe(frame, pose4, odo, lid, matched,
                                       match_px, xyz))

    def _add(self, kf: Keyframe) -> Optional[Keyframe]:
        if len(kf.lids) == 0:
            return None
        self._detect_loops(kf)
        self.keyframes.append(kf)
        if len(self.keyframes) > self.max_nodes:
            self.keyframes.pop(0)
            self.loop_edges = [(i - 1, j - 1, r, w)
                               for i, j, r, w in self.loop_edges
                               if i > 0 and j > 0]
        return kf

    def _detect_loops(self, kf: Keyframe) -> None:
        """Shared-landmark loop detection against non-adjacent keyframes —
        the graph generalization of the reference's re-identification
        re-add (SLAM.cpp:699-729, 948-1015)."""
        j = len(self.keyframes)
        for i, old in enumerate(self.keyframes[:-1]):
            # only keyframes outside the live BA window count as loops —
            # inside the window, co-observation is the norm, not a loop
            if j - i <= self.cfg.ba_window:
                continue
            shared = np.intersect1d(old.lids, kf.lids)
            if len(shared) >= self.loop_min_shared:
                rel = _relpose_np(old.pose, kf.pose)
                self.loop_edges.append((i, j, rel, 10.0))

    # -- solvers ------------------------------------------------------------

    def window_problem(self) -> Optional[BAProblem]:
        """Assemble the last ba_window keyframes into one static problem."""
        W = self.cfg.ba_window
        kfs = self.keyframes[-W:]
        if len(kfs) < 2:
            return None
        L = self.max_lms
        dtype = np.float64 if self.cfg.dtype == "float64" else np.float32

        # union of landmark ids (most-observed first)
        all_ids, counts = np.unique(
            np.concatenate([k.lids for k in kfs]), return_counts=True)
        order = np.argsort(-counts)
        ids = all_ids[order][:L]
        id_to_col = {int(l): c for c, l in enumerate(ids)}

        poses = np.zeros((W, 3), dtype)
        obs = np.zeros((W, L, 2), dtype)
        mask = np.zeros((W, L), bool)
        lms = np.zeros((L, 3), dtype)
        kf_mask = np.zeros(W, bool)
        odo_rel = np.zeros((W - 1, 3), dtype)
        for w, kf in enumerate(kfs):
            poses[w] = kf.pose
            kf_mask[w] = True
            for lid, px, xyz in zip(kf.lids, kf.pixels, kf.xyz):
                c = id_to_col.get(int(lid))
                if c is None:
                    continue
                obs[w, c] = px
                mask[w, c] = True
                lms[c] = xyz                 # latest estimate wins
            if w > 0:
                odo_rel[w - 1] = _relpose_np(kfs[w - 1].odo, kfs[w].odo)
        lm_mask = mask.any(axis=0) & (np.asarray(
            [np.count_nonzero(mask[:, c]) for c in range(L)]) >= 2)
        return BAProblem(
            poses=jnp.asarray(poses), landmarks=jnp.asarray(lms),
            obs=jnp.asarray(obs), obs_mask=jnp.asarray(mask),
            odo_rel=jnp.asarray(odo_rel), kf_mask=jnp.asarray(kf_mask),
            lm_mask=jnp.asarray(lm_mask))

    def refine_window(self):
        """Run BA on the current window. Returns dict or None."""
        prob = self.window_problem()
        if prob is None:
            return None
        before = float(reprojection_rmse(prob.poses, prob.landmarks, prob,
                                         self.cfg))
        poses, lms, costs = ba_solve(prob, self.cfg)
        after = float(reprojection_rmse(poses, lms, prob, self.cfg))
        kfs = self.keyframes[-self.cfg.ba_window:]
        for w, kf in enumerate(kfs):
            kf.pose = np.asarray(poses[w])
        return dict(poses=np.asarray(poses), landmarks=np.asarray(lms),
                    rmse_before=before, rmse_after=after,
                    costs=np.asarray(costs),
                    frames=[k.frame for k in kfs])

    def graph(self) -> Optional[PoseGraph]:
        n = len(self.keyframes)
        if n < 2:
            return None
        N = self.max_nodes
        dtype = np.float64 if self.cfg.dtype == "float64" else np.float32
        nodes = np.zeros((N, 3), dtype)
        node_mask = np.zeros(N, bool)
        for i, kf in enumerate(self.keyframes):
            nodes[i] = kf.pose
            node_mask[i] = True
        E = N + len(self.loop_edges)
        eij = np.zeros((E, 2), np.int32)
        erel = np.zeros((E, 3), dtype)
        ew = np.zeros((E, 3), dtype)
        emask = np.zeros(E, bool)
        k = 0
        for i in range(n - 1):
            eij[k] = (i, i + 1)
            erel[k] = _relpose_np(self.keyframes[i].odo,
                                  self.keyframes[i + 1].odo)
            ew[k] = (1.0 / 0.02 ** 2, 1.0 / 0.02 ** 2, 1.0 / 0.01 ** 2)
            emask[k] = True
            k += 1
        for (i, j, rel, w) in self.loop_edges:
            if k >= E or j >= n:
                break
            eij[k] = (i, j)
            erel[k] = rel
            ew[k] = (w / 0.02 ** 2, w / 0.02 ** 2, w / 0.01 ** 2)
            emask[k] = True
            k += 1
        return PoseGraph(
            nodes=jnp.asarray(nodes), edges_ij=jnp.asarray(eij),
            edges_rel=jnp.asarray(erel), edges_w=jnp.asarray(ew),
            edge_mask=jnp.asarray(emask), node_mask=jnp.asarray(node_mask))

    def optimize_graph(self, iters: int = 10):
        g = self.graph()
        if g is None:
            return None
        nodes, costs = pose_graph_solve(g, iters=iters)
        nodes = np.asarray(nodes)
        for i, kf in enumerate(self.keyframes):
            kf.pose = nodes[i]
        return dict(nodes=nodes[: len(self.keyframes)],
                    costs=np.asarray(costs),
                    n_loop_edges=len(self.loop_edges))
