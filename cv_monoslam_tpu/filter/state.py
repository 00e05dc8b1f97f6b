"""Fixed-capacity SoA filter state (JAX pytrees).

The reference grows/shrinks its state vector and sqrt covariance on every
feature add/delete and keeps a parallel linked list of landmark records
(SLAM.h:47-70, 271-273; SLAM.cpp:1260-1334, 2637-2706). On TPU every shape
must be static under jit, so this engine allocates ``max_landmarks`` slots up
front:

  * state vector ``x``: (D,) with D = 6*M + 4, slot i at rows [6i, 6i+6),
    robot pose in the LAST four rows — the reference's layout (SLAM.h:271);
  * sqrt covariance ``S``: (D, D) upper triangular, P = S^T S;
  * per-slot landmark table as struct-of-arrays.

Invariant: an *inactive* slot i has x[6i:6i+6] = (0,0,0,0,0,1) (harmless
defaults, rho=1 avoids division hazards) and S rows/cols equal to the unit
diagonal, decoupled from every active row. All lifecycle events are masked
writes + rank-structured QR updates that preserve this invariant, so adds
and deletes never reshape anything.
"""

from __future__ import annotations

import dataclasses
from typing import Any

import jax
import jax.numpy as jnp

from ..config import SlamConfig


def _dc(cls):
    """Register a frozen dataclass as a JAX pytree (all fields are leaves)."""
    cls = dataclasses.dataclass(frozen=True)(cls)
    fields = [f.name for f in dataclasses.fields(cls)]
    jax.tree_util.register_dataclass(cls, data_fields=fields, meta_fields=[])
    return cls


@_dc
class LandmarkTable:
    """Per-slot landmark records (reference PointsMap, SLAM.h:47-70)."""

    active: jnp.ndarray       # (M,) bool
    lid: jnp.ndarray          # (M,) int32 landmark IDs (0 = none)
    is_loop: jnp.ndarray      # (M,) bool
    n_predict: jnp.ndarray    # (M,) int32
    n_match: jnp.ndarray      # (M,) int32
    visible: jnp.ndarray      # (M,) bool
    matched: jnp.ndarray      # (M,) bool
    pred: jnp.ndarray         # (M, 2) predicted pixel (u, v)
    match_px: jnp.ndarray     # (M, 2) matched pixel
    si: jnp.ndarray           # (M, 2, 2) sqrt innovation
    init_pixel: jnp.ndarray   # (M, 2)
    init_trans: jnp.ndarray   # (M, 3) camera position at init
    init_theta: jnp.ndarray   # (M,) camera yaw at init
    init_patch: jnp.ndarray   # (M, P, P) float32, P = 2*hp_init + 1
    match_patch: jnp.ndarray  # (M, Q, Q) float32, Q = 2*hp_match + 1 —
    #                           last warped template (display/debug,
    #                           reference PointsMap match patch SLAM.h:47-70)
    xyz: jnp.ndarray          # (M, 3) Cartesian estimate


@_dc
class StoredTable:
    """Snapshots for redirection / loop reuse (FeatureInfo, SLAM.h:73-99).

    ``stamp``/``seq`` implement true oldest-first eviction when the table is
    full: every insert takes the monotone counter ``seq`` as its stamp, and
    a full table evicts the minimum-stamp slot (the reference's list grows
    without bound, SLAM.cpp:1359-1378; a fixed-capacity table needs a
    policy)."""

    valid: jnp.ndarray        # (K,) bool
    stamp: jnp.ndarray        # (K,) int32 insertion order stamp
    seq: jnp.ndarray          # () int32 monotone insert counter
    lid: jnp.ndarray          # (K,) int32
    is_loop: jnp.ndarray      # (K,) bool
    n_predict: jnp.ndarray    # (K,) int32
    n_match: jnp.ndarray      # (K,) int32
    state: jnp.ndarray        # (K, 6)
    sr: jnp.ndarray           # (K, 6, 6)
    init_pixel: jnp.ndarray   # (K, 2)
    init_trans: jnp.ndarray   # (K, 3)
    init_theta: jnp.ndarray   # (K,)
    init_patch: jnp.ndarray   # (K, P, P) float32
    xyz: jnp.ndarray          # (K, 3)


@_dc
class FilterState:
    """Complete SRUKF state: one pytree, all static shapes."""

    x: jnp.ndarray            # (D,)
    S: jnp.ndarray            # (D, D)
    lm: LandmarkTable
    stored: StoredTable
    next_id: jnp.ndarray      # () int32
    frame: jnp.ndarray        # () int32 — m_frame.counter
    #: () int32 — cumulative MINOR covariance repairs: Cholesky needed the
    #: first-rung jitter floor (routine — near-singular directions occur
    #: in normal operation; cf the reference's GMW which regularizes
    #: every recomposition, SLAM.cpp:2197-2327)
    n_repairs: jnp.ndarray
    #: () int32 — cumulative ESCALATED repairs: the 1e3x/1e6x jitter
    #: rungs, i.e. a partial covariance reset. Zero on any healthy run;
    #: nonzero means the filter is surviving on resets and the run's
    #: estimates are suspect.
    n_escalations: jnp.ndarray
    #: () int32 — cumulative skipped measurement updates (unrepairably
    #: indefinite posterior; the frame degrades to prediction-only)
    n_skipped: jnp.ndarray


@_dc
class PredictCache:
    """Propagated sigma points reused across motion -> measurement -> update
    (the reference keeps m_sigma / m_sigma_allPixel / m_allPredictSet across
    phases, SLAM.cpp:1463, 1615-1691, 2020-2038).

    Under ``sigma_mode="implicit"`` the full tensors are never built:
    ``sigma``/``sigma_pix`` are None and ``h_lin`` carries the UT-implied
    per-landmark measurement linearization instead."""

    sigma: Any                # (Na, 2Na+1) augmented, motion-propagated
    sigma_pix: Any            # (M, 2, 2Na+1) projected pixels per slot
    pred: jnp.ndarray         # (M, 2) weighted-mean pixels
    #: (M, 2, 10) implied measurement Jacobian w.r.t. the landmark's
    #: 10-dim dependency subspace [feat6, robot4] (implicit mode only)
    h_lin: Any = None
    #: (D, D) motion-PREDICTED covariance Gram (implicit mode only). The
    #: motion stage computes the structured Gram but defers the D x D
    #: Cholesky: the measurement reads its subspace blocks directly and
    #: the update factorizes (G - W^T W) — ONE sqrt refactorization per
    #: frame instead of two, at identical posterior math (the two-chol
    #: path factorizes G and then re-grams the factor).
    g_pred: Any = None


def inactive_feature_defaults(dtype) -> jnp.ndarray:
    return jnp.array([0.0, 0.0, 0.0, 0.0, 0.0, 1.0], dtype=dtype)


def init_state(cfg: SlamConfig, theta0: float = 0.0,
               max_stored: int = 64) -> FilterState:
    """Fresh 'robot only' state (initializeParameters, SLAM.cpp:226-246).

    Built entirely in NumPy: on backends where every eager op triggers a
    device compile (e.g. tunneled TPU), constructing the state with jnp ops
    costs minutes. NumPy leaves convert at the first jit boundary.
    """
    import numpy as np

    dtype = np.dtype(cfg.dtype)
    M = cfg.max_landmarks
    D = cfg.state_dim
    P = 2 * cfg.hp_init + 1
    K = max_stored

    x = np.tile(np.array([0, 0, 0, 0, 0, 1], dtype), M)
    x = np.concatenate([x, np.zeros(4, dtype)])
    x[-1] = theta0
    s_diag = np.ones(D, dtype)
    s_diag[-4:] = [cfg.sigma_x, cfg.sigma_y, cfg.sigma_z, cfg.sigma_theta]
    S = np.diag(s_diag)

    lm = LandmarkTable(
        active=np.zeros(M, bool),
        lid=np.zeros(M, np.int32),
        is_loop=np.zeros(M, bool),
        n_predict=np.zeros(M, np.int32),
        n_match=np.zeros(M, np.int32),
        visible=np.zeros(M, bool),
        matched=np.zeros(M, bool),
        pred=np.zeros((M, 2), dtype),
        match_px=np.zeros((M, 2), dtype),
        si=np.tile(np.eye(2, dtype=dtype), (M, 1, 1)),
        init_pixel=np.zeros((M, 2), dtype),
        init_trans=np.zeros((M, 3), dtype),
        init_theta=np.zeros(M, dtype),
        init_patch=np.zeros((M, P, P), np.float32),
        match_patch=np.zeros((M, 2 * cfg.hp_match + 1,
                              2 * cfg.hp_match + 1), np.float32),
        xyz=np.zeros((M, 3), dtype),
    )
    stored = StoredTable(
        valid=np.zeros(K, bool),
        stamp=np.zeros(K, np.int32),
        seq=np.int32(0),
        lid=np.zeros(K, np.int32),
        is_loop=np.zeros(K, bool),
        n_predict=np.zeros(K, np.int32),
        n_match=np.zeros(K, np.int32),
        state=np.zeros((K, 6), dtype),
        sr=np.zeros((K, 6, 6), dtype),
        init_pixel=np.zeros((K, 2), dtype),
        init_trans=np.zeros((K, 3), dtype),
        init_theta=np.zeros(K, dtype),
        init_patch=np.zeros((K, P, P), np.float32),
        xyz=np.zeros((K, 3), dtype),
    )
    return FilterState(
        x=x, S=S, lm=lm, stored=stored,
        next_id=np.int32(1),
        frame=np.int32(1),
        n_repairs=np.int32(0),
        n_escalations=np.int32(0),
        n_skipped=np.int32(0),
    )


def robot_pose(state: FilterState) -> jnp.ndarray:
    """(x, y, z, theta) — the last four state rows (SLAM.cpp:1184)."""
    return state.x[-4:]


def feature_states(state: FilterState, M: int) -> jnp.ndarray:
    """(M, 6) view of the landmark blocks."""
    return state.x[: 6 * M].reshape(M, 6)


def replace(obj: Any, **kw) -> Any:
    return dataclasses.replace(obj, **kw)


def count_repairs(state: FilterState, *levels) -> FilterState:
    """Fold chol_psd_flagged repair levels into the state's counters:
    levels 1-3 -> n_repairs (floors up to 1e-3 * jitter-scale — benign
    regularization), level 4 -> n_escalations (the 1e6x rung: a partial
    covariance reset)."""
    minor = jnp.int32(0)
    major = jnp.int32(0)
    for lv in levels:
        minor = minor + ((lv >= 1) & (lv <= 3)).astype(jnp.int32)
        major = major + (lv >= 4).astype(jnp.int32)
    return replace(state, n_repairs=state.n_repairs + minor,
                   n_escalations=state.n_escalations + major)
