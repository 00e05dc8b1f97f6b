"""Failure detection + recovery (SURVEY.md §5).

The reference "handles" divergence with landmark deletion rules and a
forced-PD refactorization, and data errors with ``system("pause")``
(SLAM.cpp:297-299, 2197-2327, 2443-2459). This watchdog gives the engine a
real failure-detection subsystem:

  * :func:`health_check` — one jit-able pass over the filter state: NaN/Inf
    anywhere, sqrt-factor diagonal collapse or blow-up, pose runaway. The
    checks compile into the step (no host sync until the scalar is read).
  * :class:`Watchdog` — host-side policy: on failure, either restore the
    last good checkpoint or re-initialize the filter the way the
    reference's redirection reset does (SLAM.cpp:1395-1419), preserving the
    stored-feature table so the map survives the reset.
"""

from __future__ import annotations

import dataclasses
from typing import Callable, Optional

import jax.numpy as jnp
import numpy as np

from ..config import SlamConfig
from ..filter.state import FilterState


@dataclasses.dataclass
class HealthReport:
    ok: bool
    finite: bool
    s_diag_ok: bool
    pose_ok: bool

    @classmethod
    def from_flags(cls, flags: np.ndarray) -> "HealthReport":
        finite, s_ok, pose_ok = (bool(x) for x in np.asarray(flags))
        return cls(ok=finite and s_ok and pose_ok, finite=finite,
                   s_diag_ok=s_ok, pose_ok=pose_ok)


def health_check(state: FilterState, cfg: SlamConfig,
                 pose_limit: float = 1e3,
                 s_diag_max: float = 1e4) -> jnp.ndarray:
    """Returns bool[3] = (all finite, S diag sane, pose bounded)."""
    finite = (jnp.all(jnp.isfinite(state.x))
              & jnp.all(jnp.isfinite(state.S)))
    d = jnp.abs(jnp.diag(state.S))
    s_ok = jnp.all(d < s_diag_max) & jnp.all(jnp.max(d) > 0)
    pose_ok = jnp.all(jnp.abs(state.x[-4:-1]) < pose_limit)
    return jnp.stack([finite, s_ok, pose_ok])


class Watchdog:
    """Host-side failure policy with hysteresis.

    check_every: frames between health checks (each costs one device->host
    scalar read). on_failure: "reset" re-initializes robot-only state with
    the stored table preserved (redirection-reset semantics); a checkpoint
    restore callback may be supplied instead.
    """

    def __init__(self, cfg: SlamConfig, check_every: int = 10,
                 restore_fn: Optional[Callable[[], FilterState]] = None):
        self.cfg = cfg
        self.check_every = check_every
        self.restore_fn = restore_fn
        self.n_checks = 0
        self.n_failures = 0
        self.last_report: Optional[HealthReport] = None

    def should_check(self, frame: int) -> bool:
        return frame % self.check_every == 0

    def check(self, state: FilterState) -> HealthReport:
        return self.check_flags(np.asarray(health_check(state, self.cfg)))

    def check_flags(self, flags: np.ndarray) -> HealthReport:
        """Record a report from flags already computed in the jitted step
        (the ``health`` telemetry field) — no extra device work."""
        self.n_checks += 1
        report = HealthReport.from_flags(flags)
        self.last_report = report
        if not report.ok:
            self.n_failures += 1
        return report

    def recover(self, state: FilterState,
                theta_odo: float) -> FilterState:
        """Restore from checkpoint if available, else a hard reset:
        fresh robot-only state (redirection-reset semantics,
        SLAM.cpp:1395-1419) carrying over only the *finite* stored-feature
        records — unlike redirect_reset, the diverged landmarks are NOT
        snapshotted, so the poison doesn't survive the reset."""
        if self.restore_fn is not None:
            return self.restore_fn()
        from ..filter.state import init_state, replace

        fresh = init_state(self.cfg, theta0=float(theta_odo))
        sd = state.stored
        finite = (np.isfinite(np.asarray(sd.state)).all(axis=1)
                  & np.isfinite(np.asarray(sd.sr)).all(axis=(1, 2)))
        keep = jnp.asarray(finite) & sd.valid
        import dataclasses as _dc

        stored = _dc.replace(sd, valid=keep)
        return replace(fresh, stored=stored, next_id=state.next_id,
                       frame=state.frame)
