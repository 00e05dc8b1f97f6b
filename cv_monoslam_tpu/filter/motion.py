"""SRUKF time update (motion prediction) — JAX, batched over sigma points.

Reference semantics (SLAM.cpp:1343-1595):
  * odometry pair -> control (rot1, trans, rot2) with
    rot1 = atan2(dy, dx) - theta_prev, trans = |d|, rot2 = dtheta - rot1;
  * control sqrt-noise Mt = diag(a1 r1^2 + a2 t^2, a3 t^2 + a4 r1^2 + a4 r2^2,
    a1 r2^2 + a2 t^2) placed directly into the augmented sqrt block
    (SLAM.cpp:1456-1458 — the reference uses these variance-like values as
    sqrt entries; reproduced as-is);
  * augmented state [x; 3 control-noise; 2 measurement-noise] (Na = D + 5);
  * only the last-4 robot rows propagate: noise *subtracted* from the
    control, then x += t cos(theta + r1), y += t sin(theta + r1),
    theta += r1 + r2 (SLAM.cpp:1488-1530);
  * new S = QR of sqrt(wi)-scaled deviations from chi_0 (SLAM.cpp:1539-1555).

The propagated augmented sigma set is returned for reuse by the measurement
predict and update (the reference keeps m_sigma across phases).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ..config import SlamConfig
from ..ops import qr_r
from ..ops.linalg import chol_psd_flagged
from .sigma import deviations, generate_sigma, ut_weights
from .state import FilterState, PredictCache, count_repairs, replace


def odometry_control(odo_prev: jnp.ndarray, odo_cur: jnp.ndarray):
    """(x, y, theta) pair -> (rot1, trans, rot2) (SLAM.cpp:1446-1454)."""
    d = odo_cur[:2] - odo_prev[:2]
    rot1 = jnp.arctan2(d[1], d[0]) - odo_prev[2]
    trans = jnp.sqrt(d[0] ** 2 + d[1] ** 2)
    rot2 = odo_cur[2] - odo_prev[2] - rot1
    return rot1, trans, rot2


def structured_sqrt_gram(S: jnp.ndarray, sig_out: jnp.ndarray,
                         ridx: jnp.ndarray, w, na: int, *,
                         with_flag: bool = False):
    """Posterior sqrt factor via a structured Gram — no (2Na x D) QR.

    For any UT whose output differs from the prior state only in the rows
    ``ridx`` (motion predict touches {x, y, theta}, SLAM.cpp:1518-1524;
    feature integration touches the 6*K new-slot rows, SLAM.cpp:1177-1250),
    the deviation matrix W = wi_sr*(chi_i - chi_0)^T keeps the exact
    sigma-offset structure +-gamma*S rows in every OTHER column. Writing
    c = wi_sr, g = gamma and E+/E- for the propagated ridx-column deviations
    of the +/- sigma branches (the augmented noise rows k >= D have zero
    entries in the untouched columns):

        G[F,F] = 2 (c g)^2 (S^T S)[F,F]         one D x D Gram (MXU)
        G[F,R] = c^2 g  S[:,F]^T (E+ - E-)[:D]   thin (D x |R|)
        G[R,R] = c^2 (E+^T E+ + E-^T E-)         |R| x |R|

    and S' = chol(G) (equilibrated, PD-repaired). Replaces the
    O(Na * D^2) Householder QR with one Gram at identical UT semantics —
    accuracy equals single-pass CholeskyQR on the deviations.
    """
    base = sig_out[ridx, :1]                                   # (|R|, 1)
    Ep = (sig_out[ridx, 1:na + 1] - base).T                    # (Na, |R|)
    Em = (sig_out[ridx, na + 1:] - base).T                     # (Na, |R|)
    return structured_sqrt_gram_rows(S, Ep, Em, ridx, w,
                                     with_flag=with_flag)


def structured_gram_rows(S: jnp.ndarray, Ep: jnp.ndarray,
                         Em: jnp.ndarray, ridx: jnp.ndarray, w):
    """Posterior covariance GRAM (no factorization) from the touched-row
    deviations: Ep/Em (Na_aug, |R|) are (chi_i - chi_0) for the +/- sigma
    branches restricted to rows ``ridx``. The implicit pipeline keeps the
    Gram and defers the Cholesky to the update stage."""
    dtype = S.dtype
    D = S.shape[0]
    hp = jax.lax.Precision.HIGHEST      # covariance path: full f32 dots
    c2g2 = 2.0 * (w.wi_sr * w.gamma) ** 2
    G = c2g2 * jax.lax.dot_general(
        S, S, dimension_numbers=(((0,), (0,)), ((), ())),
        preferred_element_type=dtype, precision=hp)            # (D, D)

    cross = (w.wi_sr ** 2 * w.gamma) * jnp.matmul(
        S.T, (Ep[:D] - Em[:D]), precision=hp)
    grr = (w.wi_sr ** 2) * (jnp.matmul(Ep.T, Ep, precision=hp)
                            + jnp.matmul(Em.T, Em, precision=hp))

    G = G.at[:, ridx].set(cross)
    G = G.at[ridx, :].set(cross.T)
    G = G.at[ridx[:, None], ridx[None, :]].set(grr)
    return G


def equilibrated_chol(G: jnp.ndarray, jitter: float = 1e-6):
    """Upper sqrt of a covariance Gram via diag-equilibrated, PD-repaired
    Cholesky (cf ops.linalg.cholqr). Returns (R, repair_level)."""
    d = jnp.sqrt(jnp.maximum(jnp.diag(G), 0.0))
    d = jnp.where(d > 0, d, 1.0)
    r, rep = chol_psd_flagged(G / (d[:, None] * d[None, :]), jitter)
    return r * d[None, :], rep


def structured_sqrt_gram_rows(S: jnp.ndarray, Ep: jnp.ndarray,
                              Em: jnp.ndarray, ridx: jnp.ndarray, w, *,
                              with_flag: bool = False):
    """Core of :func:`structured_sqrt_gram` taking the propagated-row
    deviations directly (see :func:`structured_gram_rows`)."""
    G = structured_gram_rows(S, Ep, Em, ridx, w)
    R, rep = equilibrated_chol(G)
    return (R, rep) if with_flag else R


def _motion_sqrt_gram(S: jnp.ndarray, sig: jnp.ndarray, w, D: int,
                      na: int):
    return structured_sqrt_gram(S, sig[:D], jnp.array([D - 4, D - 3, D - 1]),
                                w, na, with_flag=True)


def motion_predict_implicit(state: FilterState, odo_prev: jnp.ndarray,
                            odo_cur: jnp.ndarray, cfg: SlamConfig):
    """Time update without materializing the sigma tensor.

    The motion model touches exactly three state rows {x, y, theta}
    (SLAM.cpp:1518-1524), and the sigma rule chi_i = mu +- gamma*S_row_i
    means every sigma point's value at state row j is mu_j +- gamma*S[i,j]
    — i.e. the (2Na+1)-vector of row-j values is read straight off COLUMN
    j of S. Propagating only those row-vectors (plus the three control-
    noise rows) reproduces the full UT's robot-row outputs exactly:
    the posterior mean of every untouched row is provably mu_j (the +-
    branches cancel at equal weights), and the sqrt factor comes from the
    same structured Gram the full path uses. At M=512 this removes a
    76 MB (Na, 2Na+1) materialization per frame.
    """
    dtype = state.x.dtype
    D = cfg.state_dim
    na = D + 5
    ns = 2 * na + 1
    w = ut_weights(na, cfg)

    rot1, trans, rot2 = odometry_control(odo_prev, odo_cur)
    mt = jnp.stack([
        cfg.a1 * rot1 ** 2 + cfg.a2 * trans ** 2,
        cfg.a3 * trans ** 2 + cfg.a4 * rot1 ** 2 + cfg.a4 * rot2 ** 2,
        cfg.a1 * rot2 ** 2 + cfg.a2 * trans ** 2,
    ]).astype(dtype)
    mt = jnp.minimum(mt, cfg.motion_noise_cap)

    g = jnp.asarray(w.gamma, dtype)

    def state_row(j):
        """(2Na+1,) values of state row j across the sigma set."""
        col = jnp.concatenate([state.S[:, j], jnp.zeros(5, dtype)])
        return jnp.concatenate([state.x[j][None],
                                state.x[j] + g * col,
                                state.x[j] - g * col])

    def noise_row(k):
        """(2Na+1,) values of control-noise row k (diag sqrt mt)."""
        r = jnp.zeros(ns, dtype)
        r = r.at[1 + D + k].set(g * mt[k])
        return r.at[1 + na + D + k].set(-g * mt[k])

    x_row = state_row(D - 4)
    y_row = state_row(D - 3)
    th_row = state_row(D - 1)
    r1 = rot1 - noise_row(0)
    tr = trans - noise_row(1)
    r2 = rot2 - noise_row(2)
    x_row = x_row + tr * jnp.cos(th_row + r1)
    y_row = y_row + tr * jnp.sin(th_row + r1)
    th_out = th_row + r1 + r2

    mw = w.mean_weights(dtype)
    x_new = jnp.asarray(state.x)
    x_new = x_new.at[D - 4].set(x_row @ mw)
    x_new = x_new.at[D - 3].set(y_row @ mw)
    x_new = x_new.at[D - 1].set(th_out @ mw)

    R = jnp.stack([x_row, y_row, th_out])                  # (3, 2Na+1)
    base = R[:, :1]
    Ep = (R[:, 1:na + 1] - base).T                         # (Na, 3)
    Em = (R[:, na + 1:] - base).T
    ridx = jnp.array([D - 4, D - 3, D - 1])
    # ONE-CHOL PIPELINE: the predicted covariance stays a Gram; the
    # measurement reads subspace blocks of it and the update factorizes
    # (G - W^T W) directly — state.S is STALE until the update refreshes
    # it (no stage in between reads S; data_association uses lm/pose
    # fields only)
    g_pred = structured_gram_rows(state.S, Ep, Em, ridx, w)

    new_state = replace(state, x=x_new)
    cache = PredictCache(
        sigma=None, sigma_pix=None,
        pred=jnp.zeros((cfg.max_landmarks, 2), dtype),
        g_pred=g_pred,
    )
    return new_state, cache


def motion_predict(state: FilterState, odo_prev: jnp.ndarray,
                   odo_cur: jnp.ndarray, cfg: SlamConfig):
    """One SRUKF time update. Returns (new_state, PredictCache)."""
    if cfg.sigma_mode == "implicit":
        return motion_predict_implicit(state, odo_prev, odo_cur, cfg)
    dtype = state.x.dtype
    D = cfg.state_dim
    na = D + 5
    w = ut_weights(na, cfg)

    rot1, trans, rot2 = odometry_control(odo_prev, odo_cur)
    mt = jnp.stack([
        cfg.a1 * rot1 ** 2 + cfg.a2 * trans ** 2,
        cfg.a3 * trans ** 2 + cfg.a4 * rot1 ** 2 + cfg.a4 * rot2 ** 2,
        cfg.a1 * rot2 ** 2 + cfg.a2 * trans ** 2,
    ]).astype(dtype)
    mt = jnp.minimum(mt, cfg.motion_noise_cap)

    # augmented mean + sqrt (expandMatrix, SLAM.cpp:1461-1462).
    # The reference also augments 2 shared measurement-noise dims (Qt,
    # SLAM.cpp:1462); shared noise makes every landmark's pixel-deviation
    # column correlated, which degenerates the joint update (and is
    # statistically wrong — pixel noise is independent per landmark), so
    # the noise dims are kept at zero here and independent noise enters the
    # innovation Gram (measurement.py) and the update QR (update.py).
    mu = jnp.concatenate([state.x, jnp.zeros(5, dtype)])
    sr = jnp.zeros((na, na), dtype)
    sr = sr.at[:D, :D].set(state.S)
    sr = sr.at[jnp.arange(D, D + 3), jnp.arange(D, D + 3)].set(mt)

    sig = generate_sigma(mu, sr, w.gamma)

    # propagate robot rows (noise subtracted from control, SLAM.cpp:1497-1524)
    r1 = rot1 - sig[D + 0]
    tr = trans - sig[D + 1]
    r2 = rot2 - sig[D + 2]
    theta = sig[D - 1]
    sig = sig.at[D - 4].add(tr * jnp.cos(theta + r1))
    sig = sig.at[D - 3].add(tr * jnp.sin(theta + r1))
    sig = sig.at[D - 1].add(r1 + r2)

    x_new = sig[:D] @ w.mean_weights(dtype)
    rep = jnp.int32(0)
    if cfg.qr_mode == "gram":
        S_new, rep = _motion_sqrt_gram(state.S, sig, w, D, na)
    else:
        S_new = qr_r(deviations(sig[:D], w.wi_sr), cfg.qr_mode)

    new_state = count_repairs(replace(state, x=x_new, S=S_new), rep)
    cache = PredictCache(
        sigma=sig,
        sigma_pix=jnp.zeros((cfg.max_landmarks, 2, sig.shape[1]), dtype),
        pred=jnp.zeros((cfg.max_landmarks, 2), dtype),
    )
    return new_state, cache
