"""Benchmark suite: engine performance on the current JAX backend vs the
serial NumPy oracle baseline (BASELINE.md: the reference publishes no
numbers, so the baseline is the oracle transcription of its serial math on
this host), covering the BASELINE.json configs:

  1. standard engine (M=32, MXU fast paths) — frames/s + ATE, the primary
     metric vs the oracle's frames/s;
  3. large-state SRUKF — M=512 capacity (state dim 3076), frames/s + ATE
     + peak map occupancy;
  4. sliding-window BA — ATE with backend refinement vs filter-only on
     noisy odometry;
  2. vision-kernel microbench — fused Pallas NCC vs the XLA grouped-conv
     path.

Prints ONE JSON line {"metric", "value", "unit", "vs_baseline"}; the
extended results are folded into "unit" and written to BENCH_DETAILS.json.
Each extended section is time-guarded so a slow/flaky device tunnel can't
starve the primary metric.
"""

import json
import os
import sys
import time

# The environment pre-imports jax via sitecustomize, so env vars set here
# are too late — configure the persistent compile cache through the config
# API (verified: env-var-only setting silently does nothing in this image).
import jax  # noqa: E402

jax.config.update("jax_compilation_cache_dir",
                  os.path.join(os.path.dirname(__file__), ".cache", "jax"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
os.makedirs(jax.config.jax_compilation_cache_dir, exist_ok=True)
sys.path.insert(0, os.path.join(os.path.dirname(__file__), "scripts"))

import numpy as np

BUDGET = float(os.environ.get("CVMS_BENCH_BUDGET", 3000))
T0 = time.time()


def remaining():
    return BUDGET - (time.time() - T0)


def bench_primary():
    """Config 1: M=32 engine vs oracle, frames/s + ATE.

    Input: the FROZEN committed fixture (io/fixtures.py) — the r1-r4
    benches re-rendered each round and the headline swung -18% on
    identical code when a renderer delta re-rolled the GFTT knife edge
    (VERDICT r4 missing #1); from r5 the input bytes are pinned in git."""
    from cv_monoslam_tpu.config import SlamConfig
    from cv_monoslam_tpu.api import SlamSession
    from cv_monoslam_tpu.io import fixtures
    from cv_monoslam_tpu.models.oracle import OracleSLAM

    chunk = 32
    seq, track, gt_xy, gt_th = fixtures.load("bench1_arc")

    cfg = SlamConfig(max_landmarks=32, max_new_per_frame=8,
                     max_detections=48)
    sess = SlamSession(cfg, seq, track)
    sess.step_chunk(chunk)                      # warmup: compile the scan
    t0 = time.perf_counter()
    n0 = len(sess.records)
    # pipelined full chunks only (drop_tail: an odd-length tail would
    # compile fresh executables inside the timed region)
    sess.run(chunk=chunk, drop_tail=True)
    n = len(sess.records) - n0
    engine_dt = (time.perf_counter() - t0) / max(n, 1)
    ate = sess.ate(gt_xy)
    # fixed-length ATE (VERDICT r2 item 9): same 64 leading frames every
    # round, so the number is comparable across rounds (r2's 0.0512 m was
    # over a different span than r1's 0.0294 m)
    ids64 = [int(track.frame_id[r.frame]) for r in sess.records[:64]]
    err64 = sess.trajectory[:64, :2] - gt_xy[ids64]
    ate64 = float(np.sqrt((err64 ** 2).sum(axis=1).mean()))

    # oracle baseline: serial NumPy math, same sequence prefix
    ocfg = SlamConfig(max_landmarks=32, dtype="float64")
    oracle = OracleSLAM(ocfg, seq, track)
    t0 = time.perf_counter()
    k = 0
    for _ in range(6):
        if oracle.counter >= len(track):
            break
        oracle.step()
        k += 1
    oracle_dt = (time.perf_counter() - t0) / max(k, 1)
    return dict(fps=1.0 / engine_dt, ate_m=float(ate), ate64_m=ate64,
                frames=n, oracle_fps=1.0 / oracle_dt,
                vs_baseline=engine_dt and (1.0 / engine_dt) * oracle_dt)


def bench_parity():
    """Engine-vs-oracle ATE (the BASELINE metric) — CPU subprocess: the
    oracle is NumPy and the f64 engine mode is not a TPU dtype."""
    import subprocess

    env = dict(os.environ, JAX_PLATFORMS="cpu", PALLAS_AXON_POOL_IPS="")
    out = subprocess.run(
        [sys.executable,
         os.path.join(os.path.dirname(__file__), "scripts",
                      "parity_bench.py")],
        capture_output=True, text=True, timeout=1200, env=env)
    if out.returncode != 0:
        return {"error": (out.stderr or out.stdout)[-300:]}
    return json.loads(out.stdout.strip().splitlines()[-1])


def bench_large():
    """Config 3: 500+ tracked-landmark SRUKF (D=3460).

    "500+ landmark SRUKF" means landmarks TRACKED, not slots allocated
    (VERDICT r3 item 3 / r4 item 3): the 0.06 m grid fixture supplies
    >500 GFTT-keepable corners, M=576 slots hold them (D=3460), and the
    768 raw cap lets new candidates through past the ~540 already-claimed
    top responses. min_num=480 is the measured optimum (500 causes
    gate-bounce refill churn: 29.4 f/s peak 576 vs 32.3 f/s peak 539 —
    both >=500; the 480 config ships for the fps margin)."""
    from bench_large import run_large

    return run_large(landmarks=576, frames=64, chunk=8, quiet=True,
                     fixture="bench3_grid",
                     min_step_xy=0.005, min_num=480, max_detections=768,
                     n_initial_raws=768, n_process_raws=768,
                     oracle_budget_s=40.0)


def bench_backend():
    """Config 4: backend-refined vs filter-only ATE in a drift regime.

    1.25 laps of a circle whose diameter exceeds the camera's ceiling
    footprint: mid-run views are disjoint from the start, heading noise
    accumulates ~1 m of drift, and the final quarter-lap revisits the
    first. Loop closure (drift-invariant constellation alignment over
    keyframe-neighborhood landmark unions + pose-graph relaxation) must
    land the refined trajectory below the filter-only ATE."""
    from cv_monoslam_tpu.api import SlamSession
    from cv_monoslam_tpu.backend.replay import TelemetryCapture, replay
    from cv_monoslam_tpu.config import SlamConfig
    from cv_monoslam_tpu.io import fixtures

    seq, track, gt_xy, _ = fixtures.load("bench4_lap")
    cfg = SlamConfig(max_landmarks=16, max_new_per_frame=4,
                     max_detections=32, keyframe_every=5, ba_window=4)
    # one filter run (telemetry captured), then backend variants by
    # replay — the backend never feeds the filter, so this is exact
    cap = TelemetryCapture()
    sess = SlamSession(cfg, seq, track, backend=cap)
    sess.run(chunk=8)
    ate_f = float(sess.ate(gt_xy))
    be, refinements = replay(cap.calls, cfg)         # shipped gate (inf)
    sess.backend, sess.refinements = be, refinements
    ate_r = float(sess.ate(gt_xy, refined=True))
    # per-source split (VERDICT r4 item 4): the shipped default is
    # gate=inf (pose-graph only — the r5 TPU sweep measured every finite
    # gate WORSE, see config.ba_apply_gate), so the counterfactual
    # recorded alongside is the old gate-3.0 window-BA-commits variant
    be_g, _ = replay(cap.calls, cfg, ba_apply_gate=3.0)
    sess.backend = be_g
    ate_g = float(sess.ate(gt_xy, refined=True))
    sess.backend = be
    out = dict(ate_filter=ate_f, ate_window_gate3=ate_g, ate_refined=ate_r,
               improved=bool(ate_r < ate_f),
               keyframes=len(be.keyframes),
               loop_edges=len(be.loop_edges))
    # per-edge + BA telemetry so a regressed number explains itself from
    # the artifact alone (VERDICT r3 weak #4 / next-round items 1, 6);
    # ba_solves/graph_solves come single-sourced from summary()
    out.update(be.summary(refinements))
    return out


def bench_kernels_quick():
    """Config 2: fused NCC kernel vs XLA grouped conv at M=32/512."""
    from bench_kernels import bench_ncc, bench_warp

    out = {}
    for m in (32, 512):
        r = bench_ncc(m)
        out[f"ncc_m{m}"] = dict(
            pallas_ms=round(r["pallas_ms"], 3),
            xla_ms=round(r["xla_ms"], 3),
            pallas_dispatch_ms=round(r["pallas_dispatch_ms"], 3),
            xla_dispatch_ms=round(r["xla_dispatch_ms"], 3),
            pallas_gflops=round(r["pallas_gflops"], 1),
            xla_gflops=round(r["xla_gflops"], 1),
            best_peak_pct=round(
                100 * max(r["pallas_gflops"], r["xla_gflops"]) * 1e9
                / 49.2e12, 3),
            # winner by scan-amortized DEVICE time (what pallas_ms/xla_ms
            # are; the *_dispatch_ms fields are the per-call launch path)
            device_winner=("pallas" if r["pallas_ms"] <= r["xla_ms"]
                           else "xla"))
    r = bench_warp(512)
    out["warp_m512"] = dict(pallas_ms=round(r["pallas_ms"], 3),
                            xla_ms=round(r["xla_ms"], 3))
    return out


def bench_scaling():
    """Config 5: distributed-BA scaling on the virtual CPU mesh (the
    achievable substitute for multi-chip hardware in this environment) —
    serialized-virtual-device walls + modeled efficiency + the O(W^2)
    communication volume. See scripts/bench_scaling.py for semantics."""
    import subprocess

    env = dict(os.environ, JAX_PLATFORMS="cpu", PALLAS_AXON_POOL_IPS="",
               XLA_FLAGS="--xla_force_host_platform_device_count=8 "
                         "--xla_cpu_multi_thread_eigen=false")
    out = subprocess.run(
        [sys.executable,
         os.path.join(os.path.dirname(__file__), "scripts",
                      "bench_scaling.py")],
        capture_output=True, text=True, timeout=1500, env=env)
    if out.returncode != 0:
        return {"error": (out.stderr or out.stdout)[-300:]}
    return json.loads(out.stdout.strip().splitlines()[-1])


def main():
    details = {}
    primary = bench_primary()
    details["config1_standard"] = {
        k: (round(v, 4) if isinstance(v, float) else v)
        for k, v in primary.items()}

    for name, fn, min_budget in (("config3_large512", bench_large, 900),
                                 ("config4_backend", bench_backend, 420),
                                 ("config2_kernels", bench_kernels_quick,
                                  300),
                                 ("config5_scaling", bench_scaling, 300),
                                 ("config1_parity", bench_parity, 240)):
        if remaining() < min_budget:
            details[name] = {"skipped": f"budget ({remaining():.0f}s left)"}
            continue
        try:
            details[name] = fn()
        except Exception as e:  # noqa: BLE001 — record, don't die
            details[name] = {"error": repr(e)[:200]}

    # round-over-round regression gate (VERDICT r3 item 7): compare the
    # comparable fixed metrics against the previous bench run and emit an
    # explicit flag instead of a number someone must remember to read
    hist_path = os.path.join(os.path.dirname(__file__),
                             "BENCH_HISTORY.json")
    history = []
    if os.path.exists(hist_path):
        try:
            with open(hist_path) as f:
                history = json.load(f)
        except Exception:
            history = []
    cur = dict(
        ate64_m=details["config1_standard"].get("ate64_m"),
        fps=details["config1_standard"].get("fps"),
        c3_fps=details.get("config3_large512", {}).get("fps"),
        c3_ate=details.get("config3_large512", {}).get("ate_m"),
        c4_improved=details.get("config4_backend", {}).get("improved"),
        c4_ate_filter=details.get("config4_backend", {}).get("ate_filter"),
        c4_ate_refined=details.get("config4_backend", {}).get(
            "ate_refined"),
        time=time.strftime("%Y-%m-%d %H:%M"),
    )
    # r5 gate (VERDICT r4 weak #1/#3/#5): inputs are frozen fixtures now,
    # so absolute comparisons round-over-round are meaningful. History
    # entries before the fixture freeze (no c4_ate_filter key) are not
    # comparable and are skipped.
    comparable = [h for h in history if h.get("c4_ate_filter") is not None]
    regressed = []
    if comparable:
        prev = comparable[-1]
        # config-1 fps: ±10% band vs best-of-last-3 (the primary metric)
        best3 = max(h["fps"] for h in comparable[-3:] if h.get("fps"))
        if cur["fps"] and cur["fps"] < best3 * 0.9:
            regressed.append(f"c1_fps {best3:.1f}->{cur['fps']:.1f}")
        if (prev.get("ate64_m") and cur["ate64_m"]
                and cur["ate64_m"] > prev["ate64_m"] * 1.15):
            regressed.append(f"ate64 {prev['ate64_m']}->{cur['ate64_m']}")
        if (prev.get("c3_fps") and cur["c3_fps"]
                and cur["c3_fps"] < prev["c3_fps"] * 0.9):
            regressed.append(f"c3_fps {prev['c3_fps']}->{cur['c3_fps']}")
        # config-4 ABSOLUTE quality, both stages: r4's filter drift
        # tripled (0.287->0.874) with only `improved` checked
        for k in ("c4_ate_filter", "c4_ate_refined"):
            if (prev.get(k) and cur[k] and cur[k] > prev[k] * 1.15):
                regressed.append(f"{k} {prev[k]:.3f}->{cur[k]:.3f}")
    if cur["c4_improved"] is False:
        regressed.append("c4 backend made ATE worse")
    details["regression"] = dict(regressed=bool(regressed),
                                 reasons=regressed)
    history = (history + [cur])[-20:]
    with open(hist_path, "w") as f:
        json.dump(history, f, indent=1)

    with open(os.path.join(os.path.dirname(__file__),
                           "BENCH_DETAILS.json"), "w") as f:
        json.dump(details, f, indent=1, default=str)

    c3 = details.get("config3_large512", {})
    c4 = details.get("config4_backend", {})
    c2 = details.get("config2_kernels", {})
    cp = details.get("config1_parity", {})
    extras = []
    if "fps" in c3:
        extras.append(f"M512: {c3['fps']} f/s ATE {c3.get('ate_m')} "
                      f"peak_map {c3.get('peak_map')}")
    if "ate_refined" in c4:
        extras.append(f"BA: {c4['ate_filter']:.4f}->"
                      f"{c4['ate_refined']:.4f} m "
                      f"({c4.get('loop_edges', 0)} loop edges)")
    if details.get("regression", {}).get("regressed"):
        extras.append("REGRESSED: "
                      + "; ".join(details["regression"]["reasons"]))
    if "ncc_m512" in c2:
        extras.append(f"ncc512 pallas {c2['ncc_m512']['pallas_ms']}ms "
                      f"vs xla {c2['ncc_m512']['xla_ms']}ms")
    if "arc" in cp:
        extras.append(f"parity arc eng {cp['arc']['ate_engine']} vs "
                      f"orc {cp['arc']['ate_oracle']}")
    result = {
        "metric": "slam_frames_per_sec",
        "value": round(primary["fps"], 3),
        "unit": (f"frames/s (ATE {primary['ate_m']:.4f} m / "
                 f"{primary['ate64_m']:.4f} m @64f, "
                 f"{primary['frames']} frames, oracle "
                 f"{primary['oracle_fps']:.2f} f/s"
                 + ("; " + "; ".join(extras) if extras else "") + ")"),
        "vs_baseline": round(primary["fps"] / primary["oracle_fps"], 3),
    }
    print(json.dumps(result))


if __name__ == "__main__":
    main()
