"""jax.distributed multi-process CPU test (SURVEY.md §4 item 5, VERDICT 5c).

Spawns two OS processes, each contributing 4 fake CPU devices to one
jax.distributed mesh, and runs the sharded Schur-complement BA across the
process boundary — the communication pattern of BASELINE config 5 without
real hardware. Skipped when the distributed service cannot bind (sandboxed
environments without localhost TCP)."""

import os
import socket
import subprocess
import sys

import pytest

ROOT = os.path.join(os.path.dirname(__file__), "..")
SCRIPT = os.path.join(ROOT, "scripts", "dist_ba_mp.py")


def _free_port():
    s = socket.socket()
    s.bind(("localhost", 0))
    port = s.getsockname()[1]
    s.close()
    return port


def test_two_process_distributed_ba():
    try:
        port = _free_port()
    except OSError:
        pytest.skip("no localhost TCP available")
    coord = f"localhost:{port}"
    env = {k: v for k, v in os.environ.items()
           if k not in ("XLA_FLAGS", "JAX_PLATFORM_NAME")}
    procs = [
        subprocess.Popen(
            [sys.executable, SCRIPT, "--coord", coord, "--nproc", "2",
             "--pid", str(pid)],
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT, env=env,
            cwd=ROOT, text=True)
        for pid in range(2)
    ]
    outs = []
    try:
        for p in procs:
            out, _ = p.communicate(timeout=300)
            outs.append(out)
    finally:
        for p in procs:
            if p.poll() is None:
                p.kill()
    for pid, (p, out) in enumerate(zip(procs, outs)):
        if p.returncode != 0 and "UNAVAILABLE" in out:
            pytest.skip(f"distributed service unavailable: {out[-300:]}")
        assert p.returncode == 0, f"proc {pid} failed:\n{out[-3000:]}"
        assert f"proc {pid}: OK over 8 devices" in out
