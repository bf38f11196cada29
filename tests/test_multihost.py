"""Two-process jax.distributed smoke test (SURVEY.md §4 implication (e)).

Launches two REAL OS processes on the CPU backend (4 virtual devices each),
brings up jax.distributed over localhost, builds the flat global edge mesh
(parallel/multihost.py), and reduces an edge-sharded array with the same
psum the distributed BA uses — the cross-host DCN path checked end to end
without multi-host hardware.
"""

import pathlib
import socket
import subprocess
import sys

import pytest


def _free_port():
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        return s.getsockname()[1]


def _run_pair(worker: pathlib.Path, timeout: float = 600):
    port = _free_port()
    procs = [
        subprocess.Popen(
            [sys.executable, str(worker), str(pid), "2", str(port)],
            stdout=subprocess.PIPE,
            stderr=subprocess.STDOUT,
            text=True,
            cwd=str(worker.parent.parent),
        )
        for pid in range(2)
    ]
    outs = []
    for p in procs:
        try:
            out, _ = p.communicate(timeout=timeout)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            raise
        outs.append(out)
    return procs, outs


@pytest.mark.slow
def test_two_process_distributed_engine():
    """The ACTUAL SLAM loop across 2 jax.distributed processes (VERDICT r4
    item 4): both workers drive the engine SPMD over the flat global edge
    mesh — the backend BA's per-edge blocks assemble on each process's
    devices and reduce with one psum across the process (DCN) boundary —
    and each asserts trajectory parity vs a single-device run."""
    worker = pathlib.Path(__file__).parent / "distributed_engine_worker.py"
    procs, outs = _run_pair(worker, timeout=900)
    for pid, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"worker {pid} failed:\n{out[-4000:]}"
        assert "distributed SLAM engine parity over 2-process mesh OK" in out


@pytest.mark.slow
def test_two_process_distributed_psum():
    worker = pathlib.Path(__file__).parent / "distributed_worker.py"
    port = _free_port()
    procs = [
        subprocess.Popen(
            [sys.executable, str(worker), str(pid), "2", str(port)],
            stdout=subprocess.PIPE,
            stderr=subprocess.STDOUT,
            text=True,
            cwd=str(worker.parent.parent),
        )
        for pid in range(2)
    ]
    outs = []
    for p in procs:
        try:
            out, _ = p.communicate(timeout=300)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            raise
        outs.append(out)
    for pid, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"worker {pid} failed:\n{out}"
        assert "psum over 2-process mesh OK" in out, out
