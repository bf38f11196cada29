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
