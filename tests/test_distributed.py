"""Multi-process (DCN-path) test: two jax.distributed CPU processes form a
(2 hosts x 2 devices) ('dcn','ici') mesh and run a cross-process reduction
plus one sharded scenario-batched solve (scripts/dcn_worker.py). This
executes parallel/mesh.py's init_distributed/scenario_mesh multi-host
branch that a real v5p slice would drive over DCN."""

import os
import socket
import subprocess
import sys

import pytest

# slow tier: spawning two jax.distributed CPU processes costs ~107 s on
# this 1-CPU container — an infrastructure gate, not an iterate-on-code
# gate (docs/TEST_BUDGET.md)
pytestmark = pytest.mark.slow

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
WORKER = os.path.join(REPO, "scripts", "dcn_worker.py")


def _free_port():
    s = socket.socket()
    s.bind(("127.0.0.1", 0))
    port = s.getsockname()[1]
    s.close()
    return port


def test_two_process_dcn_mesh():
    port = _free_port()
    env = dict(os.environ)
    env.pop("XLA_FLAGS", None)  # workers set their own device count
    procs = [
        subprocess.Popen(
            [sys.executable, WORKER, str(port), str(pid), "2"],
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT,
            text=True, env=env, cwd=REPO)
        for pid in range(2)
    ]
    outs = []
    try:
        for p in procs:
            out, _ = p.communicate(timeout=540)
            outs.append(out)
    finally:
        for p in procs:
            if p.poll() is None:
                p.kill()
    for pid, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"proc {pid} failed:\n{out[-3000:]}"
        assert f"DCN_OK p{pid}" in out, out[-3000:]
