"""2-process multi-host rendezvous: distributed_init has a real caller.

The reference's multi-node story is slurm headers only (SURVEY.md §2.9); this
framework's is ``jax.distributed.initialize`` over DCN. Since the test rig is
one host, the rendezvous is exercised with two local processes over localhost,
each owning one CPU device, running a cross-process psum through a global mesh
(the same code path a v5e pod takes over real DCN/ICI).
"""

import pytest as _pytest_tier

pytestmark = _pytest_tier.mark.full  # heavy tier: excluded from smoke (pytest -m "not full")

import os
import socket
import subprocess
import sys
from pathlib import Path

import pytest


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("localhost", 0))
        return s.getsockname()[1]


def test_two_process_rendezvous_psum():
    worker = Path(__file__).parent / "multihost_worker.py"
    repo_root = worker.parent.parent
    port = _free_port()
    env = {**os.environ,
           "PYTHONPATH": f"{repo_root}{os.pathsep}{os.environ.get('PYTHONPATH', '')}"}
    procs = [
        subprocess.Popen(
            [sys.executable, str(worker), str(pid), str(port)],
            stdout=subprocess.PIPE, stderr=subprocess.PIPE, text=True,
            cwd=str(repo_root), env=env,
        )
        for pid in range(2)
    ]
    outs = []
    for pid, p in enumerate(procs):
        try:
            out, err = p.communicate(timeout=150)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            pytest.fail(f"worker {pid} timed out waiting for rendezvous")
        outs.append((p.returncode, out, err))
    for pid, (rc, out, err) in enumerate(outs):
        assert rc == 0, f"worker {pid} rc={rc}\nstdout:\n{out}\nstderr:\n{err[-2000:]}"
        assert f"MULTIHOST OK pid={pid} total=12.0" in out
