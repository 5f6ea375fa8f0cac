"""Multi-host (DCN) layer validated with a REAL 2-process
``jax.distributed`` CPU cluster (VERDICT r3 next #7 — ``parallel/
multihost.py`` was previously untested): two subprocesses × 2 virtual
CPU devices each form a 4-device global mesh; each process feeds ONLY
its locally-generated states through ``host_local_batch`` (asserting no
cross-host row movement), runs the sharded ∇FD path over the global
mesh, and cross-checks its addressable output rows against the
single-device answer."""

import os
import socket
import subprocess
import sys

import pytest

_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
_WORKER = os.path.join(_ROOT, "tests", "_multihost_worker.py")


def _free_port():
    with socket.socket() as s:
        s.bind(("localhost", 0))
        return s.getsockname()[1]


@pytest.mark.mid
def test_two_process_distributed_fd_grad():
    port = _free_port()
    env = dict(os.environ)
    env.pop("XLA_FLAGS", None)  # workers set their own device count
    procs = [subprocess.Popen(
        [sys.executable, _WORKER, str(pid), "2", str(port)],
        cwd=_ROOT, env=env, stdout=subprocess.PIPE,
        stderr=subprocess.STDOUT, text=True) for pid in range(2)]
    outs = []
    try:
        for p in procs:
            out, _ = p.communicate(timeout=600)
            outs.append(out)
    finally:
        for p in procs:
            if p.poll() is None:
                p.kill()
    for pid, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, (
            f"worker {pid} failed (rc={p.returncode})\n{out[-3000:]}")
        assert f"worker {pid}: ok" in out
