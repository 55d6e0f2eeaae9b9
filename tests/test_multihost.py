"""Multi-host initialization actually exercised (VERDICT r2 item 9).

Spawns a real 2-process JAX cluster with a local coordinator (CPU backend,
2 virtual devices per process = 4 global devices), forms the global mesh
through ``initialize_multihost``, and runs one sharded dispatch whose
reduction crosses the process boundary.  This validates the "multi-host
falls out for free" claim (parallel/mesh.py:15-17) with running code, not
documentation.
"""

import os
import socket
import subprocess
import sys
from pathlib import Path

import pytest

CHILD = Path(__file__).parent / "multihost_child.py"


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("localhost", 0))
        return s.getsockname()[1]


def test_two_process_cluster_sharded_dispatch():
    port = _free_port()
    env = dict(os.environ)
    # children configure their own JAX env; scrub the parent's test flags
    # AND the axon TPU plugin trigger (its sitecustomize initialises the
    # XLA backend at interpreter startup, which must not happen before
    # jax.distributed.initialize)
    env.pop("XLA_FLAGS", None)
    env.pop("PALLAS_AXON_POOL_IPS", None)
    env["JAX_PLATFORMS"] = "cpu"
    procs = [subprocess.Popen(
        [sys.executable, str(CHILD), str(port), str(pid)],
        stdout=subprocess.PIPE, stderr=subprocess.STDOUT, env=env,
        cwd=str(CHILD.parent.parent), text=True) for pid in (0, 1)]
    outs = []
    try:
        for p in procs:
            out, _ = p.communicate(timeout=240)
            outs.append(out)
    except subprocess.TimeoutExpired:
        for p in procs:
            p.kill()
        pytest.fail("multihost children timed out:\n"
                    + "\n---\n".join(outs))
    for p, out in zip(procs, outs):
        assert p.returncode == 0, out
        assert "PROBE processes=2 local=2 global=4" in out, out
        assert "PROBE result=992.0" in out, out
        assert "PROBE ok" in out, out
