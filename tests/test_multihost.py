"""Multi-process distributed execution test (r2 verdict missing #5).

Spawns TWO real OS processes that jax.distributed.initialize against a
local coordinator, form one 4-device mesh (2 virtual CPU devices per
process — the multi-host pod-slice topology shape), shard the fingerprint
index across it, and answer queries bit-identically to the NumPy golden
matcher.  This exercises the actual DCN code path (cross-process
coordination + collectives), not just a single-process virtual mesh.
"""

import os
import socket
import subprocess
import sys
from pathlib import Path

ROOT = Path(__file__).resolve().parent.parent


def test_two_process_distributed_sharded_match():
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        port = s.getsockname()[1]

    procs = []
    for pid in range(2):
        env = {
            **os.environ,
            "PALLAS_AXON_POOL_IPS": "",
            "JAX_PLATFORMS": "cpu",
            "JAX_COORDINATOR_ADDRESS": f"127.0.0.1:{port}",
            "JAX_NUM_PROCESSES": "2",
            "JAX_PROCESS_ID": str(pid),
            "XLA_FLAGS": "--xla_force_host_platform_device_count=2",
        }
        procs.append(
            subprocess.Popen(
                [sys.executable, str(ROOT / "tests" / "_multihost_worker.py")],
                env=env, cwd=ROOT,
                stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True,
            )
        )
    outs = []
    try:
        for p in procs:
            out, _ = p.communicate(timeout=540)
            outs.append(out)
    finally:
        for p in procs:
            if p.poll() is None:
                p.kill()
    for i, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"process {i} failed:\n{out[-4000:]}"
        assert "MULTIHOST_OK" in out, f"process {i} missing OK:\n{out[-2000:]}"
