"""Two-process DCN fan-out (VERDICT r2 item 10; SURVEY §5.h extension).

Spawns two OS processes, each owning 4 virtual CPU devices, joined by
jax.distributed into one 8-device global mesh whose ``space`` axis pairs
devices across the process boundary — the per-frame voxel psum crosses the
inter-process channel, emulating multi-host DCN deployment.  Each worker
asserts the sharded fleet step matches per-stream single-device tracking
(see dcn_worker.py).
"""

import os
import socket
import subprocess
import sys

import pytest


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        return s.getsockname()[1]


def test_two_process_dcn_fanout(fixture_map):
    # fixture_map dependency only to ensure assets/sim_map.yaml exists
    worker = os.path.join(os.path.dirname(__file__), "dcn_worker.py")
    port = _free_port()
    env = dict(os.environ)
    # each worker builds its own 4-device CPU platform; scrub the parent
    # test harness's 8-device flag so workers don't inherit it
    env["XLA_FLAGS"] = "--xla_force_host_platform_device_count=4"
    env.pop("JAX_PLATFORMS", None)
    procs = [
        subprocess.Popen(
            [sys.executable, worker, str(pid), "2", str(port)],
            stdout=subprocess.PIPE,
            stderr=subprocess.STDOUT,
            text=True,
            env=env,
            cwd=os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        )
        for pid in range(2)
    ]
    outs = []
    for p in procs:
        try:
            out, _ = p.communicate(timeout=540)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            raise
        outs.append(out)
    for pid, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"worker {pid} failed:\n{out[-4000:]}"
        assert "DCN_WORKER_OK" in out, f"worker {pid} no OK marker:\n{out[-4000:]}"
