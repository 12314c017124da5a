"""True multi-process pod path: two jax.distributed processes form one
8-device mesh; the sharded query step's collective merges must match a
numpy oracle. (The single-process multi-device variant is covered by
test_sharded_engine and the driver's dryrun_multichip.)"""

import os
import socket
import subprocess
import sys

import numpy as np
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
WORKER = os.path.join(REPO, "scripts", "distributed_worker.py")


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        return s.getsockname()[1]


def _expected():
    R, PW = 64, 2 * 32  # flat global word axis (partitions fold into words)
    rng = np.random.default_rng(0)
    bank = rng.integers(0, 1 << 32, size=(R, PW), dtype=np.uint32)
    words = bank[3] & bank[7]
    count = int(np.bitwise_count(words).sum())
    segment = bank[0:64]
    mut = int(np.bitwise_count(segment & words[None, :]).sum())
    return count, mut


def test_two_process_mesh():
    port = _free_port()
    env = {k: v for k, v in os.environ.items() if k != "XLA_FLAGS"}
    env["JAX_PLATFORMS"] = "cpu"
    procs = [
        subprocess.Popen(
            [sys.executable, WORKER, str(port), "2", str(pid)],
            stdout=subprocess.PIPE, stderr=subprocess.PIPE, env=env, text=True,
        )
        for pid in range(2)
    ]
    try:
        outs = [p.communicate(timeout=240) for p in procs]
    except subprocess.TimeoutExpired:
        for p in procs:
            p.kill()
        pytest.skip("jax.distributed CPU workers timed out in this environment")
    for p, (out, err) in zip(procs, outs):
        assert p.returncode == 0, f"worker failed:\n{out}\n{err}"
    count, mut = _expected()
    assert f"RESULT count={count} mut={mut}" in outs[0][0], (outs[0], (count, mut))
