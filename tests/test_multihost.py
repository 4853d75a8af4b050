"""Multi-host smoke test (SURVEY.md §4.3: jax.distributed multi-process on
localhost): 2 processes x 4 virtual CPU devices = one 8-device global mesh
running the sharded driver end-to-end."""

import os
import socket
import subprocess
import sys

import pytest


def _free_port():
    s = socket.socket()
    s.bind(("localhost", 0))
    port = s.getsockname()[1]
    s.close()
    return port


@pytest.mark.slow
def test_two_process_sharded_compute():
    worker = os.path.join(os.path.dirname(__file__), "multihost_worker.py")
    coord = f"localhost:{_free_port()}"
    env = {
        k: v for k, v in os.environ.items()
        if k not in ("XLA_FLAGS", "JAX_PLATFORMS")
    }
    procs = [
        subprocess.Popen(
            [sys.executable, worker, coord, "2", str(pid)],
            stdout=subprocess.PIPE, stderr=subprocess.PIPE, text=True,
            env=env,
        )
        for pid in range(2)
    ]
    outs = []
    try:
        for p in procs:
            out, err = p.communicate(timeout=240)
            outs.append((p.returncode, out, err))
    finally:
        for p in procs:
            if p.poll() is None:
                p.kill()

    for rc, out, err in outs:
        assert rc == 0, f"worker failed:\nstdout={out}\nstderr={err[-2000:]}"
    results = [
        line.split()[1]
        for rc, out, _ in outs
        for line in out.splitlines()
        if line.startswith("RESULT")
    ]
    assert len(results) == 2
    assert results[0] == results[1], "processes disagree on the error"
    rowshard = [
        line.split()[1]
        for rc, out, _ in outs
        for line in out.splitlines()
        if line.startswith("ROWSHARD")
    ]
    assert len(rowshard) == 2, "row-shard ingestion did not run"
    assert rowshard[0] == rowshard[1], (
        "processes disagree on the row-shard error"
    )
