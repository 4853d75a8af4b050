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
    for tag in ("ROWSHARD", "IALS", "MASKED", "BETA", "SERVE"):
        vals = [
            line.split()[1:]
            for rc, out, _ in outs
            for line in out.splitlines()
            if line.startswith(tag)
        ]
        assert len(vals) == 2, f"{tag} did not run on both processes"
        assert vals[0] == vals[1], (
            f"processes disagree on the {tag} result: {vals}"
        )


@pytest.mark.slow
def test_rowshards_kill_one_then_resume_from_checkpoint(tmp_path):
    """Fault-injection cycle over the ROWSHARDS ingestion path
    (SURVEY.md §5.3/§5.4, round-3 verdict item 8): a 2-process run
    checkpoints at half budget, host 1 dies; a fresh 2-process job
    resumes from the checkpoint on the same per-process file shards and
    must land on the uninterrupted run's error."""
    worker = os.path.join(os.path.dirname(__file__), "multihost_worker.py")
    base_env = {
        k: v for k, v in os.environ.items()
        if k not in ("XLA_FLAGS", "JAX_PLATFORMS")
    }
    base_env["NMFTPU_MH_CKPT"] = str(tmp_path / "ck")

    def launch(phase):
        env = dict(base_env, NMFTPU_MH_PHASE=phase)
        coord = f"localhost:{_free_port()}"
        procs = [
            subprocess.Popen(
                [sys.executable, worker, coord, "2", str(pid)],
                stdout=subprocess.PIPE, stderr=subprocess.PIPE,
                text=True, env=env,
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
        return outs

    outs = launch("ckpt_die")
    # host 1 os._exit(1)s after the save; host 0 then FAILS FAST at the
    # shutdown barrier (the documented multi-host failure model — a
    # surviving host must error out, not hang). The checkpoint must
    # have committed before the death on both hosts.
    assert outs[1][0] == 1, "host 1 should have died post-checkpoint"
    assert all("CKPT" in out for _, out, _ in outs), (
        "checkpoint phase did not complete before the injected death:"
        f"\n{outs[0][2][-1500:]}"
    )
    assert os.path.isdir(str(tmp_path / "ck"))

    outs = launch("resume")
    for rc, out, err in outs:
        assert rc == 0, f"resume worker failed:\nstderr={err[-2000:]}"
    resumed = [
        line.split()[1]
        for rc, out, _ in outs
        for line in out.splitlines()
        if line.startswith("RESUMED")
    ]
    assert len(resumed) == 2 and resumed[0] == resumed[1], resumed
