"""Observability utility tests: JSONL metrics sink, FLOP model."""

import json

import numpy as np

from nmftpu import NmfConfig, Algorithm
from nmftpu.driver import compute
from nmftpu.utils import JsonlLogger, flops_per_iteration


def test_jsonl_logger_as_compute_callback(tmp_path, rng):
    V = rng.uniform(0.1, 2.0, (25, 20)).astype(np.float32)
    path = tmp_path / "metrics.jsonl"
    with JsonlLogger(str(path)).bind(config="unit") as logger:
        compute(
            V, NmfConfig(rank=3, num_iterations=30, check_interval=10),
            callback=logger.as_callback(),
        )
        import jax

        jax.effects_barrier()
    records = [json.loads(line) for line in path.read_text().splitlines()]
    assert len(records) == 3
    assert [r["iteration"] for r in records] == [10, 20, 30]
    assert all(r["config"] == "unit" for r in records)
    assert all("error" in r and "ts" in r for r in records)
    # errors are non-increasing for MU
    errs = [r["error"] for r in records]
    assert errs == sorted(errs, reverse=True)


def test_flops_model_sane():
    dense = flops_per_iteration(1000, 800, 32)
    sparse = flops_per_iteration(1000, 800, 32, nnz=10_000)
    assert dense > sparse > 0
    cfg = NmfConfig(rank=32, algorithm=Algorithm.ALS)
    assert flops_per_iteration(1000, 800, 32, config=cfg) > dense


def test_trace_session_writes_profile(tmp_path, rng):
    import os
    from nmftpu.utils import trace_session

    V = rng.uniform(0.1, 1.0, (16, 12)).astype(np.float32)
    with trace_session(str(tmp_path)):
        compute(V, NmfConfig(rank=2, num_iterations=5))
    found = []
    for root, _, files in os.walk(tmp_path):
        found += files
    assert found, "profiler produced no output files"
