"""Reference-API shim tests: the nmfgpu-style call sequence must work."""

import numpy as np
import pytest

import nmftpu.compat as nmfgpu
from nmftpu.sparse import from_dense


def test_full_reference_call_sequence(rng):
    assert nmfgpu.initialize() == nmfgpu.ResultType.SUCCESS
    try:
        assert nmfgpu.device_count() >= 1
        info = nmfgpu.device_info(0)
        assert info["platform"]
        assert nmfgpu.choose_device(0) == nmfgpu.ResultType.SUCCESS
        assert nmfgpu.choose_device(None) == nmfgpu.ResultType.SUCCESS
        assert isinstance(nmfgpu.version(), str)

        V = rng.uniform(0.1, 2.0, (30, 24)).astype(np.float32)
        res = nmfgpu.compute(nmfgpu.NmfDescription(
            input_matrix=V, rank=4, algorithm="acls",
            num_iterations=20, threshold_value=1e-3, seed=42,
            parameters={"lambda_w": 0.05, "lambda_h": 0.05},
        ))
        assert res.W.shape == (30, 4)
        assert np.isfinite(res.frobenius_error)

        # sparse input through the same struct
        res2 = nmfgpu.compute(nmfgpu.NmfDescription(
            input_matrix=from_dense(V), rank=4, num_iterations=10,
        ))
        assert res2.H.shape == (4, 24)

        # warm start = CopyExisting
        res3 = nmfgpu.compute(nmfgpu.NmfDescription(
            input_matrix=V, rank=4, init_method="copy_existing",
            initial_w=np.asarray(res.W), initial_h=np.asarray(res.H),
            num_iterations=10,
        ))
        assert res3.frobenius_error <= res.frobenius_error * 1.001
    finally:
        assert nmfgpu.finalize() == nmfgpu.ResultType.SUCCESS


def test_compute_requires_initialize(rng):
    nmfgpu.finalize()
    V = rng.uniform(size=(10, 8)).astype(np.float32)
    with pytest.raises(RuntimeError):
        nmfgpu.compute(nmfgpu.NmfDescription(input_matrix=V, rank=2))


def test_invalid_device_index():
    nmfgpu.initialize()
    assert (
        nmfgpu.choose_device(10**6) == nmfgpu.ResultType.ERROR_INVALID_ARGUMENT
    )
    nmfgpu.finalize()


def test_compat_interrupt(rng):
    """Reference C17: the interrupt flag polled at every convergence
    check cancels the run (via the compat description surface)."""
    from nmftpu import compat

    compat.initialize()
    V = rng.uniform(0.1, 1.0, (24, 18)).astype("float32")
    calls = []

    def interrupt():
        calls.append(1)
        return len(calls) >= 2  # cancel at the second check

    desc = compat.NmfDescription(
        input_matrix=V, rank=3, num_iterations=400, check_interval=10,
        interrupt=interrupt,
    )
    res = compat.compute(desc)
    assert res.num_iterations < 400
    assert len(calls) >= 2
