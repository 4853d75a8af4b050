"""Reference-API compatibility shim (SURVEY.md C1).

The reference exposes a flat C surface — `nmfgpu_initialize`,
`nmfgpu_finalize`, `nmfgpu_version`, GPU selection, and `nmfgpu_compute`
taking an `NmfDescription` struct. This module mirrors that surface
1:1 in Python so code structured around the reference's call sequence
ports mechanically:

    import nmftpu.compat as nmfgpu
    nmfgpu.initialize()
    nmfgpu.choose_device(0)
    result = nmfgpu.compute(NmfDescription(
        algorithm="mu", num_iterations=500, rank=32,
        input_matrix=V, threshold_value=1e-3, seed=42,
    ))
    nmfgpu.finalize()

Device selection maps to JAX default-device control; initialize/finalize
are no-ops beyond validation (the JAX runtime is process-global), matching
the reference semantics of context setup/teardown.
"""

from __future__ import annotations

import dataclasses
from typing import Any

import jax

import nmftpu
from nmftpu.config import (
    Algorithm,
    Initialization,
    NmfConfig,
    Objective,
    ThresholdType,
)

_initialized = False
_chosen_device = None


class ResultType:
    """Reference-style status codes (the python API raises instead; these
    exist for ported code that pattern-matches on them)."""

    SUCCESS = 0
    ERROR_NOT_INITIALIZED = 1
    ERROR_INVALID_ARGUMENT = 2
    ERROR_NO_DEVICE = 3


def version() -> str:
    return nmftpu.__version__


def initialize() -> int:
    """Reference: nmfgpu_initialize — bring up the accelerator runtime."""
    global _initialized
    if not jax.devices():
        return ResultType.ERROR_NO_DEVICE
    _initialized = True
    return ResultType.SUCCESS


def finalize() -> int:
    global _initialized
    _initialized = False
    return ResultType.SUCCESS


def device_count() -> int:
    return len(jax.devices())


def device_info(index: int) -> dict:
    """Reference: device enumeration (name / memory queries)."""
    d = jax.devices()[index]
    stats: dict[str, Any] = {}
    try:
        stats = d.memory_stats() or {}
    except Exception:
        pass
    return {
        "index": index,
        "kind": d.device_kind,
        "platform": d.platform,
        "bytes_in_use": stats.get("bytes_in_use"),
        "bytes_limit": stats.get("bytes_limit"),
    }


def choose_device(index: int | None = None) -> int:
    """Reference: nmfgpu_choose_gpu — select by index, or auto-select the
    device with the most free memory when index is None."""
    global _chosen_device
    devs = jax.devices()
    if not devs:
        return ResultType.ERROR_NO_DEVICE
    if index is None:
        def free(d):
            try:
                s = d.memory_stats() or {}
                return (s.get("bytes_limit") or 0) - (
                    s.get("bytes_in_use") or 0
                )
            except Exception:
                return 0
        _chosen_device = max(devs, key=free)
    else:
        if not 0 <= index < len(devs):
            return ResultType.ERROR_INVALID_ARGUMENT
        _chosen_device = devs[index]
    jax.config.update("jax_default_device", _chosen_device)
    return ResultType.SUCCESS


@dataclasses.dataclass
class NmfDescription:
    """The reference's single computation struct, field for field."""

    input_matrix: Any = None               # dense array or sparse container
    rank: int = 16
    algorithm: str = "mu"
    objective: str = "frobenius"
    init_method: str = "all_random_values"
    seed: int = 0
    num_iterations: int = 200
    num_runs: int = 1
    threshold_type: str = "frobenius"
    threshold_value: float = 0.0
    check_interval: int = 10
    # the reference's key/value algorithm parameter list:
    parameters: dict = dataclasses.field(default_factory=dict)
    # warm start (CopyExisting):
    initial_w: Any = None
    initial_h: Any = None
    callback: Any = None
    # reference C17/§3.2: the user-interrupt flag polled at every
    # convergence check — a zero-arg callable; truthy return cancels
    interrupt: Any = None


def compute(desc: NmfDescription):
    """Reference: nmfgpu_compute(NmfDescription) -> best W/H + stats."""
    if not _initialized:
        raise RuntimeError(
            "compat.initialize() must be called first "
            "(ResultType.ERROR_NOT_INITIALIZED)"
        )
    knobs = dict(desc.parameters)
    config = NmfConfig(
        rank=desc.rank,
        algorithm=Algorithm(desc.algorithm),
        objective=Objective(desc.objective),
        init_method=Initialization(desc.init_method),
        seed=desc.seed,
        num_iterations=desc.num_iterations,
        num_runs=desc.num_runs,
        threshold_type=ThresholdType(desc.threshold_type),
        threshold_value=desc.threshold_value,
        check_interval=desc.check_interval,
        **knobs,
    )
    from nmftpu import driver, sparse as host_sparse, sparse_ops

    V = desc.input_matrix
    if isinstance(V, host_sparse.SparseMatrix):
        return sparse_ops.compute_sparse(
            V, config, W0=desc.initial_w, H0=desc.initial_h,
            callback=desc.callback, interrupt=desc.interrupt,
        )
    return driver.compute(
        V, config, W0=desc.initial_w, H0=desc.initial_h,
        callback=desc.callback, interrupt=desc.interrupt,
    )
