"""High-level convenience API, in the spirit of the reference's R binding
`nmf(data, r, algorithm=..., ...)` (SURVEY.md C19): accepts strings for all
enums, dispatches dense vs. sparse inputs, and returns an NmfResult."""

from __future__ import annotations

from typing import Any

import numpy as np

from nmftpu.config import (
    Algorithm,
    Initialization,
    NmfConfig,
    Objective,
    ThresholdType,
)
from nmftpu import driver

_INIT_ALIASES = {
    "copy": Initialization.COPY_EXISTING,
    "random": Initialization.ALL_RANDOM_VALUES,
    "mean_columns": Initialization.MEAN_COLUMNS,
    "kmeans": Initialization.K_MEANS_AND_RANDOM_VALUES,
}

_OBJ_ALIASES = {
    "kl": Objective.KL,
    "is": Objective.ITAKURA_SAITO,
    "beta": Objective.BETA,       # pair with the beta= knob
}


def _coerce(enum_cls, value, aliases=None):
    if isinstance(value, enum_cls):
        return value
    if aliases and value in aliases:
        return aliases[value]
    return enum_cls(value)


def nmf(
    data: Any,
    rank: int,
    algorithm: str | Algorithm = Algorithm.MU,
    objective: str | Objective = Objective.FROBENIUS,
    init: str | Initialization = Initialization.ALL_RANDOM_VALUES,
    seed: int = 0,
    num_iterations: int = 200,
    num_runs: int = 1,
    threshold: float = 0.0,
    threshold_type: str | ThresholdType = ThresholdType.FROBENIUS,
    W0=None,
    H0=None,
    callback=None,
    interrupt=None,
    mesh=None,
    strategy: str = "auto",
    **knobs,
) -> "driver.NmfResult":
    """Factorize `data` ≈ W H with rank `rank`.

    `data` may be a dense array (numpy/JAX) or any nmftpu sparse container
    (`SparseCSR`/`SparseCSC`/`SparseCOO` from `nmftpu.sparse`) — sparse
    inputs route through the sparse update path. Extra keyword knobs
    (lambda_w, lambda_h, alpha_w, alpha_h, lambda_tik, theta,
    alpha_confidence, check_interval, eps, dtype, v_storage,
    vectorize_runs, ...) forward into NmfConfig.

    mesh: a 2-D ('users','items') device mesh routes dense inputs through
    GSPMD partitioning and sparse inputs through the sharded driver.
    strategy: sparse engine selection (auto | densified | ell | scatter;
    single-device sparse only).
    """
    init_method = _coerce(Initialization, init, _INIT_ALIASES)
    if (W0 is not None or H0 is not None) and \
            init_method is not Initialization.COPY_EXISTING:
        import warnings

        warnings.warn(
            "W0/H0 are ignored unless init='copy' (CopyExisting); the "
            "run starts from the configured init instead of the given "
            "warm start",
            RuntimeWarning, stacklevel=2,
        )
    config = NmfConfig(
        rank=rank,
        algorithm=_coerce(Algorithm, algorithm),
        objective=_coerce(Objective, objective, _OBJ_ALIASES),
        init_method=init_method,
        seed=seed,
        num_iterations=num_iterations,
        num_runs=num_runs,
        threshold_value=threshold,
        threshold_type=_coerce(ThresholdType, threshold_type),
        **knobs,
    )

    return dispatch(
        data, config, W0=W0, H0=H0, mesh=mesh, strategy=strategy,
        callback=callback, interrupt=interrupt,
    )


def dispatch(
    data,
    config: NmfConfig,
    *,
    W0=None,
    H0=None,
    mesh=None,
    strategy: str = "auto",
    callback=None,
    interrupt=None,
) -> "driver.NmfResult":
    """Route (data, config) to the right engine: sparse+mesh → the
    sharded driver (strategy maps to its per-tile engine), sparse →
    compute_sparse, dense → compute (GSPMD-sharded when mesh given).
    Shared by `nmf` and the sklearn facade so the routing cannot drift."""
    from nmftpu import sparse as sparse_mod

    if isinstance(data, sparse_mod.SparseMatrix):
        if mesh is not None:
            from nmftpu.parallel import compute_sharded

            if strategy == "densified":
                raise ValueError(
                    "strategy='densified' is single-device only; the "
                    "sharded engines are 'ell', 'scatter', 'ring' "
                    "(or 'auto')"
                )
            if strategy not in ("auto", "ell", "scatter", "ring"):
                raise ValueError(
                    f"unknown strategy {strategy!r}; sharded engines are "
                    "'ell', 'scatter', 'ring' (or 'auto')"
                )
            engine = strategy
            return compute_sharded(
                data, config, mesh=mesh, W0=W0, H0=H0, engine=engine,
                callback=callback, interrupt=interrupt,
            )
        from nmftpu import sparse_ops

        return sparse_ops.compute_sparse(
            data, config, W0=W0, H0=H0, strategy=strategy,
            callback=callback, interrupt=interrupt,
        )
    return driver.compute(
        np.asarray(data), config, W0=W0, H0=H0, mesh=mesh,
        callback=callback, interrupt=interrupt,
    )
