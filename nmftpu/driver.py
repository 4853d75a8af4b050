"""Dense driver (SURVEY.md C2, §3.2): validate → init → generic on-device
loop (`nmftpu.loop`) → best-of-N restarts. The sparse twin lives in
`nmftpu.sparse_ops.compute_sparse`."""

from __future__ import annotations

from typing import Any, Callable

import jax
import jax.numpy as jnp

from nmftpu.algorithms import build_dense_update
from nmftpu.config import NmfConfig, Objective, resolve_dtype
from nmftpu.init import initialize_factors
from nmftpu.linalg import dense as D
from nmftpu.loop import LoopOps, NmfResult, RunStats, build_runner, execute

__all__ = ["compute", "NmfResult", "RunStats"]

_RUNNER_CACHE: dict[tuple, Callable] = {}


def _dense_ops(config: NmfConfig, true_numel: int | None = None) -> LoopOps:
    make_aux, update, effective_h = build_dense_update(config)
    if config.objective is Objective.BETA:
        beta = config.beta
        divergence = lambda V, aux, W, He: D.beta_divergence(V, W, He, beta)
    else:
        divergence = lambda V, aux, W, He: D.kl_error(V, W, He)
    return LoopOps(
        make_aux=make_aux,
        update=update,
        effective_h=effective_h,
        frobenius=lambda V, aux, W, He, svsq: D.frobenius_error(
            V, W, He, svsq
        ),
        kl=divergence,
        sum_v_sq=lambda V: jnp.sum(V * V),
        # The mesh path zero-pads V to the mesh shape; the in-loop RMSD
        # must divide by the TRUE element count (pad rows/cols contribute
        # zero error) or RMSD thresholds fire early — the same fix the
        # densified bundle carries.
        numel=lambda V: (true_numel if true_numel is not None
                         else V.shape[0] * V.shape[1]),
    )


def _get_runner(config: NmfConfig, shape, dtype, callback, interrupt,
                true_numel=None):
    if callback is not None or interrupt is not None:
        return build_runner(config, _dense_ops(config, true_numel),
                            callback, interrupt)
    key = (config, shape, str(dtype), true_numel)
    runner = _RUNNER_CACHE.get(key)
    if runner is None:
        runner = build_runner(config, _dense_ops(config, true_numel), None)
        _RUNNER_CACHE[key] = runner
    return runner


def compute(
    V,
    config: NmfConfig,
    W0=None,
    H0=None,
    mesh=None,
    callback: Callable[[Any, Any, Any, Any], None] | None = None,
    interrupt: Callable[[], bool] | None = None,
) -> NmfResult:
    """Factorize dense V ≈ W H under `config` (reference: nmfgpu_compute).

    callback, if given, is invoked (host-side, async) at every convergence
    check with (run_index, iteration, error, delta) — the reference's
    per-iteration statistics callback (SURVEY.md C17). interrupt, if given,
    is polled (synchronously) at every check; returning truthy stops the
    run and yields the current factors (SURVEY.md C9).

    mesh: optional 2-D ('users','items') device mesh — V is placed
    P('users','items'), W/H row-/column-sharded, and GSPMD partitions the
    dense update GEMMs (inserting the psum pattern automatically); the
    update code is unchanged.
    """
    if config.mask == "observed":
        raise ValueError(
            "mask='observed' needs a sparse container (the stored "
            "nonzeros ARE the observed set); a dense V has no mask "
            "structure — use nmftpu.sparse.from_dense / from_scipy and "
            "compute_sparse"
        )
    dtype = resolve_dtype(config.dtype)
    V = jnp.asarray(V, dtype)
    if V.ndim != 2:
        raise ValueError(f"V must be 2-D, got shape {V.shape}")
    n, m = V.shape
    if config.rank > min(n, m):
        raise ValueError(
            f"rank {config.rank} exceeds min(V.shape) = {min(n, m)}"
        )

    shardings = None
    if mesh is not None:
        from nmftpu.parallel.mesh import factor_shardings

        pu, pi = mesh.devices.shape
        if n % pu or m % pi:
            # GSPMD wants dims divisible by the mesh; pad with zero
            # rows/cols (absorbing under every update) and crop on return.
            n_pad = (-n) % pu
            m_pad = (-m) % pi
            V = jnp.pad(V, ((0, n_pad), (0, m_pad)))
        shardings = factor_shardings(mesh)
        V = jax.device_put(V, shardings["V"])

    runner = _get_runner(
        config, V.shape, dtype, callback, interrupt,
        true_numel=(n * m if (n, m) != V.shape else None),
    )

    def init_fn(key):
        W, H = initialize_factors(
            V,
            config.rank,
            config.init_method,
            key,
            W0=(
                jnp.pad(jnp.asarray(W0, dtype),
                        ((0, V.shape[0] - n), (0, 0)))
                if (W0 is not None and mesh is not None) else W0
            ),
            H0=(
                jnp.pad(jnp.asarray(H0, dtype),
                        ((0, 0), (0, V.shape[1] - m)))
                if (H0 is not None and mesh is not None) else H0
            ),
            kmeans_max_iter=config.kmeans_max_iter,
        )
        if shardings is not None:
            W = jax.device_put(W, shardings["W"])
            H = jax.device_put(H, shardings["H"])
        return W, H

    result = execute(V, config, runner, init_fn, numel=n * m)
    if mesh is not None and (V.shape[0] != n or V.shape[1] != m):
        result.W = result.W[:n]
        result.H = result.H[:, :m]
    return result
