"""Driver loop (SURVEY.md C2, C9, C17, §3.2): validate → init → iterate →
converge → best-of-N restarts.

TPU-first design points (vs. the reference's host-driven loop):

* The entire iterate/convergence loop is ONE `lax.while_loop` inside ONE
  jit — the error, delta, stop flag, per-check stats, and iteration counter
  all live in the on-device carry, so there are no host round-trips until a
  run finishes (the reference's per-check D2H error sync was its stall
  point, SURVEY.md §3.2).
* W/H buffers are donated, so each iteration updates factors in place.
* Multi-run restarts (SURVEY.md §3.5) re-enter the same compiled runner
  with a new seed; only one scalar (the final error) is compared on host.
* Statistics (SURVEY.md C17: {iteration, error, delta}) are written into a
  preallocated on-device buffer at each check; user callbacks are delivered
  via `jax.debug.callback` (async, non-blocking) when provided.
"""

from __future__ import annotations

import dataclasses
import time
from typing import Any, Callable

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

from nmftpu.algorithms import build_dense_update
from nmftpu.config import Initialization, NmfConfig, Objective, ThresholdType
from nmftpu.init import initialize_factors
from nmftpu.linalg import dense as D


@dataclasses.dataclass
class RunStats:
    """Per-check convergence records for one run (SURVEY.md C17)."""

    iterations: np.ndarray  # (num_checks,) int
    errors: np.ndarray      # (num_checks,) error in the threshold metric
    deltas: np.ndarray      # (num_checks,) |error - previous error|


@dataclasses.dataclass
class NmfResult:
    """Result of `compute`: best-of-N factors plus convergence metadata."""

    W: jax.Array                 # (n, rank)
    H: jax.Array                 # (rank, m)
    error: float                 # final error in config.threshold_type metric
    frobenius_error: float       # ||V - W He||_F (He = smoothed H for nsNMF)
    rmsd: float
    kl_error: float | None       # only for the KL objective
    num_iterations: int          # iterations of the best run
    converged: bool
    best_run: int
    run_errors: list[float]      # final comparison error of every run
    stats: RunStats              # stats of the best run
    elapsed_ms: float            # wall clock over all runs (host-side)


_RUNNER_CACHE: dict[tuple, Callable] = {}


def _build_dense_runner(config: NmfConfig, callback):
    """Compile-once runner for a given config (dense V path)."""
    make_aux, update, effective_h = build_dense_update(config)
    num_iterations = config.num_iterations
    check_interval = config.check_interval
    threshold = (
        float(config.threshold_value)
        if config.threshold_value > 0
        else -float("inf")
    )
    max_checks = num_iterations // check_interval + 2
    kl_objective = config.objective is Objective.KL
    use_rmsd = config.threshold_type is ThresholdType.RMSD

    def error_metric(V, aux, W, H, sum_v_sq):
        He = effective_h(aux, H)
        if use_rmsd:
            return D.rmsd(V, W, He, sum_v_sq)
        return D.frobenius_error(V, W, He, sum_v_sq)

    def run(V, W, H, run_idx):
        aux = make_aux(V)
        sum_v_sq = jnp.sum(V * V)
        err0 = error_metric(V, aux, W, H, sum_v_sq).astype(jnp.float32)
        stats = jnp.zeros((max_checks, 3), dtype=jnp.float32)
        carry = (
            W,
            H,
            jnp.asarray(0, jnp.int32),
            err0,
            jnp.asarray(jnp.inf, jnp.float32),
            stats,
            jnp.asarray(0, jnp.int32),
        )

        def cond(c):
            _, _, it, _, delta, _, _ = c
            return (it < num_iterations) & (delta > threshold)

        def body(c):
            W, H, it, prev, delta, stats, nc = c
            W, H = update(V, aux, W, H)
            it = it + 1
            do_check = (it % check_interval == 0) | (it == num_iterations)

            def checked(op):
                prev, _, stats, nc = op
                cur = error_metric(V, aux, W, H, sum_v_sq).astype(jnp.float32)
                d = jnp.abs(prev - cur)
                rec = jnp.stack([it.astype(jnp.float32), cur, d])
                stats = stats.at[nc].set(rec)
                if callback is not None:
                    jax.debug.callback(callback, run_idx, it, cur, d)
                return cur, d, stats, nc + 1

            prev, delta, stats, nc = lax.cond(
                do_check, checked, lambda op: op, (prev, delta, stats, nc)
            )
            return (W, H, it, prev, delta, stats, nc)

        W, H, it, err, delta, stats, nc = lax.while_loop(cond, body, carry)
        converged = delta <= threshold

        He = effective_h(aux, H)
        fro = D.frobenius_error(V, W, He, sum_v_sq).astype(jnp.float32)
        if kl_objective:
            kl = D.kl_error(V, W, He).astype(jnp.float32)
            compare = kl  # best-of-N uses the objective being minimized
        else:
            kl = jnp.asarray(0.0, jnp.float32)
            compare = err
        return W, H, err, fro, kl, compare, it, converged, stats, nc

    return jax.jit(run, donate_argnums=(1, 2))


def _get_runner(config: NmfConfig, shape, dtype, callback):
    if callback is not None:
        # Callbacks are arbitrary Python objects; don't cache across them.
        return _build_dense_runner(config, callback)
    key = (config, shape, str(dtype))
    runner = _RUNNER_CACHE.get(key)
    if runner is None:
        runner = _build_dense_runner(config, None)
        _RUNNER_CACHE[key] = runner
    return runner


def compute(
    V,
    config: NmfConfig,
    W0=None,
    H0=None,
    callback: Callable[[Any, Any, Any, Any], None] | None = None,
) -> NmfResult:
    """Factorize dense V ≈ W H under `config` (reference: nmfgpu_compute).

    For sparse inputs use `nmftpu.sparse_ops.compute_sparse` (or the
    top-level `nmftpu.nmf`, which dispatches on the input type).

    callback, if given, is invoked (host-side, async) at every convergence
    check with (run_index, iteration, error, delta) — the reference's
    per-iteration statistics callback (SURVEY.md C17).
    """
    dtype = jnp.dtype(config.dtype)
    V = jnp.asarray(V, dtype)
    if V.ndim != 2:
        raise ValueError(f"V must be 2-D, got shape {V.shape}")
    n, m = V.shape
    if config.rank > min(n, m):
        raise ValueError(
            f"rank {config.rank} exceeds min(V.shape) = {min(n, m)}"
        )

    runner = _get_runner(config, V.shape, dtype, callback)
    root = jax.random.PRNGKey(config.seed)

    best = None
    run_errors: list[float] = []
    t0 = time.perf_counter()
    for run_idx in range(config.num_runs):
        key = jax.random.fold_in(root, run_idx)
        W, H = initialize_factors(
            V,
            config.rank,
            config.init_method,
            key,
            W0=W0,
            H0=H0,
            kmeans_max_iter=config.kmeans_max_iter,
        )
        out = runner(V, W, H, jnp.asarray(run_idx, jnp.int32))
        (W, H, err, fro, kl, compare, it, converged, stats, nc) = out
        compare_host = float(compare)
        run_errors.append(compare_host)
        if best is None or compare_host < best[0]:
            best = (compare_host, run_idx, W, H, err, fro, kl, it, converged,
                    stats, nc)
    elapsed_ms = (time.perf_counter() - t0) * 1e3

    (_, best_idx, W, H, err, fro, kl, it, converged, stats, nc) = best
    nc = int(nc)
    stats_np = np.asarray(stats)[:nc]
    n_total = V.shape[0] * V.shape[1]
    fro_f = float(fro)
    return NmfResult(
        W=W,
        H=H,
        error=float(err),
        frobenius_error=fro_f,
        rmsd=fro_f / np.sqrt(n_total),
        kl_error=float(kl) if config.objective is Objective.KL else None,
        num_iterations=int(it),
        converged=bool(converged),
        best_run=best_idx,
        run_errors=run_errors,
        stats=RunStats(
            iterations=stats_np[:, 0].astype(np.int64),
            errors=stats_np[:, 1],
            deltas=stats_np[:, 2],
        ),
        elapsed_ms=elapsed_ms,
    )
