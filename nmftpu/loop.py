"""Generic on-device iterate/converge loop shared by the dense and sparse
drivers (SURVEY.md C2/C9/C17, §3.2).

The data operand V is any pytree (a dense array, or a DeviceCOO); the
algorithm-specific math is injected as a `LoopOps` bundle. The whole loop —
update, periodic error check, delta threshold, stats recording — runs inside
one `lax.while_loop` in one jit with donated factor buffers, so nothing
crosses the host boundary until a run finishes (the reference's per-check
D2H error sync was its stall point).
"""

from __future__ import annotations

import dataclasses
import time
from typing import Any, Callable

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

from nmftpu.config import NmfConfig, Objective, ThresholdType


@dataclasses.dataclass(frozen=True)
class LoopOps:
    """Algorithm/data-format specific operations for the generic loop.

    make_aux(V)                      -> aux pytree of loop constants
    update(V, aux, W, H)             -> (W, H)
    effective_h(aux, H)              -> H used for error metrics (nsNMF: S@H)
    frobenius(V, aux, W, He, svsq)   -> ||V - W He||_F
    kl(V, aux, W, He)                -> D_KL(V || W He)   (may be None)
    sum_v_sq(V)                      -> ||V||_F^2 (precomputed per problem)
    numel(V)                         -> total entry count n*m (for RMSD)
    """

    make_aux: Callable
    update: Callable
    effective_h: Callable
    frobenius: Callable
    kl: Callable | None
    sum_v_sq: Callable
    numel: Callable


@dataclasses.dataclass
class RunStats:
    """Per-check convergence records for one run (SURVEY.md C17)."""

    iterations: np.ndarray
    errors: np.ndarray
    deltas: np.ndarray


@dataclasses.dataclass
class NmfResult:
    """Result of a factorization: best-of-N factors plus metadata."""

    W: jax.Array
    H: jax.Array
    error: float
    frobenius_error: float
    rmsd: float
    # For objective=KL this is D_KL(V || WH); for the generalized beta
    # objective it is D_beta (the quantity best-of-N minimizes); None
    # under Frobenius.
    kl_error: float | None
    num_iterations: int
    converged: bool
    best_run: int
    run_errors: list[float]
    stats: RunStats
    # Host wall-clock over all runs. Includes jit compilation on the FIRST
    # invocation of a given (config, shape) — subsequent calls reuse the
    # cached runner and report pure compute.
    elapsed_ms: float
    # Multi-host sharded runs only: factors are returned still permuted /
    # padded (gathering to one host is not meaningful there); these record
    # the original->permuted index maps needed to interpret them.
    row_perm: object = None
    col_perm: object = None


def _verbose_callback(run_idx, iteration, error, delta):
    print(
        f"[nmftpu] run {int(run_idx)} iter {int(iteration):6d}  "
        f"error {float(error):.6g}  delta {float(delta):.3g}"
    )


def _make_verbose_callback_timed():
    """Verbosity 3: per-check line including wall-clock since the run's
    first check — the reference's full stats record {iteration, error,
    delta, elapsed ms} (SURVEY.md C17)."""
    state = {"run": None, "t0": 0.0, "it": -1}

    def cb(run_idx, iteration, error, delta):
        now = time.perf_counter()
        # reset on a new run AND on a non-increasing iteration (the
        # runner — and therefore this closure — is cached across driver
        # invocations, so a fresh call re-enters with run 0 again)
        if state["run"] != int(run_idx) or int(iteration) <= state["it"]:
            state["run"] = int(run_idx)
            state["t0"] = now
        state["it"] = int(iteration)
        ms = (now - state["t0"]) * 1e3
        print(
            f"[nmftpu] run {int(run_idx)} iter {int(iteration):6d}  "
            f"error {float(error):.6g}  delta {float(delta):.3g}  "
            f"elapsed {ms:.1f} ms"
        )

    return cb


def build_runner(config: NmfConfig, ops: LoopOps, callback,
                 interrupt=None, jit_wrap=True):
    """Build the jitted single-run loop for (config, ops).

    interrupt: optional zero-arg host callable polled at every convergence
    check (reference C9: user-interrupt polling); truthy return stops the
    run and returns the current factors.
    jit_wrap=False returns the raw traceable run function instead of
    the jitted wrapper — for callers that transform it first (the
    batched driver vmaps it over a problem stack).
    """
    if interrupt is not None and config.vectorize_runs and config.num_runs > 1:
        # ordered io_callback (the interrupt poll) is unsupported under
        # vmap; fail clearly instead of an opaque trace-time error.
        raise ValueError(
            "interrupt= cannot be combined with vectorize_runs=True "
            "(ordered io_callback does not support vmap); use sequential "
            "runs for interruptible execution"
        )
    if callback is None and config.verbosity >= 3:
        callback = _make_verbose_callback_timed()
    elif callback is None and config.verbosity >= 2:
        callback = _verbose_callback
    num_iterations = config.num_iterations
    check_interval = config.check_interval
    threshold = (
        float(config.threshold_value)
        if config.threshold_value > 0
        else -float("inf")
    )
    max_checks = num_iterations // check_interval + 2
    # Non-Frobenius objectives (KL / generalized beta) hand best-of-N
    # their own divergence through the `kl` slot; convergence deltas
    # stay on the cheap Gram-trick Frobenius metric either way.
    kl_objective = config.objective is not Objective.FROBENIUS
    use_rmsd = config.threshold_type is ThresholdType.RMSD

    def error_metric(V, aux, W, H, sum_v_sq, numel):
        He = ops.effective_h(aux, H)
        fro = ops.frobenius(V, aux, W, He, sum_v_sq)
        if use_rmsd:
            return fro / jnp.sqrt(jnp.asarray(numel, fro.dtype))
        return fro

    def run(V, W, H, run_idx):
        aux = ops.make_aux(V)
        sum_v_sq = ops.sum_v_sq(V)
        numel = ops.numel(V)
        err0 = error_metric(V, aux, W, H, sum_v_sq, numel).astype(jnp.float32)
        stats = jnp.zeros((max_checks, 3), dtype=jnp.float32)
        carry = (
            W,
            H,
            jnp.asarray(0, jnp.int32),
            err0,
            jnp.asarray(jnp.inf, jnp.float32),
            stats,
            jnp.asarray(0, jnp.int32),
            jnp.asarray(False),
        )

        def cond(c):
            _, _, it, _, delta, _, _, stop = c
            return (it < num_iterations) & (delta > threshold) & ~stop

        def body(c):
            W, H, it, prev, delta, stats, nc, stop = c
            with jax.named_scope("nmftpu.update_step"):
                W, H = ops.update(V, aux, W, H)
            it = it + 1
            do_check = (it % check_interval == 0) | (it == num_iterations)

            def checked(op):
                prev, _, stats, nc, stop = op
                with jax.named_scope("nmftpu.error_check"):
                    cur = error_metric(
                        V, aux, W, H, sum_v_sq, numel
                    ).astype(jnp.float32)
                d = jnp.abs(prev - cur)
                rec = jnp.stack([it.astype(jnp.float32), cur, d])
                stats = stats.at[nc].set(rec)
                if callback is not None:
                    jax.debug.callback(callback, run_idx, it, cur, d)
                if interrupt is not None:
                    from jax.experimental import io_callback

                    stop = io_callback(
                        lambda: np.bool_(bool(interrupt())),
                        jax.ShapeDtypeStruct((), jnp.bool_),
                        ordered=True,
                    )
                return cur, d, stats, nc + 1, stop

            prev, delta, stats, nc, stop = lax.cond(
                do_check, checked, lambda op: op,
                (prev, delta, stats, nc, stop),
            )
            return (W, H, it, prev, delta, stats, nc, stop)

        (W, H, it, err, delta, stats, nc, stop) = lax.while_loop(
            cond, body, carry
        )
        converged = (delta <= threshold) & ~stop

        He = ops.effective_h(aux, H)
        fro = ops.frobenius(V, aux, W, He, sum_v_sq).astype(jnp.float32)
        if kl_objective:
            kl = ops.kl(V, aux, W, He).astype(jnp.float32)
            compare = kl  # best-of-N compares the objective being minimized
        else:
            kl = jnp.asarray(0.0, jnp.float32)
            compare = err
        return W, H, err, fro, kl, compare, it, converged, stats, nc

    if not jit_wrap:
        return run
    return jax.jit(run, donate_argnums=(1, 2))


def _execute_vectorized(V_dev, config, runner, init_fn, numel):
    """All restarts as one vmapped program: stacked factors, lockstep
    iteration, on-device best-of argmin. One compile, one dispatch."""
    root = jax.random.PRNGKey(config.seed)
    t0 = time.perf_counter()
    inits = [
        init_fn(jax.random.fold_in(root, i))
        for i in range(config.num_runs)
    ]
    Ws = jnp.stack([w for w, _ in inits])
    Hs = jnp.stack([h for _, h in inits])
    run_ids = jnp.arange(config.num_runs, dtype=jnp.int32)
    out = jax.vmap(runner, in_axes=(None, 0, 0, 0))(V_dev, Ws, Hs, run_ids)
    (W, H, err, fro, kl, compare, it, converged, stats, nc) = out
    best = int(jnp.argmin(compare))
    elapsed_ms = (time.perf_counter() - t0) * 1e3

    ncb = int(nc[best])
    stats_np = np.asarray(stats[best])[:ncb]
    fro_f = float(fro[best])
    return NmfResult(
        W=W[best],
        H=H[best],
        error=float(err[best]),
        frobenius_error=fro_f,
        rmsd=fro_f / np.sqrt(numel),
        kl_error=(
            float(kl[best])
            if config.objective is not Objective.FROBENIUS else None
        ),
        num_iterations=int(it[best]),
        converged=bool(converged[best]),
        best_run=best,
        run_errors=[float(x) for x in np.asarray(compare)],
        stats=RunStats(
            iterations=stats_np[:, 0].astype(np.int64),
            errors=stats_np[:, 1],
            deltas=stats_np[:, 2],
        ),
        elapsed_ms=elapsed_ms,
    )


def execute(
    V_dev: Any,
    config: NmfConfig,
    runner,
    init_fn: Callable,
    numel: int,
) -> NmfResult:
    """Multi-run restart loop (SURVEY.md §3.5): re-enter the compiled runner
    per seed; only the final comparison scalar crosses to the host."""
    if config.vectorize_runs and config.num_runs > 1:
        return _execute_vectorized(V_dev, config, runner, init_fn, numel)
    root = jax.random.PRNGKey(config.seed)
    best = None
    run_errors: list[float] = []
    t0 = time.perf_counter()
    for run_idx in range(config.num_runs):
        key = jax.random.fold_in(root, run_idx)
        W, H = init_fn(key)
        out = runner(V_dev, W, H, jnp.asarray(run_idx, jnp.int32))
        (W, H, err, fro, kl, compare, it, converged, stats, nc) = out
        compare_host = float(compare)
        run_errors.append(compare_host)
        if config.verbosity >= 1:
            print(
                f"[nmftpu] run {run_idx}: {int(it)} iterations, "
                f"final error {compare_host:.6g}"
                f"{' (converged)' if bool(converged) else ''}"
            )
        if best is None or compare_host < best[0]:
            best = (
                compare_host, run_idx, W, H, err, fro, kl, it, converged,
                stats, nc,
            )
    elapsed_ms = (time.perf_counter() - t0) * 1e3

    (_, best_idx, W, H, err, fro, kl, it, converged, stats, nc) = best
    nc = int(nc)
    stats_np = np.asarray(stats)[:nc]
    fro_f = float(fro)
    return NmfResult(
        W=W,
        H=H,
        error=float(err),
        frobenius_error=fro_f,
        rmsd=fro_f / np.sqrt(numel),
        kl_error=(float(kl) if config.objective
                  is not Objective.FROBENIUS else None),
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
