"""Sharded driver: `compute_sharded` factorizes a sparse matrix over a 2-D
device mesh, reusing the generic on-device loop (`nmftpu.loop`) with
shard_map-based LoopOps (SURVEY.md §2.9, §7-PR4).

Factor padding contract: W/H are allocated at the tile-padded shapes
(pu*block_rows, r) / (r, pi*block_cols); padding rows/cols start at zero
and are absorbing under every update rule, so they never affect errors.
Results are un-permuted (if load balancing permuted rows/cols) and cropped
back to the true (n, r)/(r, m) shapes before returning.
"""

from __future__ import annotations

from typing import Any, Callable

import jax
import jax.numpy as jnp
import numpy as np

from nmftpu.config import Initialization, NmfConfig
from nmftpu.loop import LoopOps, NmfResult, build_runner, execute
from nmftpu.parallel.mesh import factor_shardings, make_grid_mesh
from nmftpu.parallel.sharded_coo import ShardedCOO, partition_sparse
from nmftpu.parallel.updates import build_sharded_errors, build_sharded_update
from nmftpu import sparse as host_sparse
from nmftpu import sparse_ops

_RUNNER_CACHE: dict[tuple, Callable] = {}


def _sharded_ops(config: NmfConfig, mesh, scoo: ShardedCOO) -> LoopOps:
    make_aux, update, effective_h = build_sharded_update(config, mesh, scoo)
    fro, kl = build_sharded_errors(mesh, scoo)
    return LoopOps(
        make_aux=make_aux,
        update=update,
        effective_h=effective_h,
        frobenius=lambda V, aux, W, He, svsq: fro(V, W, He, svsq),
        kl=lambda V, aux, W, He: kl(V, W, He),
        sum_v_sq=lambda V: jnp.sum(V.values * V.values),
        numel=lambda V: V.shape[0] * V.shape[1],
    )


def _put_global(X, sharding):
    """Place a host array onto a (possibly multi-host) sharding: each
    process materializes only the shards its devices own."""
    X = np.asarray(X)
    return jax.make_array_from_callback(
        X.shape, sharding, lambda idx: X[idx]
    )


def _pad_perm_matrix(X, perm, padded, axis):
    """Permute+pad a factor along `axis`: out[perm[i]] = X[i], rest 0."""
    X = np.asarray(X)
    shape = list(X.shape)
    shape[axis] = padded
    out = np.zeros(shape, X.dtype)
    if axis == 0:
        out[perm] = X
    else:
        out[:, perm] = X
    return out


def _sharded_init(
    mat: host_sparse.SparseMatrix,
    config: NmfConfig,
    shardings,
    row_perm,
    col_perm,
    W0,
    H0,
    shape,
    padded_shape,
    mean_v,
    dtype,
):
    """Build the per-run init closure producing padded, sharded factors."""
    n, m = shape
    pn, pm = padded_shape
    r = config.rank
    method = config.init_method
    scale = float(np.sqrt(max(mean_v, 1e-12) / r))

    row_mask = jnp.zeros((pn, 1), dtype).at[jnp.asarray(row_perm), 0].set(1.0)
    col_mask = jnp.zeros((1, pm), dtype).at[0, jnp.asarray(col_perm)].set(1.0)

    if method is Initialization.COPY_EXISTING:
        if W0 is None or H0 is None:
            raise ValueError("COPY_EXISTING requires both W0 and H0")
        Wp = jnp.asarray(_pad_perm_matrix(W0, row_perm, pn, 0), dtype)
        Hp = jnp.asarray(_pad_perm_matrix(H0, col_perm, pm, 1), dtype)

        def init_fn(key):
            return (
                _put_global(Wp, shardings["W"]),
                _put_global(Hp, shardings["H"]),
            )

        return init_fn

    if method is Initialization.ALL_RANDOM_VALUES:

        def init_fn(key):
            kw, kh = jax.random.split(key)
            W = (jax.random.uniform(kw, (pn, r), dtype) + 1e-4) * scale
            H = (jax.random.uniform(kh, (r, pm), dtype) + 1e-4) * scale
            W = W * row_mask       # zero the padding rows (absorbing)
            H = H * col_mask
            # same key on every process -> identical host values -> each
            # process places its own shards
            return (
                _put_global(W, shardings["W"]),
                _put_global(H, shardings["H"]),
            )

        return init_fn

    # Data-dependent inits (MeanColumns / k-means family): run the
    # single-device sparse init path, then permute+pad+shard. Init is a
    # one-time cost; scaling it out is future work (SURVEY.md §7 notes
    # host-side init is acceptable).
    coo_1d = sparse_ops.device_put_sparse(mat, dtype=dtype)

    def init_fn(key):
        W1, H1 = sparse_ops.sparse_initialize_factors(
            coo_1d, r, method, key,
            kmeans_max_iter=config.kmeans_max_iter,
        )
        Wp = _pad_perm_matrix(np.asarray(W1), row_perm, pn, 0)
        Hp = _pad_perm_matrix(np.asarray(H1), col_perm, pm, 1)
        return (
            _put_global(Wp, shardings["W"]),
            _put_global(Hp, shardings["H"]),
        )

    return init_fn


def compute_sharded(
    V: host_sparse.SparseMatrix,
    config: NmfConfig,
    mesh=None,
    mesh_shape: tuple[int, int] | None = None,
    W0=None,
    H0=None,
    balance: bool = True,
    chunk: int = 8192,
    engine: str = "auto",
    callback: Callable[[Any, Any, Any, Any], None] | None = None,
    interrupt: Callable[[], bool] | None = None,
) -> NmfResult:
    """Factorize sparse V over a 2-D ('users','items') device mesh.

    The full update/convergence loop runs under jit with one shard_map
    region per iteration; see nmftpu.parallel.updates for the collective
    pattern. Returns factors in the ORIGINAL row/column order, cropped to
    the true shape.

    engine: per-tile sparse engine — "ell" (gather-only bucketed segments,
    MU family, ~3x faster per tile), "scatter" (chunked COO, all
    algorithms), or "auto" (ell for MU, else scatter).
    """
    from nmftpu.config import Algorithm

    if mesh is None:
        mesh = make_grid_mesh(mesh_shape)
    shardings = factor_shardings(mesh)
    dtype = jnp.dtype(config.dtype)
    n, m = V.shape
    if config.rank > min(n, m):
        raise ValueError(
            f"rank {config.rank} exceeds min(V.shape) = {min(n, m)}"
        )

    if engine == "auto":
        engine = "ell" if config.algorithm is Algorithm.MU else "scatter"

    if engine == "ell":
        from nmftpu.parallel import sharded_ell as SEL

        sell, row_perm, col_perm = SEL.partition_sparse_ell(
            V, tuple(mesh.devices.shape), dtype=dtype,
            balance=balance, seed=config.seed, mesh=mesh,
        )
        make_aux, update, eff_h = SEL.build_sharded_ell_update(
            config, mesh, sell
        )
        fro, kl = SEL.build_sharded_ell_errors(mesh, sell)
        ops = LoopOps(
            make_aux=make_aux,
            update=update,
            effective_h=eff_h,
            frobenius=lambda s, aux, W, He, svsq: fro(s, W, He, svsq),
            kl=lambda s, aux, W, He: kl(s, W, He),
            sum_v_sq=lambda s: sum(
                jnp.sum(v * v) for v in s.r_vals
            ),
            numel=lambda s: s.shape[0] * s.shape[1],
        )
        operand = sell
        padded_shape = sell.padded_shape
        mean_v = float(sum(float(jnp.sum(v)) for v in sell.r_vals)) / (
            float(n) * float(m)
        )
        cache_key = (
            config, sell.shape, "ell",
            tuple(a.shape for a in sell.r_vals), str(dtype),
            tuple(mesh.devices.flat), mesh.axis_names,
        )
    else:
        scoo, row_perm, col_perm = partition_sparse(
            V, tuple(mesh.devices.shape), dtype=dtype, chunk=chunk,
            balance=balance, seed=config.seed,
            out_shardings=shardings["tile"],
        )
        ops = _sharded_ops(config, mesh, scoo)
        operand = scoo
        padded_shape = scoo.padded_shape
        mean_v = float(jnp.sum(scoo.values)) / (float(n) * float(m))
        cache_key = (
            config, scoo.shape, scoo.values.shape, str(dtype),
            tuple(mesh.devices.flat), mesh.axis_names,
        )

    if callback is not None or interrupt is not None:
        runner = build_runner(config, ops, callback, interrupt)
    else:
        runner = _RUNNER_CACHE.get(cache_key)
        if runner is None:
            runner = build_runner(config, ops, None)
            _RUNNER_CACHE[cache_key] = runner

    init_fn = _sharded_init(
        V, config, shardings, row_perm, col_perm, W0, H0,
        (n, m), padded_shape, mean_v, dtype,
    )

    result = execute(operand, config, runner, init_fn, numel=n * m)

    if jax.process_count() > 1:
        # Multi-host: the factors stay distributed (permuted + padded);
        # callers slice/unpermute with the attached index maps.
        result.row_perm = row_perm
        result.col_perm = col_perm
        return result

    # Un-permute and crop the padded factors back to user coordinates.
    W_full = np.asarray(result.W)
    H_full = np.asarray(result.H)
    result.W = jnp.asarray(W_full[row_perm])        # (n, r), original order
    result.H = jnp.asarray(H_full[:, col_perm])     # (r, m)
    return result
