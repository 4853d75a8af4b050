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

from nmftpu.config import Initialization, NmfConfig, resolve_dtype
from nmftpu.loop import LoopOps, NmfResult, build_runner, execute
from nmftpu.parallel.mesh import factor_shardings, make_grid_mesh
from nmftpu.parallel.sharded_coo import ShardedCOO, partition_sparse
from nmftpu.parallel.updates import build_sharded_errors, build_sharded_update
from nmftpu import sparse as host_sparse
from nmftpu import sparse_ops

_RUNNER_CACHE: dict[tuple, Callable] = {}


def _sharded_ops(config: NmfConfig, mesh, scoo: ShardedCOO) -> LoopOps:
    from nmftpu.config import Objective

    make_aux, update, effective_h = build_sharded_update(config, mesh, scoo)
    masked = config.mask == "observed"
    fro, kl = build_sharded_errors(mesh, scoo, masked=masked)
    if config.objective is Objective.BETA:
        from nmftpu.parallel.updates import build_sharded_beta_error

        kl = build_sharded_beta_error(mesh, scoo, config.beta)
    return LoopOps(
        make_aux=make_aux,
        update=update,
        effective_h=effective_h,
        frobenius=lambda V, aux, W, He, svsq: fro(V, W, He, svsq),
        kl=lambda V, aux, W, He: kl(V, W, He),
        sum_v_sq=lambda V: (
            jnp.asarray(0.0, jnp.float32) if masked
            else jnp.sum(V.values * V.values)
        ),
        # completion metrics (incl. the RMSD denominator) run over the
        # observed set, matching the single-device masked bundle
        numel=lambda V: V.nnz if masked else V.shape[0] * V.shape[1],
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


def _perm_padded_shards(X, perm, padded, axis, r, sharding, dtype):
    """Place perm+pad of X directly shard-by-shard: each process builds
    only the shard slices its devices own (never the full padded factor).
    out[perm[i]] = X[i] along `axis`; other slots zero."""
    X = np.asarray(X)
    n = X.shape[axis]
    inv = np.full(padded, -1, np.int64)
    inv[np.asarray(perm)] = np.arange(n)
    shape = (padded, r) if axis == 0 else (r, padded)

    def cb(idx):
        sl = idx[axis]
        src = inv[sl]
        used = src >= 0
        if axis == 0:
            out = np.zeros((src.shape[0], X.shape[1]), dtype)
            out[used] = X[src[used]]
            return out[:, idx[1]]
        out = np.zeros((X.shape[0], src.shape[0]), dtype)
        out[:, used] = X[:, src[used]]
        return out[idx[0], :]

    return jax.make_array_from_callback(shape, sharding, cb)


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
    mesh=None,
    row_axis=None,
    col_axis=None,
    init_scoo=None,
):
    """Build the per-run init closure producing padded, sharded factors.

    ALL_RANDOM_VALUES generates SHARD-LOCAL randomness inside shard_map
    (key folded by mesh axis index): no host or device ever materializes a
    full (pn, r)/(r, pm) factor — required at the 100M-user scale of
    BASELINE config #4. COPY_EXISTING likewise places user factors
    shard-by-shard."""
    n, m = shape
    pn, pm = padded_shape
    r = config.rank
    method = config.init_method
    scale = float(np.sqrt(max(mean_v, 1e-12) / r))

    if method is Initialization.COPY_EXISTING:
        if W0 is None or H0 is None:
            raise ValueError("COPY_EXISTING requires both W0 and H0")

        def init_fn(key):
            return (
                _perm_padded_shards(
                    W0, row_perm, pn, 0, r, shardings["W"], dtype
                ),
                _perm_padded_shards(
                    H0, col_perm, pm, 1, r, shardings["H"], dtype
                ),
            )

        return init_fn

    if method is Initialization.ALL_RANDOM_VALUES:
        from jax.sharding import PartitionSpec as P

        from nmftpu.parallel.mesh import AXIS_ITEMS, AXIS_USERS

        row_axis = row_axis or AXIS_USERS
        col_axis = col_axis or AXIS_ITEMS
        pu = mesh.shape[row_axis]
        pi = mesh.shape[col_axis]
        bw, bh = pn // pu, pm // pi

        # Padding-slot masks, placed shard-by-shard from compact host
        # bools (O(pn + pm) host memory, not O(pn * r)).
        row_used = np.zeros((pn, 1), bool)
        row_used[np.asarray(row_perm), 0] = True
        col_used = np.zeros((1, pm), bool)
        col_used[0, np.asarray(col_perm)] = True
        rm_dev = _put_global(row_used, shardings["W"])
        cm_dev = _put_global(col_used, shardings["H"])

        def _gen(key, rm, cm):
            # W shards fold only the 'users' index and H shards only the
            # 'items' index, so each factor is well-defined (identical)
            # along its replicated mesh axis.
            iu = jax.lax.axis_index(row_axis)
            ii = jax.lax.axis_index(col_axis)
            kw, kh = jax.random.split(key)
            kw = jax.random.fold_in(kw, iu)
            kh = jax.random.fold_in(kh, ii)
            Wl = (jax.random.uniform(kw, (bw, r), dtype) + 1e-4) * scale
            Hl = (jax.random.uniform(kh, (r, bh), dtype) + 1e-4) * scale
            return Wl * rm.astype(dtype), Hl * cm.astype(dtype)

        gen = jax.jit(jax.shard_map(
            _gen, mesh=mesh,
            in_specs=(P(), P(row_axis, None), P(None, col_axis)),
            out_specs=(P(row_axis, None), P(None, col_axis)),
        ))

        def init_fn(key):
            return gen(key, rm_dev, cm_dev)

        # exposed for the multichip dryrun's no-full-factor HLO assertion
        init_fn._gen = gen
        init_fn._gen_args = (rm_dev, cm_dev)
        return init_fn

    # Data-dependent inits (MeanColumns / k-means family).
    if init_scoo is not None:
        # Mesh-native: k-means assignment/centroid updates run inside
        # shard_map (shard-local argmin + psum'd sums) — no single-device
        # detour, no full factors anywhere (parallel/init_sharded.py;
        # ring meshes use the rotation/ring-reduce dataflows instead).
        from nmftpu.parallel.ring import AXIS_RING

        if row_axis == AXIS_RING:
            from nmftpu.parallel.ring import build_ring_data_init

            init = build_ring_data_init(config, mesh, init_scoo)
        else:
            from nmftpu.parallel.init_sharded import (
                build_sharded_data_init,
            )

            init = build_sharded_data_init(config, mesh, init_scoo)

        def init_fn(key):
            return init(key, init_scoo)

        return init_fn

    # Fallback: single-device init, then permute+pad+shard.
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


class ShardedPlan:
    """Partitioned, device-resident operand reusable across runs.

    `prepare_sharded` pays the host-side cost ONCE (load balancing,
    tile/bucket building, device placement — seconds at 10M+ nnz);
    `.run()` then executes the factorization loop. Compiled runners are
    cached per config, so sweeps over rank-independent loop knobs
    (iterations, threshold, seeds, runs) reuse both the partition and,
    where the config matches, the compiled program.

    The partition is built with the dtype, seed (balancing permutation)
    and engine fixed at prepare time; `.run(config)` may vary any loop-
    level or algorithm-level knob but must keep `dtype` (validated).
    """

    def __init__(self, *, V, config, mesh, shardings, engine, operand,
                 row_perm, col_perm, padded_shape, mean_v, dtype,
                 row_axis, col_axis, chunk, balance, partition_key,
                 init_scoo=None):
        self.V = V
        self.config = config
        self.mesh = mesh
        self.shardings = shardings
        self.engine = engine
        self.operand = operand
        self.row_perm = row_perm
        self.col_perm = col_perm
        self.padded_shape = padded_shape
        self.mean_v = mean_v
        self.dtype = dtype
        self.row_axis = row_axis
        self.col_axis = col_axis
        self.chunk = chunk
        self.balance = balance
        self.shape = V.shape
        self._pkey = partition_key
        self._init_scoo = init_scoo

    def _ops(self, config: NmfConfig) -> LoopOps:
        if self.engine == "ring":
            from nmftpu.config import Objective as _O
            from nmftpu.parallel import ring as RING

            make_aux, update, eff_h = RING.build_ring_update(
                config, self.mesh, self.operand
            )
            fro, kl = RING.build_ring_errors(self.mesh, self.operand)
            if config.objective is _O.BETA:
                kl = RING.build_ring_beta_error(
                    self.mesh, self.operand, config.beta
                )
            return LoopOps(
                make_aux=make_aux,
                update=update,
                effective_h=eff_h,
                frobenius=lambda s, aux, W, He, svsq: fro(s, W, He, svsq),
                kl=lambda s, aux, W, He: kl(s, W, He),
                sum_v_sq=lambda s: jnp.sum(s.values * s.values),
                numel=lambda s: s.shape[0] * s.shape[1],
            )
        if self.engine == "ell":
            from nmftpu.config import Objective as _O
            from nmftpu.parallel import sharded_ell as SEL

            make_aux, update, eff_h = SEL.build_sharded_ell_update(
                config, self.mesh, self.operand
            )
            fro, kl = SEL.build_sharded_ell_errors(self.mesh, self.operand)
            if config.objective is _O.BETA:
                kl = SEL.build_sharded_ell_beta_error(
                    self.mesh, self.operand, config.beta
                )
            return LoopOps(
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
        return _sharded_ops(config, self.mesh, self.operand)

    def _data_dep_scoo(self, config: NmfConfig):
        """Tiled COO for mesh-native data-dependent inits (lazy for the
        ELL engine, where it is an extra one-time partition)."""
        if self._init_scoo is not None:
            return self._init_scoo
        if self.engine in ("scatter", "ring"):
            self._init_scoo = self.operand
            return self._init_scoo
        # ELL: same seed => identical perms/blocking as the ELL partition;
        # the COO copy exists only for the one-time mesh-native init.
        init_scoo, rp2, cp2 = partition_sparse(
            self.V, tuple(self.mesh.devices.shape), dtype=self.dtype,
            chunk=self.chunk, balance=self.balance,
            seed=self.config.seed, out_shardings=self.shardings["tile"],
        )
        assert np.array_equal(rp2, self.row_perm) and np.array_equal(
            cp2, self.col_perm
        )
        self._init_scoo = init_scoo
        return init_scoo

    def run(
        self,
        config: NmfConfig | None = None,
        W0=None,
        H0=None,
        callback: Callable[[Any, Any, Any, Any], None] | None = None,
        interrupt: Callable[[], bool] | None = None,
        unpermute: bool = True,
    ) -> NmfResult:
        """Execute the factorization loop on the prepared partition.

        unpermute=False skips the final device→host fetch + un-permute of
        the full factors: W/H come back sharded, PADDED and in partition
        order, with `row_perm`/`col_perm` attached for callers that keep
        factors on-device (sharded retrieval, checkpointing, benchmarks).
        """
        if config is None:
            config = self.config
        n, m = self.shape
        if config.rank > min(n, m):
            raise ValueError(
                f"rank {config.rank} exceeds min(V.shape) = {min(n, m)}"
            )
        if jnp.dtype(config.dtype) != self.dtype:
            raise ValueError(
                f"config.dtype {config.dtype} differs from the plan's "
                f"partition dtype {self.dtype}; re-run prepare_sharded"
            )
        # Note: the balancing permutation was drawn from the PREPARE-time
        # seed; a run-time config.seed feeds only the init/run RNG.

        cache_key = (config,) + self._pkey
        if callback is not None or interrupt is not None:
            runner = build_runner(config, self._ops(config), callback,
                                  interrupt)
        else:
            runner = _RUNNER_CACHE.get(cache_key)
            if runner is None:
                runner = build_runner(config, self._ops(config), None)
                _RUNNER_CACHE[cache_key] = runner

        data_dep = config.init_method in (
            Initialization.MEAN_COLUMNS,
            Initialization.K_MEANS_AND_RANDOM_VALUES,
            Initialization.K_MEANS_AND_NON_NEGATIVE_WTV,
            Initialization.K_MEANS_AND_ABSOLUTE_WTV,
        )
        init_scoo = self._data_dep_scoo(config) if data_dep else None

        init_fn = _sharded_init(
            self.V, config, self.shardings, self.row_perm, self.col_perm,
            W0, H0, (n, m), self.padded_shape, self.mean_v, self.dtype,
            mesh=self.mesh, row_axis=self.row_axis,
            col_axis=self.col_axis, init_scoo=init_scoo,
        )

        result = execute(
            self.operand, config, runner, init_fn,
            # masked runs report every metric (incl. rmsd's denominator)
            # over the OBSERVED set, mirroring SparsePlan.run
            numel=(self.V.nnz if config.mask == "observed" else n * m),
        )

        if jax.process_count() > 1 or not unpermute:
            # Multi-host (or unpermute=False): the factors stay
            # distributed (permuted + padded); callers slice/unpermute
            # with the index maps.
            result.row_perm = self.row_perm
            result.col_perm = self.col_perm
            return result

        # Un-permute and crop padded factors back to user coordinates.
        W_full = np.asarray(result.W)
        H_full = np.asarray(result.H)
        result.W = jnp.asarray(W_full[self.row_perm])   # (n, r)
        result.H = jnp.asarray(H_full[:, self.col_perm])  # (r, m)
        return result


def prepare_sharded(
    V: host_sparse.SparseMatrix,
    config: NmfConfig,
    mesh=None,
    mesh_shape: tuple[int, int] | None = None,
    balance: bool = True,
    chunk: int = 8192,
    engine: str = "auto",
) -> ShardedPlan:
    """Partition sparse V over the mesh once, returning a reusable
    :class:`ShardedPlan`. Use when factorizing the same matrix repeatedly
    (hyperparameter sweeps, warm restarts, benchmarking): the host-side
    balance/tile/bucket build and device placement — the expensive part
    at 10M+ nonzeros — happens here, not per run."""
    from nmftpu.config import Algorithm

    if config.mu_style == "jacobi":
        raise ValueError(
            "mu_style='jacobi' is wired through the dense engine only; "
            "sharded engines run gauss-seidel half-steps"
        )
    if mesh is None:
        mesh = make_grid_mesh(mesh_shape)
    shardings = factor_shardings(mesh)
    dtype = resolve_dtype(config.dtype)
    n, m = V.shape
    if config.rank > min(n, m):
        raise ValueError(
            f"rank {config.rank} exceeds min(V.shape) = {min(n, m)}"
        )

    from nmftpu.config import Objective as _Obj

    if engine == "auto":
        if config.mask == "observed":
            engine = "scatter"
        else:
            # MU (incl. generalized beta, which config pins to MU) takes
            # the gather-only ELL tiles — measured ~3x faster per tile.
            engine = "ell" if config.algorithm is Algorithm.MU else "scatter"
    if engine not in ("ell", "scatter", "ring"):
        raise ValueError(
            f"engine must be 'auto', 'ell', 'scatter' or 'ring', "
            f"got {engine!r}"
        )
    from nmftpu.config import Objective

    if config.mask == "observed" and engine != "scatter":
        raise ValueError(
            "mask='observed' (matrix completion) runs the 'scatter' "
            f"grid engine on the mesh (got engine={engine!r}); the "
            "masked denominators are per-tile SDDMM+SpMM over the "
            "stored set"
        )
    if config.v_storage != "float32":
        # Sharded tiles keep values at the compute dtype; honoring
        # low-precision storage here would require per-tile quantized
        # layouts — reject rather than silently run full-precision.
        raise ValueError(
            f"v_storage={config.v_storage!r} is not supported by the "
            "sparse sharded engines (tile values stay at the compute "
            "dtype); use v_storage='float32' here, the single-device "
            "'densified' engine, or the dense mesh path (compute(V, "
            "cfg, mesh=...)), which do honor quantized storage."
        )

    row_axis = col_axis = None
    if engine == "ring":
        from nmftpu.parallel import ring as RING

        mesh = RING.make_ring_mesh(list(mesh.devices.flat))
        shardings = RING.ring_shardings(mesh)
        row_axis = col_axis = RING.AXIS_RING
        p = mesh.devices.size
        operand, row_perm, col_perm = RING.partition_for_ring(
            V, p, dtype=dtype, chunk=chunk, balance=balance,
            seed=config.seed, out_shardings=shardings["tiles"],
        )
        padded_shape = operand.padded_shape
        mean_v = float(jnp.sum(operand.values)) / (float(n) * float(m))
        partition_key = (
            operand.shape, operand.values.shape, "ring", str(dtype),
            tuple(mesh.devices.flat), mesh.axis_names,
        )
    elif engine == "ell":
        from nmftpu.parallel import sharded_ell as SEL

        operand, row_perm, col_perm = SEL.partition_sparse_ell(
            V, tuple(mesh.devices.shape), dtype=dtype,
            balance=balance, seed=config.seed, mesh=mesh,
        )
        padded_shape = operand.padded_shape
        mean_v = float(
            sum(float(jnp.sum(v)) for v in operand.r_vals)
        ) / (float(n) * float(m))
        partition_key = (
            operand.shape, "ell",
            tuple(a.shape for a in operand.r_vals), str(dtype),
            tuple(mesh.devices.flat), mesh.axis_names,
        )
    else:
        operand, row_perm, col_perm = partition_sparse(
            V, tuple(mesh.devices.shape), dtype=dtype, chunk=chunk,
            balance=balance, seed=config.seed,
            out_shardings=shardings["tile"],
        )
        padded_shape = operand.padded_shape
        mean_v = float(jnp.sum(operand.values)) / (float(n) * float(m))
        partition_key = (
            operand.shape, operand.values.shape, str(dtype),
            tuple(mesh.devices.flat), mesh.axis_names,
        )

    return ShardedPlan(
        V=V, config=config, mesh=mesh, shardings=shardings, engine=engine,
        operand=operand, row_perm=row_perm, col_perm=col_perm,
        padded_shape=padded_shape, mean_v=mean_v, dtype=dtype,
        row_axis=row_axis, col_axis=col_axis, chunk=chunk,
        balance=balance, partition_key=partition_key,
    )


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
    algorithms), "ring" (1-D ring topology: H blocks rotate via ppermute —
    SURVEY.md §5.7's long-item-axis answer; uses the mesh's devices as a
    ring regardless of its 2-D shape), or "auto" (ell for MU, else
    scatter).

    Repeated factorizations of the same matrix should use
    :func:`prepare_sharded` once and call ``plan.run(...)`` per sweep
    point — this function re-partitions V on every call.
    """
    plan = prepare_sharded(
        V, config, mesh=mesh, mesh_shape=mesh_shape, balance=balance,
        chunk=chunk, engine=engine,
    )
    return plan.run(W0=W0, H0=H0, callback=callback, interrupt=interrupt)


# ---------------------------------------------------------------------------
# Multi-host row-shard ingestion (BASELINE.json config #4 scale path)
# ---------------------------------------------------------------------------


def prepare_sharded_rowshards(
    local_mat: host_sparse.SparseMatrix,
    row_offset: int,
    global_shape: tuple[int, int],
    config: NmfConfig,
    mesh=None,
    balance: bool = True,
    chunk: int = 8192,
) -> "ShardedPlan":
    """Build a ShardedPlan when EACH PROCESS holds only its own row
    shard of V (its file shard) — no host ever materializes the full
    nonzero set, the contract `partition_sparse` cannot honor (it
    builds the full (pu, pi, cap) tiles on every process).

    local_mat: this process's rows, with LOCAL row indices (0-based);
    row_offset: index of this process's first row in the GLOBAL matrix.
    The shard must cover exactly the row blocks owned by this process's
    devices on the mesh's 'users' axis (processes stack along 'users' —
    the make_grid_mesh default device order; asserted at build time).

    Load balance: rows must be pre-shuffled OFFLINE across file shards
    (a one-time shuffle at dataset creation — at 100M+ rows that is a
    disk-level operation, not an ingest-time one). `balance=True`
    applies the seeded COLUMN permutation only (identical on every
    process — drawn from config.seed, no communication needed).

    Data-dependent inits (mean-columns / k-means) are not supported on
    this path (they would need a second global partition); use random
    or copy_existing.
    """
    import jax.experimental.multihost_utils as mhu

    from nmftpu.config import Initialization
    from nmftpu.parallel.mesh import make_grid_mesh
    from nmftpu.parallel.sharded_coo import ShardedCOO, _round_up

    if mesh is None:
        mesh = make_grid_mesh()
    shardings = factor_shardings(mesh)
    dtype = resolve_dtype(config.dtype)
    n, m = global_shape
    pu, pi = mesh.devices.shape
    if config.init_method in (
        Initialization.MEAN_COLUMNS,
        Initialization.K_MEANS_AND_RANDOM_VALUES,
        Initialization.K_MEANS_AND_NON_NEGATIVE_WTV,
        Initialization.K_MEANS_AND_ABSOLUTE_WTV,
    ):
        raise ValueError(
            "row-shard ingestion supports random/copy_existing inits "
            "only (data-dependent inits need a second global partition)"
        )

    coo = local_mat.to_coo()
    rows = coo.row.astype(np.int64) + int(row_offset)
    if balance:
        col_perm = np.random.default_rng(config.seed).permutation(
            m
        ).astype(np.int32)
        cols = col_perm[coo.col]
    else:
        col_perm = np.arange(m, dtype=np.int32)
        cols = coo.col
    row_perm = np.arange(n, dtype=np.int32)

    block_rows = _round_up((n + pu - 1) // pu, 8)
    block_cols = _round_up((m + pi - 1) // pi, 8)

    # this process's devices own these users-axis blocks
    my_tiles_r = sorted({
        int(np.argwhere((d == mesh.devices).any(axis=1))[0, 0])
        for d in jax.local_devices() if d in mesh.devices
    })
    lo = row_offset
    hi = row_offset + local_mat.shape[0]
    for tr in my_tiles_r:
        if tr * block_rows < lo or min((tr + 1) * block_rows, n) > hi:
            raise ValueError(
                f"local row shard [{lo}, {hi}) does not cover this "
                f"process's users-block {tr} "
                f"[{tr*block_rows}, {min((tr+1)*block_rows, n)}); align "
                "file shards with the mesh's users-axis blocks"
            )

    tile_r = rows // block_rows
    # converse of the block-coverage check above: every LOCAL nonzero
    # must land in a users-block this process owns, else it would be
    # silently dropped (the tile callback only materializes owned
    # tiles) while still inflating the allgathered cap/nnz —
    # overlapping or over-extended file shards fail loudly instead
    stray = np.setdiff1d(np.unique(tile_r), np.asarray(my_tiles_r))
    if stray.size:
        raise ValueError(
            f"local row shard [{lo}, {hi}) contains rows in users-"
            f"block(s) {stray.tolist()} not owned by this process "
            f"(owned: {my_tiles_r}); file shards must partition the "
            "row space along the mesh's users-axis blocks"
        )
    tile_c = cols // block_cols
    tile_id = tile_r * pi + tile_c
    local_counts = np.bincount(tile_id, minlength=pu * pi)
    # one tiny allgather establishes the GLOBAL cap + value mass
    local_stats = np.concatenate(
        [local_counts.astype(np.float64), [float(np.sum(coo.data))]]
    )
    if jax.process_count() > 1:
        gathered = np.asarray(mhu.process_allgather(local_stats))
        counts = gathered[:, :-1].sum(axis=0)
        total_v = float(gathered[:, -1].sum())
    else:
        counts = local_stats[:-1]
        total_v = float(local_stats[-1])
    cap = max(int(counts.max()), 1)
    chunk = min(chunk, _round_up(cap, 256))
    cap = _round_up(cap, chunk)
    mean_v = total_v / (float(n) * float(m))

    def build_tile(ti, tj):
        # tiny key space: one boolean scan per owned tile beats the
        # stable argsort, and the sorted selection keeps the gathers
        # monotonic (same rationale as partition_sparse)
        t = ti * pi + tj
        sel = np.flatnonzero(tile_id == t)
        k = len(sel)
        vals = np.zeros(cap, dtype=np.dtype(dtype))
        lr = np.zeros(cap, dtype=np.int32)
        lc = np.zeros(cap, dtype=np.int32)
        vals[:k] = coo.data[sel]
        lr[:k] = rows[sel] - ti * block_rows
        lc[:k] = cols[sel] - tj * block_cols
        return vals, lr, lc

    cache = {}

    def cb(which):
        def inner(idx):
            ti = idx[0].start if idx[0].start is not None else 0
            tj = idx[1].start if idx[1].start is not None else 0
            key = (ti, tj)
            if key not in cache:
                cache[key] = build_tile(ti, tj)
            return cache[key][which][None, None, :]

        return inner

    shape3 = (pu, pi, cap)
    values = jax.make_array_from_callback(shape3, shardings["tile"],
                                          cb(0))
    lrows = jax.make_array_from_callback(shape3, shardings["tile"], cb(1))
    lcols = jax.make_array_from_callback(shape3, shardings["tile"], cb(2))
    cache.clear()

    nnz_local = np.array([coo.nnz], np.float64)
    if jax.process_count() > 1:
        nnz_global = int(np.asarray(mhu.process_allgather(
            nnz_local)).sum())
    else:
        nnz_global = int(nnz_local[0])

    operand = ShardedCOO(
        values=values, rows=lrows, cols=lcols, shape=(n, m),
        nnz=nnz_global, chunk=chunk, mesh_shape=(pu, pi),
        block_rows=block_rows, block_cols=block_cols,
    )

    class _ShapeOnly:
        """Stands in for V: the plan needs only .shape on this path."""

        def __init__(self, shape):
            self.shape = shape

    partition_key = (
        operand.shape, operand.values.shape, str(dtype),
        tuple(mesh.devices.flat), mesh.axis_names, "rowshards",
    )
    return ShardedPlan(
        V=_ShapeOnly((n, m)), config=config, mesh=mesh,
        shardings=shardings, engine="scatter", operand=operand,
        row_perm=row_perm, col_perm=col_perm,
        padded_shape=operand.padded_shape, mean_v=mean_v, dtype=dtype,
        row_axis=None, col_axis=None, chunk=chunk, balance=balance,
        partition_key=partition_key,
    )
