"""Mesh-native data-dependent initialization (round-1 verdict item 7;
SURVEY.md §3.4): k-means over V's columns and MeanColumns run INSIDE one
shard_map region — shard-local assignment argmin + psum'd centroid
sums/counts — so no device ever materializes full factors or leaves the
mesh. Replaces the single-device fallback in parallel/driver.py for 2-D
grid meshes (the ring engine keeps the fallback).

Dataflow per Lloyd iteration, on the (pu, pi) grid with V tiled as
block-local COO (tile (i, j) on device (i, j)):

  cross    = psum_users( wt_v(tile, centroids_blk) )   -> (r, bm) local
  labels   = argmin over r of ||v_col - c||^2          -> shard-local
  sums     = psum_items( project_columns(tile, onehot) ) -> (bn, r)
  counts   = psum_both( onehot col sums )
  new centroids block = sums / counts

Centroid seeding samples global column ids from the permuted valid range
[0, m) (the permutation is a bijection, padding columns live in [m, pm)
and are never sampled); each tile contributes the rows it owns via the
same masked-scatter extract as the single-device path.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax import lax
from jax.sharding import PartitionSpec as P

from nmftpu.config import Initialization, NmfConfig
from nmftpu.parallel.mesh import AXIS_ITEMS, AXIS_USERS
from nmftpu.parallel.sharded_coo import ShardedCOO
from nmftpu.sparse_ops import (
    DeviceCOO,
    col_sums,
    extract_columns,
    project_columns,
    wt_v,
)

_TILE = P(AXIS_USERS, AXIS_ITEMS, None)


def _local(meta, vals, rows, cols) -> DeviceCOO:
    return DeviceCOO(
        values=vals[0, 0], rows=rows[0, 0], cols=cols[0, 0],
        shape=(meta.block_rows, meta.block_cols), nnz=-1,
        chunk=meta.chunk,
    )


def build_sharded_data_init(config: NmfConfig, mesh, scoo_meta: ShardedCOO):
    """Returns init(key, scoo) -> (W, H) sharded (P(users, None),
    P(None, items)), for the data-dependent strategies."""
    method = config.init_method
    rank = config.rank
    max_iter = config.kmeans_max_iter
    n, m = scoo_meta.shape
    bm = scoo_meta.block_cols

    def f(key, vals, rows, cols):
        local = _local(scoo_meta, vals, rows, cols)
        dtype = local.values.dtype
        iu = lax.axis_index(AXIS_USERS)
        ii = lax.axis_index(AXIS_ITEMS)
        kw, kh, kk = jax.random.split(key, 3)

        mean_v = lax.psum(
            lax.psum(jnp.sum(local.values), AXIS_USERS), AXIS_ITEMS
        ) / (float(n) * float(m))
        scale = jnp.sqrt(jnp.maximum(mean_v, 1e-12) / rank).astype(dtype)

        def rand_h():
            # shard-local randomness: fold only the items index so the
            # block is identical along the replicated users axis
            k_loc = jax.random.fold_in(kh, ii)
            u = jax.random.uniform(k_loc, (rank, bm), dtype=dtype)
            return (u + jnp.asarray(1e-4, dtype)) * scale

        def extract_cols_global(cols_global):
            """(bn, x) row-block of V's columns at global permuted ids:
            per-tile masked extract (out-of-range local ids never match a
            stored index) + psum over the items axis."""
            local_idx = cols_global - ii * bm
            return lax.psum(extract_columns(local, local_idx), AXIS_ITEMS)

        if method is Initialization.MEAN_COLUMNS:
            q = int(min(max(5, m // max(rank, 1)), m))
            cols_s = jax.random.randint(kk, (rank, q), 0, m)
            # A_loc[j_local, k] = (#times local column j sampled for k)/q.
            # Samples on EARLIER item shards give negative local_idx, which
            # JAX would wrap NumPy-style before mode="drop" applies —
            # remap them to bm (positive out-of-bounds, genuinely dropped).
            local_idx = cols_s.reshape(-1) - ii * bm
            local_idx = jnp.where(local_idx < 0, bm, local_idx)
            A = jnp.zeros((bm, rank), dtype).at[
                local_idx, jnp.repeat(jnp.arange(rank), q)
            ].add(1.0 / q, mode="drop")
            W = lax.psum(project_columns(local, A), AXIS_ITEMS)
            return W, rand_h()

        # --- k-means family -------------------------------------------
        cols_s = jax.random.choice(kk, m, shape=(rank,), replace=False)
        centroids = extract_cols_global(cols_s)            # (bn, r)

        vsq = local.with_values(local.values * local.values)
        col_sq = lax.psum(col_sums(vsq), AXIS_USERS)       # (bm,)

        def assign(centroids):
            cross = lax.psum(
                wt_v(local, centroids), AXIS_USERS
            ).T                                            # (bm, r)
            cent_sq = lax.psum(
                jnp.sum(centroids * centroids, axis=0), AXIS_USERS
            )
            d2 = col_sq[:, None] - 2.0 * cross + cent_sq[None, :]
            # padding columns (empty) would all go to one centroid and
            # drag it to zero: give them an out-of-range pseudo-label
            col_ids = ii * bm + jnp.arange(bm)
            return jnp.where(col_ids < m, jnp.argmin(d2, axis=1), rank)

        def body(_, centroids):
            # labels are identical on every users-shard (all their inputs
            # are users-psums), so one_hot/counts need only the items-psum;
            # row blocks are disjoint across the users axis, so the
            # centroid row-block sums never cross it.
            labels = assign(centroids)
            onehot = jax.nn.one_hot(labels, rank, dtype=dtype)  # (bm, r)
            sums = lax.psum(
                project_columns(local, onehot), AXIS_ITEMS
            )                                               # (bn, r)
            counts = lax.psum(jnp.sum(onehot, axis=0), AXIS_ITEMS)
            new = sums / jnp.maximum(counts, 1.0)[None, :]
            return jnp.where(counts[None, :] > 0, new, centroids)

        centroids = lax.fori_loop(0, max_iter, body, centroids)
        W = jnp.maximum(centroids, 0.0) + jnp.asarray(1e-6, dtype)

        if method is Initialization.K_MEANS_AND_RANDOM_VALUES:
            H = rand_h()
        else:
            WtV = lax.psum(wt_v(local, W), AXIS_USERS)     # (r, bm)
            if method is Initialization.K_MEANS_AND_NON_NEGATIVE_WTV:
                H = jnp.maximum(WtV, 0.0) + jnp.asarray(1e-6, dtype)
            else:
                H = jnp.abs(WtV) + jnp.asarray(1e-6, dtype)
        return W, H

    shmapped = jax.jit(jax.shard_map(
        f, mesh=mesh,
        in_specs=(P(), _TILE, _TILE, _TILE),
        out_specs=(P(AXIS_USERS, None), P(None, AXIS_ITEMS)),
        check_vma=False,
    ))

    def init(key, scoo):
        return shmapped(key, scoo.values, scoo.rows, scoo.cols)

    return init
