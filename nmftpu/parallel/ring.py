"""Ring-SpMM MU update on a 1-D mesh (SURVEY.md §2.9 SP/ring analog, §5.7).

The 2-D grid engine (parallel/updates.py) is the default; this module is
the ring-topology alternative for 1-D meshes / very long item axes —
structurally the ring-attention pattern with H blocks in the KV role:

* p devices; device i owns W row-block i, H column-block i, and its row
  panel of V pre-split into p column tiles (block-local indices).
* numerator V·Hᵀ: H blocks ROTATE around the ring (`lax.ppermute`); at
  step s device i holds H block (i−s) mod p and consumes its matching V
  tile — after p use-and-rotate steps every W shard has seen every H block
  and H is home again.
* numerator WᵀV: a ring REDUCE — per-block accumulators travel the ring,
  each device adding its own contribution for the block the accumulator is
  destined to; one final rotation delivers every completed block to its
  owner.
* Grams (WᵀW, HHᵀ) are `psum`s, as in the grid engine.

Per-iteration comm volume: 2·r·m + r·n floats around the ring — higher
than the 2-D grid's O((n/pu + m/pi)·r); use the ring when the mesh is
physically 1-D (a single ICI ring) or when the item axis alone must scale.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from nmftpu.parallel.sharded_coo import partition_sparse
from nmftpu.sparse_ops import DeviceCOO, v_ht, wt_v
from nmftpu import sparse as host_sparse

AXIS_RING = "shards"


def make_ring_mesh(devices=None) -> Mesh:
    if devices is None:
        devices = jax.devices()
    return Mesh(np.asarray(devices), (AXIS_RING,))


def ring_shardings(mesh: Mesh):
    return {
        "W": NamedSharding(mesh, P(AXIS_RING, None)),
        "H": NamedSharding(mesh, P(None, AXIS_RING)),
        "tiles": NamedSharding(mesh, P(AXIS_RING, None, None)),
    }


def partition_for_ring(mat: host_sparse.SparseMatrix, p: int, **kw):
    """Device i gets its V row panel as p column tiles: reuse the 2-D
    partitioner with a (p, p) grid; only the leading axis is sharded."""
    return partition_sparse(mat, (p, p), **kw)


def _tile(scoo_meta, vals, rows, cols, j):
    """Block-local DeviceCOO for the traced column-tile index j."""
    return DeviceCOO(
        values=lax.dynamic_index_in_dim(vals, j, 0, keepdims=False),
        rows=lax.dynamic_index_in_dim(rows, j, 0, keepdims=False),
        cols=lax.dynamic_index_in_dim(cols, j, 0, keepdims=False),
        shape=(scoo_meta.block_rows, scoo_meta.block_cols),
        nnz=-1,
        chunk=scoo_meta.chunk,
    )


def build_ring_mu_update(mesh: Mesh, scoo_meta, eps=1e-9, order="WH"):
    """Ring MU (Frobenius) update: returns update(scoo, W, H) -> (W, H) for
    padded factors sharded per ring_shardings."""
    p = mesh.devices.size
    fwd = [(k, (k + 1) % p) for k in range(p)]

    def step(vals, rows, cols, W, H):
        vals, rows, cols = vals[0], rows[0], cols[0]   # (p, Nt) local
        my = lax.axis_index(AXIS_RING)

        def numer_w(H):
            """V_i · Hᵀ by rotating H blocks around the ring."""
            def body(s, carry):
                H_rot, acc = carry
                j = (my - s) % p
                local = _tile(scoo_meta, vals, rows, cols, j)
                acc = acc + v_ht(local, H_rot)
                H_rot = lax.ppermute(H_rot, AXIS_RING, fwd)
                return (H_rot, acc)

            acc0 = jnp.zeros((scoo_meta.block_rows, H.shape[0]), H.dtype)
            H_home, acc = lax.fori_loop(0, p, body, (H, acc0))
            # p rotations == identity; H_home is H again (kept for clarity)
            return acc, H_home

        def numer_h(W):
            """WᵀV ring-reduce: traveling per-block accumulators."""
            def contribution(b):
                local = _tile(scoo_meta, vals, rows, cols, b)
                return wt_v(local, W)                   # (r, block_cols)

            acc = contribution((my + 1) % p)

            def body(s, acc):
                acc = lax.ppermute(acc, AXIS_RING, fwd)
                b = (my - s + 1) % p
                return acc + contribution(b)

            acc = lax.fori_loop(1, p, body, acc)
            # completed block (i0+1) sits at device (i0-1): shift home (+2)
            if p > 2:
                home = [(k, (k + 2) % p) for k in range(p)]
                acc = lax.ppermute(acc, AXIS_RING, home)
            return acc

        def upd_w(W, H):
            numer, H = numer_w(H)
            HHt = lax.psum(H @ H.T, AXIS_RING)
            return W * (numer / (W @ HHt + eps)), H

        def upd_h(W, H):
            numer = numer_h(W)
            WtW = lax.psum(W.T @ W, AXIS_RING)
            return H * (numer / (WtW @ H + eps))

        if order == "WH":
            W, H = upd_w(W, H)
            H = upd_h(W, H)
        else:
            H = upd_h(W, H)
            W, _ = upd_w(W, H)
        return W, H

    shmapped = jax.shard_map(
        step, mesh=mesh,
        in_specs=(
            P(AXIS_RING, None, None), P(AXIS_RING, None, None),
            P(AXIS_RING, None, None), P(AXIS_RING, None), P(None, AXIS_RING),
        ),
        out_specs=(P(AXIS_RING, None), P(None, AXIS_RING)),
        check_vma=False,
    )

    def update(scoo, W, H):
        return shmapped(scoo.values, scoo.rows, scoo.cols, W, H)

    return update
