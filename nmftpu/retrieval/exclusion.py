"""Block-bucketed seen-item exclusion for top-k serving/eval at the
10M-item scale (BASELINE.json config #5; round-1 verdict items 5–7).

A dense (batch, m) bool mask is O(batch·m) — 80 GB for a 1k batch at
m=10M — and defeats `topk_mips_blocked`'s bounded memory. Instead the
seen pairs are bucketed BY SCORING BLOCK on the host (O(total_seen)
work), giving two small (nblocks, E) int32 arrays:

    ex_user[blk, j], ex_col[blk, j]  — the j-th excluded (batch-row,
    block-local column) of block blk, padded with -1.

Inside the scoring scan each block scatters -inf at its own E entries
(the consumer remaps the -1 padding to a POSITIVE out-of-bounds index
before a `mode="drop"` scatter — raw negatives would wrap NumPy-style),
so total exclusion work is O(total_seen + nblocks·pad) regardless of m.
E is rounded up to a power of two to bound jit recompiles across
batches.
"""

from __future__ import annotations

import numpy as np


def _round_pow2(x: int) -> int:
    return 1 << max(0, int(np.ceil(np.log2(max(x, 1)))))


def build_block_exclusion(
    user_ids,
    csr,
    m: int,
    block: int,
    shards: int = 1,
):
    """Bucket each batch user's seen items by scoring block.

    user_ids: (b,) global user ids of the batch; csr: training
    interactions (SparseCSR-like with indptr/indices); m: item count;
    block: the scoring block size; shards: for the items-sharded path,
    the number of item shards (m must divide evenly) — block indices are
    then per-shard-local, concatenated shard-major, and columns are
    shard-local, matching what each shard's blocked scan sees.

    Returns (ex_user, ex_col): (nblocks_total, E) int32, -1 padded.
    """
    user_ids = np.asarray(user_ids)
    if shards > 1 and m % shards != 0:
        raise ValueError(f"m={m} must divide into {shards} item shards")
    m_loc = m // shards
    eff_block = min(block, m_loc)
    nblocks_loc = (m_loc + eff_block - 1) // eff_block
    nblocks_total = nblocks_loc * shards

    b = len(user_ids)
    starts = np.asarray(csr.indptr)[user_ids]
    ends = np.asarray(csr.indptr)[user_ids + 1]
    counts = ends - starts
    total = int(counts.sum())
    if total == 0:
        return (np.full((nblocks_total, 1), -1, np.int32),
                np.full((nblocks_total, 1), -1, np.int32))

    rows = np.repeat(np.arange(b, dtype=np.int64), counts)
    pos = np.concatenate(
        [np.arange(s, e, dtype=np.int64)
         for s, e in zip(starts, ends) if e > s]
    )
    items = np.asarray(csr.indices)[pos].astype(np.int64)

    shard, loc = np.divmod(items, m_loc)
    blk_loc, col = np.divmod(loc, eff_block)
    blk = shard * nblocks_loc + blk_loc

    order = np.argsort(blk, kind="stable")
    blk_s, rows_s, col_s = blk[order], rows[order], col[order]
    blk_counts = np.bincount(blk_s, minlength=nblocks_total)
    E = _round_pow2(int(blk_counts.max()))
    offsets = np.concatenate([[0], np.cumsum(blk_counts)[:-1]])
    j = np.arange(total, dtype=np.int64) - offsets[blk_s]

    ex_user = np.full((nblocks_total, E), -1, np.int32)
    ex_col = np.full((nblocks_total, E), -1, np.int32)
    ex_user[blk_s, j] = rows_s
    ex_col[blk_s, j] = col_s
    return ex_user, ex_col
