"""Synthetic matrix generators for tests and scaling benchmarks
(BASELINE.json config #4: 100M-user x 10M-item power-law sparse)."""

from __future__ import annotations

import numpy as np

from nmftpu.sparse import SparseCOO


def synthetic_lowrank_dense(
    n, m, rank, noise=0.01, seed=0, dtype=np.float32
):
    """Nonnegative dense V with exact nonnegative rank-`rank` structure."""
    rng = np.random.default_rng(seed)
    W = rng.uniform(0.1, 1.0, size=(n, rank)).astype(dtype)
    H = rng.uniform(0.1, 1.0, size=(rank, m)).astype(dtype)
    V = W @ H
    if noise > 0:
        V = V + noise * rng.uniform(0.0, 1.0, size=(n, m)).astype(dtype)
    return V.astype(dtype)


def synthetic_powerlaw_sparse(
    n, m, nnz, rank=16, alpha_user=1.1, alpha_item=1.1, seed=0,
    dtype=np.float32,
):
    """Sparse interaction matrix with Zipf-like user/item popularity and a
    planted nonnegative low-rank signal in the observed values.

    Row/column marginals follow truncated power laws (exponent
    alpha_user/alpha_item) — the load-imbalance regime real recommender
    matrices live in (SURVEY.md §7 hard parts). Duplicate (user, item)
    draws are collapsed to a single entry, so the RETURNED nnz (read it
    from the result) is below the requested `nnz` — substantially so for
    steep power laws at high densities; size FLOP/throughput accounting
    off the result's nnz, not the request.
    """
    rng = np.random.default_rng(seed)

    def powerlaw_probs(k, alpha):
        p = (1.0 + np.arange(k)) ** (-alpha)
        return p / p.sum()

    users = rng.choice(n, size=nnz, p=powerlaw_probs(n, alpha_user))
    items = rng.choice(m, size=nnz, p=powerlaw_probs(m, alpha_item))
    # collapse duplicates
    keys = users.astype(np.int64) * m + items
    uniq, idx = np.unique(keys, return_index=True)
    users, items = users[idx], items[idx]

    Wp = rng.uniform(0.1, 1.0, size=(n, rank)).astype(dtype)
    Hp = rng.uniform(0.1, 1.0, size=(rank, m)).astype(dtype)
    vals = np.einsum("ij,ji->i", Wp[users], Hp[:, items]).astype(dtype)
    vals += 0.05 * rng.standard_normal(len(vals)).astype(dtype)
    vals = np.maximum(vals, 0.05).astype(dtype)

    return SparseCOO(
        row=users.astype(np.int32),
        col=items.astype(np.int32),
        data=vals,
        shape=(n, m),
    )
