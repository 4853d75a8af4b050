"""recall@k evaluation harness on held-out interactions
(BASELINE.json config #5; SURVEY.md §4.4)."""

from __future__ import annotations

import numpy as np

from nmftpu.retrieval.mips import topk_mips_blocked
from nmftpu.sparse import SparseMatrix


def recall_at_k(
    W,
    H,
    test_pairs: np.ndarray,
    train: SparseMatrix | None = None,
    k: int = 100,
    batch_users: int = 1024,
    block: int = 4096,
    mesh=None,
    method: str = "exact",
) -> float:
    """Fraction of held-out (user, item) pairs whose item appears in the
    user's top-k recommendations (training items excluded from candidates).

    W: (n, r) user factors; H: (r, m) item factors; test_pairs: (t, 2)
    [user, item]; train: the training interactions to exclude from
    candidate lists (standard protocol; exclusion is block-bucketed
    lists — O(total_seen), never an O(batch·m) mask, so evaluation
    scales to m=10M). With `mesh`, H may be sharded P(None, 'items')
    and scoring runs through the two-stage sharded top-k (per-shard
    blocked top-k + all-gather merge).
    """
    from nmftpu.retrieval.exclusion import build_block_exclusion

    W = np.asarray(W)
    H_dev = H  # stays on device across batches
    if mesh is not None:
        from nmftpu.parallel.mesh import AXIS_ITEMS
        from nmftpu.parallel.retrieval_sharded import topk_mips_sharded

        shards = mesh.shape[AXIS_ITEMS]
    else:
        shards = 1
    test_pairs = np.asarray(test_pairs)
    if test_pairs.size == 0:
        return float("nan")
    m = H.shape[1]

    train_csr = train.to_csr() if train is not None else None

    # group test items by user
    users = np.unique(test_pairs[:, 0])
    by_user: dict[int, list[int]] = {}
    for u, i in test_pairs:
        by_user.setdefault(int(u), []).append(int(i))

    hits = 0
    total = 0
    for start in range(0, len(users), batch_users):
        batch = users[start:start + batch_users]
        Wq = W[batch]                                       # (b, r)
        if train_csr is not None:
            lists = build_block_exclusion(
                batch, train_csr, m, block, shards=shards
            )
        else:
            lists = None
        if mesh is not None:
            scr, idx = topk_mips_sharded(
                Wq, H_dev, k, mesh=mesh, block=block,
                exclude_lists=lists, method=method,
            )
        else:
            scr, idx = topk_mips_blocked(
                Wq, H_dev, k, block=block, exclude_lists=lists,
                method=method,
            )
        idx = np.asarray(idx)
        scr = np.asarray(scr)
        for bi, u in enumerate(batch):
            # -inf slots are fillers (fewer than k valid candidates) —
            # counting their index-0 placeholder would inflate recall
            # for test item 0
            valid = scr[bi] > -np.inf
            top = set(idx[bi][valid].tolist())
            for item in by_user[int(u)]:
                hits += item in top
                total += 1
    return hits / total
