"""MovieLens loaders (BASELINE.json configs #1–#3).

Handles both on-disk formats without external deps:
  * ML-100K  `u.data`      — tab-separated  user  item  rating  timestamp
  * ML-20M   `ratings.csv` — header line  userId,movieId,rating,timestamp

Raw ids are remapped to contiguous [0, n_users) x [0, n_items) indices and
returned as an `Interactions` bundle wrapping an nmftpu SparseCOO. A
C++-accelerated parser for the same formats lives in `native/` (loaded via
`nmftpu.native_loader` when built); this module is the pure-python
fallback and the semantic reference for it.
"""

from __future__ import annotations

import dataclasses
import os

import numpy as np

from nmftpu.sparse import SparseCOO


@dataclasses.dataclass
class Interactions:
    """A user-item interaction matrix plus the id maps that produced it."""

    matrix: SparseCOO              # (n_users, n_items) ratings/clicks
    user_ids: np.ndarray           # original user id for each row index
    item_ids: np.ndarray           # original item id for each column index
    timestamps: np.ndarray | None  # per-nonzero timestamps (same order)

    @property
    def n_users(self) -> int:
        return self.matrix.shape[0]

    @property
    def n_items(self) -> int:
        return self.matrix.shape[1]


def _parse_file(path: str):
    """Return (users, items, ratings, timestamps) raw arrays."""
    with open(path, "rb") as f:
        head = f.readline()
    if b"," in head:  # ratings.csv (ML-20M style, with header)
        skip = 1 if head.lower().startswith(b"userid") else 0
        raw = np.genfromtxt(
            path, delimiter=",", skip_header=skip,
            dtype=[("u", np.int64), ("i", np.int64),
                   ("r", np.float32), ("t", np.int64)],
        )
    else:  # u.data (ML-100K style, tab separated, no header)
        raw = np.genfromtxt(
            path, delimiter="\t",
            dtype=[("u", np.int64), ("i", np.int64),
                   ("r", np.float32), ("t", np.int64)],
        )
    return raw["u"], raw["i"], raw["r"], raw["t"]


def load_movielens(
    path: str, implicit: bool = False, use_native: bool | None = None
) -> Interactions:
    """Load a MovieLens ratings file into an Interactions bundle.

    implicit=True binarizes ratings to 1.0 (click/watch events) for the
    confidence-weighted configs. use_native: None = use the C++ parser
    (native/nmftpu_io.cc) when built, else the python path; True forces
    native (raises if unavailable); False forces python.
    """
    if not os.path.exists(path):
        raise FileNotFoundError(path)

    if use_native is not False:
        from nmftpu import native_loader

        if native_loader.available():
            rows, cols, vals, ts, user_ids, item_ids = (
                native_loader.parse_movielens(path, implicit=implicit)
            )
            mat = SparseCOO(
                row=rows, col=cols, data=vals,
                shape=(len(user_ids), len(item_ids)),
            )
            return Interactions(
                matrix=mat, user_ids=user_ids, item_ids=item_ids,
                timestamps=ts,
            )
        if use_native:
            raise RuntimeError(
                "native parser requested but libnmftpu_io.so is not built "
                "(run `make -C native` or nmftpu.native_loader.build())"
            )

    users, items, ratings, ts = _parse_file(path)
    uniq_u, u_idx = np.unique(users, return_inverse=True)
    uniq_i, i_idx = np.unique(items, return_inverse=True)
    values = np.ones_like(ratings) if implicit else ratings
    mat = SparseCOO(
        row=u_idx.astype(np.int32),
        col=i_idx.astype(np.int32),
        data=values.astype(np.float32),
        shape=(len(uniq_u), len(uniq_i)),
    )
    return Interactions(
        matrix=mat, user_ids=uniq_u, item_ids=uniq_i, timestamps=ts
    )


def train_test_split_by_user(
    inter: Interactions,
    holdout_per_user: int = 1,
    seed: int = 0,
    by_time: bool = True,
):
    """Hold out `holdout_per_user` interactions per user for evaluation
    (recall@k harness, SURVEY.md §4.4 / BASELINE.json config #5).

    by_time=True holds out each user's most recent interactions (the
    standard leave-latest-out protocol); otherwise uniformly at random.
    Users with <= holdout_per_user interactions keep everything in train.
    Returns (train: SparseCOO, test_pairs: (n_test, 2) [user, item]).
    """
    coo = inter.matrix
    n_users = inter.n_users
    rng = np.random.default_rng(seed)

    order = np.argsort(coo.row, kind="stable")
    rows, cols, data = coo.row[order], coo.col[order], coo.data[order]
    ts = (
        inter.timestamps[order]
        if (by_time and inter.timestamps is not None)
        else None
    )

    test_mask = np.zeros(len(rows), dtype=bool)
    starts = np.searchsorted(rows, np.arange(n_users))
    ends = np.searchsorted(rows, np.arange(n_users) + 1)
    for u in range(n_users):
        s, e = starts[u], ends[u]
        cnt = e - s
        if cnt <= holdout_per_user:
            continue
        if ts is not None:
            # latest interactions held out
            local = np.argsort(ts[s:e], kind="stable")[-holdout_per_user:]
        else:
            local = rng.choice(cnt, size=holdout_per_user, replace=False)
        test_mask[s + local] = True

    train = SparseCOO(
        row=rows[~test_mask], col=cols[~test_mask], data=data[~test_mask],
        shape=coo.shape,
    )
    test_pairs = np.stack([rows[test_mask], cols[test_mask]], axis=1)
    return train, test_pairs
