"""Serving layer (BASELINE.json config #5): the learned factors as
embedding tables behind a recommend/score API.

`Recommender` wraps W/H (optionally sharded over a mesh) plus the training
interactions (for seen-item exclusion) and serves exact top-k MIPS
recommendations; `save`/`load` persist the tables for a serving process
that never touches the trainer.
"""

from __future__ import annotations

import json
import os

import numpy as np

from nmftpu.retrieval.mips import topk_mips_blocked
from nmftpu.sparse import SparseCSR, SparseMatrix


class Recommender:
    """Top-k recommendation serving over factor embedding tables."""

    def __init__(self, W, H, train: SparseMatrix | None = None,
                 mesh=None, block: int = 8192, method: str = "approx"):
        import jax

        self.W = np.asarray(W)
        self.mesh = mesh
        self.block = block
        self.method = method  # "approx": TPU approx_max_k serving path
        if mesh is not None:
            from nmftpu.parallel import factor_shardings

            self.H = jax.device_put(
                np.asarray(H), factor_shardings(mesh)["H"]
            )
        else:
            self.H = jax.device_put(np.asarray(H))
        self._train_csr = train.to_csr() if train is not None else None

    @property
    def n_users(self) -> int:
        return self.W.shape[0]

    @property
    def n_items(self) -> int:
        return self.H.shape[1]

    def user_embedding(self, user_ids) -> np.ndarray:
        return self.W[np.asarray(user_ids)]

    def _mask(self, user_ids):
        if self._train_csr is None:
            return None
        mask = np.zeros((len(user_ids), self.n_items), dtype=bool)
        for i, u in enumerate(user_ids):
            s, e = self._train_csr.indptr[u], self._train_csr.indptr[u + 1]
            mask[i, self._train_csr.indices[s:e]] = True
        return mask

    def recommend(self, user_ids, k: int = 100,
                  exclude_seen: bool = True):
        """Top-k items for each user id. Returns (scores, item_ids),
        both (len(user_ids), k)."""
        user_ids = np.atleast_1d(np.asarray(user_ids))
        Wq = self.W[user_ids]
        mask = self._mask(user_ids) if exclude_seen else None
        if self.mesh is not None:
            from nmftpu.parallel import topk_mips_sharded

            s, i = topk_mips_sharded(
                Wq, self.H, k, mesh=self.mesh, block=self.block,
                exclude_mask=mask, method=self.method,
            )
        else:
            s, i = topk_mips_blocked(
                Wq, self.H, k, block=self.block, exclude_mask=mask,
                method=self.method,
            )
        return np.asarray(s), np.asarray(i)

    def score(self, user_id: int, item_ids) -> np.ndarray:
        """Predicted affinities for specific (user, items) pairs."""
        H = np.asarray(self.H)
        return self.W[user_id] @ H[:, np.asarray(item_ids)]

    # -- persistence ------------------------------------------------------

    def save(self, path: str) -> None:
        os.makedirs(path, exist_ok=True)
        np.save(os.path.join(path, "W.npy"), self.W)
        np.save(os.path.join(path, "H.npy"), np.asarray(self.H))
        meta = {"n_users": self.n_users, "n_items": self.n_items,
                "rank": int(self.W.shape[1])}
        if self._train_csr is not None:
            np.savez(
                os.path.join(path, "train.npz"),
                indptr=self._train_csr.indptr,
                indices=self._train_csr.indices,
                data=self._train_csr.data,
            )
            meta["has_train"] = True
        with open(os.path.join(path, "meta.json"), "w") as f:
            json.dump(meta, f)

    @classmethod
    def load(cls, path: str, mesh=None) -> "Recommender":
        W = np.load(os.path.join(path, "W.npy"))
        H = np.load(os.path.join(path, "H.npy"))
        train = None
        tr_path = os.path.join(path, "train.npz")
        if os.path.exists(tr_path):
            z = np.load(tr_path)
            train = SparseCSR(
                z["indptr"], z["indices"], z["data"],
                (W.shape[0], H.shape[1]),
            )
        return cls(W, H, train=train, mesh=mesh)
