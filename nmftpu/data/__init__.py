"""Data layer: MovieLens interaction-matrix loaders and synthetic
generators (SURVEY.md §4.4, BASELINE.json configs — ML-100K dense,
ML-20M sparse CSR, synthetic power-law matrices for scaling runs)."""

from nmftpu.data.movielens import (
    Interactions,
    load_movielens,
    train_test_split_by_user,
)
from nmftpu.data.synthetic import (
    synthetic_lowrank_dense,
    synthetic_powerlaw_sparse,
)

__all__ = [
    "Interactions",
    "load_movielens",
    "train_test_split_by_user",
    "synthetic_lowrank_dense",
    "synthetic_powerlaw_sparse",
]
