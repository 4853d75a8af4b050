"""Consensus rank selection (Brunet cophenetic / Kim-Park dispersion)."""

import numpy as np
import pytest

from nmftpu.model_selection import (
    connectivity,
    consensus_matrix,
    cophenetic_correlation,
    dispersion,
    rank_selection,
)


@pytest.fixture
def rng():
    return np.random.default_rng(31)


def _block_matrix(rng, k_true=3, rows_per=20, m=24, noise=0.02):
    """Clearly k_true-clustered rows: each block loads one factor."""
    n = k_true * rows_per
    W = np.zeros((n, k_true), np.float32)
    for b in range(k_true):
        W[b * rows_per:(b + 1) * rows_per, b] = \
            1.0 + rng.random(rows_per).astype(np.float32)
    H = np.abs(rng.normal(size=(k_true, m))).astype(np.float32) + 0.2
    V = W @ H + noise * np.abs(
        rng.normal(size=(n, m))).astype(np.float32)
    return V.astype(np.float32)


def test_connectivity_and_metrics(rng):
    W = np.array([[2.0, 0.1], [1.5, 0.2], [0.1, 3.0]], np.float32)
    C = np.asarray(connectivity(W))
    assert C[0, 1] and not C[0, 2] and C.diagonal().all()
    # binary consensus -> dispersion 1, cophenetic 1
    Cb = np.asarray(C, np.float64)
    assert dispersion(Cb) == 1.0
    assert cophenetic_correlation(Cb) == pytest.approx(1.0)
    # maximally unstable consensus -> low dispersion
    Cu = np.full((4, 4), 0.5)
    np.fill_diagonal(Cu, 1.0)
    assert dispersion(Cu) < 0.3


def test_consensus_at_true_rank_is_stable(rng):
    V = _block_matrix(rng)
    from nmftpu.config import Initialization, NmfConfig

    cfg = NmfConfig(rank=3, num_iterations=60,
                    init_method=Initialization.ALL_RANDOM_VALUES,
                    seed=0, check_interval=30)
    C, errs = consensus_matrix(V, cfg, n_runs=5)
    assert C.shape == (60, 60) and len(errs) == 5
    rho = cophenetic_correlation(C)
    assert rho > 0.98  # restarts agree at the true rank
    # seeds differ across runs -> errors are genuine restarts
    assert len({round(e, 6) for e in errs}) > 1


def test_rank_selection_finds_true_rank(rng):
    V = _block_matrix(rng)
    sel = rank_selection(V, ranks=(2, 3, 5), n_runs=5,
                         num_iterations=60, seed=0, check_interval=30)
    assert sel.best_rank == 3
    d = sel.as_dict()
    assert set(d) == {2, 3, 5}
    # rho at the true rank dominates the overfit rank
    assert d[3]["cophenetic"] > d[5]["cophenetic"]
    # reconstruction error still decreases with rank (sanity)
    assert d[5]["mean_error"] < d[2]["mean_error"]


def test_rank_selection_sampled_and_sparse(rng):
    from nmftpu import sparse as hs

    V = _block_matrix(rng)
    V[V < 0.05] = 0.0
    sel = rank_selection(hs.from_dense(V), ranks=(3,), n_runs=4,
                         num_iterations=40, seed=1, sample=30,
                         check_interval=20)
    assert sel.cophenetic[0] > 0.9
    # the package-level lazy export resolves
    import nmftpu

    assert nmftpu.rank_selection is rank_selection
