"""Robustness edge cases across the engine surface: degenerate shapes,
zero structure, extreme ranks, KL with exact zeros, empty-ish sparsity."""

import numpy as np
import pytest

from nmftpu import Algorithm, Initialization, NmfConfig, Objective
from nmftpu import sparse as hs
from nmftpu.driver import compute
from nmftpu.sparse_ops import compute_sparse


def test_rank_one(rng):
    V = np.outer(rng.uniform(1, 2, 20), rng.uniform(1, 2, 15)).astype(
        np.float32
    )
    res = compute(V, NmfConfig(rank=1, num_iterations=200))
    rel = res.frobenius_error / np.linalg.norm(V)
    assert rel < 1e-2  # rank-1 matrix recovered by rank-1 factorization


def test_single_row_and_column(rng):
    V = rng.uniform(0.5, 1.5, (1, 12)).astype(np.float32)
    res = compute(V, NmfConfig(rank=1, num_iterations=50))
    assert np.isfinite(res.frobenius_error)
    V = rng.uniform(0.5, 1.5, (12, 1)).astype(np.float32)
    res = compute(V, NmfConfig(rank=1, num_iterations=50))
    assert np.isfinite(res.frobenius_error)


def test_zero_matrix():
    V = np.zeros((10, 8), np.float32)
    res = compute(V, NmfConfig(rank=2, num_iterations=20))
    assert np.isfinite(res.frobenius_error)
    assert res.frobenius_error < 1e-3  # zeros are exactly representable


def test_zero_rows_cols_kl(rng):
    V = rng.uniform(0.5, 1.5, (15, 12)).astype(np.float32)
    V[4, :] = 0.0
    V[:, 7] = 0.0
    res = compute(
        V, NmfConfig(rank=3, objective=Objective.KL, num_iterations=40)
    )
    assert np.isfinite(res.kl_error)
    assert np.all(np.isfinite(np.asarray(res.W)))


def test_full_rank_request(rng):
    V = rng.uniform(0.1, 1.0, (9, 9)).astype(np.float32)
    res = compute(V, NmfConfig(rank=9, num_iterations=100))
    assert res.frobenius_error / np.linalg.norm(V) < 0.1


def test_sparse_one_nonzero():
    sp = hs.SparseCOO(row=[2], col=[3], data=[5.0], shape=(6, 7))
    for strategy in ("scatter", "ell", "densified"):
        res = compute_sparse(
            sp, NmfConfig(rank=1, num_iterations=20), strategy=strategy
        )
        assert np.isfinite(res.frobenius_error)


def test_sparse_dense_row(rng):
    """One fully dense row among empty ones (ELL segment splitting)."""
    dense = np.zeros((8, 600), np.float32)
    dense[3, :] = rng.uniform(0.5, 1.0, 600)
    dense[0, 0] = 1.0
    sp = hs.from_dense(dense)
    r1 = compute_sparse(sp, NmfConfig(rank=2, num_iterations=15),
                        strategy="ell")
    r2 = compute_sparse(sp, NmfConfig(rank=2, num_iterations=15),
                        strategy="scatter")
    np.testing.assert_allclose(r1.frobenius_error, r2.frobenius_error,
                               rtol=1e-3)


def test_duplicate_coo_entries_summed():
    sp = hs.SparseCOO(row=[0, 0, 1], col=[0, 0, 1], data=[1.0, 2.0, 4.0],
                      shape=(3, 3))
    assert sp.todense()[0, 0] == 3.0
    res = compute_sparse(sp, NmfConfig(rank=1, num_iterations=10),
                         strategy="scatter")
    assert np.isfinite(res.frobenius_error)


def test_num_runs_exceeding_variation(rng):
    V = rng.uniform(0.1, 1.0, (12, 10)).astype(np.float32)
    res = compute(V, NmfConfig(rank=2, num_iterations=10, num_runs=6))
    assert len(res.run_errors) == 6


def test_check_interval_larger_than_iters(rng):
    V = rng.uniform(0.1, 1.0, (12, 10)).astype(np.float32)
    res = compute(V, NmfConfig(rank=2, num_iterations=5, check_interval=50))
    # final-iteration check still records exactly one stats row
    assert list(res.stats.iterations) == [5]


@pytest.mark.parametrize("alg", [Algorithm.ALS, Algorithm.GDCLS])
def test_als_family_with_zero_rows(rng, alg):
    V = rng.uniform(0.5, 1.5, (14, 11)).astype(np.float32)
    V[2, :] = 0.0
    res = compute(
        V, NmfConfig(rank=3, algorithm=alg, num_iterations=20,
                     lambda_tik=0.01)
    )
    assert np.all(np.isfinite(np.asarray(res.W)))
    # the zero row's factor row must be (near) zero
    assert np.abs(np.asarray(res.W)[2]).max() < 1e-3
