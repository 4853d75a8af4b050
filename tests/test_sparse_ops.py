"""Sparse device-path tests (SURVEY.md §4.1/§7-PR3): every chunked COO
primitive and every sparse update must agree with the dense path applied to
the densified matrix."""

import numpy as np
import pytest

from nmftpu import Initialization, NmfConfig, Objective, Algorithm
from nmftpu import sparse as hs
from nmftpu import sparse_ops as so
from nmftpu.linalg import dense as D
from nmftpu.driver import compute
from nmftpu.sparse_ops import compute_sparse


def _sprandom(rng, n, m, density=0.3, chunk=256):
    dense = rng.uniform(0.2, 2.0, (n, m))
    mask = rng.uniform(size=(n, m)) < density
    # keep problem well posed: nonempty rows/cols
    mask[:, 0] = True
    mask[0, :] = True
    dense = (dense * mask).astype(np.float32)
    coo = so.device_put_sparse(hs.from_dense(dense), chunk=chunk)
    return dense, coo


def _factors(rng, n, m, r):
    W = rng.uniform(0.1, 1.0, (n, r)).astype(np.float32)
    H = rng.uniform(0.1, 1.0, (r, m)).astype(np.float32)
    return W, H


def test_container_roundtrip(rng):
    dense = rng.uniform(size=(13, 9))
    dense[dense < 0.5] = 0.0
    coo = hs.from_dense(dense)
    np.testing.assert_array_equal(coo.todense(), dense)
    np.testing.assert_array_equal(coo.to_csr().todense(), dense)
    np.testing.assert_array_equal(coo.to_csc().todense(), dense)
    np.testing.assert_array_equal(coo.to_csr().to_coo().todense(), dense)
    np.testing.assert_array_equal(coo.T.todense(), dense.T)
    assert coo.to_csr().nnz == np.count_nonzero(dense)


def test_scipy_adapter(rng):
    scipy_sparse = pytest.importorskip("scipy.sparse")
    dense = rng.uniform(size=(11, 7))
    dense[dense < 0.6] = 0.0
    for fmt in ("csr", "csc", "coo"):
        mat = scipy_sparse.random(0, 0)  # placeholder avoid lint
        mat = getattr(scipy_sparse, fmt + "_matrix")(dense)
        np.testing.assert_array_equal(hs.from_scipy(mat).todense(), dense)


def test_wt_v_and_v_ht_match_dense(rng):
    dense, coo = _sprandom(rng, 37, 29)
    W, H = _factors(rng, 37, 29, 5)
    np.testing.assert_allclose(
        np.asarray(so.wt_v(coo, W)), W.T @ dense, rtol=1e-5, atol=1e-5
    )
    np.testing.assert_allclose(
        np.asarray(so.v_ht(coo, H)), dense @ H.T, rtol=1e-5, atol=1e-5
    )


def test_sddmm_matches_dense(rng):
    dense, coo = _sprandom(rng, 23, 19)
    W, H = _factors(rng, 23, 19, 4)
    WH = W @ H
    got = np.asarray(so.sddmm(coo, W, H))
    rows = np.asarray(coo.rows)
    cols = np.asarray(coo.cols)
    vals = np.asarray(coo.values)
    nz = vals != 0
    np.testing.assert_allclose(
        got[nz], WH[rows[nz], cols[nz]], rtol=1e-5
    )


def test_sparse_errors_match_dense(rng):
    dense, coo = _sprandom(rng, 31, 27)
    W, H = _factors(rng, 31, 27, 4)
    np.testing.assert_allclose(
        float(so.frobenius_error(coo, W, H)),
        np.linalg.norm(dense - W @ H, "fro"),
        rtol=1e-4,
    )
    np.testing.assert_allclose(
        float(so.kl_error(coo, W, H)),
        float(D.kl_error(dense, W, H)),
        rtol=1e-4,
    )


@pytest.mark.parametrize("order", ["WH", "HW"])
def test_sparse_mu_frobenius_matches_dense(rng, order):
    dense, coo = _sprandom(rng, 25, 21)
    W, H = _factors(rng, 25, 21, 4)
    Ws, Hs = so.mu_update_frobenius_sparse(coo, W, H, order=order)
    Wd, Hd = D.mu_update_frobenius(dense, W, H, order=order)
    np.testing.assert_allclose(np.asarray(Ws), np.asarray(Wd), rtol=2e-4)
    np.testing.assert_allclose(np.asarray(Hs), np.asarray(Hd), rtol=2e-4)


def test_sparse_mu_kl_descends_sparse_objective(rng):
    """Sparse KL MU optimizes the divergence restricted to observed entries
    plus the full +WH mass term; verify monotone descent of that objective."""
    dense, coo = _sprandom(rng, 25, 21)
    W, H = _factors(rng, 25, 21, 4)
    prev = float(so.kl_error(coo, W, H))
    for _ in range(15):
        W, H = so.mu_update_kl_sparse(coo, W, H)
        cur = float(so.kl_error(coo, W, H))
        assert cur <= prev * (1 + 1e-5)
        prev = cur


def test_sparse_weighted_matches_dense_weighted(rng):
    """Sparse confidence weighting == dense weighted MU with C = 1 + a*V
    (C is exactly 1 at zeros, so the dense weighted path is the oracle)."""
    dense, coo = _sprandom(rng, 19, 17)
    W, H = _factors(rng, 19, 17, 3)
    alpha = 3.0
    C = 1.0 + alpha * dense
    Ws, Hs = so.mu_update_frobenius_weighted_sparse(coo, W, H, alpha)
    Wd, Hd = D.mu_update_frobenius_weighted(dense, C, W, H)
    np.testing.assert_allclose(np.asarray(Ws), np.asarray(Wd), rtol=3e-4)
    np.testing.assert_allclose(np.asarray(Hs), np.asarray(Hd), rtol=3e-4)


def test_sparse_als_family_matches_dense(rng):
    dense, coo = _sprandom(rng, 22, 18)
    W, H = _factors(rng, 22, 18, 3)
    Ws, Hs = so.als_family_update_sparse(coo, W, H)
    Wd, Hd = D.als_update(dense, W, H)
    np.testing.assert_allclose(np.asarray(Ws), np.asarray(Wd),
                               rtol=1e-3, atol=1e-5)
    np.testing.assert_allclose(np.asarray(Hs), np.asarray(Hd),
                               rtol=1e-3, atol=1e-5)


def test_col_sums_and_extract_columns(rng):
    dense, coo = _sprandom(rng, 15, 12)
    np.testing.assert_allclose(
        np.asarray(so.col_sums(coo)), dense.sum(axis=0), rtol=1e-5
    )
    idx = np.array([3, 7, 0], dtype=np.int32)
    np.testing.assert_allclose(
        np.asarray(so.extract_columns(coo, idx)), dense[:, idx], rtol=1e-5
    )


@pytest.mark.parametrize("alg", list(Algorithm))
def test_compute_sparse_all_algorithms(rng, alg):
    dense, _ = _sprandom(rng, 30, 24)
    sp = hs.from_dense(dense)
    cfg = NmfConfig(
        rank=4, algorithm=alg, num_iterations=30, check_interval=10,
        lambda_w=0.05, lambda_h=0.05, lambda_tik=0.05, theta=0.3, seed=2,
    )
    res = compute_sparse(sp, cfg)
    assert np.isfinite(res.frobenius_error)
    assert res.stats.errors[-1] <= res.stats.errors[0] * (1 + 1e-4)


def test_compute_sparse_matches_compute_dense(rng):
    """End-to-end: sparse driver == dense driver on the same data/init."""
    dense, _ = _sprandom(rng, 28, 22)
    sp = hs.from_dense(dense)
    W0, H0 = _factors(rng, 28, 22, 4)
    cfg = NmfConfig(
        rank=4, init_method=Initialization.COPY_EXISTING, num_iterations=40,
    )
    rs = compute_sparse(sp, cfg, W0=W0, H0=H0, strategy="scatter")
    rd = compute(dense, cfg, W0=W0, H0=H0)
    np.testing.assert_allclose(rs.frobenius_error, rd.frobenius_error,
                               rtol=1e-3)
    np.testing.assert_allclose(np.asarray(rs.W), np.asarray(rd.W), rtol=5e-2,
                               atol=1e-3)


@pytest.mark.parametrize("init", [i for i in Initialization
                                  if i is not Initialization.COPY_EXISTING])
def test_sparse_init_strategies(rng, init):
    dense, coo = _sprandom(rng, 26, 20)
    import jax
    W, H = so.sparse_initialize_factors(
        coo, 4, init, jax.random.PRNGKey(0), kmeans_max_iter=5
    )
    assert W.shape == (26, 4) and H.shape == (4, 20)
    assert np.all(np.isfinite(np.asarray(W)))
    assert np.all(np.asarray(W) >= 0) and np.all(np.asarray(H) >= 0)


def test_sparse_kl_end_to_end(rng):
    dense, _ = _sprandom(rng, 30, 25)
    sp = hs.from_dense(dense)
    cfg = NmfConfig(
        rank=4, objective=Objective.KL, num_iterations=30, check_interval=10,
    )
    res = compute_sparse(sp, cfg)
    assert res.kl_error is not None and np.isfinite(res.kl_error)


def test_nmf_api_dispatches_sparse(rng):
    import nmftpu
    dense, _ = _sprandom(rng, 20, 16)
    sp = hs.from_dense(dense)
    res = nmftpu.nmf(sp, 3, num_iterations=15)
    assert res.W.shape == (20, 3)


@pytest.mark.parametrize("strategy", ["scatter", "densified", "ell"])
def test_prepare_sparse_plan_matches_oneshot(rng, strategy):
    """prepare_sparse + plan.run == compute_sparse bit-for-bit, and a
    loop-knob sweep reuses the prepared layout."""
    import dataclasses

    from nmftpu.sparse_ops import prepare_sparse

    dense = rng.uniform(0.2, 2.0, (30, 26))
    dense[rng.uniform(size=(30, 26)) > 0.4] = 0.0
    dense[:, 0] = 1.0
    dense[0, :] = 1.0
    sp = hs.from_dense(dense.astype(np.float32))
    cfg = NmfConfig(rank=3, num_iterations=8, seed=5)
    plan = prepare_sparse(sp, cfg, strategy=strategy)
    r1 = plan.run()
    r2 = compute_sparse(sp, cfg, strategy=strategy)
    np.testing.assert_array_equal(np.asarray(r1.W), np.asarray(r2.W))
    np.testing.assert_array_equal(np.asarray(r1.H), np.asarray(r2.H))

    operand_before = plan.operand
    r3 = plan.run(dataclasses.replace(cfg, num_iterations=16))
    assert r3.num_iterations == 16
    assert plan.operand is operand_before  # no layout rebuild
    assert r3.frobenius_error <= r1.frobenius_error + 1e-6

    with pytest.raises(ValueError, match="dtype"):
        plan.run(dataclasses.replace(cfg, dtype="bfloat16"))


def test_prepare_sparse_densified_v_storage_guard(rng):
    """Switching int8 v_storage after a bf16 densify (or vice versa) must
    be rejected — the layouts differ."""
    import dataclasses

    from nmftpu.sparse_ops import prepare_sparse

    dense, _ = _sprandom(rng, 24, 20)
    sp = hs.from_dense(dense)
    cfg = NmfConfig(rank=3, num_iterations=4)
    plan = prepare_sparse(sp, cfg, strategy="densified")
    with pytest.raises(ValueError, match="v_storage"):
        plan.run(dataclasses.replace(cfg, v_storage="int8"))

    cfg8 = dataclasses.replace(cfg, v_storage="int8")
    plan8 = prepare_sparse(sp, cfg8, strategy="densified")
    r8 = plan8.run()
    assert np.isfinite(r8.frobenius_error)


def test_prepare_sparse_unknown_strategy_rejected(rng):
    from nmftpu.sparse_ops import prepare_sparse

    dense, _ = _sprandom(rng, 12, 10)
    sp = hs.from_dense(dense)
    with pytest.raises(ValueError, match="strategy"):
        prepare_sparse(sp, NmfConfig(rank=2, num_iterations=2),
                       strategy="dense")
