"""transform() / fold-in: W-only projection against a fixed item table.

Oracle: sklearn's MU with update_H=False
(sklearn/decomposition/_nmf.py:532, _multiplicative_update_w)."""

import numpy as np
import pytest

import nmftpu
from nmftpu.sparse import from_dense
from nmftpu.foldin import transform


def _rand_problem(b=24, m=40, r=5, seed=0, sparsity=0.0):
    rng = np.random.default_rng(seed)
    V = rng.uniform(0.1, 1.0, (b, m)).astype(np.float32)
    if sparsity:
        V[rng.uniform(size=V.shape) < sparsity] = 0.0
    H = rng.uniform(0.1, 1.0, (r, m)).astype(np.float32)
    W0 = rng.uniform(0.1, 1.0, (b, r)).astype(np.float32)
    return V, H, W0


def _sklearn_mu_w(V, H, W0, beta_loss, k):
    from sklearn.decomposition._nmf import _multiplicative_update_w

    W = W0.astype(np.float64).copy()
    H = H.astype(np.float64)
    V = V.astype(np.float64)
    H_sum = HHt = XHt = None
    for _ in range(k):
        # _multiplicative_update_w applies W *= delta in place and
        # returns the updated W
        W, H_sum, HHt, XHt = _multiplicative_update_w(
            V, W, H, beta_loss=beta_loss, l1_reg_W=0, l2_reg_W=0,
            gamma=1.0, H_sum=H_sum, HHt=HHt, XHt=XHt, update_H=False,
        )
    return W


@pytest.mark.parametrize("beta,objective", [(2, "frobenius"), (1, "kl")])
def test_mu_sklearn_parity(beta, objective):
    V, H, W0 = _rand_problem()
    expected = _sklearn_mu_w(V, H, W0, beta, k=10)
    res = transform(V, H, algorithm="mu", objective=objective,
                    num_iterations=10, W0=W0)
    np.testing.assert_allclose(res.W, expected, rtol=2e-3, atol=1e-5)


@pytest.mark.parametrize("objective", ["frobenius", "kl"])
def test_sparse_matches_dense(objective):
    V, H, W0 = _rand_problem(sparsity=0.6, seed=1)
    dense = transform(V, H, algorithm="mu", objective=objective,
                      num_iterations=15, W0=W0)
    sparse = transform(from_dense(V), H, algorithm="mu",
                       objective=objective, num_iterations=15, W0=W0)
    np.testing.assert_allclose(sparse.W, dense.W, rtol=2e-4, atol=1e-6)
    assert np.isfinite(sparse.error)
    np.testing.assert_allclose(sparse.error, dense.error,
                               rtol=1e-3, atol=1e-5)


def test_als_exact_on_realizable_data():
    """V = W_true H exactly, H full row rank: the one-shot LS recovers
    W_true and the clamp is a no-op."""
    rng = np.random.default_rng(2)
    r, m, b = 4, 32, 10
    H = rng.uniform(0.1, 1.0, (r, m)).astype(np.float32)
    W_true = rng.uniform(0.0, 2.0, (b, r)).astype(np.float32)
    V = W_true @ H
    res = transform(V, H, algorithm="als", lambda_w=0.0)
    np.testing.assert_allclose(res.W, W_true, rtol=1e-3, atol=1e-3)
    assert res.error < 1e-2
    # sparse input path hits the same solution
    res_sp = transform(from_dense(V), H, algorithm="als", lambda_w=0.0)
    np.testing.assert_allclose(res_sp.W, W_true, rtol=1e-3, atol=1e-3)


def test_weighted_als_sparse_matches_dense():
    V, H, _ = _rand_problem(b=12, sparsity=0.7, seed=3)
    d = transform(V, H, algorithm="als", alpha_confidence=4.0,
                  lambda_w=1e-3)
    s = transform(from_dense(V), H, algorithm="als", alpha_confidence=4.0,
                  lambda_w=1e-3)
    np.testing.assert_allclose(s.W, d.W, rtol=1e-3, atol=1e-4)


def test_transform_reproduces_training_residual():
    """transform() on the training rows against the fitted H reaches the
    fit's own reconstruction error."""
    rng = np.random.default_rng(4)
    V = rng.uniform(0.1, 1.0, (30, 24)).astype(np.float32)
    fit = nmftpu.nmf(V, rank=4, num_iterations=150, seed=0)
    res = transform(V, fit.H, algorithm="mu", num_iterations=300, seed=0)
    assert res.error <= fit.frobenius_error * 1.05
    assert (res.W >= 0).all()


def test_monotone_frobenius_decrease():
    V, H, W0 = _rand_problem(seed=5)
    errs = []
    for k in (1, 5, 20, 80):
        errs.append(transform(V, H, algorithm="mu", num_iterations=k,
                              W0=W0).error)
    assert all(e2 <= e1 + 1e-5 for e1, e2 in zip(errs, errs[1:]))


def test_empty_rows_and_validation():
    V, H, _ = _rand_problem(b=6, seed=6)
    Vs = from_dense(V).to_csr()
    Vs.data[Vs.indptr[2]:Vs.indptr[3]] = 0.0  # kill row 2's values
    import nmftpu.sparse as sparse_mod

    coo = Vs.to_coo()
    keep = coo.data != 0
    empty_row = sparse_mod.SparseCOO(
        coo.row[keep], coo.col[keep], coo.data[keep], coo.shape
    )
    res = transform(empty_row, H, algorithm="als")
    assert np.allclose(res.W[2], 0.0)
    res_mu = transform(empty_row, H, algorithm="mu", num_iterations=5)
    assert np.isfinite(res_mu.W).all()

    with pytest.raises(ValueError):
        transform(V, H, algorithm="nope")
    with pytest.raises(ValueError):
        transform(V, H, algorithm="als", objective="kl")
    with pytest.raises(ValueError):
        transform(V, H, algorithm="mu", alpha_confidence=1.0)
    with pytest.raises(ValueError):
        transform(V[:, :-1], H)
    with pytest.raises(ValueError):
        transform(V, H, W0=np.zeros((2, 2)))


def test_fold_in_and_recommend_from_history():
    rng = np.random.default_rng(7)
    n, m, r = 40, 32, 4
    V = (rng.uniform(size=(n, m)) < 0.3).astype(np.float32)
    sp = from_dense(V)
    fit = nmftpu.nmf(sp, rank=r, num_iterations=80, seed=0)
    rec = nmftpu.Recommender(np.asarray(fit.W), np.asarray(fit.H),
                             train=sp, block=8, method="exact")

    hist = np.flatnonzero(V[0])[:5]
    emb = rec.fold_in(hist)
    assert emb.shape == (r,) and (emb >= 0).all()
    # an existing user's own history should fold in near their trained
    # embedding's score ordering — sanity: embedding is finite, nonzero
    assert np.isfinite(emb).all() and emb.max() > 0

    scores, items = rec.recommend_from_history(hist, k=6)
    assert scores.shape == (6,) and items.shape == (6,)
    assert not set(items.tolist()) & set(hist.tolist())  # history excluded

    # weighted fold-in path
    emb_w = rec.fold_in(hist, alpha_confidence=8.0)
    assert emb_w.shape == (r,) and np.isfinite(emb_w).all()

    # mu fold-in path
    emb_mu = rec.fold_in(hist, algorithm="mu", num_iterations=30)
    assert emb_mu.shape == (r,) and (emb_mu >= 0).all()
