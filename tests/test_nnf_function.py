"""non_negative_factorization — the sklearn module-level function API."""

import numpy as np
import pytest


@pytest.fixture
def rng():
    return np.random.default_rng(41)


def _problem(rng, n=40, m=30, r=4):
    V = (np.abs(rng.normal(size=(n, m))) + 0.1)
    W0 = np.abs(rng.normal(size=(n, r))) + 0.05
    H0 = np.abs(rng.normal(size=(r, m))) + 0.05
    return V, W0, H0


def test_nnf_update_h_true_matches_sklearn(rng):
    from sklearn.decomposition import non_negative_factorization as sk_nnf

    from nmftpu.sklearn_api import non_negative_factorization as nnf

    V, W0, H0 = _problem(rng)
    for solver, bl in (("cd", "frobenius"), ("mu", "kullback-leibler"),
                       ("mu", 1.5)):
        W_sk, H_sk, it_sk = sk_nnf(
            V.copy(), W=W0.copy(), H=H0.copy(), n_components=4,
            init="custom", solver=solver, beta_loss=bl, tol=0.0,
            max_iter=12,
        )
        W, H, it = nnf(V, W=W0, H=H0, n_components=4, init="custom",
                       solver=solver, beta_loss=bl, tol=0.0,
                       max_iter=12, dtype="float64")
        np.testing.assert_allclose(W, W_sk, rtol=1e-7, atol=1e-10)
        np.testing.assert_allclose(H, H_sk, rtol=1e-7, atol=1e-10)
        assert it == it_sk


@pytest.mark.parametrize("solver,bl", [
    ("mu", "frobenius"),
    ("mu", "kullback-leibler"),
    ("mu", 1.5),
    ("mu", 0.5),   # flat-avg init + beta<1 stabilization
    ("cd", "frobenius"),  # zeros init
])
def test_nnf_update_h_false_matches_sklearn(rng, solver, bl):
    """W-only solves (H constant) match sklearn for both solvers
    across losses; sklearn re-initializes W (ignoring any provided one,
    with a warning) -- mirrored exactly."""
    from sklearn.decomposition import non_negative_factorization as sk_nnf

    from nmftpu.sklearn_api import non_negative_factorization as nnf

    V, W0, H0 = _problem(rng)
    kw = dict(n_components=4, update_H=False, solver=solver,
              beta_loss=bl, tol=0.0, max_iter=10)
    W_sk, H_sk, _ = sk_nnf(V.copy(), H=H0.copy(), **kw)
    W, H, _ = nnf(V, H=H0, dtype="float64", **kw)
    np.testing.assert_allclose(W, W_sk, rtol=1e-7, atol=1e-10)
    np.testing.assert_array_equal(H, H_sk)  # untouched
    # a provided W is ignored, with the same warning as sklearn
    with pytest.warns(RuntimeWarning, match="not used"):
        W2, _, _ = nnf(V, W=W0, H=H0, dtype="float64", **kw)
    np.testing.assert_array_equal(W2, W)


def test_nnf_update_h_false_regularized(rng):
    from sklearn.decomposition import non_negative_factorization as sk_nnf

    from nmftpu.sklearn_api import non_negative_factorization as nnf

    V, W0, H0 = _problem(rng)
    kw = dict(n_components=4, update_H=False,
              solver="mu", tol=0.0, max_iter=10, alpha_W=0.002,
              l1_ratio=0.3)
    W_sk, _, _ = sk_nnf(V.copy(), H=H0.copy(), **kw)
    W, _, _ = nnf(V, H=H0, dtype="float64", **kw)
    np.testing.assert_allclose(W, W_sk, rtol=1e-7, atol=1e-10)


def test_nnf_guards(rng):
    from nmftpu.sklearn_api import non_negative_factorization as nnf

    V, W0, H0 = _problem(rng)
    with pytest.raises(ValueError, match="requires H"):
        nnf(V, update_H=False)
    with pytest.raises(ValueError, match="solver='cd'"):
        nnf(V, H=H0, update_H=False, beta_loss=1.5)
    # package lazy export
    import nmftpu

    assert nmftpu.non_negative_factorization is nnf


def test_nnf_update_h_false_sklearn_guards(rng):
    """Review findings: the W-only path enforces sklearn's validation
    surface (H shape vs n_components, the beta<=0 zero guard, shuffle
    rejection) instead of silently diverging from sklearn."""
    from nmftpu.sklearn_api import non_negative_factorization as nnf

    V, W0, H0 = _problem(rng)
    with pytest.raises(ValueError, match="n_components"):
        nnf(V, H=H0, n_components=3, update_H=False, solver="mu")
    with pytest.raises(ValueError, match="features"):
        nnf(V, H=H0[:, :10], update_H=False, solver="mu")
    Vz = V.copy()
    Vz[0, 0] = 0.0
    with pytest.raises(ValueError, match="beta_loss <= 0"):
        nnf(Vz, H=H0, update_H=False, solver="mu",
            beta_loss="itakura-saito")
    with pytest.raises(NotImplementedError, match="shuffle"):
        nnf(V, H=H0, update_H=False, solver="cd", shuffle=True)
