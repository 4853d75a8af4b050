"""The sklearn-compatible estimator facade (nmftpu.sklearn_api.NMF):
drop-in constructor/method surface, factor parity with
sklearn.decomposition.NMF under identical settings, sparse/mesh routing,
and parameter-translation errors."""

import numpy as np
import pytest

from nmftpu.sklearn_api import NMF


def _problem(rng, n=40, m=30, r=5, dtype=np.float64):
    V = rng.uniform(0.1, 2.0, (n, m)).astype(dtype)
    W0 = rng.uniform(0.1, 1.0, (n, r)).astype(dtype)
    H0 = rng.uniform(0.1, 1.0, (r, m)).astype(dtype)
    return V, W0, H0


@pytest.mark.parametrize("beta", ["frobenius", "kullback-leibler"])
def test_fit_transform_matches_sklearn(rng, beta):
    from sklearn.decomposition import NMF as SkNMF

    V, W0, H0 = _problem(rng)
    iters = 30

    sk = SkNMF(n_components=5, init="custom", solver="mu", beta_loss=beta,
               max_iter=iters, tol=0.0)
    W_sk = sk.fit_transform(V.copy(), W=W0.copy(), H=H0.copy())

    est = NMF(n_components=5, init="custom", solver="mu", beta_loss=beta,
              max_iter=iters, tol=0.0, dtype="float64", eps=0.0)
    W = est.fit_transform(V, W=W0, H=H0)

    np.testing.assert_allclose(W, W_sk, rtol=1e-4, atol=1e-7)
    np.testing.assert_allclose(est.components_, sk.components_,
                               rtol=1e-4, atol=1e-7)
    assert est.n_components_ == 5
    assert est.n_iter_ == iters
    np.testing.assert_allclose(est.reconstruction_err_,
                               sk.reconstruction_err_, rtol=1e-3)


def test_fit_and_fitted_attributes(rng):
    V, _, _ = _problem(rng)
    est = NMF(n_components=4, max_iter=20, tol=0.0, random_state=1)
    assert est.fit(V) is est
    assert est.components_.shape == (4, 30)
    assert est.n_features_in_ == 30
    assert np.isfinite(est.reconstruction_err_)
    recon = est.inverse_transform(est._result.W)
    assert recon.shape == V.shape


def test_transform_projects_new_rows(rng):
    """transform() = fold-in against the frozen components; matches
    sklearn's transform semantics (update_H=False MU)."""
    from sklearn.decomposition import NMF as SkNMF

    V, W0, H0 = _problem(rng, n=50)
    est = NMF(n_components=5, init="custom", max_iter=100, tol=0.0,
              dtype="float64", eps=0.0)
    est.fit(V, W=W0, H=H0)

    new = rng.uniform(0.1, 2.0, (6, 30)).astype(np.float64)
    Wn = est.transform(new)
    assert Wn.shape == (6, 5) and (Wn >= 0).all()
    # reconstruction through the frozen table beats a random embedding
    err = np.linalg.norm(new - Wn @ est.components_)
    rand_err = np.linalg.norm(
        new - np.abs(rng.standard_normal((6, 5))) @ est.components_
    )
    assert err < rand_err


def test_scipy_sparse_and_nmftpu_sparse_inputs(rng):
    scipy_sparse = pytest.importorskip("scipy.sparse")
    from nmftpu.sparse import from_dense

    V, _, _ = _problem(rng, dtype=np.float32)
    V[V < 0.8] = 0.0
    V[:, 0] += 0.5
    V[0, :] += 0.5

    est1 = NMF(n_components=4, max_iter=25, tol=0.0, random_state=2)
    W1 = est1.fit_transform(scipy_sparse.csr_matrix(V))
    est2 = NMF(n_components=4, max_iter=25, tol=0.0, random_state=2)
    W2 = est2.fit_transform(from_dense(V))
    np.testing.assert_allclose(W1, W2, rtol=1e-4, atol=1e-6)


def test_mesh_routing(rng):
    from nmftpu.parallel import make_grid_mesh
    from nmftpu.sparse import from_dense

    V, _, _ = _problem(rng, dtype=np.float32)
    V[V < 0.8] = 0.0
    V[:, 0] += 0.5
    V[0, :] += 0.5
    est = NMF(n_components=3, max_iter=15, tol=0.0,
              mesh=make_grid_mesh((2, 4)))
    W = est.fit_transform(from_dense(V))
    assert W.shape == (40, 3) and np.isfinite(est.reconstruction_err_)


def test_parameter_translation_errors(rng):
    V, _, _ = _problem(rng)
    with pytest.raises(NotImplementedError, match="solver"):
        NMF(n_components=3, solver="cd").fit(V)
    with pytest.raises(ValueError, match="beta_loss"):
        NMF(n_components=3, beta_loss="itakura-saito").fit(V)
    with pytest.raises(NotImplementedError, match="acls"):
        NMF(n_components=3, alpha_W=0.1).fit(V)
    with pytest.raises(NotImplementedError, match="nndsvd"):
        NMF(n_components=3, init="nndsvd").fit(V)
    with pytest.raises(ValueError, match="custom"):
        NMF(n_components=3, init="custom").fit(V)
    with pytest.raises(AttributeError, match="not fitted"):
        NMF(n_components=3).transform(V)


def test_get_set_params_clone(rng):
    """BaseEstimator integration: get_params/set_params/clone work, so
    the estimator composes with sklearn pipelines and searches."""
    from sklearn.base import clone

    est = NMF(n_components=3, max_iter=10, tol=0.0, random_state=5)
    params = est.get_params()
    assert params["n_components"] == 3 and params["max_iter"] == 10
    est2 = clone(est).set_params(max_iter=20)
    V, _, _ = _problem(rng)
    W = est2.fit_transform(V)
    assert est2.n_iter_ == 20 and W.shape == (40, 3)


def test_extension_algorithm_als(rng):
    """algorithm= extension: the ALS family rides the same facade."""
    _, W0, H0 = _problem(rng, dtype=np.float32)
    V = (W0 @ H0).astype(np.float32)  # exactly rank-5
    est = NMF(n_components=5, max_iter=30, tol=0.0, algorithm="als",
              random_state=0)
    W = est.fit_transform(V)
    assert (W >= 0).all()
    rel = est.reconstruction_err_ / np.linalg.norm(V)
    assert rel < 0.05
