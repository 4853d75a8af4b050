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
    W = est.fit_transform(V)
    assert est.components_.shape == (4, 30)
    assert est.n_features_in_ == 30
    assert np.isfinite(est.reconstruction_err_)
    recon = est.inverse_transform(W)
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
        NMF(n_components=3, solver="pg").fit(V)  # cd IS implemented now
    with pytest.raises(ValueError, match="beta_loss"):
        NMF(n_components=3, solver="mu", beta_loss="not-a-loss").fit(V)
    # alpha_W under the default 'cd' solver is mapped now; still
    # rejected where unmapped (mu solver / explicit algorithms)
    with pytest.raises(NotImplementedError, match="acls"):
        NMF(n_components=3, solver="mu", alpha_W=0.1).fit(V)
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


def test_nndsvd_init_matches_sklearn(rng):
    """Our exact-SVD NNDSVD matches sklearn's randomized-SVD version to
    numerical precision (the per-component +/- part selection makes
    NNDSVD invariant to the SVD's sign ambiguity)."""
    from sklearn.decomposition._nmf import _initialize_nmf

    from nmftpu.init.nndsvd import nndsvd_init

    V, _, _ = _problem(rng, n=30, m=24, r=6)
    for variant in ("nndsvd", "nndsvda"):
        W_sk, H_sk = _initialize_nmf(V, 6, init=variant, random_state=0)
        W, H = nndsvd_init(V, 6, variant=variant)
        # sklearn uses randomized SVD (approximate); ours is exact LAPACK
        np.testing.assert_allclose(W, W_sk, rtol=2e-3, atol=2e-4)
        np.testing.assert_allclose(H, H_sk, rtol=2e-3, atol=2e-4)
    # sparse input path (scipy svds), same math
    scipy_sparse = pytest.importorskip("scipy.sparse")
    Vs = V.copy(); Vs[Vs < np.quantile(Vs, 0.6)] = 0.0
    W_sk, H_sk = _initialize_nmf(
        scipy_sparse.csr_matrix(Vs), 4, init="nndsvd", random_state=0
    )
    W, H = nndsvd_init(scipy_sparse.csr_matrix(Vs), 4, variant="nndsvd")
    # truncated ARPACK vs randomized SVD drift more on the sparse
    # spectrum tail; the seeding is equivalent, not bit-identical
    np.testing.assert_allclose(W, W_sk, rtol=2e-2, atol=1e-2)
    np.testing.assert_allclose(H, H_sk, rtol=2e-2, atol=1e-2)


def test_default_construction_matches_sklearn_end_to_end(rng):
    """NMF(n_components=r) with all other params DEFAULT follows sklearn's
    default pipeline — nndsvda init + the 'cd' (HALS) solver. The SVD
    backends differ (exact LAPACK vs randomized), so factors are
    equivalent-quality rather than bit-identical: the reconstruction
    errors must agree."""
    from sklearn.decomposition import NMF as SkNMF

    V, _, _ = _problem(rng)
    iters = 50
    # random_state seeds sklearn's randomized SVD (otherwise the nndsvda
    # seeding — and this comparison — varies run to run)
    sk = SkNMF(n_components=5, max_iter=iters, tol=0.0, random_state=0)
    sk.fit_transform(V.copy())
    est = NMF(n_components=5, max_iter=iters, tol=0.0,
              dtype="float64", eps=0.0)
    est.fit_transform(V)
    np.testing.assert_allclose(est.reconstruction_err_,
                               sk.reconstruction_err_, rtol=2e-3)
    # and with identical custom inits, the default pipelines match
    # factor-for-factor (both run the same cyclic CD)
    W0 = rng.uniform(0.1, 1.0, (40, 5))
    H0 = rng.uniform(0.1, 1.0, (5, 30))
    sk2 = SkNMF(n_components=5, init="custom", max_iter=20, tol=0.0)
    W_sk = sk2.fit_transform(V.copy(), W=W0.copy(), H=H0.copy())
    est2 = NMF(n_components=5, init="custom", max_iter=20, tol=0.0,
               dtype="float64", eps=0.0)
    W = est2.fit_transform(V, W=W0, H=H0)
    np.testing.assert_allclose(W, W_sk, rtol=1e-6, atol=1e-10)


def test_auto_n_components_resolution(rng):
    """'auto' (the sklearn 1.x default) infers the rank from a custom H,
    else n_features; a tall matrix fits with the n_features default."""
    V, W0, H0 = _problem(rng, n=40, m=8, r=3)
    est = NMF(init="custom", max_iter=5, tol=0.0, dtype="float64")
    est.fit(V, W=W0[:, :3], H=H0[:3, :8])
    assert est.n_components_ == 3
    est2 = NMF(max_iter=5, tol=0.0)
    est2.fit(V)  # auto -> n_features = 8 <= min handled
    assert est2.n_components_ == 8
    # overcomplete default on a short-wide matrix fails LOUDLY
    import pytest as _pytest
    with _pytest.raises(ValueError, match="rank"):
        NMF(max_iter=5).fit(V.T[:6])


def test_ignored_custom_factors_warn(rng):
    V, W0, H0 = _problem(rng)
    est = NMF(n_components=5, init="random", max_iter=5, tol=0.0)
    with pytest.warns(RuntimeWarning, match="ignored"):
        est.fit(V, W=W0, H=H0)


def test_mesh_strategy_forwarding(rng):
    """strategy= selects the sharded per-tile engine when a mesh is
    given; 'densified' is rejected on meshes."""
    from nmftpu.parallel import make_grid_mesh
    from nmftpu.sparse import from_dense

    V, _, _ = _problem(rng, dtype=np.float32)
    V[V < 0.8] = 0.0
    V[:, 0] += 0.5
    V[0, :] += 0.5
    sp = from_dense(V)
    mesh = make_grid_mesh((2, 4))
    for strat in ("scatter", "ring"):
        est = NMF(n_components=3, max_iter=10, tol=0.0, mesh=mesh,
                  strategy=strat, init="random", random_state=0)
        est.fit(sp)
        assert np.isfinite(est.reconstruction_err_)
    with pytest.raises(ValueError, match="densified"):
        NMF(n_components=3, max_iter=5, mesh=mesh,
            strategy="densified", init="random").fit(sp)


def test_nndsvd_inits_via_core_api(rng):
    """The NNDSVD family is first-class in the core API too (dense and
    sparse drivers), not just the facade."""
    import nmftpu
    from nmftpu.sparse import from_dense

    V, _, _ = _problem(rng, dtype=np.float32)
    for init in ("nndsvd", "nndsvda", "nndsvdar"):
        res = nmftpu.nmf(V, 4, init=init, num_iterations=10)
        assert np.isfinite(res.frobenius_error)
    Vs = V.copy(); Vs[Vs < np.quantile(Vs, 0.6)] = 0.0
    Vs[:, 0] += 0.5; Vs[0, :] += 0.5
    res = nmftpu.nmf(from_dense(Vs), 4, init="nndsvda", num_iterations=10)
    assert np.isfinite(res.frobenius_error)
    # deterministic: same call twice -> identical factors
    r2 = nmftpu.nmf(from_dense(Vs), 4, init="nndsvda", num_iterations=10)
    np.testing.assert_array_equal(np.asarray(res.W), np.asarray(r2.W))
    # sharded driver routes nndsvd through the single-device init
    # fallback then shards (host SVD is init-time-only)
    from nmftpu.parallel import make_grid_mesh

    rm = nmftpu.nmf(from_dense(Vs), 4, init="nndsvda", num_iterations=10,
                    mesh=make_grid_mesh((2, 4)))
    assert np.isfinite(rm.frobenius_error)


def test_extension_ials(rng):
    """alpha_confidence extension: algorithm='als' runs iALS through the
    facade on implicit data."""
    W0 = rng.uniform(0.1, 1.0, (40, 4))
    H0 = rng.uniform(0.1, 1.0, (4, 30))
    V = ((W0 @ H0) > np.quantile(W0 @ H0, 0.75)).astype(np.float32)
    V[:, 0] = 1.0
    V[0, :] = 1.0
    est = NMF(n_components=4, max_iter=10, tol=0.0, algorithm="als",
              alpha_confidence=20.0, lambda_w=0.1, lambda_h=0.1,
              random_state=0)
    W = est.fit_transform(V)
    assert (W >= 0).all() and np.isfinite(est.reconstruction_err_)
