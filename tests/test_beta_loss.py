"""Generalized beta-divergence objective (sklearn's float beta_loss /
'itakura-saito'): dense + densified engines, facade mapping, guards."""

import numpy as np
import pytest

from nmftpu import Algorithm, NmfConfig, Objective
from nmftpu import sparse as hs
from nmftpu.driver import compute
from nmftpu.sparse_ops import compute_sparse


@pytest.fixture
def rng():
    return np.random.default_rng(11)


def _problem(rng, n=40, m=30, r=4, dtype=np.float64):
    # strictly positive V: the IS divergence is +inf at zeros, and
    # sklearn's own beta<1 guards assume positive data
    V = (np.abs(rng.normal(size=(n, m))) + 0.1).astype(dtype)
    W0 = np.abs(rng.normal(size=(n, r))).astype(dtype) + 0.05
    H0 = np.abs(rng.normal(size=(r, m))).astype(dtype) + 0.05
    return V, W0, H0


@pytest.mark.parametrize("beta_loss", [0.5, 1.5, 2.5, "itakura-saito"])
def test_beta_mu_matches_sklearn(rng, beta_loss):
    """Factor parity with sklearn solver='mu' at float beta_loss values
    spanning all three gamma regimes (beta<1, 1<beta<2, beta>2) and IS."""
    from sklearn.decomposition import NMF as SkNMF

    from nmftpu.sklearn_api import NMF

    V, W0, H0 = _problem(rng)
    sk = SkNMF(n_components=4, solver="mu", beta_loss=beta_loss,
               init="custom", max_iter=12, tol=0.0)
    W_sk = sk.fit_transform(V.copy(), W=W0.copy(), H=H0.copy())
    est = NMF(n_components=4, solver="mu", beta_loss=beta_loss,
              init="custom", max_iter=12, tol=0.0, dtype="float64")
    W = est.fit_transform(V, W=W0, H=H0)
    np.testing.assert_allclose(W, W_sk, rtol=1e-7, atol=1e-10)
    np.testing.assert_allclose(est.components_, sk.components_,
                               rtol=1e-7, atol=1e-10)
    # sklearn's reconstruction_err_ = sqrt(2 * beta_divergence)
    np.testing.assert_allclose(
        est.reconstruction_err_, sk.reconstruction_err_, rtol=1e-5
    )


def test_beta_divergence_value_matches_sklearn(rng):
    from sklearn.decomposition._nmf import _beta_divergence

    from nmftpu.linalg import dense as D

    V, W0, H0 = _problem(rng)
    for beta in (0.0, 0.5, 1.5, 2.5, -0.5):
        ours = float(D.beta_divergence(V, W0, H0, beta))
        ref = float(_beta_divergence(V, W0, H0, beta))
        np.testing.assert_allclose(ours, ref, rtol=1e-6)


def test_beta_config_normalization():
    cfg = NmfConfig(rank=3, objective="beta-divergence", beta=2.0)
    assert cfg.objective is Objective.FROBENIUS and cfg.beta is None
    cfg = NmfConfig(rank=3, objective="beta-divergence", beta=1)
    assert cfg.objective is Objective.KL and cfg.beta is None
    cfg = NmfConfig(rank=3, objective="itakura-saito")
    assert cfg.objective is Objective.BETA and cfg.beta == 0.0
    with pytest.raises(ValueError, match="requires the beta knob"):
        NmfConfig(rank=3, objective="beta-divergence")
    with pytest.raises(ValueError, match="only meaningful"):
        NmfConfig(rank=3, beta=0.5)
    with pytest.raises(ValueError, match="MU"):
        NmfConfig(rank=3, objective="beta-divergence", beta=0.5,
                  algorithm="als")
    with pytest.raises(ValueError, match="itakura"):
        NmfConfig(rank=3, objective="itakura-saito", beta=0.5)


def test_beta_densified_matches_dense(rng):
    """Sparse V routes to the densified engine (auto) and tracks the
    dense engine within bf16-storage tolerance."""
    V32, W0, H0 = _problem(rng, dtype=np.float32)
    V32[V32 < np.quantile(V32, 0.5)] = 0.0
    V32[:, 0] += 0.5
    V32[0, :] += 0.5
    cfg = NmfConfig(rank=4, objective="beta-divergence", beta=1.5,
                    num_iterations=8, init_method="copy_existing",
                    check_interval=4)
    kw = dict(W0=W0.astype(np.float32), H0=H0.astype(np.float32))
    rd = compute(V32, cfg, **kw)
    rs = compute_sparse(hs.from_dense(V32), cfg, **kw)
    np.testing.assert_allclose(
        rs.frobenius_error, rd.frobenius_error, rtol=5e-3
    )
    np.testing.assert_allclose(rs.kl_error, rd.kl_error, rtol=5e-3)
    assert np.asarray(rs.W).shape == np.asarray(rd.W).shape
    # divergence decreased from the initial factors
    from nmftpu.linalg import dense as D

    d0 = float(D.beta_divergence(V32, kw["W0"], kw["H0"], 1.5))
    assert rd.kl_error < d0


def test_beta_int8_storage(rng):
    """int8-stored V under general beta: scale folds into the numerator;
    the run matches the f32 densified path loosely and decreases D."""
    V32, W0, H0 = _problem(rng, dtype=np.float32)
    kw = dict(W0=W0.astype(np.float32), H0=H0.astype(np.float32))
    ref = compute(
        V32,
        NmfConfig(rank=4, objective="beta-divergence", beta=1.5,
                  num_iterations=6, init_method="copy_existing",
                  check_interval=3),
        **kw,
    )
    rq = compute(
        V32,
        NmfConfig(rank=4, objective="beta-divergence", beta=1.5,
                  num_iterations=6, init_method="copy_existing",
                  check_interval=3, v_storage="int8"),
        **kw,
    )
    np.testing.assert_allclose(
        rq.frobenius_error, ref.frobenius_error, rtol=0.05
    )


def test_beta_engine_guards(rng):
    V32, _, _ = _problem(rng, dtype=np.float32)
    sp = hs.from_dense(V32)
    cfg = NmfConfig(rank=3, objective="beta-divergence", beta=0.5,
                    num_iterations=2)
    from nmftpu.parallel import prepare_sharded, make_grid_mesh

    # every sharded engine runs beta (scatter/ring/ELL: see
    # test_beta_sharded_matches_single_device); auto follows the MU
    # rule and picks the ELL tiles
    plan = prepare_sharded(sp, cfg, mesh=make_grid_mesh((2, 4)))
    assert plan.engine == "ell"
    from nmftpu.sparse_ops import _resolve_strategy

    # f64 beta routes to the exact scatter engine; f32 beyond the
    # densify budget routes to ELL (r3 verdict item 7: every single-
    # device engine runs a float beta_loss)
    cfg64 = NmfConfig(rank=3, objective="beta-divergence", beta=0.5,
                      dtype="float64")
    assert _resolve_strategy(None, cfg64, "auto", 40, 30) == "scatter"
    cfg32 = NmfConfig(rank=3, objective="beta-divergence", beta=0.5)
    assert _resolve_strategy(None, cfg32, "auto", 40, 30) == "densified"
    assert _resolve_strategy(None, cfg32, "auto", 10**6, 10**6) == "ell"


@pytest.mark.parametrize("beta", [0.5, 1.5, 2.5, 0.0])
def test_beta_sparse_engines_match_dense(rng, beta):
    """Scatter and ELL beta-MU track the dense oracle (which is itself
    sklearn-parity-tested above) — numerators via the fused gather
    machinery, denominators streamed blockwise."""
    import dataclasses

    V, W0, H0 = _problem(rng)
    sp = hs.from_dense(V)
    cfg = NmfConfig(rank=4, objective="beta-divergence", beta=beta,
                    num_iterations=8, init_method="copy_existing",
                    check_interval=4, dtype="float64")
    r_dense = compute(V, cfg, W0=W0, H0=H0)
    r_sc = compute_sparse(sp, cfg, W0=W0, H0=H0, strategy="scatter")
    np.testing.assert_allclose(np.asarray(r_sc.W), np.asarray(r_dense.W),
                               rtol=1e-9, atol=1e-12)
    np.testing.assert_allclose(np.asarray(r_sc.H), np.asarray(r_dense.H),
                               rtol=1e-9, atol=1e-12)
    np.testing.assert_allclose(float(r_sc.kl_error),
                               float(r_dense.kl_error), rtol=1e-6)
    # ELL accumulates f32: compare at f32 tolerance
    cfg32 = dataclasses.replace(cfg, dtype="float32")
    r_d32 = compute(V.astype(np.float32), cfg32,
                    W0=W0.astype(np.float32), H0=H0.astype(np.float32))
    r_ell = compute_sparse(hs.from_dense(V.astype(np.float32)), cfg32,
                           W0=W0.astype(np.float32),
                           H0=H0.astype(np.float32), strategy="ell")
    np.testing.assert_allclose(np.asarray(r_ell.W), np.asarray(r_d32.W),
                               rtol=2e-3, atol=2e-5)
    np.testing.assert_allclose(float(r_ell.kl_error),
                               float(r_d32.kl_error), rtol=1e-3)


def test_beta_sparse_with_zeros_matches_sklearn(rng):
    """Sparse-X beta parity directly against sklearn (zeros present —
    the case the guards exist for), scatter f64 exact."""
    from sklearn.decomposition import NMF as SkNMF

    V, W0, H0 = _problem(rng)
    V = np.where(rng.random(V.shape) < 0.4, 0.0, V)
    V[:, 0] += 0.2
    V[0, :] += 0.2
    sk = SkNMF(n_components=4, solver="mu", beta_loss=1.5,
               init="custom", max_iter=10, tol=0.0)
    W_sk = sk.fit_transform(V.copy(), W=W0.copy(), H=H0.copy())
    cfg = NmfConfig(rank=4, objective="beta-divergence", beta=1.5,
                    num_iterations=10, init_method="copy_existing",
                    check_interval=10, dtype="float64")
    r = compute_sparse(hs.from_dense(V), cfg, W0=W0, H0=H0,
                       strategy="scatter")
    np.testing.assert_allclose(np.asarray(r.W), W_sk, rtol=1e-7,
                               atol=1e-10)
    np.testing.assert_allclose(np.asarray(r.H), sk.components_,
                               rtol=1e-7, atol=1e-10)


def test_beta_divergence_sparse_matches_sklearn(rng):
    """beta_divergence_sparse / beta_divergence_ell == sklearn's
    _beta_divergence on sparse X (guard-for-guard: v > EPSILON filter,
    WH clamp, blockwise sum over the zero positions)."""
    import scipy.sparse as sps
    from sklearn.decomposition._nmf import _beta_divergence

    from nmftpu.sparse_ell import beta_divergence_ell, build_ell_pair
    from nmftpu.sparse_ops import beta_divergence_sparse, device_put_sparse

    V, W0, H0 = _problem(rng)
    V = np.where(rng.random(V.shape) < 0.4, 0.0, V)
    sp = hs.from_dense(V)
    coo = device_put_sparse(sp, dtype="float64")
    pair = build_ell_pair(sp, dtype="float64")
    X = sps.csr_matrix(V)
    for beta in (0.5, 1.5, 2.5, 0.0):
        ref = float(_beta_divergence(X, W0, H0, beta))
        ours = float(beta_divergence_sparse(coo, W0, H0, beta))
        np.testing.assert_allclose(ours, ref, rtol=1e-6)
        ours_ell = float(beta_divergence_ell(pair, W0, H0, beta))
        np.testing.assert_allclose(ours_ell, ref, rtol=1e-6)


def test_beta_facade_guards(rng):
    from nmftpu.sklearn_api import NMF

    V, _, _ = _problem(rng)
    # cd (default) rejects non-frobenius losses like sklearn
    with pytest.raises(ValueError, match="solver='cd'"):
        NMF(n_components=3, beta_loss=0.5).fit(V)
    with pytest.raises(ValueError, match="beta_loss"):
        NMF(n_components=3, solver="mu", beta_loss="nope").fit(V)
    est = NMF(n_components=3, solver="mu", beta_loss=1.5, max_iter=5,
              tol=0.0)
    est.fit(V)
    # transform under a general beta is IMPLEMENTED (W-only beta-MU
    # fold-in, nmftpu.foldin._beta_w_loop_dense)
    Wt = est.transform(V[:4])
    assert Wt.shape == (4, 3) and np.isfinite(Wt).all() and (Wt >= 0).all()


def test_beta_transform_matches_sklearn(rng):
    """Facade transform under float beta_loss tracks sklearn's
    transform given the SAME components. (Fitting both libraries
    end-to-end and comparing is NOT robust: the objective is
    multimodal and 200 iterations amplify reduction-order roundoff
    into different local minima run-to-run — so fit with sklearn
    once and test only the projection, which is what this facade
    path implements.)"""
    from sklearn.decomposition import NMF as SkNMF

    from nmftpu.sklearn_api import NMF

    V, _, _ = _problem(rng)
    Vnew = V[:6] + 0.05
    for bl in (1.5, 0.5, "itakura-saito"):
        sk = SkNMF(n_components=4, init="nndsvda", solver="mu",
                   beta_loss=bl, max_iter=200, tol=0.0)
        sk.fit(V.copy())
        want = sk.transform(Vnew.copy())
        est = NMF(n_components=4, init="nndsvda", solver="mu",
                  beta_loss=bl, max_iter=200, tol=0.0, eps=0.0,
                  dtype="float64")
        # graft sklearn's fit so both transforms see identical H
        est.components_ = sk.components_.copy()
        est.n_components_ = sk.components_.shape[0]
        got = est.transform(Vnew)
        # fold-in runs f32 (serving path) vs sklearn's f64 loop
        assert (np.abs(got - want).max() / np.abs(want).max()) < 1e-3, bl


def test_beta_api_nmf_entry(rng):
    """Top-level nmf() accepts the objective strings + beta knob."""
    import nmftpu

    V32, _, _ = _problem(rng, dtype=np.float32)
    res = nmftpu.nmf(V32, 3, objective="is", num_iterations=5, seed=1)
    assert np.isfinite(res.kl_error)
    res2 = nmftpu.nmf(V32, 3, objective="beta", beta=1.5,
                      num_iterations=5, seed=1, num_runs=2)
    assert len(res2.run_errors) == 2
    assert np.isfinite(res2.kl_error)


def test_beta_sklearn_parity_with_zeros(rng):
    """Data WITH zeros: the EPSILON power guards must match sklearn
    exactly (review finding: zero/subnormal WH entries previously took
    a different clamp than sklearn's)."""
    from sklearn.decomposition import NMF as SkNMF

    from nmftpu.sklearn_api import NMF

    V, W0, H0 = _problem(rng)
    V[V < np.quantile(V, 0.3)] = 0.0  # plenty of exact zeros
    for bl in (0.5, 1.5):
        sk = SkNMF(n_components=4, solver="mu", beta_loss=bl,
                   init="custom", max_iter=15, tol=0.0)
        W_sk = sk.fit_transform(V.copy(), W=W0.copy(), H=H0.copy())
        est = NMF(n_components=4, solver="mu", beta_loss=bl,
                  init="custom", max_iter=15, tol=0.0, dtype="float64")
        W = est.fit_transform(V, W=W0, H=H0)
        np.testing.assert_allclose(W, W_sk, rtol=1e-7, atol=1e-12)
        np.testing.assert_allclose(est.components_, sk.components_,
                                   rtol=1e-7, atol=1e-12)


def test_beta_normalized_objectives_hit_algorithm_guards():
    """beta=1.0 / beta=2.0 normalize BEFORE the objective-algorithm
    guards, so they obey the same rules as the named objectives
    (review finding: ALS+beta=1.0 previously slipped through as a
    silent Frobenius fit labeled KL)."""
    with pytest.raises(ValueError, match="KL objective"):
        NmfConfig(rank=4, algorithm="als",
                  objective="beta-divergence", beta=1.0)
    cfg = NmfConfig(rank=4, algorithm="als",
                    objective="beta-divergence", beta=2.0)
    assert cfg.objective is Objective.FROBENIUS  # fine: ALS+fro


@pytest.mark.parametrize("beta", [0.5, 1.5, 2.5, 0.0])
def test_beta_sharded_matches_single_device(rng, beta):
    """Grid-mesh beta-MU (per-tile powered-SDDMM numerators, streamed
    panel denominators psum'd over the mesh axes) matches the
    single-device scatter engine, divergence included."""
    from nmftpu.parallel import compute_sharded, make_grid_mesh

    V, W0, H0 = _problem(rng)
    V32 = V.astype(np.float32)
    V32 = np.where(rng.random(V32.shape) < 0.3, 0.0, V32)
    V32[:, 0] += 0.2
    V32[0, :] += 0.2
    W032 = W0.astype(np.float32)
    H032 = H0.astype(np.float32)
    sp = hs.from_dense(V32)
    cfg = NmfConfig(rank=4, objective="beta-divergence", beta=beta,
                    num_iterations=6, init_method="copy_existing",
                    check_interval=3)
    r1 = compute_sparse(sp, cfg, W0=W032, H0=H032, strategy="scatter")
    mesh = make_grid_mesh((2, 4))
    rs = compute_sharded(sp, cfg, W0=W032, H0=H032, mesh=mesh,
                         engine="scatter")
    np.testing.assert_allclose(np.asarray(rs.W), np.asarray(r1.W),
                               rtol=3e-3, atol=3e-4)
    np.testing.assert_allclose(np.asarray(rs.H), np.asarray(r1.H),
                               rtol=3e-3, atol=3e-4)
    np.testing.assert_allclose(float(rs.kl_error), float(r1.kl_error),
                               rtol=2e-3)
    # ring engine: same rotation-based dataflow, same answer
    rr = compute_sharded(sp, cfg, W0=W032, H0=H032, mesh=mesh,
                         engine="ring")
    np.testing.assert_allclose(np.asarray(rr.W), np.asarray(r1.W),
                               rtol=3e-3, atol=3e-4)
    np.testing.assert_allclose(float(rr.kl_error), float(r1.kl_error),
                               rtol=2e-3)
    # ELL tiles (the auto default for beta+MU since round 4): fused
    # gather-once numerators + the same streamed panel denominators
    re_ = compute_sharded(sp, cfg, W0=W032, H0=H032, mesh=mesh,
                          engine="ell")
    np.testing.assert_allclose(np.asarray(re_.W), np.asarray(r1.W),
                               rtol=3e-3, atol=3e-4)
    np.testing.assert_allclose(np.asarray(re_.H), np.asarray(r1.H),
                               rtol=3e-3, atol=3e-4)
    np.testing.assert_allclose(float(re_.kl_error), float(r1.kl_error),
                               rtol=2e-3)
