"""Mini-batch / online NMF (sklearn MiniBatchNMF parity + streaming)."""

import numpy as np
import pytest


@pytest.fixture
def rng():
    return np.random.default_rng(21)


def _problem(rng, n=48, m=20, r=4, dtype=np.float64):
    V = (np.abs(rng.normal(size=(n, m))) + 0.05).astype(dtype)
    W0 = np.abs(rng.normal(size=(n, r))).astype(dtype) + 0.05
    H0 = np.abs(rng.normal(size=(r, m))).astype(dtype) + 0.05
    return V, W0, H0


def _pair(beta_loss, rng, **kw):
    from sklearn.decomposition import MiniBatchNMF as SkMB

    from nmftpu.sklearn_api import MiniBatchNMF

    V, W0, H0 = _problem(rng)
    common = dict(n_components=4, init="custom", batch_size=16,
                  beta_loss=beta_loss, tol=0.0, max_no_improvement=None,
                  max_iter=4, **kw)
    sk = SkMB(**common)
    W_sk = sk.fit_transform(V.copy(), W=W0.copy(), H=H0.copy())
    est = MiniBatchNMF(dtype="float64", **common)
    W = est.fit_transform(V, W=W0, H=H0)
    return sk, W_sk, est, W


@pytest.mark.parametrize("beta_loss",
                         ["frobenius", "kullback-leibler", 0.5, 1.5])
def test_minibatch_matches_sklearn(rng, beta_loss):
    """Factor + err parity with sklearn MiniBatchNMF across the gamma
    regimes, fixed step count (tol=0, no-improvement patience off)."""
    sk, W_sk, est, W = _pair(beta_loss, rng)
    np.testing.assert_allclose(W, W_sk, rtol=1e-7, atol=1e-10)
    np.testing.assert_allclose(est.components_, sk.components_,
                               rtol=1e-7, atol=1e-10)
    assert est.n_steps_ == sk.n_steps_ and est.n_iter_ == sk.n_iter_
    np.testing.assert_allclose(
        est.reconstruction_err_, sk.reconstruction_err_, rtol=1e-6
    )


def test_minibatch_regularized_matches_sklearn(rng):
    sk, W_sk, est, W = _pair("frobenius", rng, alpha_W=0.002,
                             alpha_H=0.004, l1_ratio=0.4)
    np.testing.assert_allclose(W, W_sk, rtol=1e-7, atol=1e-10)
    np.testing.assert_allclose(est.components_, sk.components_,
                               rtol=1e-7, atol=1e-10)


def test_minibatch_fresh_restarts_matches_sklearn(rng):
    sk, W_sk, est, W = _pair("frobenius", rng, fresh_restarts=True,
                             fresh_restarts_max_iter=10)
    np.testing.assert_allclose(W, W_sk, rtol=1e-7, atol=1e-9)
    np.testing.assert_allclose(est.components_, sk.components_,
                               rtol=1e-7, atol=1e-9)


def test_minibatch_transform_matches_sklearn(rng):
    sk, _, est, _ = _pair("frobenius", rng)
    V, _, _ = _problem(rng)
    got = est.transform(V[:7])
    want = sk.transform(V[:7])
    np.testing.assert_allclose(got, want, rtol=1e-6, atol=1e-9)


def test_minibatch_partial_fit_matches_sklearn(rng):
    """Streaming path: a sequence of partial_fit batches tracks sklearn
    step for step."""
    from sklearn.decomposition import MiniBatchNMF as SkMB

    from nmftpu.sklearn_api import MiniBatchNMF

    V, W0, H0 = _problem(rng)
    common = dict(n_components=4, init="custom", batch_size=16,
                  tol=0.0, max_no_improvement=None, max_iter=3)
    sk = SkMB(**common)
    est = MiniBatchNMF(dtype="float64", **common)
    for i, lo in enumerate(range(0, 48, 16)):
        batch = V[lo:lo + 16]
        if i == 0:
            sk.partial_fit(batch, W=W0[:16].copy(), H=H0.copy())
            est.partial_fit(batch, W=W0[:16], H=H0)
        else:
            sk.partial_fit(batch)
            est.partial_fit(batch)
    np.testing.assert_allclose(est.components_, sk.components_,
                               rtol=1e-7, atol=1e-10)
    assert est.n_steps_ == sk.n_steps_ == 3


def test_minibatch_early_stopping_smoke(rng):
    """tol>0 / patience paths terminate early with finite factors."""
    from nmftpu.sklearn_api import MiniBatchNMF

    _, W0, H0 = _problem(rng, dtype=np.float32)
    V = (W0 @ H0).astype(np.float32)  # exactly rank-4: converges fast
    est = MiniBatchNMF(n_components=4, init="custom", batch_size=16,
                       tol=1e-4, max_no_improvement=3, max_iter=500)
    W = est.fit_transform(V, W=W0.astype(np.float32),
                          H=H0.astype(np.float32))
    assert est.n_steps_ < 500 * 3  # H-change / patience stop fired
    assert np.isfinite(W).all() and np.isfinite(est.components_).all()


def test_minibatch_scipy_sparse_input(rng):
    """scipy.sparse X streams through densified panels."""
    import scipy.sparse as sp

    from nmftpu.sklearn_api import MiniBatchNMF

    V, W0, H0 = _problem(rng, dtype=np.float32)
    V[V < np.quantile(V, 0.5)] = 0.0
    est = MiniBatchNMF(n_components=4, init="custom", batch_size=16,
                       tol=0.0, max_no_improvement=None, max_iter=3)
    kw = dict(W=W0.astype(np.float32), H=H0.astype(np.float32))
    W_dense = est.fit_transform(V, **kw)
    est_sp = MiniBatchNMF(n_components=4, init="custom", batch_size=16,
                          tol=0.0, max_no_improvement=None, max_iter=3)
    W_sp = est_sp.fit_transform(sp.csr_matrix(V), **kw)
    np.testing.assert_allclose(W_sp, W_dense, rtol=1e-5, atol=1e-7)


def test_minibatch_guards(rng):
    from nmftpu.sklearn_api import MiniBatchNMF

    V, _, _ = _problem(rng)
    V[0, 0] = 0.0
    with pytest.raises(ValueError, match="beta_loss <= 0"):
        MiniBatchNMF(n_components=3,
                     beta_loss="itakura-saito").fit(V)
    with pytest.raises(ValueError, match="custom"):
        MiniBatchNMF(n_components=3, init="custom").fit(V)


@pytest.mark.parametrize("n,fresh", [(48, False), (52, False), (48, True)])
def test_minibatch_fused_epoch_matches_host_loop(rng, n, fresh):
    """The single-dispatch epoch_fused path is bit-identical to the
    per-batch host loop (incl. a non-dividing tail batch and fresh
    restarts), and fuses only when it should."""
    from nmftpu.minibatch import minibatch_fit

    V, W0, H0 = _problem(rng, n=n, dtype=np.float32)
    kw = dict(batch_size=16, max_iter=3, beta=1.5, alpha_w=0.002,
              alpha_h=0.004, l1_ratio=0.3, tol=0.0,
              max_no_improvement=None, fresh_restarts=fresh,
              W0=W0.astype(np.float32), H0=H0.astype(np.float32))
    W_f, H_f, ni_f, ns_f = minibatch_fit(V, 4, fused=True, **kw)
    W_h, H_h, ni_h, ns_h = minibatch_fit(V, 4, fused=False, **kw)
    np.testing.assert_array_equal(np.asarray(H_f), np.asarray(H_h))
    np.testing.assert_array_equal(np.asarray(W_f), np.asarray(W_h))
    assert (ni_f, ns_f) == (ni_h, ns_h)


def test_minibatch_mesh_matches_single_device(rng):
    """Column-sharded H/A/B over the 8-device mesh: fit and streaming
    partial_fit match the unsharded run (GSPMD inserts the psums)."""
    from nmftpu.minibatch import OnlineNMF, minibatch_fit
    from nmftpu.parallel import make_grid_mesh
    from nmftpu.sklearn_api import MiniBatchNMF

    mesh = make_grid_mesh((2, 4))
    V, W0, H0 = _problem(rng, n=48, m=32, dtype=np.float32)
    kw = dict(batch_size=16, max_iter=3, tol=0.0,
              max_no_improvement=None, W0=W0.astype(np.float32),
              H0=H0.astype(np.float32))
    W_1, H_1, _, _ = minibatch_fit(V, 4, **kw)
    W_m, H_m, _, _ = minibatch_fit(V, 4, mesh=mesh, **kw)
    np.testing.assert_allclose(np.asarray(H_m), np.asarray(H_1),
                               rtol=2e-5, atol=1e-6)
    np.testing.assert_allclose(np.asarray(W_m), np.asarray(W_1),
                               rtol=2e-5, atol=1e-6)
    # facade route
    est = MiniBatchNMF(n_components=4, init="custom", batch_size=16,
                       tol=0.0, max_no_improvement=None, max_iter=3,
                       mesh=mesh)
    W_f = est.fit_transform(V, W=kw["W0"], H=kw["H0"])
    np.testing.assert_allclose(W_f, np.asarray(W_1), rtol=2e-5,
                               atol=1e-6)
    # streaming with sharded state
    a = OnlineNMF(4, batch_size=16, seed=1)
    b = OnlineNMF(4, batch_size=16, seed=1, mesh=mesh)
    for lo in range(0, 48, 16):
        a.partial_fit(V[lo:lo + 16])
        b.partial_fit(V[lo:lo + 16])
    np.testing.assert_allclose(np.asarray(b.H), np.asarray(a.H),
                               rtol=2e-5, atol=1e-6)


def test_online_nmf_streaming(rng):
    """Core OnlineNMF: an unbounded row stream improves the model; H is
    the only persistent device state."""
    from nmftpu.linalg import dense as D
    from nmftpu.minibatch import OnlineNMF

    m, r = 30, 4
    H_true = np.abs(rng.normal(size=(r, m))).astype(np.float32)
    model = OnlineNMF(r, beta=2.0, batch_size=64, seed=3)
    holdout_W = np.abs(rng.normal(size=(128, r))).astype(np.float32)
    holdout = (holdout_W @ H_true
               + 0.01 * np.abs(rng.normal(size=(128, m)))
               ).astype(np.float32)

    def fit_err():
        Wh = model.transform(holdout)
        return float(D.frobenius_error(holdout, Wh, model.H))

    errs = []
    for step in range(60):
        Wb = np.abs(rng.normal(size=(64, r))).astype(np.float32)
        batch = Wb @ H_true + 0.01 * np.abs(
            rng.normal(size=(64, m))).astype(np.float32)
        model.partial_fit(batch)
        if step in (0, 59):
            errs.append(fit_err())
    assert model.n_steps == 60
    assert errs[-1] < 0.5 * errs[0]  # the stream actually teaches H


def test_minibatch_fresh_tol_matches_sklearn(rng):
    """Fresh W solves honor tol inside _solve_W (review finding: the
    per-batch fresh solve previously ran all iterations regardless)."""
    from sklearn.decomposition import MiniBatchNMF as SkMB

    from nmftpu.sklearn_api import MiniBatchNMF

    V, W0, H0 = _problem(rng)
    common = dict(n_components=4, init="custom", batch_size=16,
                  tol=1e-3, max_no_improvement=None, max_iter=3,
                  fresh_restarts=True, fresh_restarts_max_iter=25)
    sk = SkMB(**common)
    est = MiniBatchNMF(dtype="float64", **common)
    for i, lo in enumerate(range(0, 48, 16)):
        b = V[lo:lo + 16]
        if i == 0:
            sk.partial_fit(b, W=W0[:16].copy(), H=H0.copy())
            est.partial_fit(b, W=W0[:16], H=H0)
        else:
            sk.partial_fit(b)
            est.partial_fit(b)
    np.testing.assert_allclose(est.components_, sk.components_,
                               rtol=1e-7, atol=1e-10)


def test_minibatch_fused_explicit_guards(rng):
    """fused=True rejects configurations it cannot honor (review
    finding: it previously ran with silently different semantics)."""
    import scipy.sparse as sp

    from nmftpu.minibatch import minibatch_fit

    V, W0, H0 = _problem(rng, dtype=np.float32)
    kw = dict(W0=W0.astype(np.float32), H0=H0.astype(np.float32),
              batch_size=16, max_iter=2)
    with pytest.raises(ValueError, match="early stopping"):
        minibatch_fit(V, 4, fused=True, tol=1e-3, **kw)
    from nmftpu.sklearn_api import _RowSource

    with pytest.raises(ValueError, match="in-memory"):
        minibatch_fit(_RowSource(sp.csr_matrix(V)), 4, fused=True,
                      tol=0.0, max_no_improvement=None, **kw)


def test_minibatch_facade_partial_fit_keeps_sharding(rng):
    """mesh= H stays column-sharded across facade partial_fit calls
    (review finding: the 2nd call previously re-uploaded unsharded)."""
    from nmftpu.parallel import make_grid_mesh
    from nmftpu.sklearn_api import MiniBatchNMF

    mesh = make_grid_mesh((2, 4))
    V, W0, H0 = _problem(rng, n=64, m=32, dtype=np.float32)
    est = MiniBatchNMF(n_components=4, init="custom", batch_size=16,
                       tol=0.0, max_no_improvement=None, mesh=mesh)
    est.partial_fit(V[:16], W=W0[:16].astype(np.float32),
                    H=H0.astype(np.float32))
    est.partial_fit(V[16:32])
    est.partial_fit(V[32:48])
    devs = {s.device.id for s in est._online.H.addressable_shards}
    assert len(devs) == 8  # still sharded after repeated calls
    # matches the unsharded stream
    ref = MiniBatchNMF(n_components=4, init="custom", batch_size=16,
                       tol=0.0, max_no_improvement=None)
    ref.partial_fit(V[:16], W=W0[:16].astype(np.float32),
                    H=H0.astype(np.float32))
    ref.partial_fit(V[16:32])
    ref.partial_fit(V[32:48])
    np.testing.assert_allclose(est.components_, ref.components_,
                               rtol=2e-5, atol=1e-6)


def test_minibatch_fresh_restarts_memmap_streams(rng, tmp_path):
    """fresh_restarts on an out-of-core source streams the final W
    solve panel by panel (review finding: it previously loaded V[:]
    onto the device), matching the in-memory solve closely."""
    from nmftpu.minibatch import minibatch_fit

    V, W0, H0 = _problem(rng, n=52, dtype=np.float32)
    mm = np.memmap(tmp_path / "v.dat", dtype=np.float32, mode="w+",
                   shape=V.shape)
    mm[:] = V.astype(np.float32)
    mm.flush()
    ro = np.memmap(tmp_path / "v.dat", dtype=np.float32, mode="r",
                   shape=V.shape)
    kw = dict(batch_size=16, max_iter=2, tol=0.0,
              max_no_improvement=None, fresh_restarts=True,
              W0=W0.astype(np.float32), H0=H0.astype(np.float32))
    W_mm, H_mm, _, _ = minibatch_fit(ro, 4, **kw)
    W_in, H_in, _, _ = minibatch_fit(V.astype(np.float32), 4, **kw)
    np.testing.assert_array_equal(np.asarray(H_mm), np.asarray(H_in))
    # the streamed final solve differs only by the mean-accumulation
    # rounding in the flat start
    np.testing.assert_allclose(np.asarray(W_mm), np.asarray(W_in),
                               rtol=1e-4, atol=1e-6)


def test_online_nmf_save_resume(rng, tmp_path):
    """A saved stream resumes exactly: interrupted-and-restored H/A/B
    continue to the same state as the uninterrupted run; mesh= re-shards
    on load."""
    from nmftpu.minibatch import OnlineNMF
    from nmftpu.parallel import make_grid_mesh

    V, _, _ = _problem(rng, n=64, m=32, dtype=np.float32)
    batches = [V[lo:lo + 16] for lo in range(0, 64, 16)]

    full = OnlineNMF(4, batch_size=16, seed=2)
    for b in batches:
        full.partial_fit(b)

    part = OnlineNMF(4, batch_size=16, seed=2)
    for b in batches[:2]:
        part.partial_fit(b)
    part.save(tmp_path / "stream")
    resumed = OnlineNMF.load(tmp_path / "stream")
    assert resumed.n_steps == 2 and resumed.rho == part.rho
    for b in batches[2:]:
        resumed.partial_fit(b)
    np.testing.assert_array_equal(np.asarray(resumed.H),
                                  np.asarray(full.H))

    # restore onto a mesh: state sharded, same numbers
    sharded = OnlineNMF.load(tmp_path / "stream",
                             mesh=make_grid_mesh((2, 4)))
    for b in batches[2:]:
        sharded.partial_fit(b)
    assert len({s.device.id for s in sharded.H.addressable_shards}) == 8
    np.testing.assert_allclose(np.asarray(sharded.H),
                               np.asarray(full.H), rtol=2e-5, atol=1e-6)
    with pytest.raises(ValueError, match="nothing to save"):
        OnlineNMF(4).save(tmp_path / "empty")
