"""mask='observed' — matrix-completion NMF over the stored set only."""

import numpy as np
import pytest

from nmftpu import NmfConfig
from nmftpu import sparse as hs
from nmftpu.sparse_ops import compute_sparse


@pytest.fixture
def rng():
    return np.random.default_rng(23)


def _observed_problem(rng, n=40, m=32, r=3, frac=0.5):
    """Exactly rank-r positive matrix with a random observed subset."""
    W = np.abs(rng.normal(size=(n, r))).astype(np.float32) + 0.2
    H = np.abs(rng.normal(size=(r, m))).astype(np.float32) + 0.2
    V = W @ H
    obs = rng.random((n, m)) < frac
    # keep every row/col observed at least twice (identifiable problem)
    obs[:, :2] = True
    obs[:2, :] = True
    Vobs = np.where(obs, V, 0.0).astype(np.float32)
    return V, Vobs, obs


def _np_masked_mu(Vobs, obs, W, H, iters):
    """Dense numpy oracle of the masked Frobenius MU update."""
    M = obs.astype(np.float64)
    W = W.astype(np.float64).copy()
    H = H.astype(np.float64).copy()
    Vm = Vobs.astype(np.float64) * M
    for _ in range(iters):
        WH = (W @ H) * M
        W = W * ((Vm @ H.T) / (WH @ H.T + 1e-9))
        WH = (W @ H) * M
        H = H * ((W.T @ Vm) / (W.T @ WH + 1e-9))
    return W, H


def test_masked_fro_matches_dense_oracle(rng):
    V, Vobs, obs = _observed_problem(rng)
    W0 = np.abs(rng.normal(size=(40, 3))).astype(np.float32) + 0.1
    H0 = np.abs(rng.normal(size=(3, 32))).astype(np.float32) + 0.1
    cfg = NmfConfig(rank=3, mask="observed", num_iterations=10,
                    init_method="copy_existing", check_interval=5)
    res = compute_sparse(hs.from_dense(Vobs), cfg, W0=W0, H0=H0)
    W_ref, H_ref = _np_masked_mu(Vobs, obs, W0, H0, 10)
    np.testing.assert_allclose(np.asarray(res.W), W_ref, rtol=2e-4,
                               atol=1e-5)
    np.testing.assert_allclose(np.asarray(res.H), H_ref, rtol=2e-4,
                               atol=1e-5)


def test_masked_completion_recovers_unobserved(rng):
    """The point of the mask: a rank-3 matrix half-observed completes
    to the TRUE unobserved entries; the unmasked fit (zeros-as-data)
    cannot."""
    V, Vobs, obs = _observed_problem(rng)
    cfg = NmfConfig(rank=3, mask="observed", num_iterations=800,
                    init_method="all_random_values", seed=4,
                    check_interval=100)
    res = compute_sparse(hs.from_dense(Vobs), cfg)
    recon = np.asarray(res.W) @ np.asarray(res.H)
    unobs = ~obs
    rel = (np.linalg.norm((recon - V)[unobs])
           / np.linalg.norm(V[unobs]))
    assert rel < 0.05, f"completion relerr {rel:.3f}"
    # the unmasked fit drives unobserved entries toward 0 instead
    cfg0 = NmfConfig(rank=3, num_iterations=800, seed=4,
                     init_method="all_random_values",
                     check_interval=100)
    res0 = compute_sparse(hs.from_dense(Vobs), cfg0)
    recon0 = np.asarray(res0.W) @ np.asarray(res0.H)
    rel0 = (np.linalg.norm((recon0 - V)[unobs])
            / np.linalg.norm(V[unobs]))
    assert rel < 0.2 * rel0  # masked beats zeros-as-data by >5x


def test_masked_kl_decreases_and_reports_observed_metrics(rng):
    V, Vobs, obs = _observed_problem(rng)
    cfg = NmfConfig(rank=3, mask="observed",
                    objective="kullback-leibler", num_iterations=40,
                    seed=1, check_interval=20, threshold_type="rmsd")
    res = compute_sparse(hs.from_dense(Vobs), cfg)
    assert res.kl_error is not None and res.kl_error >= 0
    # error metrics are observed-set quantities
    recon = np.asarray(res.W) @ np.asarray(res.H)
    fro_obs = np.linalg.norm((recon - V)[obs & (Vobs != 0)])
    np.testing.assert_allclose(res.frobenius_error, fro_obs, rtol=1e-3)
    nnz = int((Vobs != 0).sum())
    np.testing.assert_allclose(res.rmsd,
                               res.frobenius_error / np.sqrt(nnz),
                               rtol=1e-6)


def test_masked_guards(rng):
    _, Vobs, _ = _observed_problem(rng)
    cfg = NmfConfig(rank=3, mask="observed", num_iterations=2)
    from nmftpu.driver import compute

    with pytest.raises(ValueError, match="sparse container"):
        compute(Vobs, cfg)
    with pytest.raises(ValueError, match="densif"):
        compute_sparse(hs.from_dense(Vobs), cfg, strategy="densified")
    # masked ALS runs ell/scatter only (per-row Gram deltas)
    cfg_als = NmfConfig(rank=3, mask="observed", algorithm="als",
                        num_iterations=2)
    with pytest.raises(ValueError, match="densif"):
        compute_sparse(hs.from_dense(Vobs), cfg_als,
                       strategy="densified")
    from nmftpu.parallel import compute_sharded, make_grid_mesh

    # the sharded masked path runs the scatter grid engine only
    with pytest.raises(ValueError, match="scatter"):
        compute_sharded(hs.from_dense(Vobs), cfg,
                        mesh=make_grid_mesh((2, 4)), engine="ell")
    with pytest.raises(ValueError, match="KL|mask"):
        NmfConfig(rank=3, mask="observed", algorithm="als",
                  objective="kullback-leibler")
    with pytest.raises(ValueError, match="mask"):
        NmfConfig(rank=3, mask="observed", algorithm="hals")
    with pytest.raises(ValueError, match="weighting models"):
        NmfConfig(rank=3, mask="observed", alpha_confidence=2.0)


def test_masked_ell_matches_scatter_oracle(rng):
    """The gather-only masked MU engine (fused gather-once numerator +
    SDDMM + masked denominator) is the same update as the scatter
    engine, both objectives."""
    V, Vobs, obs = _observed_problem(rng)
    W0 = np.abs(rng.normal(size=(40, 3))).astype(np.float32) + 0.1
    H0 = np.abs(rng.normal(size=(3, 32))).astype(np.float32) + 0.1
    for objective in ("frobenius", "kullback-leibler"):
        cfg = NmfConfig(rank=3, mask="observed", objective=objective,
                        num_iterations=8, init_method="copy_existing",
                        check_interval=4)
        r_sc = compute_sparse(hs.from_dense(Vobs), cfg, W0=W0, H0=H0,
                              strategy="scatter")
        r_el = compute_sparse(hs.from_dense(Vobs), cfg, W0=W0, H0=H0,
                              strategy="ell")
        np.testing.assert_allclose(np.asarray(r_el.W),
                                   np.asarray(r_sc.W),
                                   rtol=3e-4, atol=1e-5)
        np.testing.assert_allclose(np.asarray(r_el.H),
                                   np.asarray(r_sc.H),
                                   rtol=3e-4, atol=1e-5)
        np.testing.assert_allclose(
            float(r_el.frobenius_error), float(r_sc.frobenius_error),
            rtol=1e-4,
        )


def _np_masked_als(Vobs, obs, W, H, iters, lam, eps=1e-9):
    """Dense numpy oracle of exact completion ALS (observed-only normal
    equations per row/column + nonnegativity clamp)."""
    M = obs & (Vobs != 0)
    W = W.astype(np.float64).copy()
    H = H.astype(np.float64).copy()
    Vm = Vobs.astype(np.float64)
    r = W.shape[1]
    for _ in range(iters):
        for u in range(W.shape[0]):
            cols = np.where(M[u])[0]
            Hc = H[:, cols]
            G = Hc @ Hc.T
            ridge = (lam + eps
                     + max(eps, 100 * np.finfo(np.float32).eps)
                     * np.trace(G) / r)
            W[u] = np.maximum(np.linalg.solve(
                G + ridge * np.eye(r), Hc @ Vm[u, cols]), 0.0)
        for i in range(H.shape[1]):
            rws = np.where(M[:, i])[0]
            Wr = W[rws]
            G = Wr.T @ Wr
            ridge = (lam + eps
                     + max(eps, 100 * np.finfo(np.float32).eps)
                     * np.trace(G) / r)
            H[:, i] = np.maximum(np.linalg.solve(
                G + ridge * np.eye(r), Wr.T @ Vm[rws, i]), 0.0)
    return W, H


def test_masked_als_matches_dense_oracle(rng):
    """Exact completion ALS (iALS solver, 0/1 confidence) solves the
    same observed-only normal equations as the per-row numpy oracle —
    on BOTH engines (scatter COO and batched-GEMM ELL)."""
    V, Vobs, obs = _observed_problem(rng)
    W0 = np.abs(rng.normal(size=(40, 3))).astype(np.float32) + 0.1
    H0 = np.abs(rng.normal(size=(3, 32))).astype(np.float32) + 0.1
    cfg = NmfConfig(rank=3, mask="observed", algorithm="als",
                    lambda_w=0.05, lambda_h=0.05, num_iterations=3,
                    init_method="copy_existing", check_interval=3)
    W_ref, H_ref = _np_masked_als(Vobs, obs, W0, H0, 3, 0.05)
    for strategy in ("scatter", "ell"):
        res = compute_sparse(hs.from_dense(Vobs), cfg, W0=W0, H0=H0,
                             strategy=strategy)
        np.testing.assert_allclose(np.asarray(res.W), W_ref, rtol=2e-3,
                                   atol=2e-4, err_msg=strategy)
        np.testing.assert_allclose(np.asarray(res.H), H_ref, rtol=2e-3,
                                   atol=2e-4, err_msg=strategy)


def test_masked_als_completes_fast(rng):
    """Completion ALS reaches the masked-MU answer in FAR fewer
    iterations (exact solves vs multiplicative steps)."""
    V, Vobs, obs = _observed_problem(rng)
    cfg = NmfConfig(rank=3, mask="observed", algorithm="als",
                    lambda_w=1e-3, lambda_h=1e-3, num_iterations=30,
                    init_method="all_random_values", seed=4,
                    check_interval=30)
    res = compute_sparse(hs.from_dense(Vobs), cfg)
    recon = np.asarray(res.W) @ np.asarray(res.H)
    unobs = ~obs
    rel = (np.linalg.norm((recon - V)[unobs])
           / np.linalg.norm(V[unobs]))
    assert rel < 0.05, f"ALS completion relerr {rel:.3f} in 30 iters"


def test_masked_sharded_matches_single_device(rng):
    """Grid-mesh masked runs (MU fro/KL + completion ALS) match the
    single-device scatter engine."""
    from nmftpu.parallel import compute_sharded, make_grid_mesh

    V, Vobs, obs = _observed_problem(rng)
    mesh = make_grid_mesh((2, 4))
    sp = hs.from_dense(Vobs)
    W0 = np.abs(rng.normal(size=(40, 3))).astype(np.float32) + 0.1
    H0 = np.abs(rng.normal(size=(3, 32))).astype(np.float32) + 0.1
    for cfg in (
        NmfConfig(rank=3, mask="observed", num_iterations=10,
                  init_method="copy_existing", check_interval=5),
        NmfConfig(rank=3, mask="observed", num_iterations=10,
                  objective="kullback-leibler",
                  init_method="copy_existing", check_interval=5),
        NmfConfig(rank=3, mask="observed", algorithm="als",
                  lambda_w=0.05, lambda_h=0.05, num_iterations=5,
                  init_method="copy_existing", check_interval=5),
    ):
        r1 = compute_sparse(sp, cfg, W0=W0, H0=H0, strategy="scatter")
        rs = compute_sharded(sp, cfg, W0=W0, H0=H0, mesh=mesh)
        np.testing.assert_allclose(np.asarray(rs.W), np.asarray(r1.W),
                                   rtol=3e-3, atol=3e-4)
        np.testing.assert_allclose(np.asarray(rs.H), np.asarray(r1.H),
                                   rtol=3e-3, atol=3e-4)
        np.testing.assert_allclose(
            float(rs.frobenius_error), float(r1.frobenius_error),
            rtol=1e-3,
        )
        # rmsd divides by the OBSERVED count on both paths (advisor r3:
        # the sharded path used to divide by sqrt(n*m))
        np.testing.assert_allclose(float(rs.rmsd), float(r1.rmsd),
                                   rtol=1e-3)
