"""Densified-bf16 strategy tests: parity with the scatter path / dense
oracle at bf16 tolerance, blocked-KL correctness, strategy selection."""

import numpy as np
import pytest

from nmftpu import Algorithm, Initialization, NmfConfig, Objective
from nmftpu import densified as DF
from nmftpu import sparse as hs
from nmftpu import sparse_ops as so
from nmftpu.driver import compute
from nmftpu.linalg import dense as D


def _sprandom(rng, n=40, m=36, density=0.3):
    dense = rng.uniform(0.2, 2.0, (n, m))
    mask = rng.uniform(size=(n, m)) < density
    mask[:, 0] = True
    mask[0, :] = True
    dense = (dense * mask).astype(np.float32)
    return dense, so.device_put_sparse(hs.from_dense(dense), chunk=256)


def test_densify_roundtrip(rng):
    dense, coo = _sprandom(rng)
    Vd = np.asarray(DF.densify(coo)).astype(np.float32)
    np.testing.assert_allclose(Vd, dense, rtol=1e-2, atol=1e-2)  # bf16


def test_blocked_kl_update_matches_dense(rng):
    dense, coo = _sprandom(rng, 50, 30)
    W = rng.uniform(0.1, 1.0, (50, 4)).astype(np.float32)
    H = rng.uniform(0.1, 1.0, (4, 30)).astype(np.float32)
    Vd = DF.densify(coo)
    Wk, Hk = DF.mu_update_kl_densified(Vd, W, H, block_rows=16)
    Wd, Hd = D.mu_update_kl(np.asarray(Vd).astype(np.float32), W, H)
    np.testing.assert_allclose(np.asarray(Wk), np.asarray(Wd),
                               rtol=3e-2, atol=1e-3)
    np.testing.assert_allclose(np.asarray(Hk), np.asarray(Hd),
                               rtol=3e-2, atol=1e-3)


def test_blocked_kl_error_matches_dense(rng):
    dense, coo = _sprandom(rng, 45, 25)
    W = rng.uniform(0.1, 1.0, (45, 3)).astype(np.float32)
    H = rng.uniform(0.1, 1.0, (3, 25)).astype(np.float32)
    Vd = DF.densify(coo)
    got = float(DF.kl_error_densified(Vd, W, H, block_rows=16))
    want = float(D.kl_error(np.asarray(Vd).astype(np.float32), W, H))
    np.testing.assert_allclose(got, want, rtol=1e-3)


@pytest.mark.parametrize("objective", [Objective.FROBENIUS, Objective.KL])
def test_compute_sparse_densified_matches_scatter(rng, objective):
    dense, _ = _sprandom(rng)
    sp = hs.from_dense(dense)
    W0 = rng.uniform(0.1, 1.0, (40, 4)).astype(np.float32)
    H0 = rng.uniform(0.1, 1.0, (4, 36)).astype(np.float32)
    cfg = NmfConfig(
        rank=4, objective=objective,
        init_method=Initialization.COPY_EXISTING,
        num_iterations=20, check_interval=10,
    )
    rd = so.compute_sparse(sp, cfg, W0=W0, H0=H0, strategy="densified")
    rs = so.compute_sparse(sp, cfg, W0=W0, H0=H0, strategy="scatter")
    np.testing.assert_allclose(
        rd.frobenius_error, rs.frobenius_error, rtol=2e-2
    )
    np.testing.assert_allclose(
        np.asarray(rd.W), np.asarray(rs.W), rtol=0.1, atol=5e-3
    )


def test_strategy_auto_and_validation(rng):
    dense, _ = _sprandom(rng, 20, 18)
    sp = hs.from_dense(dense)
    # auto on a tiny matrix -> densified (within budget), must run
    res = so.compute_sparse(
        sp, NmfConfig(rank=3, num_iterations=5), strategy="auto"
    )
    assert np.isfinite(res.frobenius_error)


@pytest.mark.parametrize("alg", [
    Algorithm.ALS, Algorithm.ACLS, Algorithm.AHCLS, Algorithm.GDCLS,
    Algorithm.NSNMF,
])
def test_densified_all_algorithms_match_scatter(rng, alg):
    dense, _ = _sprandom(rng)
    sp = hs.from_dense(dense)
    W0 = rng.uniform(0.1, 1.0, (40, 4)).astype(np.float32)
    H0 = rng.uniform(0.1, 1.0, (4, 36)).astype(np.float32)
    cfg = NmfConfig(
        rank=4, algorithm=alg,
        init_method=Initialization.COPY_EXISTING,
        num_iterations=10, check_interval=5,
        lambda_w=0.05, lambda_h=0.05, lambda_tik=0.05, theta=0.3,
    )
    rd = so.compute_sparse(sp, cfg, W0=W0, H0=H0, strategy="densified")
    rs = so.compute_sparse(sp, cfg, W0=W0, H0=H0, strategy="scatter")
    np.testing.assert_allclose(
        rd.frobenius_error, rs.frobenius_error, rtol=3e-2
    )


def test_densified_weighted_matches_dense(rng):
    dense, _ = _sprandom(rng)
    sp = hs.from_dense(dense)
    W0 = rng.uniform(0.1, 1.0, (40, 4)).astype(np.float32)
    H0 = rng.uniform(0.1, 1.0, (4, 36)).astype(np.float32)
    cfg = NmfConfig(
        rank=4, alpha_confidence=3.0,
        init_method=Initialization.COPY_EXISTING,
        num_iterations=8, check_interval=4,
    )
    rd = so.compute_sparse(sp, cfg, W0=W0, H0=H0, strategy="densified")
    from nmftpu.driver import compute
    rf = compute(dense, cfg, W0=W0, H0=H0)
    np.testing.assert_allclose(
        rd.frobenius_error, rf.frobenius_error, rtol=3e-2
    )


@pytest.mark.parametrize("strategy", ["densified", "ell"])
def test_nsnmf_kl_all_engines_match_scatter(rng, strategy):
    dense, _ = _sprandom(rng)
    sp = hs.from_dense(dense)
    W0 = rng.uniform(0.1, 1.0, (40, 4)).astype(np.float32)
    H0 = rng.uniform(0.1, 1.0, (4, 36)).astype(np.float32)
    cfg = NmfConfig(
        rank=4, algorithm=Algorithm.NSNMF, objective=Objective.KL,
        theta=0.3, init_method=Initialization.COPY_EXISTING,
        num_iterations=8, check_interval=4,
    )
    ra = so.compute_sparse(sp, cfg, W0=W0, H0=H0, strategy=strategy)
    rs = so.compute_sparse(sp, cfg, W0=W0, H0=H0, strategy="scatter")
    np.testing.assert_allclose(ra.kl_error, rs.kl_error, rtol=3e-2)


def test_densified_rmsd_uses_true_numel(rng):
    """ADVICE r1: the in-loop RMSD must divide by the TRUE n*m, not the
    padded densified shape (rows pad to a 4096 multiple), so the reported
    error and NmfResult.rmsd agree."""
    from nmftpu.config import ThresholdType

    dense, _ = _sprandom(rng, n=50, m=36)
    sp = hs.from_dense(dense)
    cfg = NmfConfig(
        rank=3, num_iterations=8, threshold_type=ThresholdType.RMSD,
        threshold_value=0.0, seed=0,
    )
    res = so.compute_sparse(sp, cfg, strategy="densified")
    np.testing.assert_allclose(res.error, res.rmsd, rtol=1e-5)
