"""Oracle parity (SURVEY.md §4.2): sklearn's MU solver is the independent
implementation of exactly the MU family with Frobenius AND KL objectives
(sklearn/decomposition/_nmf.py: _multiplicative_update_w/_h). Same init +
same iteration count + update_order="WH" (sklearn's W-then-H loop) must give
allclose factors on dense inputs."""

import numpy as np
import pytest
from sklearn.decomposition import NMF

from nmftpu import Initialization, NmfConfig, Objective
from nmftpu.driver import compute


def _setup(rng, n=40, m=30, r=5):
    V = rng.uniform(0.1, 2.0, (n, m)).astype(np.float64)
    W0 = rng.uniform(0.1, 1.0, (n, r)).astype(np.float64)
    H0 = rng.uniform(0.1, 1.0, (r, m)).astype(np.float64)
    return V, W0, H0


@pytest.mark.parametrize(
    "objective,beta",
    [(Objective.FROBENIUS, "frobenius"), (Objective.KL, "kullback-leibler")],
)
def test_mu_matches_sklearn(rng, objective, beta):
    V, W0, H0 = _setup(rng)
    iters = 30

    sk = NMF(
        n_components=5, init="custom", solver="mu", beta_loss=beta,
        max_iter=iters, tol=0.0,
    )
    W_sk = sk.fit_transform(V.copy(), W=W0.copy(), H=H0.copy())
    H_sk = sk.components_

    cfg = NmfConfig(
        rank=5, objective=objective,
        init_method=Initialization.COPY_EXISTING,
        num_iterations=iters, update_order="WH",
        eps=0.0, dtype="float64",
    )
    res = compute(V, cfg, W0=W0, H0=H0)

    np.testing.assert_allclose(np.asarray(res.W), W_sk, rtol=1e-4, atol=1e-7)
    np.testing.assert_allclose(np.asarray(res.H), H_sk, rtol=1e-4, atol=1e-7)


def test_converged_error_parity_sparse_input(rng):
    """Converged-error parity on a sparse matrix (sklearn gets scipy CSR)."""
    scipy_sparse = pytest.importorskip("scipy.sparse")
    n, m, r = 50, 40, 4
    dense = rng.uniform(0.0, 1.0, (n, m))
    dense[dense < 0.7] = 0.0  # ~30% density
    dense = dense.astype(np.float64)
    # keep every row/col nonempty for a well-posed problem
    dense[:, 0] += 0.5
    dense[0, :] += 0.5

    W0 = rng.uniform(0.1, 1.0, (n, r))
    H0 = rng.uniform(0.1, 1.0, (r, m))
    iters = 100

    sk = NMF(
        n_components=r, init="custom", solver="mu", beta_loss="frobenius",
        max_iter=iters, tol=0.0,
    )
    W_sk = sk.fit_transform(
        scipy_sparse.csr_matrix(dense), W=W0.copy(), H=H0.copy()
    )
    err_sk = np.linalg.norm(dense - W_sk @ sk.components_, "fro")

    cfg = NmfConfig(
        rank=r, init_method=Initialization.COPY_EXISTING,
        num_iterations=iters, update_order="WH", eps=0.0, dtype="float64",
    )
    res = compute(dense, cfg, W0=W0, H0=H0)
    np.testing.assert_allclose(res.frobenius_error, err_sk, rtol=1e-3)
