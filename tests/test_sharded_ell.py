"""Sharded ELL-tile engine tests vs. the dense oracle on the 2x4 mesh."""

import jax
import numpy as np
import pytest

from nmftpu import Initialization, NmfConfig, Objective
from nmftpu import sparse as hs
from nmftpu.driver import compute
from nmftpu.linalg import dense as D
from nmftpu.parallel import factor_shardings, make_grid_mesh
from nmftpu.parallel import sharded_ell as SEL


@pytest.fixture(scope="module")
def mesh():
    return make_grid_mesh((2, 4))


def _spmat(rng, n=40, m=48, density=0.3):
    dense = rng.uniform(0.2, 2.0, (n, m))
    mask = rng.uniform(size=(n, m)) < density
    mask[:, 0] = True
    mask[0, :] = True
    dense = (dense * mask).astype(np.float32)
    return dense, hs.from_dense(dense)


def _padded_problem(rng, mesh, n=40, m=48, r=4, balance=False):
    dense, sp = _spmat(rng, n, m)
    sell, row_perm, col_perm = SEL.partition_sparse_ell(
        sp, (2, 4), seg_max=16, buckets=(8, 16), balance=balance,
        mesh=mesh,
    )
    pn, pm = sell.padded_shape
    Vp = np.zeros((pn, pm), np.float32)
    Vp[np.ix_(row_perm, col_perm)] = dense
    W0 = np.zeros((pn, r), np.float32)
    H0 = np.zeros((r, pm), np.float32)
    W0[row_perm] = rng.uniform(0.1, 1.0, (n, r))
    H0[:, col_perm] = rng.uniform(0.1, 1.0, (r, m))
    sh = factor_shardings(mesh)
    W = jax.device_put(W0, sh["W"])
    H = jax.device_put(H0, sh["H"])
    return dense, sell, Vp, W0, H0, W, H


@pytest.mark.parametrize("obj", [Objective.FROBENIUS, Objective.KL])
@pytest.mark.parametrize("balance", [False, True])
def test_sharded_ell_update_matches_dense(rng, mesh, obj, balance):
    dense, sell, Vp, W0, H0, W, H = _padded_problem(
        rng, mesh, balance=balance
    )
    cfg = NmfConfig(rank=4, objective=obj)
    _, update, _ = SEL.build_sharded_ell_update(cfg, mesh, sell)
    upd = jax.jit(lambda s, W, H: update(s, (), W, H))

    ref = (D.mu_update_frobenius if obj is Objective.FROBENIUS
           else D.mu_update_kl)
    Wd, Hd = W0.copy(), H0.copy()
    for _ in range(4):
        W, H = upd(sell, W, H)
        Wd, Hd = ref(Vp, Wd, Hd)
        Wd, Hd = np.asarray(Wd), np.asarray(Hd)
    np.testing.assert_allclose(np.asarray(W), Wd, rtol=2e-3, atol=1e-4)
    np.testing.assert_allclose(np.asarray(H), Hd, rtol=2e-3, atol=1e-4)


def test_sharded_ell_weighted_matches_dense(rng, mesh):
    dense, sell, Vp, W0, H0, W, H = _padded_problem(rng, mesh)
    alpha = 3.0
    cfg = NmfConfig(rank=4, alpha_confidence=alpha)
    _, update, _ = SEL.build_sharded_ell_update(cfg, mesh, sell)
    upd = jax.jit(lambda s, W, H: update(s, (), W, H))
    W, H = upd(sell, W, H)
    C = 1.0 + alpha * Vp
    Wd, Hd = D.mu_update_frobenius_weighted(Vp, C, W0, H0)
    np.testing.assert_allclose(np.asarray(W), np.asarray(Wd),
                               rtol=3e-3, atol=1e-4)
    np.testing.assert_allclose(np.asarray(H), np.asarray(Hd),
                               rtol=3e-3, atol=1e-4)


def test_sharded_ell_errors_match_dense(rng, mesh):
    dense, sell, Vp, W0, H0, W, H = _padded_problem(rng, mesh)
    fro, kl = SEL.build_sharded_ell_errors(mesh, sell)
    svsq = np.sum(Vp * Vp)
    got_f = float(jax.jit(fro)(sell, W, H, svsq))
    want_f = np.linalg.norm(Vp - W0 @ H0)
    np.testing.assert_allclose(got_f, want_f, rtol=1e-4)
    got_k = float(jax.jit(kl)(sell, W, H))
    want_k = float(D.kl_error(Vp, W0, H0))
    np.testing.assert_allclose(got_k, want_k, rtol=1e-3)
