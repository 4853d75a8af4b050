"""Ring-SpMM MU tests: the 1-D ring engine must match the dense oracle."""

import jax
import numpy as np
import pytest

from nmftpu import sparse as hs
from nmftpu.linalg import dense as D
from nmftpu.parallel import ring


@pytest.fixture(scope="module", params=[2, 4])
def ring_mesh(request):
    p = request.param
    return ring.make_ring_mesh(jax.devices()[:p])


def test_ring_mu_matches_dense(rng, ring_mesh):
    p = ring_mesh.devices.size
    n, m, r = 36, 44, 4
    dense = rng.uniform(0.2, 2.0, (n, m))
    mask = rng.uniform(size=(n, m)) < 0.4
    mask[:, 0] = True
    mask[0, :] = True
    dense = (dense * mask).astype(np.float32)

    scoo, row_perm, col_perm = ring.partition_for_ring(
        hs.from_dense(dense), p, balance=False, chunk=64
    )
    pn, pm = scoo.padded_shape
    Vp = np.zeros((pn, pm), np.float32)
    Vp[:n, :m] = dense

    W0 = np.zeros((pn, r), np.float32)
    H0 = np.zeros((r, pm), np.float32)
    W0[:n] = rng.uniform(0.1, 1.0, (n, r))
    H0[:, :m] = rng.uniform(0.1, 1.0, (r, m))

    sh = ring.ring_shardings(ring_mesh)
    scoo_dev = type(scoo)(
        values=jax.device_put(np.asarray(scoo.values), sh["tiles"]),
        rows=jax.device_put(np.asarray(scoo.rows), sh["tiles"]),
        cols=jax.device_put(np.asarray(scoo.cols), sh["tiles"]),
        shape=scoo.shape, nnz=scoo.nnz, chunk=scoo.chunk,
        mesh_shape=scoo.mesh_shape, block_rows=scoo.block_rows,
        block_cols=scoo.block_cols,
    )
    W = jax.device_put(W0, sh["W"])
    H = jax.device_put(H0, sh["H"])

    update = ring.build_ring_mu_update(ring_mesh, scoo)
    update = jax.jit(update)

    Wd, Hd = W0.copy(), H0.copy()
    for _ in range(5):
        W, H = update(scoo_dev, W, H)
        Wd, Hd = D.mu_update_frobenius(Vp, Wd, Hd)
        Wd, Hd = np.asarray(Wd), np.asarray(Hd)

    np.testing.assert_allclose(np.asarray(W), Wd, rtol=2e-3, atol=1e-4)
    np.testing.assert_allclose(np.asarray(H), Hd, rtol=2e-3, atol=1e-4)
