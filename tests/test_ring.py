"""Ring-SpMM engine tests (SURVEY.md §2.9 SP row, §5.7, §7 hard-parts):
the rotation/ring-reduce dataflows are exactly the off-by-one territory
SURVEY §7 warns about, so update-level parity runs exhaustively over
p in {2,3,4,8} x both update orders x both objectives against the dense
oracle, plus end-to-end compute_sharded(engine="ring") for every
algorithm family."""


import jax
import numpy as np
import pytest

from nmftpu import Algorithm, Initialization, NmfConfig, Objective
from nmftpu import sparse as hs
from nmftpu.driver import compute
from nmftpu.linalg import dense as D
from nmftpu.parallel import ring
from nmftpu.parallel.driver import compute_sharded


def _problem(rng, n=36, m=44, r=4, density=0.4):
    dense = rng.uniform(0.2, 2.0, (n, m))
    mask = rng.uniform(size=(n, m)) < density
    mask[:, 0] = True
    mask[0, :] = True
    dense = (dense * mask).astype(np.float32)
    W0 = rng.uniform(0.1, 1.0, (n, r)).astype(np.float32)
    H0 = rng.uniform(0.1, 1.0, (r, m)).astype(np.float32)
    return dense, W0, H0


def _place(scoo, mesh):
    sh = ring.ring_shardings(mesh)
    return type(scoo)(
        values=jax.device_put(np.asarray(scoo.values), sh["tiles"]),
        rows=jax.device_put(np.asarray(scoo.rows), sh["tiles"]),
        cols=jax.device_put(np.asarray(scoo.cols), sh["tiles"]),
        shape=scoo.shape, nnz=scoo.nnz, chunk=scoo.chunk,
        mesh_shape=scoo.mesh_shape, block_rows=scoo.block_rows,
        block_cols=scoo.block_cols,
    )


@pytest.mark.parametrize("p", [2, 3, 4, 8])
@pytest.mark.parametrize("order", ["WH", "HW"])
@pytest.mark.parametrize("objective", ["frobenius", "kullback-leibler"])
def test_ring_mu_matches_dense(rng, p, order, objective):
    """5 MU iterations on the ring == dense oracle, for every ring size,
    update order, and objective."""
    mesh = ring.make_ring_mesh(jax.devices()[:p])
    n, m, r = 36, 44, 4
    dense, W0f, H0f = _problem(rng, n, m, r)

    scoo, row_perm, col_perm = ring.partition_for_ring(
        hs.from_dense(dense), p, balance=False, chunk=64
    )
    pn, pm = scoo.padded_shape
    Vp = np.zeros((pn, pm), np.float32)
    Vp[:n, :m] = dense
    W0 = np.zeros((pn, r), np.float32)
    H0 = np.zeros((r, pm), np.float32)
    W0[:n] = W0f
    H0[:, :m] = H0f

    sh = ring.ring_shardings(mesh)
    scoo_dev = _place(scoo, mesh)
    W = jax.device_put(W0, sh["W"])
    H = jax.device_put(H0, sh["H"])

    cfg = NmfConfig(
        rank=r, num_iterations=1, update_order=order,
        objective=Objective(objective),
    )
    _, upd, _ = ring.build_ring_update(cfg, mesh, scoo)
    update = jax.jit(lambda s, W, H: upd(s, (), W, H))

    oracle = (D.mu_update_frobenius if objective == "frobenius"
              else D.mu_update_kl)
    Wd, Hd = W0.copy(), H0.copy()
    for _ in range(5):
        W, H = update(scoo_dev, W, H)
        Wd, Hd = oracle(Vp, Wd, Hd, order=order)
        Wd, Hd = np.asarray(Wd), np.asarray(Hd)

    np.testing.assert_allclose(np.asarray(W), Wd, rtol=2e-3, atol=1e-4)
    np.testing.assert_allclose(np.asarray(H), Hd, rtol=2e-3, atol=1e-4)


@pytest.mark.parametrize(
    "alg,obj,knobs",
    [
        (Algorithm.MU, Objective.FROBENIUS, {}),
        (Algorithm.MU, Objective.KL, {}),
        (Algorithm.MU, Objective.FROBENIUS, {"alpha_confidence": 4.0}),
        (Algorithm.ALS, Objective.FROBENIUS, {}),
        (Algorithm.ACLS, Objective.FROBENIUS,
         {"lambda_w": 0.1, "lambda_h": 0.1}),
        (Algorithm.AHCLS, Objective.FROBENIUS,
         {"lambda_w": 0.1, "lambda_h": 0.1, "alpha_w": 0.6,
          "alpha_h": 0.6}),
        (Algorithm.GDCLS, Objective.FROBENIUS, {"lambda_tik": 0.05}),
        (Algorithm.NSNMF, Objective.FROBENIUS, {"theta": 0.3}),
        (Algorithm.NSNMF, Objective.KL, {"theta": 0.3}),
    ],
)
def test_ring_engine_matches_dense_driver(rng, alg, obj, knobs):
    """compute_sharded(engine='ring') == the dense driver for every
    algorithm family (COPY_EXISTING, fixed iterations)."""
    dense, W0, H0 = _problem(rng, 30, 36, 3)
    sp = hs.from_dense(dense)
    cfg = NmfConfig(
        rank=3, algorithm=alg, objective=obj,
        init_method=Initialization.COPY_EXISTING,
        num_iterations=8, check_interval=4, **knobs,
    )
    rr = compute_sharded(sp, cfg, engine="ring", W0=W0, H0=H0, chunk=128)
    rd = compute(dense, cfg, W0=W0, H0=H0)
    np.testing.assert_allclose(
        np.asarray(rr.W), np.asarray(rd.W), rtol=2e-2, atol=2e-3
    )
    np.testing.assert_allclose(
        np.asarray(rr.H), np.asarray(rd.H), rtol=2e-2, atol=2e-3
    )
    np.testing.assert_allclose(
        rr.frobenius_error, rd.frobenius_error, rtol=1e-3
    )
    if obj is Objective.KL:
        np.testing.assert_allclose(rr.kl_error, rd.kl_error,
                                   rtol=1e-3, atol=1e-3)


def test_ring_random_init_runs_and_balances(rng):
    """Random-init ring run: shard-local RNG init, convergence tracking,
    results in original coordinates."""
    dense, _, _ = _problem(rng, 48, 40, 4)
    sp = hs.from_dense(dense)
    cfg = NmfConfig(rank=4, num_iterations=30, seed=7, check_interval=10)
    res = compute_sharded(sp, cfg, engine="ring")
    assert res.W.shape == (48, 4) and res.H.shape == (4, 40)
    recon = np.linalg.norm(dense - np.asarray(res.W) @ np.asarray(res.H))
    np.testing.assert_allclose(recon, res.frobenius_error, rtol=5e-2)


def test_ring_determinism(rng):
    dense, _, _ = _problem(rng, 24, 28, 3)
    sp = hs.from_dense(dense)
    cfg = NmfConfig(rank=3, num_iterations=6, seed=11)
    r1 = compute_sharded(sp, cfg, engine="ring")
    r2 = compute_sharded(sp, cfg, engine="ring")
    np.testing.assert_array_equal(np.asarray(r1.W), np.asarray(r2.W))


def test_ring_threshold_convergence(rng):
    dense, _, _ = _problem(rng, 30, 30, 3, density=0.6)
    sp = hs.from_dense(dense)
    cfg = NmfConfig(
        rank=3, num_iterations=500, threshold_value=1e-3,
        check_interval=10, seed=2,
    )
    res = compute_sharded(sp, cfg, engine="ring")
    assert res.converged
    assert res.num_iterations < 500


@pytest.mark.parametrize("p", [2, 4])
def test_ring_kmeans_init_matches_single_device(rng, p):
    """Ring-native k-means init (centroid row-blocks resident, cross
    terms ring-reduced, one-hot blocks rotating) == the single-device
    sparse k-means on the same permuted matrix with the same key."""
    import jax.numpy as jnp
    from nmftpu import sparse_ops as so
    from nmftpu.parallel.ring import build_ring_data_init

    n, m, r = 40, 48, 4
    dense, _, _ = _problem(rng, n, m, r, density=0.5)
    cfg = NmfConfig(
        rank=r, init_method=Initialization.K_MEANS_AND_NON_NEGATIVE_WTV,
        num_iterations=1, kmeans_max_iter=5, seed=3,
    )
    mesh = ring.make_ring_mesh(jax.devices()[:p])
    sh = ring.ring_shardings(mesh)
    scoo, row_perm, col_perm = ring.partition_for_ring(
        hs.from_dense(dense), p, chunk=64, seed=cfg.seed,
        out_shardings=sh["tiles"],
    )
    init = build_ring_data_init(cfg, mesh, scoo)
    key = jax.random.PRNGKey(123)
    W_sh, H_sh = init(key, scoo)

    # single-device oracle on the permuted matrix with the same subkey
    Vp = np.zeros((n, m), np.float32)
    Vp[row_perm[:, None], col_perm[None, :]] = dense
    coo1 = so.device_put_sparse(hs.from_dense(Vp), chunk=64)
    _, _, kk = jax.random.split(key, 3)
    cent, _ = so.kmeans_columns_sparse(coo1, r, kk, max_iter=5)
    W_ref = np.maximum(np.asarray(cent), 0.0) + 1e-6
    H_ref = (
        np.maximum(np.asarray(so.wt_v(coo1, jnp.asarray(W_ref))), 0.0)
        + 1e-6
    )

    np.testing.assert_allclose(
        np.asarray(W_sh)[:n], W_ref, rtol=1e-4, atol=1e-5
    )
    np.testing.assert_allclose(
        np.asarray(H_sh)[:, :m], H_ref, rtol=1e-4, atol=1e-5
    )


@pytest.mark.parametrize(
    "method",
    [
        Initialization.K_MEANS_AND_RANDOM_VALUES,
        Initialization.K_MEANS_AND_ABSOLUTE_WTV,
        Initialization.MEAN_COLUMNS,
    ],
)
def test_ring_data_init_e2e(rng, method):
    """Every data-dependent init runs mesh-native on the ring engine
    end-to-end (no single-device fallback) and converges sanely."""
    dense, _, _ = _problem(rng, 36, 40, 3)
    sp = hs.from_dense(dense)
    cfg = NmfConfig(
        rank=3, init_method=method, num_iterations=10,
        kmeans_max_iter=3, seed=5, check_interval=5,
    )
    res = compute_sharded(sp, cfg, engine="ring")
    assert np.isfinite(res.frobenius_error)
    recon = np.linalg.norm(dense - np.asarray(res.W) @ np.asarray(res.H))
    np.testing.assert_allclose(recon, res.frobenius_error, rtol=5e-2)


def test_ring_mean_columns_init_matches_single_device(rng):
    """Regression for the negative-local-index wrap (see the grid twin in
    test_parallel): ring MEAN_COLUMNS W must equal the single-device
    oracle on the permuted matrix."""
    import jax.numpy as jnp
    from nmftpu import sparse_ops as so
    from nmftpu.parallel.ring import (
        build_ring_data_init, make_ring_mesh, partition_for_ring,
        ring_shardings,
    )

    n, m, r = 36, 40, 3
    dense, _, _ = _problem(rng, n, m, r)
    sp = hs.from_dense(dense)
    p = 4
    mesh = make_ring_mesh(jax.devices()[:p])
    cfg = NmfConfig(
        rank=r, init_method=Initialization.MEAN_COLUMNS,
        num_iterations=1, seed=7,
    )
    scoo, row_perm, col_perm = partition_for_ring(
        sp, p, chunk=64, seed=cfg.seed,
        out_shardings=ring_shardings(mesh)["tiles"],
    )
    init = build_ring_data_init(cfg, mesh, scoo)
    key = jax.random.PRNGKey(123)
    W_sh, _ = init(key, scoo)

    Vp = np.zeros((n, m), np.float32)
    Vp[row_perm[:, None], col_perm[None, :]] = dense
    coo1 = so.device_put_sparse(hs.from_dense(Vp), chunk=64)
    _, _, kk = jax.random.split(key, 3)
    q = int(min(max(5, m // max(r, 1)), m))
    cols = jax.random.randint(kk, (r, q), 0, m)
    A = jnp.zeros((m, r), jnp.float32).at[
        cols.reshape(-1), jnp.repeat(jnp.arange(r), q)
    ].add(1.0 / q)
    W_ref = np.asarray(so.project_columns(coo1, A))

    np.testing.assert_allclose(
        np.asarray(W_sh)[:n], W_ref, rtol=1e-4, atol=1e-6
    )
