"""Sharded-path tests on the 8-virtual-device CPU mesh (SURVEY.md §4.3):
partitioner round-trip, sharded updates vs. the single-device oracle,
end-to-end compute_sharded parity, sharded retrieval."""

import jax
import numpy as np
import pytest
from jax.sharding import PartitionSpec as P

from nmftpu import Algorithm, Initialization, NmfConfig, Objective
from nmftpu import sparse as hs
from nmftpu.driver import compute
from nmftpu.parallel import (
    compute_sharded,
    factor_shardings,
    make_grid_mesh,
    partition_sparse,
    topk_mips_sharded,
)
from nmftpu.parallel.sharded_coo import balance_report
from nmftpu.retrieval import topk_mips


@pytest.fixture(scope="module")
def mesh():
    assert len(jax.devices()) == 8, "conftest must provide 8 CPU devices"
    return make_grid_mesh((2, 4))


def _spmat(rng, n=50, m=60, density=0.25):
    dense = rng.uniform(0.2, 2.0, (n, m))
    mask = rng.uniform(size=(n, m)) < density
    mask[:, 0] = True
    mask[0, :] = True
    dense = (dense * mask).astype(np.float32)
    return dense, hs.from_dense(dense)


def test_mesh_construction():
    mesh = make_grid_mesh()  # auto shape over 8 devices
    assert mesh.devices.size == 8
    assert mesh.axis_names == ("users", "items")
    sh = factor_shardings(mesh)
    assert sh["W"].spec == P("users", None)


@pytest.mark.parametrize("balance", [False, True])
def test_partition_roundtrip(rng, mesh, balance):
    dense, sp = _spmat(rng)
    scoo, row_perm, col_perm = partition_sparse(
        sp, (2, 4), balance=balance, chunk=256
    )
    # reconstruct the dense matrix from the tiles
    pu, pi = scoo.mesh_shape
    recon = np.zeros(scoo.padded_shape, np.float32)
    vals = np.asarray(scoo.values)
    rows = np.asarray(scoo.rows)
    cols = np.asarray(scoo.cols)
    for i in range(pu):
        for j in range(pi):
            nz = vals[i, j] != 0
            recon[
                rows[i, j][nz] + i * scoo.block_rows,
                cols[i, j][nz] + j * scoo.block_cols,
            ] += vals[i, j][nz]
    # apply inverse permutation: recon[row_perm[i], col_perm[j]] == dense[i,j]
    got = recon[np.ix_(row_perm, col_perm)]
    np.testing.assert_allclose(got, dense, rtol=1e-6)
    rep = balance_report(scoo)
    assert rep["tile_nnz_max"] <= rep["tile_capacity"]


def test_balance_improves_imbalance(rng):
    """Power-law rows: permutation should equalize tile populations."""
    from nmftpu.data import synthetic_powerlaw_sparse
    sp = synthetic_powerlaw_sparse(400, 300, nnz=8000, alpha_user=1.3,
                                  seed=3)
    _, _, _ = partition_sparse(sp, (2, 4), balance=False, chunk=256)
    unbal = balance_report(partition_sparse(sp, (2, 4), balance=False,
                                            chunk=256)[0])
    bal = balance_report(partition_sparse(sp, (2, 4), balance=True,
                                          chunk=256)[0])
    assert bal["imbalance"] <= unbal["imbalance"] * 1.05


@pytest.mark.parametrize("alg,obj", [
    (Algorithm.MU, Objective.FROBENIUS),
    (Algorithm.MU, Objective.KL),
    (Algorithm.ALS, Objective.FROBENIUS),
    (Algorithm.ACLS, Objective.FROBENIUS),
    (Algorithm.AHCLS, Objective.FROBENIUS),
    (Algorithm.GDCLS, Objective.FROBENIUS),
    (Algorithm.NSNMF, Objective.FROBENIUS),
    (Algorithm.NSNMF, Objective.KL),
])
def test_sharded_matches_dense_oracle(rng, mesh, alg, obj):
    """compute_sharded on the 2x4 mesh == single-device compute() on the
    densified matrix, same warm start, to float tolerance."""
    dense, sp = _spmat(rng, 40, 48)
    W0 = rng.uniform(0.1, 1.0, (40, 4)).astype(np.float32)
    H0 = rng.uniform(0.1, 1.0, (4, 48)).astype(np.float32)
    cfg = NmfConfig(
        rank=4, algorithm=alg, objective=obj,
        init_method=Initialization.COPY_EXISTING,
        num_iterations=15, check_interval=5,
        lambda_w=0.05, lambda_h=0.05, lambda_tik=0.05, theta=0.3,
    )
    rs = compute_sharded(sp, cfg, mesh=mesh, W0=W0, H0=H0, chunk=256)
    rd = compute(dense, cfg, W0=W0, H0=H0)
    np.testing.assert_allclose(
        rs.frobenius_error, rd.frobenius_error, rtol=2e-3
    )
    np.testing.assert_allclose(
        np.asarray(rs.W), np.asarray(rd.W), rtol=2e-2, atol=2e-3
    )
    np.testing.assert_allclose(
        np.asarray(rs.H), np.asarray(rd.H), rtol=2e-2, atol=2e-3
    )


def test_sharded_weighted_confidence(rng, mesh):
    dense, sp = _spmat(rng, 30, 36)
    W0 = rng.uniform(0.1, 1.0, (30, 3)).astype(np.float32)
    H0 = rng.uniform(0.1, 1.0, (3, 36)).astype(np.float32)
    cfg = NmfConfig(
        rank=3, alpha_confidence=4.0,
        init_method=Initialization.COPY_EXISTING,
        num_iterations=10, check_interval=5,
    )
    rs = compute_sharded(sp, cfg, mesh=mesh, W0=W0, H0=H0, chunk=256)
    rd = compute(dense, cfg, W0=W0, H0=H0)
    np.testing.assert_allclose(
        np.asarray(rs.W), np.asarray(rd.W), rtol=2e-2, atol=2e-3
    )


def test_sharded_random_init_and_threshold(rng, mesh):
    dense, sp = _spmat(rng, 60, 64, density=0.4)
    cfg = NmfConfig(
        rank=5, num_iterations=400, threshold_value=1e-3,
        check_interval=10, seed=4,
    )
    res = compute_sharded(sp, cfg, mesh=mesh, chunk=256)
    assert res.converged
    assert res.W.shape == (60, 5) and res.H.shape == (5, 64)
    # factors come back in original coordinates: error must be consistent
    recon_err = np.linalg.norm(dense - np.asarray(res.W) @ np.asarray(res.H))
    np.testing.assert_allclose(recon_err, res.frobenius_error, rtol=5e-2)


def test_sharded_data_dependent_init(rng, mesh):
    dense, sp = _spmat(rng, 40, 40)
    cfg = NmfConfig(
        rank=4, init_method=Initialization.K_MEANS_AND_NON_NEGATIVE_WTV,
        num_iterations=10, kmeans_max_iter=3,
    )
    res = compute_sharded(sp, cfg, mesh=mesh, chunk=256)
    assert np.isfinite(res.frobenius_error)


def test_sharded_determinism(rng, mesh):
    _, sp = _spmat(rng, 30, 32)
    cfg = NmfConfig(rank=3, num_iterations=10, seed=9)
    r1 = compute_sharded(sp, cfg, mesh=mesh, chunk=256)
    r2 = compute_sharded(sp, cfg, mesh=mesh, chunk=256)
    np.testing.assert_array_equal(np.asarray(r1.W), np.asarray(r2.W))


def test_topk_mips_sharded_matches_single(rng, mesh):
    b, r, m = 6, 8, 96
    Wq = rng.standard_normal((b, r)).astype(np.float32)
    H = rng.standard_normal((r, m)).astype(np.float32)
    sh = factor_shardings(mesh)
    H_dev = jax.device_put(H, sh["H"])
    s_ref, i_ref = topk_mips(Wq, H, k=7)
    s_sh, i_sh = topk_mips_sharded(Wq, H_dev, k=7, mesh=mesh, block=16)
    np.testing.assert_allclose(np.asarray(s_sh), np.asarray(s_ref),
                               rtol=1e-5)
    np.testing.assert_array_equal(np.asarray(i_sh), np.asarray(i_ref))


def test_recall_at_k_sharded_matches_single(rng, mesh):
    from nmftpu.retrieval import recall_at_k
    n, m, r = 40, 96, 6
    W = rng.uniform(0.1, 1.0, (n, r)).astype(np.float32)
    H = rng.uniform(0.1, 1.0, (r, m)).astype(np.float32)
    held = np.argmax(W @ H, axis=1)
    test_pairs = np.stack([np.arange(n), held], axis=1)
    sh = factor_shardings(mesh)
    H_dev = jax.device_put(H, sh["H"])
    r1 = recall_at_k(W, H, test_pairs, k=5, batch_users=16, block=16)
    r2 = recall_at_k(W, H_dev, test_pairs, k=5, batch_users=16, block=16,
                     mesh=mesh)
    assert r1 == r2 == 1.0


def test_dense_gspmd_sharded_matches_unsharded(rng, mesh):
    """Dense driver with mesh=: GSPMD-partitioned GEMMs must reproduce the
    single-device result (shapes deliberately NOT divisible by the mesh)."""
    V = rng.uniform(0.1, 2.0, (42, 51)).astype(np.float32)  # 42%2=0, 51%4=3
    W0 = rng.uniform(0.1, 1.0, (42, 4)).astype(np.float32)
    H0 = rng.uniform(0.1, 1.0, (4, 51)).astype(np.float32)
    cfg = NmfConfig(
        rank=4, init_method=Initialization.COPY_EXISTING,
        num_iterations=15, check_interval=5,
    )
    rs = compute(V, cfg, W0=W0, H0=H0, mesh=mesh)
    rd = compute(V, cfg, W0=W0, H0=H0)
    assert rs.W.shape == (42, 4) and rs.H.shape == (4, 51)
    np.testing.assert_allclose(rs.frobenius_error, rd.frobenius_error,
                               rtol=1e-4)
    np.testing.assert_allclose(np.asarray(rs.W), np.asarray(rd.W),
                               rtol=1e-3, atol=1e-5)


def test_sharded_exclude_lists_match_single(rng, mesh):
    """Sharded block-bucketed exclusion == single-device lists == dense
    mask (shard-major bucketing, shard-local columns)."""
    from nmftpu.retrieval.exclusion import build_block_exclusion
    from nmftpu.retrieval.mips import topk_mips_blocked
    from nmftpu.parallel.retrieval_sharded import topk_mips_sharded
    from nmftpu.sparse import SparseCSR

    n, m, r = 12, 256, 4
    pi = mesh.shape["items"]
    W = rng.uniform(0.1, 1.0, (n, r)).astype(np.float32)
    H = rng.uniform(0.1, 1.0, (r, m)).astype(np.float32)
    dense_seen = rng.uniform(size=(n, m)) < 0.1
    indptr = np.concatenate([[0], np.cumsum(dense_seen.sum(1))]).astype(np.int64)
    indices = np.concatenate([np.nonzero(row)[0] for row in dense_seen])
    csr = SparseCSR(indptr, indices.astype(np.int64),
                    np.ones(len(indices), np.float32), (n, m))

    sh = factor_shardings(mesh)
    H_dev = jax.device_put(H, sh["H"])
    lists_sh = build_block_exclusion(np.arange(n), csr, m, block=32,
                                     shards=pi)
    s_sh, i_sh = topk_mips_sharded(
        W, H_dev, k=9, mesh=mesh, block=32, exclude_lists=lists_sh)
    _, i_one = topk_mips_blocked(
        W, H, k=9, block=32, exclude_mask=dense_seen)
    np.testing.assert_array_equal(np.asarray(i_sh), np.asarray(i_one))


def test_sharded_kmeans_init_matches_single_device(rng, mesh):
    """Mesh-native k-means init (shard-local argmin + psum'd centroid
    sums) == the single-device sparse k-means on the same permuted
    matrix with the same key."""
    import jax.numpy as jnp
    from nmftpu.parallel.init_sharded import build_sharded_data_init
    from nmftpu.parallel.sharded_coo import partition_sparse
    from nmftpu import sparse_ops as so
    from nmftpu import sparse as hs
    from nmftpu.config import Initialization
    import dataclasses as dc

    n, m, r = 40, 48, 4
    dense, sp = _spmat(rng, n, m, density=0.5)
    cfg = NmfConfig(
        rank=r, init_method=Initialization.K_MEANS_AND_NON_NEGATIVE_WTV,
        num_iterations=1, kmeans_max_iter=5, seed=3,
    )
    scoo, row_perm, col_perm = partition_sparse(
        sp, tuple(mesh.devices.shape), chunk=256, seed=cfg.seed,
        out_shardings=factor_shardings(mesh)["tile"],
    )
    init = build_sharded_data_init(cfg, mesh, scoo)
    key = jax.random.PRNGKey(123)
    W_sh, H_sh = init(key, scoo)

    # single-device oracle on the permuted matrix with the same subkey
    Vp = np.zeros((n, m), np.float32)
    Vp[row_perm[:, None], col_perm[None, :]] = dense
    coo1 = so.device_put_sparse(hs.from_dense(Vp), chunk=256)
    _, _, kk = jax.random.split(key, 3)
    cent, _ = so.kmeans_columns_sparse(coo1, r, kk, max_iter=5)
    W_ref = np.maximum(np.asarray(cent), 0.0) + 1e-6
    H_ref = np.maximum(np.asarray(so.wt_v(coo1, jnp.asarray(W_ref))), 0.0) + 1e-6

    np.testing.assert_allclose(
        np.asarray(W_sh)[:n], W_ref, rtol=1e-4, atol=1e-5
    )
    np.testing.assert_allclose(
        np.asarray(H_sh)[:, :m], H_ref, rtol=1e-4, atol=1e-5
    )


def test_sharded_kmeans_init_ell_engine_e2e(rng, mesh):
    """k-means init runs mesh-native under the ELL engine too (the COO
    init copy shares the ELL partition's perms/blocking)."""
    dense, sp = _spmat(rng, 36, 40)
    cfg = NmfConfig(
        rank=3, init_method=Initialization.K_MEANS_AND_RANDOM_VALUES,
        num_iterations=8, kmeans_max_iter=3, seed=5,
    )
    res = compute_sharded(sp, cfg, mesh=mesh, engine="ell")
    assert np.isfinite(res.frobenius_error)
    recon = np.linalg.norm(dense - np.asarray(res.W) @ np.asarray(res.H))
    np.testing.assert_allclose(recon, res.frobenius_error, rtol=5e-2)


@pytest.mark.parametrize("alg", [Algorithm.MU, Algorithm.ALS])
def test_dense_mesh_int8_storage(rng, mesh, alg):
    """v_storage='int8' rides the GSPMD dense mesh path: the registry's
    int8 branches quantize the sharded V in place (global-max reduction +
    elementwise), and the int8 dot_generals partition like any other
    contraction. MU tracks the single-device int8 run tightly; ALS is
    trajectory-sensitive (clamp-boundary flips under reduction-order
    noise), so it gets a quality bound instead."""
    V = (
        rng.uniform(0.1, 1.0, (48, 4)) @ rng.uniform(0.1, 1.0, (4, 40))
    ).astype(np.float32)
    W0 = rng.uniform(0.1, 1.0, (48, 4)).astype(np.float32)
    H0 = rng.uniform(0.1, 1.0, (4, 40)).astype(np.float32)
    cfg = NmfConfig(
        rank=4, algorithm=alg, v_storage="int8",
        init_method=Initialization.COPY_EXISTING,
        num_iterations=15, check_interval=5,
    )
    rm = compute(V, cfg, W0=W0, H0=H0, mesh=mesh)
    rs = compute(V, cfg, W0=W0, H0=H0)
    if alg is Algorithm.MU:
        np.testing.assert_allclose(
            rm.frobenius_error, rs.frobenius_error, rtol=2e-3
        )
    else:
        vnorm = float(np.linalg.norm(V))
        assert rm.frobenius_error <= rs.frobenius_error + 0.015 * vnorm
    assert np.all(np.asarray(rm.W) >= 0)


def test_prepare_sharded_plan_reuse(rng, mesh):
    """prepare_sharded pays the partition once; plan.run() is bit-equal to
    a fresh compute_sharded for the same config, and loop-knob sweeps
    (iterations) reuse the partition without re-building it."""
    import dataclasses

    from nmftpu.parallel import prepare_sharded

    _, sp = _spmat(rng, 30, 32)
    cfg = NmfConfig(rank=3, num_iterations=10, seed=9)
    plan = prepare_sharded(sp, cfg, mesh=mesh, chunk=256)
    r1 = plan.run()
    r2 = compute_sharded(sp, cfg, mesh=mesh, chunk=256)
    np.testing.assert_array_equal(np.asarray(r1.W), np.asarray(r2.W))

    operand_before = plan.operand
    r3 = plan.run(dataclasses.replace(cfg, num_iterations=20))
    assert r3.num_iterations == 20
    assert plan.operand is operand_before  # no re-partition
    assert r3.frobenius_error <= r1.frobenius_error + 1e-6

    with pytest.raises(ValueError, match="dtype"):
        plan.run(dataclasses.replace(cfg, dtype="bfloat16"))
    with pytest.raises(ValueError, match="rank"):
        plan.run(dataclasses.replace(cfg, rank=64))


def test_prepare_sharded_plan_warm_start_and_engines(rng, mesh):
    """COPY_EXISTING warm starts flow through plan.run, and the scatter /
    ring partitions behave the same way as the default ELL one."""
    import dataclasses

    from nmftpu.parallel import prepare_sharded

    dense, sp = _spmat(rng, 24, 28)
    W0 = rng.uniform(0.1, 1.0, (24, 3)).astype(np.float32)
    H0 = rng.uniform(0.1, 1.0, (3, 28)).astype(np.float32)
    cfg = NmfConfig(
        rank=3, init_method=Initialization.COPY_EXISTING,
        num_iterations=8, check_interval=4,
    )
    for engine in ("scatter", "ring"):
        plan = prepare_sharded(sp, cfg, mesh=mesh, chunk=256,
                               engine=engine)
        rp = plan.run(W0=W0, H0=H0)
        rc = compute_sharded(sp, cfg, mesh=mesh, chunk=256,
                             engine=engine, W0=W0, H0=H0)
        np.testing.assert_array_equal(np.asarray(rp.W), np.asarray(rc.W))


def test_prepare_sharded_plan_data_dependent_init(rng, mesh):
    """Data-dependent init on an ELL plan builds its COO companion
    lazily, once, and reuses it on subsequent runs."""
    _, sp = _spmat(rng, 40, 40)
    from nmftpu.parallel import prepare_sharded

    cfg = NmfConfig(
        rank=4, init_method=Initialization.K_MEANS_AND_NON_NEGATIVE_WTV,
        num_iterations=4, kmeans_max_iter=2,
    )
    plan = prepare_sharded(sp, cfg, mesh=mesh, chunk=256, engine="ell")
    assert plan._init_scoo is None
    r1 = plan.run()
    scoo = plan._init_scoo
    assert scoo is not None
    r2 = plan.run()
    assert plan._init_scoo is scoo
    np.testing.assert_array_equal(np.asarray(r1.W), np.asarray(r2.W))


def test_plan_run_unpermute_false(rng, mesh):
    """unpermute=False keeps factors padded + partition-ordered on device;
    applying the attached perms reproduces the default output."""
    from nmftpu.parallel import prepare_sharded

    _, sp = _spmat(rng, 30, 32)
    cfg = NmfConfig(rank=3, num_iterations=6, seed=2)
    plan = prepare_sharded(sp, cfg, mesh=mesh, chunk=256)
    rp = plan.run(unpermute=False)
    rd = plan.run()
    assert rp.W.shape[0] >= 30 and rp.H.shape[1] >= 32
    np.testing.assert_array_equal(
        np.asarray(rp.W)[rp.row_perm], np.asarray(rd.W)
    )
    np.testing.assert_array_equal(
        np.asarray(rp.H)[:, rp.col_perm], np.asarray(rd.H)
    )


def test_plan_unpermuted_factors_feed_sharded_topk(rng, mesh):
    """The documented on-device pipeline: run(unpermute=False) keeps H
    sharded/padded; feeding it straight into topk_mips_sharded and
    mapping indices back through col_perm reproduces the top-k of the
    unpermuted factors (H pad columns are zero, so they never rank)."""
    import jax.numpy as jnp

    from nmftpu.parallel import prepare_sharded

    _, sp = _spmat(rng, 40, 64, density=0.3)
    cfg = NmfConfig(rank=4, num_iterations=8, seed=3)
    plan = prepare_sharded(sp, cfg, mesh=mesh, chunk=256)
    rp = plan.run(unpermute=False)
    rd = plan.run()  # same seed => same factors, user coordinates

    Wq = jnp.asarray(np.asarray(rd.W)[:5])
    s_ref, i_ref = topk_mips(Wq, jnp.asarray(rd.H), 10)
    s_dev, i_dev = topk_mips_sharded(Wq, rp.H, 10, mesh, block=16)

    np.testing.assert_allclose(
        np.asarray(s_dev), np.asarray(s_ref), rtol=1e-5
    )
    inv = np.full(rp.H.shape[1], -1, np.int64)
    inv[np.asarray(rp.col_perm)] = np.arange(len(rp.col_perm))
    mapped = inv[np.asarray(i_dev)]
    assert (mapped >= 0).all()  # pad columns never enter the top-k
    for got, want in zip(mapped, np.asarray(i_ref)):
        assert set(got) == set(want)


def test_sharded_mean_columns_init_matches_single_device(rng, mesh):
    """Regression: MEAN_COLUMNS samples on EARLIER item shards gave
    negative local indices, which JAX wraps NumPy-style before
    mode="drop" — every such sample was double-counted at a wrong
    column. Mesh-native W must equal the single-device oracle."""
    import jax.numpy as jnp
    from nmftpu.parallel.init_sharded import build_sharded_data_init
    from nmftpu.parallel.sharded_coo import partition_sparse
    from nmftpu import sparse_ops as so
    from nmftpu import sparse as hs
    from nmftpu.config import Initialization

    n, m, r = 40, 48, 4
    dense, sp = _spmat(rng, n, m, density=0.5)
    cfg = NmfConfig(
        rank=r, init_method=Initialization.MEAN_COLUMNS,
        num_iterations=1, seed=3,
    )
    scoo, row_perm, col_perm = partition_sparse(
        sp, tuple(mesh.devices.shape), chunk=256, seed=cfg.seed,
        out_shardings=factor_shardings(mesh)["tile"],
    )
    init = build_sharded_data_init(cfg, mesh, scoo)
    key = jax.random.PRNGKey(123)
    W_sh, _ = init(key, scoo)

    # single-device oracle on the permuted matrix with the same subkey
    Vp = np.zeros((n, m), np.float32)
    Vp[row_perm[:, None], col_perm[None, :]] = dense
    coo1 = so.device_put_sparse(hs.from_dense(Vp), chunk=256)
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
