"""Weighted ALS (iALS): exact per-row weighted normal-equation solves
under the C = 1 + alpha*V confidence objective (the same model as
weighted MU, optimized exactly)."""

import numpy as np
import pytest

from nmftpu import Algorithm, NmfConfig
from nmftpu import sparse as hs
from nmftpu.driver import compute
from nmftpu.linalg import dense as D
from nmftpu.sparse_ops import compute_sparse, prepare_sparse


def _implicit(rng, n=30, m=24, r=3):
    Wt = rng.uniform(0.1, 1.0, (n, r))
    Ht = rng.uniform(0.1, 1.0, (r, m))
    V = (Wt @ Ht > np.quantile(Wt @ Ht, 0.7)).astype(np.float32)
    V[:, 0] = 1.0
    V[0, :] = 1.0
    return V


def _oracle_half_step_w(V, W, H, alpha, lam, eps, dtype=np.float64):
    """Direct numpy per-row weighted solve (the iALS definition), with
    the library's scale-aware ridge (see _batched_solve_clamped)."""
    n, r = W.shape
    out = np.zeros_like(W, dtype=np.float64)
    rel_floor = 100.0 * np.finfo(dtype).eps
    for u in range(n):
        c = 1.0 + alpha * V[u]
        G = (H * c) @ H.T
        ridge = lam + eps + max(eps, rel_floor) * np.trace(G) / r
        A = G + ridge * np.eye(r)
        y = H @ (c * V[u])
        out[u] = np.maximum(np.linalg.solve(A, y), 0.0)
    return out


def test_dense_half_step_matches_oracle(rng):
    V = _implicit(rng).astype(np.float64)
    W = rng.uniform(0.1, 1.0, (30, 3))
    H = rng.uniform(0.1, 1.0, (3, 24))
    alpha, lam, eps = 8.0, 0.05, 1e-9
    W1, H1 = D.als_update_weighted(
        V, W, H, alpha, lambda_w=lam, lambda_h=lam, eps=eps,
        order="WH", block=7,  # force panels + tail
    )
    W_ref = _oracle_half_step_w(V, W, H, alpha, lam, eps)
    np.testing.assert_allclose(np.asarray(W1), W_ref, rtol=1e-8)
    # H half-step against the dual oracle (transpose the problem)
    H_ref = _oracle_half_step_w(V.T, H.T, W_ref.T, alpha, lam, eps).T
    np.testing.assert_allclose(np.asarray(H1), H_ref, rtol=1e-8)


def test_sparse_matches_dense(rng):
    """Sparse-aware Gram deltas == the dense formulation (unobserved
    entries carry c = 1)."""
    V = _implicit(rng, 40, 32, 4)
    W0 = rng.uniform(0.1, 1.0, (40, 4)).astype(np.float32)
    H0 = rng.uniform(0.1, 1.0, (4, 32)).astype(np.float32)
    cfg = NmfConfig(
        rank=4, algorithm=Algorithm.ALS, alpha_confidence=6.0,
        lambda_w=0.1, lambda_h=0.1, num_iterations=8,
        init_method="copy_existing", check_interval=4,
    )
    rd = compute(V, cfg, W0=W0, H0=H0)
    rs = compute_sparse(hs.from_dense(V), cfg, W0=W0, H0=H0)
    np.testing.assert_allclose(
        np.asarray(rs.W), np.asarray(rd.W), rtol=5e-4, atol=1e-5
    )
    np.testing.assert_allclose(
        rs.frobenius_error, rd.frobenius_error, rtol=1e-4
    )


def test_ials_ell_matches_scatter(rng):
    """The ELL iALS engine (batched-GEMM Gram deltas + fused RHS from
    one gather) is the same update as the scatter oracle — and both
    match the dense formulation."""
    V = _implicit(rng, 40, 32, 4)
    W0 = rng.uniform(0.1, 1.0, (40, 4)).astype(np.float32)
    H0 = rng.uniform(0.1, 1.0, (4, 32)).astype(np.float32)
    cfg = NmfConfig(
        rank=4, algorithm=Algorithm.ALS, alpha_confidence=6.0,
        lambda_w=0.1, lambda_h=0.1, num_iterations=8,
        init_method="copy_existing", check_interval=4,
    )
    rs = compute_sparse(hs.from_dense(V), cfg, W0=W0, H0=H0,
                        strategy="scatter")
    re = compute_sparse(hs.from_dense(V), cfg, W0=W0, H0=H0,
                        strategy="ell")
    np.testing.assert_allclose(
        np.asarray(re.W), np.asarray(rs.W), rtol=5e-4, atol=1e-5
    )
    np.testing.assert_allclose(
        np.asarray(re.H), np.asarray(rs.H), rtol=5e-4, atol=1e-5
    )
    np.testing.assert_allclose(
        re.frobenius_error, rs.frobenius_error, rtol=1e-4
    )


def test_ials_cg_solver_tracks_exact(rng):
    """als_solver='cg' (warm-started Jacobi-PCG, Takács & Pilászy's
    ALS-CG) converges to the same weighted objective as the exact
    batched-Cholesky path, on both sparse engines; masked ALS too."""
    V = _implicit(rng, 40, 32, 4)
    W0 = rng.uniform(0.1, 1.0, (40, 4)).astype(np.float32)
    H0 = rng.uniform(0.1, 1.0, (4, 32)).astype(np.float32)
    base = dict(rank=4, algorithm=Algorithm.ALS, alpha_confidence=6.0,
                lambda_w=0.1, lambda_h=0.1, num_iterations=15,
                init_method="copy_existing", check_interval=15)
    r_ex = compute_sparse(hs.from_dense(V), NmfConfig(**base),
                          W0=W0, H0=H0, strategy="ell")
    for strategy in ("ell", "scatter"):
        r_cg = compute_sparse(
            hs.from_dense(V),
            NmfConfig(**base, als_solver="cg", cg_steps=3),
            W0=W0, H0=H0, strategy=strategy,
        )
        # converges to the same objective class: CG must be no worse
        # than 2% above the exact path (clamped ALS is a heuristic —
        # trajectories differ slightly; CG sometimes lands LOWER)
        assert (float(r_cg.frobenius_error)
                <= 1.02 * float(r_ex.frobenius_error)), (
            strategy, float(r_cg.frobenius_error),
            float(r_ex.frobenius_error),
        )
    # masked completion ALS under CG still completes
    obs = rng.random((40, 32)) < 0.6
    obs[:, :2] = True
    obs[:2, :] = True
    Wt = np.abs(rng.normal(size=(40, 3))).astype(np.float32) + 0.2
    Ht = np.abs(rng.normal(size=(3, 32))).astype(np.float32) + 0.2
    Vt = Wt @ Ht
    Vobs = np.where(obs, Vt, 0.0).astype(np.float32)
    cfg_m = NmfConfig(rank=3, mask="observed", algorithm="als",
                      lambda_w=1e-3, lambda_h=1e-3, num_iterations=30,
                      seed=4, init_method="all_random_values",
                      check_interval=30, als_solver="cg", cg_steps=4)
    res = compute_sparse(hs.from_dense(Vobs), cfg_m)
    recon = np.asarray(res.W) @ np.asarray(res.H)
    rel = (np.linalg.norm((recon - Vt)[~obs])
           / np.linalg.norm(Vt[~obs]))
    assert rel < 0.08, f"CG masked completion relerr {rel:.3f}"
    # guard: cg on the plain ALS family is rejected
    with pytest.raises(ValueError, match="cg"):
        NmfConfig(rank=3, algorithm="als", als_solver="cg")


def test_weighted_objective_beats_mu_per_iteration(rng):
    """The exact solver reaches a lower weighted objective than the
    multiplicative steps in the same iteration budget."""
    V = _implicit(rng, 50, 40, 4)
    alpha = 10.0

    def weighted_obj(res):
        R = V - np.asarray(res.W) @ np.asarray(res.H)
        C = 1.0 + alpha * V
        return float(np.sum(C * R * R))

    kw = dict(W0=np.full((50, 4), 0.5, np.float32),
              H0=np.full((4, 40), 0.5, np.float32))
    cfg = lambda alg: NmfConfig(
        rank=4, algorithm=alg, alpha_confidence=alpha, lambda_w=1e-4,
        lambda_h=1e-4, num_iterations=5, init_method="copy_existing",
        check_interval=5,
    )
    o_als = weighted_obj(compute(V, cfg(Algorithm.ALS), **kw))
    o_mu = weighted_obj(compute(V, cfg(Algorithm.MU), **kw))
    assert o_als <= o_mu * 1.01, (o_als, o_mu)


def test_routing_and_guards(rng):
    V = _implicit(rng, 24, 20, 3)
    sp = hs.from_dense(V)
    cfg = NmfConfig(rank=3, algorithm=Algorithm.ALS, alpha_confidence=4.0,
                    num_iterations=3)
    plan = prepare_sparse(sp, cfg)
    assert plan.strategy == "ell"  # auto routes iALS to the ELL engine
    import dataclasses as _dc

    plan64 = prepare_sparse(
        sp, _dc.replace(cfg, dtype="float64"))
    assert plan64.strategy == "scatter"  # f64 keeps the exact oracle
    with pytest.raises(ValueError, match="ALS"):
        prepare_sparse(sp, cfg, strategy="densified")
    with pytest.raises(ValueError, match="weighted"):
        NmfConfig(rank=3, algorithm=Algorithm.ALS, alpha_confidence=1.0,
                  v_storage="int8")
    # budget guard
    import os

    os.environ["NMFTPU_WEIGHTED_GRAM_BUDGET_BYTES"] = "10"
    try:
        with pytest.raises(ValueError, match="budget"):
            prepare_sparse(sp, cfg)
    finally:
        del os.environ["NMFTPU_WEIGHTED_GRAM_BUDGET_BYTES"]


def test_foldin_consistency(rng):
    """The weighted-ALS fold-in solves the SAME per-row normal equations
    as a training W half-step against the frozen H (order='WH' leaves
    the returned W one half-step stale, so compare to a fresh solve)."""
    from nmftpu.foldin import transform

    V = _implicit(rng, 30, 24, 3)
    cfg = NmfConfig(rank=3, algorithm=Algorithm.ALS, alpha_confidence=5.0,
                    lambda_w=0.1, lambda_h=0.1, num_iterations=30,
                    seed=2, check_interval=10)
    res = compute(V, cfg)
    H = np.asarray(res.H)
    out = transform(hs.from_dense(V[:5]), H,
                    algorithm="als", alpha_confidence=5.0, lambda_w=0.1)
    # the fold-in solve runs f32, so its scale-aware ridge uses the f32
    # relative floor — mirror it in the oracle
    W_ref = _oracle_half_step_w(
        V[:5].astype(np.float64), np.zeros((5, 3)), H, 5.0, 0.1, 1e-9,
        dtype=np.float32,
    )
    np.testing.assert_allclose(out.W, W_ref, rtol=1e-3, atol=1e-5)


def test_degenerate_init_stays_finite(rng):
    """Constant init makes the weighted Gram exactly rank-1; the
    scale-aware ridge must keep the f32 Cholesky finite (used to NaN)."""
    V = _implicit(rng, 60, 48, 6)
    W0 = np.full((60, 6), 0.5, np.float32)
    H0 = np.full((6, 48), 0.5, np.float32)
    cfg = NmfConfig(rank=6, algorithm=Algorithm.ALS, alpha_confidence=40.0,
                    lambda_w=1e-4, lambda_h=1e-4, num_iterations=5,
                    init_method="copy_existing", check_interval=5)
    for data in (V, hs.from_dense(V)):
        res = (compute(data, cfg, W0=W0, H0=H0) if isinstance(data, np.ndarray)
               else compute_sparse(data, cfg, W0=W0, H0=H0))
        assert np.isfinite(res.frobenius_error)
        assert not np.isnan(np.asarray(res.W)).any()


@pytest.mark.parametrize("engine", ["scatter", "ring"])
def test_sharded_ials_matches_single_device(rng, engine):
    """Grid (psum'd per-row Gram deltas) and ring (rotating/reducing
    (b, r, r) accumulators) iALS match the single-device scatter run."""
    from nmftpu.parallel import compute_sharded, make_grid_mesh

    V = _implicit(rng, 40, 32, 4)
    W0 = rng.uniform(0.1, 1.0, (40, 4)).astype(np.float32)
    H0 = rng.uniform(0.1, 1.0, (4, 32)).astype(np.float32)
    cfg = NmfConfig(
        rank=4, algorithm=Algorithm.ALS, alpha_confidence=6.0,
        lambda_w=0.1, lambda_h=0.1, num_iterations=6,
        init_method="copy_existing", check_interval=3,
    )
    ref = compute_sparse(hs.from_dense(V), cfg, W0=W0, H0=H0)
    res = compute_sharded(hs.from_dense(V), cfg,
                          mesh=make_grid_mesh((2, 4)), engine=engine,
                          W0=W0, H0=H0)
    np.testing.assert_allclose(
        res.frobenius_error, ref.frobenius_error, rtol=2e-4
    )
    np.testing.assert_allclose(
        np.asarray(res.W), np.asarray(ref.W), rtol=2e-3, atol=1e-4
    )


def test_weighted_grams_nonmultiple_chunk(rng):
    """Sharded tiles carry chunk sizes that are any 256-multiple
    (partition_sparse rounds the max tile nnz, e.g. 5120): the
    Gram-delta sub-chunking must process the [T*sub, chunk) tail slice
    (its nonzeros used to vanish silently)."""
    import jax.numpy as jnp

    from nmftpu.sparse_ops import DeviceCOO, _weighted_row_grams

    n, m, r = 12, 5200, 3
    chunk = 5120  # NOT a multiple of the 4096 sub-chunk -> 1024 tail
    nnz = m
    cols = np.arange(m, dtype=np.int32)
    pad = 2 * chunk - nnz
    coo = DeviceCOO(
        values=jnp.asarray(np.concatenate([np.ones(nnz, np.float32),
                                           np.zeros(pad, np.float32)])),
        rows=jnp.asarray(np.zeros(nnz + pad, np.int32)),
        cols=jnp.asarray(np.concatenate([cols,
                                         np.zeros(pad, np.int32)])),
        shape=(n, m), nnz=nnz, chunk=chunk,
    )
    H = rng.uniform(0.1, 1.0, (r, m)).astype(np.float32)
    dG = np.asarray(_weighted_row_grams(coo, jnp.asarray(H.T), 2.0, n))
    expect = 2.0 * H @ H.T  # sum over ALL 5200 columns of row 0
    np.testing.assert_allclose(dG[0], expect, rtol=1e-4)


def test_facade_transform_uses_ials_weights(rng):
    """An iALS-fitted sklearn facade must project new rows with the SAME
    weighted, regularized solve it trained with."""
    from nmftpu.sklearn_api import NMF
    from nmftpu.foldin import transform

    V = _implicit(rng, 40, 30, 4)
    est = NMF(n_components=4, max_iter=10, tol=0.0, algorithm="als",
              alpha_confidence=20.0, lambda_w=0.1, random_state=0)
    est.fit(V)
    got = est.transform(hs.from_dense(V[:4]))
    want = transform(hs.from_dense(V[:4]), est.components_,
                     algorithm="als", alpha_confidence=20.0,
                     lambda_w=0.1).W
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-7)


def test_plan_run_checks_gram_budget(rng):
    import os

    V = _implicit(rng, 24, 20, 3)
    plain = NmfConfig(rank=3, algorithm=Algorithm.ALS, num_iterations=3)
    plan = prepare_sparse(hs.from_dense(V), plain, strategy="scatter")
    import dataclasses

    ials = dataclasses.replace(plain, alpha_confidence=4.0)
    os.environ["NMFTPU_WEIGHTED_GRAM_BUDGET_BYTES"] = "10"
    try:
        with pytest.raises(ValueError, match="budget"):
            plan.run(config=ials)
    finally:
        del os.environ["NMFTPU_WEIGHTED_GRAM_BUDGET_BYTES"]
    res = plan.run(config=ials)  # under the default budget: runs
    assert np.isfinite(res.frobenius_error)


def test_sharded_grid_honors_cg_solver(rng):
    """The grid-mesh iALS/masked-ALS updates route config.als_solver
    (advisor r3: they used to hardcode the exact Cholesky path). The
    sharded CG run must match the single-device CG run — and differ
    from the sharded exact run, proving the knob is honored."""
    from nmftpu.parallel import compute_sharded, make_grid_mesh

    V = _implicit(rng, 40, 32, 4)
    W0 = rng.uniform(0.1, 1.0, (40, 4)).astype(np.float32)
    H0 = rng.uniform(0.1, 1.0, (4, 32)).astype(np.float32)
    mesh = make_grid_mesh((2, 4))
    base = dict(rank=4, algorithm=Algorithm.ALS, alpha_confidence=6.0,
                lambda_w=0.1, lambda_h=0.1, num_iterations=4,
                init_method="copy_existing", check_interval=4)
    cfg_cg = NmfConfig(**base, als_solver="cg", cg_steps=2)
    r1 = compute_sparse(hs.from_dense(V), cfg_cg, W0=W0, H0=H0,
                        strategy="scatter")
    rs = compute_sharded(hs.from_dense(V), cfg_cg, W0=W0, H0=H0,
                         mesh=mesh)
    np.testing.assert_allclose(np.asarray(rs.W), np.asarray(r1.W),
                               rtol=2e-3, atol=2e-4)
    rs_ex = compute_sharded(hs.from_dense(V), NmfConfig(**base),
                            W0=W0, H0=H0, mesh=mesh)
    assert not np.allclose(np.asarray(rs.W), np.asarray(rs_ex.W),
                           rtol=1e-6, atol=1e-7)

    # masked completion ALS on the grid under CG: parity with the
    # single-device scatter engine
    obs = rng.random((40, 32)) < 0.6
    obs[:, :2] = True
    obs[:2, :] = True
    Vobs = np.where(obs, V + 0.5, 0.0).astype(np.float32)
    cfg_m = NmfConfig(rank=3, mask="observed", algorithm="als",
                      lambda_w=0.05, lambda_h=0.05, num_iterations=4,
                      init_method="copy_existing", check_interval=4,
                      als_solver="cg", cg_steps=2)
    W0m = W0[:, :3].copy()
    H0m = H0[:3].copy()
    r1m = compute_sparse(hs.from_dense(Vobs), cfg_m, W0=W0m, H0=H0m,
                         strategy="scatter")
    rsm = compute_sharded(hs.from_dense(Vobs), cfg_m, W0=W0m, H0=H0m,
                          mesh=mesh)
    np.testing.assert_allclose(np.asarray(rsm.W), np.asarray(r1m.W),
                               rtol=2e-3, atol=2e-4)
    np.testing.assert_allclose(float(rsm.rmsd), float(r1m.rmsd),
                               rtol=1e-3)
