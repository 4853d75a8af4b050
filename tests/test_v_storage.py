"""v_storage (bfloat16 / int8) driver-path tests."""

import numpy as np
import pytest

from nmftpu import Algorithm, NmfConfig, Objective, Initialization
from nmftpu.driver import compute


def _problem(rng, n=60, m=48, r=5):
    W = rng.uniform(0.1, 1.0, (n, r)).astype(np.float32)
    H = rng.uniform(0.1, 1.0, (r, m)).astype(np.float32)
    return (W @ H).astype(np.float32)


@pytest.mark.parametrize("storage", ["bfloat16", "int8"])
def test_low_precision_storage_converges(rng, storage):
    V = _problem(rng)
    cfg = NmfConfig(
        rank=5, num_iterations=150, v_storage=storage, seed=1,
        check_interval=25,
    )
    res = compute(V, cfg)
    rel = res.frobenius_error / np.linalg.norm(V)
    # low-precision numerators floor the attainable relative error at the
    # few-percent level (int8: ~scale/2 per entry; bf16: 8-bit mantissa)
    limit = 0.05
    assert rel < limit, f"relative error {rel} with {storage} storage"
    assert np.all(np.asarray(res.W) >= 0)


def test_int8_storage_validation():
    with pytest.raises(ValueError):
        NmfConfig(rank=4, v_storage="fp4")
    # confidence weighting composes with int8 (round 2: C = 1 + α·scale·Vq
    # rebuilt per panel)
    NmfConfig(rank=4, v_storage="int8", alpha_confidence=1.0)
    # the whole Frobenius family is int8-eligible (round 2)
    for alg in (Algorithm.ALS, Algorithm.ACLS, Algorithm.AHCLS,
                Algorithm.GDCLS, Algorithm.NSNMF):
        NmfConfig(rank=4, v_storage="int8", algorithm=alg)
    # KL is int8-eligible for the KL-capable algorithms (round 2:
    # quantized-KL with the scale folded into the numerators)
    NmfConfig(rank=4, v_storage="int8", objective=Objective.KL)
    NmfConfig(rank=4, v_storage="int8", algorithm=Algorithm.NSNMF,
              objective=Objective.KL)


def test_bf16_matches_f32_loosely(rng):
    V = _problem(rng)
    W0 = rng.uniform(0.1, 1.0, (60, 5)).astype(np.float32)
    H0 = rng.uniform(0.1, 1.0, (5, 48)).astype(np.float32)
    base = NmfConfig(
        rank=5, num_iterations=20,
        init_method=Initialization.COPY_EXISTING,
    )
    import dataclasses
    r32 = compute(V, base, W0=W0, H0=H0)
    rb16 = compute(
        V, dataclasses.replace(base, v_storage="bfloat16"), W0=W0, H0=H0
    )
    np.testing.assert_allclose(
        rb16.frobenius_error, r32.frobenius_error, rtol=5e-2
    )


def test_int8x8_update_matches_f32_within_quantization(rng):
    """The int8 x int8 MXU update (the anchor-beating path) tracks the f32
    update within the 0.4%-per-operand quantization tolerance."""
    import jax.numpy as jnp

    from nmftpu.linalg import dense as D

    n, m, r = 48, 40, 5
    V = rng.uniform(0.0, 2.0, (n, m)).astype(np.float32)
    W = rng.uniform(0.1, 1.0, (n, r)).astype(np.float32)
    H = rng.uniform(0.1, 1.0, (r, m)).astype(np.float32)
    s, Vq = D.quantize_sym(jnp.asarray(V))

    Wf, Hf = D.mu_update_frobenius(V, W, H)
    Wq, Hq = D.mu_update_frobenius_int8x8(Vq, s, jnp.asarray(W),
                                          jnp.asarray(H))
    np.testing.assert_allclose(np.asarray(Wq), np.asarray(Wf), rtol=2e-2,
                               atol=1e-3)
    np.testing.assert_allclose(np.asarray(Hq), np.asarray(Hf), rtol=2e-2,
                               atol=1e-3)


def test_int8_densified_engine_matches_bf16(rng):
    """Sparse densified engine with v_storage='int8' (int8 x int8 MXU
    contractions on the densified matrix): converged error within 1% of
    the bf16 densified engine, and the reported Gram-trick error agrees
    with the true f32 residual of the returned factors."""
    from nmftpu import sparse as hs
    from nmftpu.sparse_ops import compute_sparse

    n, m, r = 120, 150, 6
    dense = np.where(
        rng.random((n, m)) < 0.3,
        rng.integers(1, 11, (n, m)) * 0.5, 0.0,
    ).astype(np.float32)
    sp = hs.from_dense(dense)
    cfg = NmfConfig(rank=r, num_iterations=80, seed=0, check_interval=20)
    import dataclasses

    cfg8 = dataclasses.replace(cfg, v_storage="int8")
    rb = compute_sparse(sp, cfg, strategy="densified")
    rq = compute_sparse(sp, cfg8, strategy="densified")
    assert (
        abs(rq.frobenius_error - rb.frobenius_error) / rb.frobenius_error
        < 0.01
    )
    true_err = np.linalg.norm(dense - np.asarray(rq.W) @ np.asarray(rq.H))
    np.testing.assert_allclose(rq.frobenius_error, true_err, rtol=2e-2)
    # auto strategy routes int8 within the halved (1 byte/entry) budget
    ra = compute_sparse(sp, cfg8, strategy="auto")
    np.testing.assert_allclose(
        ra.frobenius_error, rq.frobenius_error, atol=1e-3
    )


def test_int8x8_converges_like_f32(rng, lowrank):
    """50 driver iterations with v_storage='int8': converged error within
    1% of the f32 run (the probe measured 5-digit agreement on-chip)."""
    from nmftpu import NmfConfig
    from nmftpu.driver import compute

    V = lowrank(rng, 60, 50, 4)
    cfg_f = NmfConfig(rank=4, num_iterations=50, seed=0)
    cfg_q = NmfConfig(rank=4, num_iterations=50, seed=0,
                      v_storage="int8")
    rf = compute(V, cfg_f)
    rq = compute(V, cfg_q)
    assert abs(rq.frobenius_error - rf.frobenius_error) / rf.frobenius_error < 0.01


_FAMILY_CFGS = [
    dict(algorithm=Algorithm.ALS),
    dict(algorithm=Algorithm.ACLS, lambda_w=0.05, lambda_h=0.05),
    dict(algorithm=Algorithm.AHCLS, lambda_w=0.05, lambda_h=0.05,
         alpha_w=0.4, alpha_h=0.4),
    dict(algorithm=Algorithm.GDCLS, lambda_tik=0.05),
    dict(algorithm=Algorithm.NSNMF, theta=0.3),
]


@pytest.mark.parametrize(
    "kw", _FAMILY_CFGS, ids=lambda kw: kw["algorithm"].name.lower()
)
def test_int8_family_dense_tracks_f32(rng, lowrank, kw):
    """ALS/ACLS/AHCLS/GDCLS/nsNMF with v_storage='int8' (int8 MXU
    right-hand sides, exact f32 solves): short fixed-init trajectory
    stays within a few percent of the same algorithm's f32 run (the
    ALS family is non-monotone, so long trajectories diverge under any
    perturbation — compare before chaos sets in, as test_densified does)."""
    V = lowrank(rng, 60, 50, 4)
    W0 = rng.uniform(0.1, 1.0, (60, 4)).astype(np.float32)
    H0 = rng.uniform(0.1, 1.0, (4, 50)).astype(np.float32)
    cfg_f = NmfConfig(
        rank=4, num_iterations=10, check_interval=5,
        init_method=Initialization.COPY_EXISTING, **kw,
    )
    import dataclasses

    cfg_q = dataclasses.replace(cfg_f, v_storage="int8")
    rf = compute(V, cfg_f, W0=W0, H0=H0)
    rq = compute(V, cfg_q, W0=W0, H0=H0)
    # Quality bound, not trajectory parity: the int8 path solves the
    # quantized problem exactly (per-step parity <1%, see _ls_terms
    # docstring) but its residual vs the TRUE V carries the V-quantization
    # noise floor ~0.5% of ||V||_F, which unregularized ALS exposes in
    # full once the fit approaches it. Require the int8 fit to be no more
    # than 1.5% of ||V|| worse than f32's.
    vnorm = float(np.linalg.norm(V))
    assert rq.frobenius_error <= rf.frobenius_error + 0.015 * vnorm, (
        rq.frobenius_error, rf.frobenius_error, vnorm,
    )
    assert np.all(np.asarray(rq.W) >= 0)
    assert np.all(np.asarray(rq.H) >= 0)


@pytest.mark.parametrize(
    "kw", _FAMILY_CFGS, ids=lambda kw: kw["algorithm"].name.lower()
)
def test_int8_family_densified_engine_tracks_bf16(rng, kw):
    """The densified sparse engine routes the whole Frobenius family
    through the int8 MXU path; error within 2% of the bf16 engine."""
    from nmftpu import sparse as hs
    from nmftpu.sparse_ops import compute_sparse

    n, m, r = 100, 120, 5
    dense = np.where(
        rng.random((n, m)) < 0.3,
        rng.integers(1, 11, (n, m)) * 0.5, 0.0,
    ).astype(np.float32)
    sp = hs.from_dense(dense)
    W0 = rng.uniform(0.1, 1.0, (n, r)).astype(np.float32)
    H0 = rng.uniform(0.1, 1.0, (r, m)).astype(np.float32)
    cfg = NmfConfig(
        rank=r, num_iterations=10, check_interval=5,
        init_method=Initialization.COPY_EXISTING, **kw,
    )
    import dataclasses

    cfg8 = dataclasses.replace(cfg, v_storage="int8")
    rb = compute_sparse(sp, cfg, W0=W0, H0=H0, strategy="densified")
    rq = compute_sparse(sp, cfg8, W0=W0, H0=H0, strategy="densified")
    np.testing.assert_allclose(
        rq.frobenius_error, rb.frobenius_error, rtol=5e-2
    )
    # reported Gram-trick error vs true residual of returned factors
    # (nsNMF reports against the smoothed S@H, folded in by the driver)
    He = np.asarray(rq.H)
    if kw["algorithm"] is Algorithm.NSNMF:
        from nmftpu.linalg import dense as D

        S = np.asarray(D.nsnmf_smoothing_matrix(r, kw["theta"]))
        He = S @ He
    true_err = np.linalg.norm(dense - np.asarray(rq.W) @ He)
    np.testing.assert_allclose(rq.frobenius_error, true_err, rtol=2e-2)


@pytest.mark.parametrize("alg", [Algorithm.MU, Algorithm.NSNMF])
@pytest.mark.parametrize("storage", ["bfloat16", "int8"])
def test_kl_lowp_dense_tracks_f32(rng, alg, storage):
    """KL with low-precision-stored V (blockwise bf16-GEMM half-steps;
    int8 additionally folds its quantization scale into the numerators):
    on integer count data <= 127 the int8 storage is EXACT, so both
    storages track the f32 trajectory to bf16-GEMM rounding."""
    import dataclasses

    V = rng.integers(0, 6, (80, 64)).astype(np.float32)
    W0 = rng.uniform(0.1, 1.0, (80, 5)).astype(np.float32)
    H0 = rng.uniform(0.1, 1.0, (5, 64)).astype(np.float32)
    kw = {"theta": 0.3} if alg is Algorithm.NSNMF else {}
    cfg = NmfConfig(
        rank=5, algorithm=alg, objective=Objective.KL,
        num_iterations=12, check_interval=4,
        init_method=Initialization.COPY_EXISTING, **kw,
    )
    ref = compute(V, cfg, W0=W0, H0=H0)
    res = compute(V, dataclasses.replace(cfg, v_storage=storage),
                  W0=W0, H0=H0)
    np.testing.assert_allclose(res.kl_error, ref.kl_error, rtol=2e-3)
    np.testing.assert_allclose(
        res.frobenius_error, ref.frobenius_error, rtol=2e-3
    )
    assert np.all(np.asarray(res.W) >= 0)
    assert np.all(np.asarray(res.H) >= 0)


@pytest.mark.parametrize("alg", [Algorithm.MU, Algorithm.NSNMF])
def test_kl_int8_densified_engine_tracks_bf16(rng, alg):
    """The densified sparse engine under KL with v_storage='int8':
    quantized densify + scale-folded blockwise updates + quantized KL
    error metric track the bf16 densified engine."""
    import dataclasses

    from nmftpu import sparse as hs
    from nmftpu.sparse_ops import compute_sparse

    n, m, r = 90, 70, 4
    dense = np.where(
        rng.random((n, m)) < 0.3, rng.integers(1, 6, (n, m)), 0
    ).astype(np.float32)
    sp = hs.from_dense(dense)
    W0 = rng.uniform(0.1, 1.0, (n, r)).astype(np.float32)
    H0 = rng.uniform(0.1, 1.0, (r, m)).astype(np.float32)
    kw = {"theta": 0.3} if alg is Algorithm.NSNMF else {}
    cfg = NmfConfig(
        rank=r, algorithm=alg, objective=Objective.KL,
        num_iterations=10, check_interval=5,
        init_method=Initialization.COPY_EXISTING, **kw,
    )
    rb = compute_sparse(sp, cfg, W0=W0, H0=H0, strategy="densified")
    rq = compute_sparse(
        sp, dataclasses.replace(cfg, v_storage="int8"),
        W0=W0, H0=H0, strategy="densified",
    )
    np.testing.assert_allclose(rq.kl_error, rb.kl_error, rtol=5e-3)
    np.testing.assert_allclose(
        rq.frobenius_error, rb.frobenius_error, rtol=5e-3
    )


@pytest.mark.parametrize(
    "kw", _FAMILY_CFGS, ids=lambda kw: kw["algorithm"].name.lower()
)
def test_bf16_family_dense_tracks_f32(rng, lowrank, kw):
    """ALS/ACLS/AHCLS/GDCLS/nsNMF with v_storage='bfloat16' (previously a
    silent no-op on these algorithms): bf16 MXU right-hand sides, exact
    f32 solves — same quality-bound contract as the int8 family test."""
    import dataclasses

    V = lowrank(rng, 60, 50, 4)
    W0 = rng.uniform(0.1, 1.0, (60, 4)).astype(np.float32)
    H0 = rng.uniform(0.1, 1.0, (4, 50)).astype(np.float32)
    cfg_f = NmfConfig(
        rank=4, num_iterations=10, check_interval=5,
        init_method=Initialization.COPY_EXISTING, **kw,
    )
    cfg_b = dataclasses.replace(cfg_f, v_storage="bfloat16")
    rf = compute(V, cfg_f, W0=W0, H0=H0)
    rb = compute(V, cfg_b, W0=W0, H0=H0)
    vnorm = float(np.linalg.norm(V))
    # plain ALS has no regularizer pinning the clamp set, so rounding
    # noise flips active constraints and trajectories fork harder than
    # for the penalized variants — wider bound for that one case
    tol = 0.04 if kw["algorithm"] is Algorithm.ALS else 0.015
    assert rb.frobenius_error <= rf.frobenius_error + tol * vnorm, (
        rb.frobenius_error, rf.frobenius_error, vnorm,
    )
    assert np.all(np.asarray(rb.W) >= 0)
    assert np.all(np.asarray(rb.H) >= 0)


@pytest.mark.parametrize("storage", ["bfloat16", "int8"])
def test_weighted_lowp_dense_tracks_f32(rng, storage):
    """Confidence weighting with low-precision-stored V: C = 1 + alpha*V
    is rebuilt per row panel (int8 applies its scale before weighting),
    so no nm-sized C aux exists and the trajectory tracks f32."""
    import dataclasses

    V = rng.integers(0, 6, (90, 70)).astype(np.float32)
    W0 = rng.uniform(0.1, 1.0, (90, 4)).astype(np.float32)
    H0 = rng.uniform(0.1, 1.0, (4, 70)).astype(np.float32)
    cfg = NmfConfig(
        rank=4, num_iterations=12, check_interval=4,
        alpha_confidence=2.0, init_method=Initialization.COPY_EXISTING,
    )
    ref = compute(V, cfg, W0=W0, H0=H0)
    res = compute(V, dataclasses.replace(cfg, v_storage=storage),
                  W0=W0, H0=H0)
    np.testing.assert_allclose(
        res.frobenius_error, ref.frobenius_error, rtol=5e-3
    )
    assert np.all(np.asarray(res.W) >= 0)


def test_weighted_int8_densified_engine(rng):
    """int8 densified engine under confidence weighting tracks bf16."""
    import dataclasses

    from nmftpu import sparse as hs
    from nmftpu.sparse_ops import compute_sparse

    dense = np.where(
        rng.random((100, 80)) < 0.3, rng.integers(1, 6, (100, 80)), 0
    ).astype(np.float32)
    sp = hs.from_dense(dense)
    W0 = rng.uniform(0.1, 1.0, (100, 4)).astype(np.float32)
    H0 = rng.uniform(0.1, 1.0, (4, 80)).astype(np.float32)
    cfg = NmfConfig(
        rank=4, num_iterations=10, check_interval=5,
        alpha_confidence=2.0, init_method=Initialization.COPY_EXISTING,
    )
    rb = compute_sparse(sp, cfg, W0=W0, H0=H0, strategy="densified")
    rq = compute_sparse(
        sp, dataclasses.replace(cfg, v_storage="int8"),
        W0=W0, H0=H0, strategy="densified",
    )
    np.testing.assert_allclose(
        rq.frobenius_error, rb.frobenius_error, rtol=1e-2
    )


def test_v_storage_rejected_on_unsupporting_engines(rng):
    """ell/scatter and the sparse sharded engines keep V at the compute
    dtype; a low-precision v_storage request must fail loudly instead of
    silently running full-precision (code-review r2)."""
    import pytest

    from nmftpu.parallel import compute_sharded, make_grid_mesh
    from nmftpu.sparse import from_dense
    from nmftpu.sparse_ops import compute_sparse

    dense = (rng.uniform(0.1, 1.0, (24, 20)) *
             (rng.uniform(size=(24, 20)) < 0.4)).astype(np.float32)
    dense[:, 0] += 0.5
    dense[0, :] += 0.5
    sp = from_dense(dense)

    for strategy in ("ell", "scatter"):
        for storage in ("int8", "bfloat16"):
            cfg = NmfConfig(rank=3, num_iterations=3, v_storage=storage)
            with pytest.raises(ValueError, match="v_storage"):
                compute_sparse(sp, cfg, strategy=strategy)

    cfg = NmfConfig(rank=3, num_iterations=3, v_storage="int8")
    with pytest.raises(ValueError, match="v_storage"):
        compute_sharded(sp, cfg, mesh=make_grid_mesh((2, 4)))

    # densified still honors it
    cfg = NmfConfig(rank=3, num_iterations=3, v_storage="int8")
    res = compute_sparse(sp, cfg, strategy="densified")
    assert np.isfinite(res.frobenius_error)
