"""Driver-level tests (SURVEY.md C2/C9/C17): end-to-end compute() on dense
inputs — convergence, early stopping, multi-run best-of, callbacks, every
algorithm and init strategy."""

import numpy as np
import pytest

import nmftpu
from nmftpu import Algorithm, Initialization, NmfConfig, Objective, ThresholdType
from nmftpu.driver import compute


def test_mu_frobenius_converges_on_lowrank(lowrank, rng):
    V = lowrank(rng, 60, 45, 5, noise=0.0)
    cfg = NmfConfig(rank=5, num_iterations=300, seed=1)
    res = compute(V, cfg)
    rel = res.frobenius_error / np.linalg.norm(V, "fro")
    assert rel < 0.02, f"relative error {rel}"
    assert res.W.shape == (60, 5) and res.H.shape == (5, 45)
    assert np.all(np.asarray(res.W) >= 0) and np.all(np.asarray(res.H) >= 0)


def test_threshold_early_stop(lowrank, rng):
    V = lowrank(rng, 50, 40, 4, noise=0.0)
    cfg = NmfConfig(
        rank=4, num_iterations=5000, threshold_value=1e-3,
        threshold_type=ThresholdType.FROBENIUS, check_interval=5, seed=0,
    )
    res = compute(V, cfg)
    assert res.converged
    assert res.num_iterations < 5000
    # deltas at the stopping check must be below threshold
    assert res.stats.deltas[-1] <= 1e-3


def test_rmsd_threshold_metric(lowrank, rng):
    V = lowrank(rng, 30, 20, 3, noise=0.0)
    cfg = NmfConfig(
        rank=3, num_iterations=400, threshold_value=1e-6,
        threshold_type=ThresholdType.RMSD, check_interval=10,
    )
    res = compute(V, cfg)
    # error reported in the RMSD metric
    np.testing.assert_allclose(res.error, res.rmsd, rtol=1e-3, atol=1e-6)


def test_multi_run_picks_best(lowrank, rng):
    V = lowrank(rng, 40, 30, 4, noise=0.05)
    cfg = NmfConfig(rank=4, num_iterations=60, num_runs=4, seed=7)
    res = compute(V, cfg)
    assert len(res.run_errors) == 4
    assert res.run_errors[res.best_run] == min(res.run_errors)
    np.testing.assert_allclose(
        res.error, res.run_errors[res.best_run], rtol=1e-5
    )


def test_copy_existing_warm_start(lowrank, rng):
    V = lowrank(rng, 30, 25, 3, noise=0.0)
    cfg = NmfConfig(rank=3, num_iterations=100, seed=3)
    res1 = compute(V, cfg)
    cfg2 = NmfConfig(
        rank=3, num_iterations=50,
        init_method=Initialization.COPY_EXISTING,
    )
    res2 = compute(V, cfg2, W0=np.asarray(res1.W), H0=np.asarray(res1.H))
    assert res2.frobenius_error <= res1.frobenius_error * (1 + 1e-4)


def test_callback_invoked(lowrank, rng):
    V = lowrank(rng, 20, 15, 3)
    seen = []

    def cb(run_idx, iteration, error, delta):
        seen.append((int(run_idx), int(iteration), float(error)))

    cfg = NmfConfig(rank=3, num_iterations=30, check_interval=10)
    res = compute(V, cfg, callback=cb)
    import jax
    jax.effects_barrier()
    assert len(seen) == 3  # checks at 10, 20, 30
    assert [it for _, it, _ in seen] == [10, 20, 30]
    # stats mirror the callback stream
    assert list(res.stats.iterations) == [10, 20, 30]


@pytest.mark.parametrize("alg", list(Algorithm))
def test_all_algorithms_run_and_descend(lowrank, rng, alg):
    V = lowrank(rng, 40, 30, 4, noise=0.02)
    cfg = NmfConfig(
        rank=4, algorithm=alg, num_iterations=40, check_interval=10,
        lambda_w=0.05, lambda_h=0.05, lambda_tik=0.05, theta=0.3, seed=2,
    )
    res = compute(V, cfg)
    assert np.isfinite(res.frobenius_error)
    assert res.stats.errors[-1] <= res.stats.errors[0] * (1 + 1e-4)
    assert np.all(np.asarray(res.W) >= 0) and np.all(np.asarray(res.H) >= 0)


@pytest.mark.parametrize("init", [i for i in Initialization
                                  if i is not Initialization.COPY_EXISTING])
def test_all_init_strategies(lowrank, rng, init):
    V = lowrank(rng, 35, 28, 4, noise=0.02)
    cfg = NmfConfig(rank=4, init_method=init, num_iterations=30, seed=5)
    res = compute(V, cfg)
    assert np.isfinite(res.frobenius_error)
    assert res.frobenius_error < np.linalg.norm(V, "fro")


def test_kl_objective_descends(lowrank, rng):
    V = lowrank(rng, 30, 25, 4, noise=0.02)
    cfg = NmfConfig(
        rank=4, objective=Objective.KL, num_iterations=50, check_interval=10
    )
    res = compute(V, cfg)
    assert res.kl_error is not None and np.isfinite(res.kl_error)
    assert res.stats.errors[-1] <= res.stats.errors[0]


def test_weighted_confidence_runs(lowrank, rng):
    V = lowrank(rng, 25, 20, 3, noise=0.02)
    cfg = NmfConfig(rank=3, alpha_confidence=5.0, num_iterations=40)
    res = compute(V, cfg)
    assert np.isfinite(res.frobenius_error)


def test_determinism_same_seed(lowrank, rng):
    V = lowrank(rng, 25, 20, 3)
    cfg = NmfConfig(rank=3, num_iterations=25, seed=11)
    r1 = compute(V, cfg)
    r2 = compute(V, cfg)
    np.testing.assert_array_equal(np.asarray(r1.W), np.asarray(r2.W))
    np.testing.assert_array_equal(np.asarray(r1.H), np.asarray(r2.H))


def test_validation_errors(rng):
    V = rng.uniform(size=(10, 8)).astype(np.float32)
    with pytest.raises(ValueError):
        compute(V, NmfConfig(rank=20))
    with pytest.raises(ValueError):
        compute(V.reshape(-1), NmfConfig(rank=2))
    with pytest.raises(ValueError):
        NmfConfig(rank=0)
    with pytest.raises(ValueError):
        NmfConfig(rank=2, objective=Objective.KL, algorithm=Algorithm.ALS)


def test_top_level_nmf_api(lowrank, rng):
    V = lowrank(rng, 20, 16, 3)
    res = nmftpu.nmf(V, 3, algorithm="mu", init="random", num_iterations=20)
    assert res.W.shape == (20, 3)


def test_interrupt_stops_run(lowrank, rng):
    """Reference C9: the user-interrupt poll stops the loop early and
    returns the current factors."""
    V = lowrank(rng, 30, 24, 3)
    calls = []

    def interrupt():
        calls.append(1)
        return len(calls) >= 2  # stop at the second check

    cfg = NmfConfig(rank=3, num_iterations=1000, check_interval=10)
    res = compute(V, cfg, interrupt=interrupt)
    assert res.num_iterations == 20  # stopped right after check #2
    assert not res.converged
    assert np.isfinite(res.frobenius_error)


def test_vectorized_runs_match_sequential(lowrank, rng):
    """vectorize_runs=True: one vmapped program; same best-of result as
    the sequential restart loop."""
    import dataclasses
    V = lowrank(rng, 30, 24, 3, noise=0.05)
    base = NmfConfig(rank=3, num_iterations=40, num_runs=4, seed=7)
    seq = compute(V, base)
    vec = compute(V, dataclasses.replace(base, vectorize_runs=True))
    assert len(vec.run_errors) == 4
    np.testing.assert_allclose(
        sorted(vec.run_errors), sorted(seq.run_errors), rtol=1e-4
    )
    assert vec.best_run == seq.best_run
    np.testing.assert_allclose(
        vec.frobenius_error, seq.frobenius_error, rtol=1e-5
    )


def test_nmf_api_mesh_and_strategy(lowrank, rng):
    from nmftpu.parallel import make_grid_mesh
    from nmftpu.sparse import from_dense

    mesh = make_grid_mesh((2, 4))
    V = lowrank(rng, 24, 32, 3)
    r1 = nmftpu.nmf(V, 3, num_iterations=10, mesh=mesh)
    assert r1.W.shape == (24, 3)
    sp = from_dense(np.where(V > np.median(V), V, 0.0))
    r2 = nmftpu.nmf(sp, 3, num_iterations=10, mesh=mesh)
    assert r2.W.shape == (24, 3)
    r3 = nmftpu.nmf(sp, 3, num_iterations=10, strategy="scatter")
    assert np.isfinite(r3.frobenius_error)


def test_lazy_top_level_exports():
    import nmftpu as pkg
    assert callable(pkg.compute_sparse)
    assert callable(pkg.compute_sharded)
    assert callable(pkg.recall_at_k)
    assert pkg.Recommender.__name__ == "Recommender"
    with pytest.raises(AttributeError):
        pkg.does_not_exist


def test_interrupt_with_vectorized_runs_rejected(rng):
    """ADVICE r1: ordered io_callback is unsupported under vmap — the
    combination must fail with a clear error, not an opaque trace error."""
    import pytest as _pytest

    V = rng.uniform(0.1, 1.0, (16, 12)).astype(np.float32)
    cfg = NmfConfig(rank=2, num_iterations=4, num_runs=3,
                    vectorize_runs=True)
    with _pytest.raises(ValueError, match="vectorize_runs"):
        compute(V, cfg, interrupt=lambda: False)


def test_verbosity_three_prints_elapsed(rng, capsys):
    """Verbosity 3 = reference C17's full record: per-check lines carry
    elapsed wall-clock ms."""
    from nmftpu import NmfConfig
    from nmftpu.driver import compute

    V = rng.uniform(0.1, 1.0, (16, 12)).astype(np.float32)
    compute(V, NmfConfig(rank=2, num_iterations=10, check_interval=5,
                         verbosity=3))
    out = capsys.readouterr().out
    assert "elapsed" in out and "ms" in out
