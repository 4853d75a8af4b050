"""Checkpoint/resume tests (SURVEY.md §5.3–5.4): save/restore round-trip,
kill-and-resume equivalence with an uninterrupted run, sharded resume."""

import dataclasses

import numpy as np
import pytest

from nmftpu import Initialization, NmfConfig
from nmftpu import checkpoint as ckpt
from nmftpu.driver import compute
from nmftpu import sparse as hs


def _problem(rng, n=30, m=24, r=3):
    V = rng.uniform(0.1, 2.0, (n, m)).astype(np.float32)
    W0 = rng.uniform(0.1, 1.0, (n, r)).astype(np.float32)
    H0 = rng.uniform(0.1, 1.0, (r, m)).astype(np.float32)
    return V, W0, H0


def test_save_load_roundtrip(tmp_path, rng):
    V, W0, H0 = _problem(rng)
    cfg = NmfConfig(rank=3, num_iterations=10)
    ckpt.save(str(tmp_path / "ck"), W0, H0, iteration=7, config=cfg)
    ck = ckpt.load(str(tmp_path / "ck"))
    np.testing.assert_allclose(np.asarray(ck.W), W0, rtol=1e-6)
    np.testing.assert_allclose(np.asarray(ck.H), H0, rtol=1e-6)
    assert ck.iteration == 7


def test_resume_equals_uninterrupted(tmp_path, rng):
    """Run 40 iters straight vs. 20 + checkpoint + resume 20: same result
    (restart-based recovery, SURVEY.md §5.3)."""
    V, W0, H0 = _problem(rng)
    base = NmfConfig(
        rank=3, num_iterations=40,
        init_method=Initialization.COPY_EXISTING,
    )
    full = compute(V, base, W0=W0, H0=H0)

    half = dataclasses.replace(base, num_iterations=20)
    first = compute(V, half, W0=W0, H0=H0)
    ckpt.save(
        str(tmp_path / "ck"), np.asarray(first.W), np.asarray(first.H),
        iteration=20, config=base,
    )
    resumed = ckpt.resume(str(tmp_path / "ck"), V, base)
    np.testing.assert_allclose(
        resumed.frobenius_error, full.frobenius_error, rtol=1e-5
    )
    np.testing.assert_allclose(
        np.asarray(resumed.W), np.asarray(full.W), rtol=1e-4, atol=1e-6
    )


def test_resume_rejects_config_mismatch(tmp_path, rng):
    V, W0, H0 = _problem(rng)
    cfg = NmfConfig(rank=3, num_iterations=10)
    ckpt.save(str(tmp_path / "ck"), W0, H0, iteration=5, config=cfg)
    other = NmfConfig(rank=3, num_iterations=10, eps=1e-5)
    with pytest.raises(ValueError):
        ckpt.resume(str(tmp_path / "ck"), V, other)
    # strict=False allows it
    res = ckpt.resume(str(tmp_path / "ck"), V, other, strict=False)
    assert np.isfinite(res.frobenius_error)


def test_resume_sharded(tmp_path, rng):
    from nmftpu.parallel import make_grid_mesh

    V, W0, H0 = _problem(rng, 40, 32, 4)
    V[V < 1.0] = 0.0
    V[:, 0] += 0.5
    sp = hs.from_dense(V)
    cfg = NmfConfig(
        rank=4, num_iterations=20, init_method=Initialization.COPY_EXISTING,
    )
    mesh = make_grid_mesh((2, 4))
    ckpt.save(str(tmp_path / "ck"), W0, H0, iteration=10, config=cfg)
    res = ckpt.resume(
        str(tmp_path / "ck"), sp, cfg, mesh=mesh, chunk=256
    )
    assert res.W.shape == (40, 4)
    assert np.isfinite(res.frobenius_error)

def test_resume_at_budget_returns_factors_unchanged(tmp_path, rng):
    """Resuming a checkpoint already at num_iterations must not run extra
    updates (ADVICE r1: the old max(..., 1) clamp ran one spurious step)."""
    V, W0, H0 = _problem(rng)
    cfg = NmfConfig(rank=3, num_iterations=10)
    ckpt.save(str(tmp_path / "ck"), W0, H0, iteration=10, config=cfg)
    res = ckpt.resume(str(tmp_path / "ck"), V, cfg)
    assert res.num_iterations == 0
    np.testing.assert_allclose(np.asarray(res.W), W0, rtol=1e-6)
    np.testing.assert_allclose(np.asarray(res.H), H0, rtol=1e-6)
    # the evaluate-only pass reports REAL errors and does not claim a
    # convergence it never tested (code-review r2)
    assert not res.converged
    expect = np.linalg.norm(V - W0 @ H0)
    np.testing.assert_allclose(res.frobenius_error, expect, rtol=5e-4)
    assert np.isfinite(res.rmsd) and np.isfinite(res.error)


def test_resume_at_budget_sharded_and_sparse(tmp_path, rng):
    """The zero-remaining evaluate-only pass works on the sparse and
    sharded drivers too (not just the dense path)."""
    from nmftpu.parallel import make_grid_mesh
    from nmftpu.sparse_ops import compute_sparse

    V, W0, H0 = _problem(rng, 40, 32, 4)
    V[V < 1.0] = 0.0
    V[:, 0] += 0.5
    sp = hs.from_dense(V)
    cfg = NmfConfig(rank=4, num_iterations=10)
    ckpt.save(str(tmp_path / "ck"), W0, H0, iteration=10, config=cfg)
    expect = np.linalg.norm(V - W0 @ H0)

    res = ckpt.resume(str(tmp_path / "ck"), sp, cfg)
    assert res.num_iterations == 0 and not res.converged
    np.testing.assert_allclose(res.frobenius_error, expect, rtol=5e-4)

    mesh = make_grid_mesh((2, 4))
    res = ckpt.resume(str(tmp_path / "ck"), sp, cfg, mesh=mesh, chunk=256)
    assert res.num_iterations == 0 and not res.converged
    np.testing.assert_allclose(res.frobenius_error, expect, rtol=5e-4)
    np.testing.assert_allclose(np.asarray(res.W), W0, rtol=1e-5, atol=1e-7)
