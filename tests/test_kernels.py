"""Pallas kernel correctness vs. the jnp oracle, run with interpret=True on
CPU (SURVEY.md §4.1: Pallas kernels vs. their jnp equivalents)."""

import numpy as np
import pytest

from nmftpu.kernels import dense_mu as K
from nmftpu.linalg import dense as D


def _factors(rng, n, m, r):
    V = rng.uniform(0.1, 2.0, (n, m)).astype(np.float32)
    W = rng.uniform(0.1, 1.0, (n, r)).astype(np.float32)
    H = rng.uniform(0.1, 1.0, (r, m)).astype(np.float32)
    return V, W, H


# bf16 MXU passes: tolerances are bf16-level relative
RTOL = 2e-2
ATOL = 1e-3


@pytest.mark.parametrize("shape", [(64, 80, 8), (300, 200, 32),
                                   (128, 384, 128)])
def test_h_update_fused_matches_jnp(rng, shape):
    n, m, r = shape
    V, W, H = _factors(rng, n, m, r)
    G = W.T @ W
    got = np.asarray(K.h_update_fused(
        V, W, H, G, eps=1e-9, tile_m=128, tile_n=128, interpret=True
    ))
    want = np.asarray(D.mu_update_h_frobenius(V, W, H, 1e-9))
    assert got.shape == want.shape
    np.testing.assert_allclose(got, want, rtol=RTOL, atol=ATOL)


@pytest.mark.parametrize("shape", [(64, 80, 8), (200, 300, 32)])
def test_w_update_fused_matches_jnp(rng, shape):
    n, m, r = shape
    V, W, H = _factors(rng, n, m, r)
    G = H @ H.T
    got = np.asarray(K.w_update_fused(
        V, W, H, G, eps=1e-9, tile_m=128, tile_n=128, interpret=True
    ))
    want = np.asarray(D.mu_update_w_frobenius(V, W, H, 1e-9))
    assert got.shape == want.shape
    np.testing.assert_allclose(got, want, rtol=RTOL, atol=ATOL)


def test_full_fused_iteration_matches_jnp(rng):
    V, W, H = _factors(rng, 150, 170, 16)
    Wf, Hf = K.mu_update_frobenius_fused(V, W, H, interpret=True)
    Wd, Hd = D.mu_update_frobenius(V, W, H)
    np.testing.assert_allclose(np.asarray(Wf), np.asarray(Wd),
                               rtol=RTOL, atol=ATOL)
    np.testing.assert_allclose(np.asarray(Hf), np.asarray(Hd),
                               rtol=RTOL, atol=ATOL)


def test_fused_multiply_divide(rng):
    X = rng.uniform(0.1, 1.0, (32, 128)).astype(np.float32)
    num = rng.uniform(0.1, 1.0, (32, 128)).astype(np.float32)
    den = rng.uniform(0.1, 1.0, (32, 128)).astype(np.float32)
    got = np.asarray(K.fused_multiply_divide(X, num, den, eps=1e-9,
                                             interpret=True))
    np.testing.assert_allclose(got, X * num / (den + 1e-9), rtol=1e-6)


def test_fused_descends_objective(rng):
    """Monotone descent must survive the bf16 kernel precision."""
    V, W, H = _factors(rng, 120, 96, 8)
    prev = float(D.frobenius_error_sq(V, W, H))
    for _ in range(10):
        W, H = K.mu_update_frobenius_fused(V, W, H, interpret=True)
        cur = float(D.frobenius_error_sq(V, np.asarray(W), np.asarray(H)))
        assert cur <= prev * (1 + 1e-3)
        prev = cur
