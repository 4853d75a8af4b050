"""Quantized (int8-V) fused kernel tests: exact parity with the jnp oracle
on the dequantized matrix, and bounded quantization error on raw data."""

import numpy as np
import pytest

from nmftpu.kernels import quantized as Q
from nmftpu.linalg import dense as D


def _factors(rng, n, m, r):
    V = rng.uniform(0.1, 2.0, (n, m)).astype(np.float32)
    W = rng.uniform(0.1, 1.0, (n, r)).astype(np.float32)
    H = rng.uniform(0.1, 1.0, (r, m)).astype(np.float32)
    return V, W, H


def test_quantize_v_roundtrip_error_bound(rng):
    V = rng.uniform(0.0, 5.0, (50, 40)).astype(np.float32)
    Vq, scale = Q.quantize_v(V)
    recon = np.asarray(Vq, np.float32) * float(scale)
    assert np.max(np.abs(recon - V)) <= float(scale) / 2 + 1e-6


def test_quantize_exact_on_rating_grid():
    """Half-star ratings with max 6.35 quantize exactly (scale = .05)."""
    V = (np.arange(128).reshape(8, 16) % 13) * 0.5
    V[0, 0] = 6.35
    Vq, scale = Q.quantize_v(V.astype(np.float32))
    recon = np.asarray(Vq, np.float32) * float(scale)
    np.testing.assert_allclose(recon, V, atol=1e-6)


@pytest.mark.parametrize("shape", [(64, 80, 8), (300, 200, 32)])
def test_quantized_update_matches_jnp_on_dequantized(rng, shape):
    """Kernel output == jnp MU applied to (scale * Vq) — quantization is
    the ONLY error source; the kernel math itself is bf16-exact vs jnp."""
    n, m, r = shape
    V, W, H = _factors(rng, n, m, r)
    Vq, scale = Q.quantize_v(V)
    Vdq = np.asarray(Vq, np.float32) * float(scale)

    Wq, Hq = Q.mu_update_frobenius_q(Vq, scale, W, H, interpret=True)
    Wd, Hd = D.mu_update_frobenius(Vdq, W, H)
    np.testing.assert_allclose(np.asarray(Wq), np.asarray(Wd),
                               rtol=2e-2, atol=1e-3)
    np.testing.assert_allclose(np.asarray(Hq), np.asarray(Hd),
                               rtol=2e-2, atol=1e-3)


def test_quantized_descends_true_objective(rng):
    """Descent on the TRUE (unquantized) objective must survive int8 V."""
    V, W, H = _factors(rng, 120, 96, 8)
    Vq, scale = Q.quantize_v(V)
    first = float(D.frobenius_error_sq(V, W, H))
    for _ in range(10):
        W, H = Q.mu_update_frobenius_q(Vq, scale, W, H, interpret=True)
        W, H = np.asarray(W), np.asarray(H)
    last = float(D.frobenius_error_sq(V, W, H))
    assert last < first * 0.9
