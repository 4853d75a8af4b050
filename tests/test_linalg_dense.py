"""Unit tests for the pure-jnp update math vs. hand-rolled NumPy
(SURVEY.md §4.1): formula checks, nonnegativity invariants, and the
Lee–Seung monotone-descent guarantee."""

import numpy as np
import pytest

from nmftpu.linalg import dense as D


def _np_mu_fro(V, W, H, eps):
    W = W * ((V @ H.T) / (W @ (H @ H.T) + eps))
    H = H * ((W.T @ V) / ((W.T @ W) @ H + eps))
    return W, H


def _rand_factors(rng, n, m, r):
    V = rng.uniform(0.1, 2.0, (n, m)).astype(np.float32)
    W = rng.uniform(0.1, 1.0, (n, r)).astype(np.float32)
    H = rng.uniform(0.1, 1.0, (r, m)).astype(np.float32)
    return V, W, H


def test_mu_frobenius_matches_numpy(rng):
    V, W, H = _rand_factors(rng, 23, 17, 4)
    Wj, Hj = D.mu_update_frobenius(V, W, H, eps=1e-9, order="WH")
    Wn, Hn = _np_mu_fro(V, W, H, 1e-9)
    np.testing.assert_allclose(np.asarray(Wj), Wn, rtol=2e-5)
    np.testing.assert_allclose(np.asarray(Hj), Hn, rtol=2e-5)


def test_mu_kl_matches_numpy(rng):
    V, W, H = _rand_factors(rng, 19, 13, 3)
    eps = 1e-9
    # numpy KL, W first then H (order="WH")
    WH = W @ H
    Wn = W * (((V / (WH + eps)) @ H.T) / np.maximum(H.sum(axis=1), eps))
    WH = Wn @ H
    Hn = H * ((Wn.T @ (V / (WH + eps))) / np.maximum(Wn.sum(axis=0), eps)[:, None])
    Wj, Hj = D.mu_update_kl(V, W, H, eps=eps, order="WH")
    np.testing.assert_allclose(np.asarray(Wj), Wn, rtol=2e-5)
    np.testing.assert_allclose(np.asarray(Hj), Hn, rtol=2e-5)


def test_frobenius_error_gram_identity(rng):
    V, W, H = _rand_factors(rng, 31, 29, 5)
    direct = np.linalg.norm(V - W @ H, "fro")
    tricked = float(D.frobenius_error(V, W, H))
    np.testing.assert_allclose(tricked, direct, rtol=1e-4)
    r = float(D.rmsd(V, W, H))
    np.testing.assert_allclose(r, direct / np.sqrt(V.size), rtol=1e-4)


def test_kl_error_matches_definition(rng):
    V, W, H = _rand_factors(rng, 11, 9, 3)
    V[0, :3] = 0.0  # exercise the zero-entry branch
    WH = W @ H
    mask = V > 0
    expected = float(
        np.sum(np.where(mask, V * np.log(np.where(mask, V, 1.0) / WH), 0.0))
        - V.sum()
        + WH.sum()
    )
    got = float(D.kl_error(V, W, H))
    np.testing.assert_allclose(got, expected, rtol=1e-4)


@pytest.mark.parametrize("objective", ["fro", "kl"])
def test_mu_monotone_descent_and_nonnegative(rng, objective):
    """Lee–Seung guarantee: the objective is non-increasing under MU."""
    V, W, H = _rand_factors(rng, 40, 30, 6)
    err_fn = (
        (lambda V, W, H: float(D.frobenius_error_sq(V, W, H)))
        if objective == "fro"
        else (lambda V, W, H: float(D.kl_error(V, W, H)))
    )
    upd = D.mu_update_frobenius if objective == "fro" else D.mu_update_kl
    prev = err_fn(V, W, H)
    for _ in range(25):
        W, H = upd(V, W, H, eps=1e-12)
        cur = err_fn(V, np.asarray(W), np.asarray(H))
        assert cur <= prev * (1 + 1e-5), "objective increased"
        prev = cur
    assert np.all(np.asarray(W) >= 0) and np.all(np.asarray(H) >= 0)


def test_als_family_nonnegative_and_descending(rng):
    V, W, H = _rand_factors(rng, 30, 25, 4)
    for upd in (
        lambda V, W, H: D.als_update(V, W, H),
        lambda V, W, H: D.acls_update(V, W, H, lambda_w=0.05, lambda_h=0.05),
        lambda V, W, H: D.ahcls_update(
            V, W, H, lambda_w=0.05, lambda_h=0.05, alpha_w=0.6, alpha_h=0.6
        ),
        lambda V, W, H: D.gdcls_update(V, W, H, lambda_tik=0.05),
    ):
        Wc, Hc = W.copy(), H.copy()
        first = float(D.frobenius_error(V, Wc, Hc))
        for _ in range(15):
            Wc, Hc = upd(V, Wc, Hc)
        last = float(D.frobenius_error(V, np.asarray(Wc), np.asarray(Hc)))
        assert np.all(np.asarray(Wc) >= 0)
        assert np.all(np.asarray(Hc) >= 0)
        assert last < first


def test_nsnmf_smoothing_matrix_properties():
    S = np.asarray(D.nsnmf_smoothing_matrix(6, theta=0.4))
    np.testing.assert_allclose(S.sum(axis=0), np.ones(6), rtol=1e-6)
    assert np.all(S >= 0)
    np.testing.assert_allclose(
        np.asarray(D.nsnmf_smoothing_matrix(6, theta=0.0)), np.eye(6),
        atol=1e-7,
    )


def test_nsnmf_update_descends(rng):
    V, W, H = _rand_factors(rng, 25, 20, 5)
    S = D.nsnmf_smoothing_matrix(5, theta=0.3)
    first = float(D.frobenius_error(V, W, np.asarray(S) @ H))
    for _ in range(20):
        W, H = D.nsnmf_update(V, W, H, S)
    last = float(D.frobenius_error(V, np.asarray(W), np.asarray(S @ H)))
    assert last < first


def test_weighted_mu_descends_weighted_objective(rng):
    V, W, H = _rand_factors(rng, 20, 15, 4)
    C = 1.0 + 2.0 * V
    def werr(W, H):
        R = V - np.asarray(W) @ np.asarray(H)
        return float(np.sum(C * R * R))
    prev = werr(W, H)
    for _ in range(20):
        W, H = D.mu_update_frobenius_weighted(V, C, W, H)
        cur = werr(W, H)
        assert cur <= prev * (1 + 1e-5)
        prev = cur
