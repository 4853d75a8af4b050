"""Serving fuzz: randomized (shape, method, table dtype, exclusion
width, k) combinations of the Recommender surface checked against the
brute-force oracle. The round-4 advisor found a padded-table fold-in
hole and a tiny-catalog certified hole in exactly this combinatorial
space; this matrix walks it systematically (CPU: reservoir runs the
kernel in interpret mode)."""

import numpy as np
import pytest

from nmftpu.serving import Recommender
from nmftpu.sparse import SparseCSR


def _mk(rng, n, m, r):
    W = rng.uniform(0.05, 1.0, (n, r)).astype(np.float32)
    H = rng.uniform(0.05, 1.0, (r, m)).astype(np.float32)
    return W, H


def _train_csr(rng, n, m, max_seen):
    counts = rng.integers(0, max_seen + 1, n)
    indptr = np.concatenate([[0], np.cumsum(counts)]).astype(np.int64)
    cols = []
    for u in range(n):
        cols.append(rng.choice(m, counts[u], replace=False))
    indices = (np.concatenate(cols).astype(np.int64) if cols
               else np.zeros(0, np.int64))
    for u in range(n):  # CSR wants sorted columns
        lo, hi = indptr[u], indptr[u + 1]
        indices[lo:hi] = np.sort(indices[lo:hi])
    return SparseCSR(indptr, indices,
                     np.ones(len(indices), np.float32), (n, m))


CASES = [
    # (seed, n, m, r, method, dtype, max_seen, k, slots)
    (0, 12, 97, 5, "exact", "float32", 0, 7, 64),
    (1, 12, 97, 5, "exact", "float32", 30, 7, 64),
    (2, 20, 130, 4, "approx", "float32", 15, 9, 64),
    (3, 20, 130, 4, "approx", "bfloat16", 15, 9, 64),
    (4, 16, 200, 6, "reservoir", "float32", 0, 11, 64),
    (5, 16, 200, 6, "reservoir", "bfloat16", 12, 11, 64),
    (6, 16, 200, 6, "reservoir", "int8", 12, 11, 256),
    (7, 10, 33, 3, "reservoir", "float32", 8, 13, 16),  # k near m-S
    (8, 14, 64, 4, "exact", "int8", 60, 5, 64),          # wide seen
    (9, 18, 150, 5, "approx", "float32", 120, 6, 64),    # wide seen
]


@pytest.mark.parametrize(
    "seed,n,m,r,method,dtype,max_seen,k,slots", CASES)
def test_serving_fuzz_case(seed, n, m, r, method, dtype, max_seen, k,
                           slots):
    rng = np.random.default_rng(seed)
    W, H = _mk(rng, n, m, r)
    csr = _train_csr(rng, n, m, max_seen) if max_seen else None
    # SparseCSR satisfies the train protocol directly (.to_csr)
    rec = Recommender(
        W, H, train=csr, method=method, table_dtype=dtype,
        reservoir_slots=slots, block=max(16, m // 4),
    )
    users = rng.choice(n, min(6, n), replace=False)
    s, i = rec.recommend(users, k=k, exclude_seen=csr is not None)

    full = W @ H
    masked = full.copy()
    if csr is not None:
        for u in range(n):
            masked[u, csr.indices[csr.indptr[u]:csr.indptr[u + 1]]] \
                = -np.inf
    # the exact-set oracle applies to f32 exact scans always, and to
    # the reservoir only when every item owns a slot (slots >= m makes
    # the scan exhaustive); reservoir_slots is unused by method="exact"
    exact_full = rec.table_dtype == "float32" and (
        method == "exact" or (method == "reservoir" and slots >= m))
    for row, u in enumerate(users):
        got = i[row][np.isfinite(s[row])]
        # no seen item ever surfaces, no duplicates, ids in range
        if csr is not None:
            su = set(csr.indices[csr.indptr[u]:csr.indptr[u + 1]]
                     .tolist())
            assert not (su & set(got.tolist())), (row, u)
        assert len(set(got.tolist())) == len(got)
        assert ((got >= 0) & (got < m)).all()
        avail = int(np.isfinite(masked[u]).sum())
        assert len(got) == min(k, avail), (len(got), k, avail)
        if exact_full:
            # f32 exact / whole-catalog reservoir: exact top-k up to
            # ties
            want = set(np.argsort(-masked[u])[:len(got)].tolist())
            assert set(got.tolist()) == want, (row, u)

    # certified surface on the same data: certified rows must be the
    # exact top-k; fallback='exact' makes every row exact
    s2, i2, cert = rec.recommend_certified(
        users, k=k, exclude_seen=csr is not None, fallback="exact")
    for row, u in enumerate(users):
        got = i2[row][np.isfinite(s2[row])]
        want_order = np.argsort(-masked[u])[:len(got)]
        # compare score SETS (bf16/int8 tables rescore at reduced
        # precision; ties may swap ids of equal true score)
        np.testing.assert_allclose(
            np.sort(full[u, got]), np.sort(full[u, want_order]),
            rtol=2e-2, atol=1e-3)
        if csr is not None:
            su = set(csr.indices[csr.indptr[u]:csr.indptr[u + 1]]
                     .tolist())
            assert not (su & set(got.tolist()))


MESH_CASES = [
    # (seed, n, m, r, method, dtype, max_seen, k, slots)
    (20, 16, 96, 4, "exact", "float32", 10, 7, 64),
    (21, 16, 96, 4, "approx", "float32", 10, 7, 64),
    (22, 16, 128, 5, "reservoir", "float32", 6, 9, 64),
    (23, 16, 128, 5, "reservoir", "int8", 6, 9, 64),
]


@pytest.mark.parametrize(
    "seed,n,m,r,method,dtype,max_seen,k,slots", MESH_CASES)
def test_serving_fuzz_mesh_case(seed, n, m, r, method, dtype, max_seen,
                                k, slots):
    """Mesh twin of the fuzz matrix: the sharded scan + certificate
    must match the single-device Recommender on the same data (m
    divisible by the items axis)."""
    from nmftpu.parallel import make_grid_mesh

    rng = np.random.default_rng(seed)
    W, H = _mk(rng, n, m, r)
    csr = _train_csr(rng, n, m, max_seen) if max_seen else None
    mesh = make_grid_mesh((2, 4))
    rec_m = Recommender(W, H, train=csr, mesh=mesh, method=method,
                        table_dtype=dtype, reservoir_slots=slots,
                        block=m // 8)
    rec_1 = Recommender(W, H, train=csr, method="exact",
                        table_dtype=dtype, block=m // 4)
    users = rng.choice(n, 5, replace=False)
    s_m, i_m = rec_m.recommend(users, k=k, exclude_seen=csr is not None)
    s_1, i_1 = rec_1.recommend(users, k=k, exclude_seen=csr is not None)
    for row, u in enumerate(users):
        got_m = set(i_m[row][np.isfinite(s_m[row])].tolist())
        got_1 = set(i_1[row][np.isfinite(s_1[row])].tolist())
        if method in ("exact", "reservoir") and slots >= m // 4:
            # reservoir per-shard slots >= local m -> exhaustive scan;
            # int8 near-ties may swap at equal quantized score, so
            # compare through the true scores
            full = W @ H
            np.testing.assert_allclose(
                np.sort([full[u, j] for j in got_m]),
                np.sort([full[u, j] for j in got_1]),
                rtol=2e-2, atol=1e-3)
        if csr is not None:
            su = set(csr.indices[csr.indptr[u]:csr.indptr[u + 1]]
                     .tolist())
            assert not (su & got_m)

    # mesh certified + all-exact fallback agrees with brute force
    s_c, i_c, cert = rec_m.recommend_certified(
        users, k=k, exclude_seen=csr is not None, fallback="exact")
    full = W @ H
    masked = full.copy()
    if csr is not None:
        for u in range(n):
            masked[u, csr.indices[csr.indptr[u]:csr.indptr[u + 1]]] \
                = -np.inf
    for row, u in enumerate(users):
        got = i_c[row][np.isfinite(s_c[row])]
        want = np.argsort(-masked[u])[:len(got)]
        np.testing.assert_allclose(
            np.sort(full[u, got]), np.sort(full[u, want]),
            rtol=2e-2, atol=1e-3)
