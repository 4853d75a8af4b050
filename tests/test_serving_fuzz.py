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


@pytest.mark.parametrize("dtype,method,slots", [
    ("float32", "approx", 64),
    ("bfloat16", "exact", 64),
    ("int8", "reservoir", 128),   # padded table (m % slots != 0)
])
def test_foldin_fuzz(dtype, method, slots):
    """Fold-in across table dtypes/methods vs the direct regularized
    NNLS oracle on the true f32 table: weighted + unweighted histories,
    batch == per-user parity, history exclusion end-to-end."""
    rng = np.random.default_rng(11)
    n, m, r = 10, 90, 5
    W, H = _mk(rng, n, m, r)
    rec = Recommender(W, H, method=method, table_dtype=dtype,
                      reservoir_slots=slots, block=32)
    hists = [
        np.array([3, 17, 55]),
        (np.array([2, 60, 80, 88]), np.array([2.0, 1.0, 4.5, 3.0],
                                             np.float32)),
        np.array([7]),
    ]
    Wb = rec.fold_in_batch(hists, lambda_w=1e-3)
    assert Wb.shape == (3, r) and (Wb >= 0).all()
    # oracle: the ALS fold-in solves against the FULL row (zeros are
    # data, sklearn transform semantics): A = H H^T + lambda I,
    # rhs = H v_full = H[:, ids] @ vals, then clamp
    for u, h in enumerate(hists):
        ids, vals = h if isinstance(h, tuple) else (h, None)
        v = np.ones(len(ids), np.float32) if vals is None else vals
        A = H @ H.T + 1e-3 * np.eye(r)
        w_star = np.maximum(np.linalg.solve(A, H[:, ids] @ v), 0.0)
        tol = 0.35 if dtype == "int8" else 0.05
        denom = max(float(np.linalg.norm(w_star)), 1e-6)
        assert np.linalg.norm(Wb[u] - w_star) / denom < tol, (u, dtype)
        w1 = rec.fold_in(ids, vals, lambda_w=1e-3)
        np.testing.assert_allclose(Wb[u], w1, rtol=1e-5, atol=1e-6)
    s, i = rec.recommend_from_history_batch(hists, k=6,
                                            lambda_w=1e-3)
    for u, h in enumerate(hists):
        ids = h[0] if isinstance(h, tuple) else h
        got = i[u][np.isfinite(s[u])]
        assert not (set(np.atleast_1d(ids).tolist()) & set(got.tolist()))


def test_mesh_save_load_roundtrip(tmp_path):
    """save() on a mesh Recommender persists the unpadded f32 table;
    load(mesh=...) re-shards and serves identically."""
    from nmftpu.parallel import make_grid_mesh

    rng = np.random.default_rng(12)
    W, H = _mk(rng, 12, 96, 4)
    mesh = make_grid_mesh((2, 4))
    rec = Recommender(W, H, train=_train_csr(rng, 12, 96, 8),
                      mesh=mesh, method="reservoir", reservoir_slots=16,
                      block=12)
    rec.save(str(tmp_path / "m"))
    rec2 = Recommender.load(str(tmp_path / "m"), mesh=mesh)
    assert rec2.method == "reservoir" and rec2.n_items == 96
    s1, i1 = rec.recommend([0, 5], k=5)
    s2, i2 = rec2.recommend([0, 5], k=5)
    np.testing.assert_array_equal(i1, i2)
