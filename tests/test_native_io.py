"""Native C++ IO library parity tests: the python loader in
nmftpu/data/movielens.py is the semantic reference; the native parser must
produce identical remapped matrices. Skipped when the library cannot be
built (no g++)."""

import numpy as np
import pytest

from nmftpu import native_loader
from nmftpu.data import load_movielens

pytestmark = pytest.mark.skipif(
    not (native_loader.available() or native_loader.build()),
    reason="native library unavailable and could not be built",
)


def _write_ml100k(tmp_path):
    rows = [
        (1, 10, 5.0, 100), (1, 20, 3.0, 200), (1, 30, 4.0, 50),
        (2, 10, 2.0, 300), (2, 40, 1.5, 400),
        (5, 20, 4.5, 10),
    ]
    p = tmp_path / "u.data"
    p.write_text("\n".join(f"{u}\t{i}\t{r}\t{t}" for u, i, r, t in rows))
    return str(p)


def _write_ml20m(tmp_path):
    rows = [(3, 7, 4.0, 11), (3, 9, 2.5, 22), (8, 7, 5.0, 33)]
    p = tmp_path / "ratings.csv"
    p.write_text(
        "userId,movieId,rating,timestamp\n"
        + "\n".join(f"{u},{i},{r},{t}" for u, i, r, t in rows)
    )
    return str(p)


@pytest.mark.parametrize("writer", [_write_ml100k, _write_ml20m])
def test_native_matches_python(tmp_path, writer):
    path = writer(tmp_path)
    nat = load_movielens(path, use_native=True)
    py = load_movielens(path, use_native=False)
    assert nat.matrix.shape == py.matrix.shape
    np.testing.assert_array_equal(nat.matrix.todense(), py.matrix.todense())
    np.testing.assert_array_equal(nat.user_ids, py.user_ids)
    np.testing.assert_array_equal(nat.item_ids, py.item_ids)


def test_native_implicit(tmp_path):
    path = _write_ml100k(tmp_path)
    nat = load_movielens(path, use_native=True, implicit=True)
    assert set(np.unique(nat.matrix.data)) == {1.0}


def test_native_coo_to_csr(rng):
    n_rows = 17
    rows = rng.integers(0, n_rows, 200).astype(np.int32)
    cols = rng.integers(0, 23, 200).astype(np.int32)
    indptr, perm = native_loader.coo_to_csr(rows, cols, n_rows)
    assert indptr[-1] == 200
    sorted_rows = rows[perm]
    assert np.all(np.diff(sorted_rows) >= 0)
    # within each row, columns ascend
    for r in range(n_rows):
        seg = cols[perm[indptr[r]:indptr[r + 1]]]
        assert np.all(np.diff(seg) >= 0)
        assert np.all(rows[perm[indptr[r]:indptr[r + 1]]] == r)


def test_native_error_path(tmp_path):
    with pytest.raises(RuntimeError):
        native_loader.parse_movielens(str(tmp_path / "missing.dat"))


def test_native_parse_speed_sanity(tmp_path, rng):
    """Native parser handles a larger file and matches python output."""
    n = 20000
    u = rng.integers(1, 500, n)
    i = rng.integers(1, 800, n)
    r = rng.integers(1, 10, n) / 2.0
    t = rng.integers(1, 10**9, n)
    p = tmp_path / "ratings.csv"
    p.write_text(
        "userId,movieId,rating,timestamp\n"
        + "\n".join(
            f"{a},{b},{c},{d}" for a, b, c, d in zip(u, i, r, t)
        )
    )
    nat = load_movielens(str(p), use_native=True)
    py = load_movielens(str(p), use_native=False)
    np.testing.assert_allclose(
        nat.matrix.todense(), py.matrix.todense(), rtol=1e-6
    )


def test_native_skips_nonrecord_lines(tmp_path):
    """Headers of any case and malformed lines must be SKIPPED, not
    fabricated as (0,0,0) records (which would inject a phantom raw id
    0 and shift the contiguous remap against the python loader)."""
    rows = [(3, 7, 4.0, 11), (3, 9, 2.5, 22), (8, 7, 5.0, 33)]
    body = "\n".join(f"{u},{i},{r},{t}" for u, i, r, t in rows)

    # mixed-case header: both loaders must skip it and agree
    p = tmp_path / "ratings.csv"
    p.write_text("UserId,MovieId,Rating,Timestamp\n" + body + "\n")
    nat = load_movielens(str(p), use_native=True)
    py = load_movielens(str(p), use_native=False)
    assert nat.matrix.nnz == 3
    np.testing.assert_array_equal(nat.user_ids, [3, 8])
    np.testing.assert_array_equal(
        nat.matrix.todense(), py.matrix.todense()
    )

    # comment/short lines: the native parser skips them (the python
    # genfromtxt loader ERRORS on such files, so no parity to match) —
    # it must not fabricate (0,0,0) records
    p2 = tmp_path / "messy.csv"
    p2.write_text("UserId,MovieId,Rating,Timestamp\n" + body
                  + "\n# trailing comment line\n3,\n")
    nat2 = load_movielens(str(p2), use_native=True)
    assert nat2.matrix.nnz == 3
    np.testing.assert_array_equal(nat2.user_ids, [3, 8])
    np.testing.assert_array_equal(nat2.item_ids, [7, 9])


@pytest.mark.skipif(not native_loader.available(),
                    reason="native lib not built")
def test_native_csr_build_matches_numpy(rng):
    """nmio_csr_build == the numpy to_csr path (indptr/indices exact;
    data identical on unique coordinates)."""
    if not native_loader.has_csr_build():
        pytest.skip("stale native lib without nmio_csr_build")
    from nmftpu.sparse import SparseCOO

    n, m, nnz = 500, 300, 20_000
    # unique coordinates so ordering among duplicates cannot differ
    flat = rng.choice(n * m, nnz, replace=False)
    rows = (flat // m).astype(np.int32)
    cols = (flat % m).astype(np.int32)
    vals = rng.uniform(0.1, 5.0, nnz).astype(np.float32)
    indptr, indices, data = native_loader.csr_build(rows, cols, vals, n)
    import os
    os.environ["NMFTPU_NATIVE_CSR"] = "0"
    try:
        ref = SparseCOO(rows, cols, vals, (n, m)).to_csr()
    finally:
        os.environ.pop("NMFTPU_NATIVE_CSR")
    np.testing.assert_array_equal(indptr, ref.indptr)
    np.testing.assert_array_equal(indices, ref.indices)
    np.testing.assert_array_equal(data, ref.data)


@pytest.mark.skipif(not native_loader.available(),
                    reason="native lib not built")
def test_native_ell_build_matches_numpy(rng):
    """nmio_ell_count/fill reproduce the numpy bucketed-ELL builder
    bucket for bucket, including the padding policy and the sorted
    out_row tail, across power-law row lengths and long rows that split
    into multiple segments."""
    if not native_loader.has_csr_build():
        pytest.skip("stale native lib without the ELL entry points")
    from nmftpu.sparse import SparseCOO
    from nmftpu.sparse_ell import DEFAULT_BUCKETS, build_ell_rows

    n, m = 400, 9000
    lens = np.minimum(rng.zipf(1.3, n), 4000)
    rows = np.repeat(np.arange(n, dtype=np.int32), lens)
    cols = rng.integers(0, m, len(rows)).astype(np.int32)
    vals = rng.uniform(0.1, 5.0, len(rows)).astype(np.float32)
    csr = SparseCOO(rows, cols, vals, (n, m)).to_csr()

    seg_max, chunk = 512, 64
    ref = build_ell_rows(csr, seg_max=seg_max, chunk_segments=chunk)

    def pad(ns):
        ns_p = ((ns + chunk - 1) // chunk) * (chunk if ns > chunk else 1)
        return max(ns_p, ns)

    nat = native_loader.ell_build(csr.indptr, csr.indices, csr.data,
                                  seg_max, DEFAULT_BUCKETS,
                                  pad_segments=pad)
    assert len(nat) == len(ref.buckets)
    for (v, c, r, ns, w), rb in zip(nat, ref.buckets):
        assert w == rb.width
        np.testing.assert_array_equal(v, np.asarray(rb.vals))
        np.testing.assert_array_equal(c, np.asarray(rb.cols))
        np.testing.assert_array_equal(r, np.asarray(rb.out_row))


@pytest.mark.skipif(not native_loader.available(),
                    reason="native lib not built")
def test_native_paths_end_to_end_equivalence(rng, monkeypatch):
    """With the size gate lowered, a full factorization through the
    native CSR+ELL builders matches the numpy-built run exactly."""
    if not native_loader.has_csr_build():
        pytest.skip("stale native lib")
    from nmftpu import NmfConfig
    from nmftpu.sparse import SparseCOO
    from nmftpu.sparse_ops import compute_sparse

    n, m, nnz = 300, 200, 5000
    flat = rng.choice(n * m, nnz, replace=False)
    coo = SparseCOO((flat // m).astype(np.int32),
                    (flat % m).astype(np.int32),
                    rng.uniform(0.1, 5.0, nnz).astype(np.float32),
                    (n, m))
    cfg = NmfConfig(rank=4, num_iterations=6, check_interval=3, seed=0)
    monkeypatch.setattr(native_loader, "NATIVE_MIN_NNZ", 1)
    r_nat = compute_sparse(coo, cfg, strategy="ell")
    monkeypatch.setenv("NMFTPU_NATIVE_CSR", "0")
    r_np = compute_sparse(coo, cfg, strategy="ell")
    np.testing.assert_array_equal(np.asarray(r_nat.W),
                                  np.asarray(r_np.W))
    np.testing.assert_array_equal(np.asarray(r_nat.H),
                                  np.asarray(r_np.H))
