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
