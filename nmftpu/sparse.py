"""Host-side sparse matrix containers: CSR / CSC / COO (SURVEY.md C11).

The reference accepts V in CSR/CSC/COO in addition to dense (the R binding
converts Matrix/SparseM objects to indexed triplets). These containers are
the host-side equivalent: plain numpy storage, format conversions, and the
entry point into the TPU device layout (`nmftpu.sparse_ops.BlockedRows` —
a padded row-bucketed ELL layout that Mosaic/XLA can tile).

No scipy dependency is required; `from_scipy` accepts scipy.sparse objects
opportunistically when scipy is installed.
"""

from __future__ import annotations

import dataclasses
import os

import numpy as np


def _native_csr(major, minor, data, n_major):
    """Fused native CSR build (nmio_csr_build: counting-sort fill +
    OpenMP per-row col sort — measured ~5x the numpy fused-key sort at
    100M nnz, BENCH_host_partition.json). Returns (indptr, indices,
    data) or None to fall back: f32 values only (the native path
    stores float), large inputs only (ctypes overhead + identical
    numpy behavior below), NMFTPU_NATIVE_CSR=0 disables."""
    if os.environ.get("NMFTPU_NATIVE_CSR", "1") == "0":
        return None
    try:
        from nmftpu import native_loader

        if (data.dtype != np.float32
                or len(data) < native_loader.NATIVE_MIN_NNZ):
            return None
        if not native_loader.has_csr_build():
            return None
        return native_loader.csr_build(major, minor, data, n_major)
    except Exception:
        return None


def _two_key_order(major, minor, minor_extent):
    """argsort by (major, minor). When major*extent+minor fits int64 the
    two keys fuse into ONE int64 quicksort — ~4x faster than np.lexsort
    at 100M nnz (the cfg4 ingest hot spot; BENCH_host_partition.json).

    Duplicate-coordinate caveat: the fused sort is deterministic (same
    input -> same permutation) but NOT input-order stable, so duplicate
    (row, col) entries land in unspecified relative order; downstream
    they are summed, and only the f32 rounding of that sum can differ
    from the old lexsort order. kind='stable' (radix) would restore
    input order but measures 2.3x slower at 30M keys — not worth it for
    an input class (duplicate coordinates) the loaders never emit."""
    major = np.asarray(major, np.int64)
    minor = np.asarray(minor, np.int64)
    extent = int(minor_extent)
    if extent > 0 and major.size and (
        int(major.max()) < (2**63 - 1) // max(extent, 1)
    ):
        return np.argsort(major * extent + minor)
    return np.lexsort((minor, major))


class SparseMatrix:
    """Base class for nmftpu host sparse containers."""

    shape: tuple[int, int]

    @property
    def nnz(self) -> int:
        raise NotImplementedError

    def to_coo(self) -> "SparseCOO":
        raise NotImplementedError

    def to_csr(self) -> "SparseCSR":
        return self.to_coo().to_csr()

    def to_csc(self) -> "SparseCSC":
        return self.to_coo().to_csc()

    def todense(self) -> np.ndarray:
        coo = self.to_coo()
        out = np.zeros(self.shape, dtype=coo.data.dtype)
        # += handles duplicate coordinates like scipy (summed)
        np.add.at(out, (coo.row, coo.col), coo.data)
        return out

    def transpose(self):
        coo = self.to_coo()
        return SparseCOO(
            row=coo.col, col=coo.row, data=coo.data,
            shape=(self.shape[1], self.shape[0]),
        )

    @property
    def T(self):
        return self.transpose()


@dataclasses.dataclass
class SparseCOO(SparseMatrix):
    """Coordinate triplets (row, col, data); duplicates are summed on use."""

    row: np.ndarray
    col: np.ndarray
    data: np.ndarray
    shape: tuple[int, int]

    def __post_init__(self):
        self.row = np.asarray(self.row, dtype=np.int32)
        self.col = np.asarray(self.col, dtype=np.int32)
        self.data = np.asarray(self.data)
        if not (len(self.row) == len(self.col) == len(self.data)):
            raise ValueError("row/col/data length mismatch")
        self.shape = (int(self.shape[0]), int(self.shape[1]))

    @property
    def nnz(self) -> int:
        return len(self.data)

    def to_coo(self) -> "SparseCOO":
        return self

    def to_csr(self) -> "SparseCSR":
        n, m = self.shape
        nat = _native_csr(self.row, self.col, self.data, n)
        if nat is not None:
            return SparseCSR(indptr=nat[0], indices=nat[1], data=nat[2],
                             shape=self.shape)
        order = _two_key_order(self.row, self.col, m)
        indptr = np.zeros(n + 1, dtype=np.int64)
        np.cumsum(
            np.bincount(self.row, minlength=n), out=indptr[1:]
        )
        return SparseCSR(
            indptr=indptr,
            indices=self.col[order],
            data=self.data[order],
            shape=self.shape,
        )

    def to_csc(self) -> "SparseCSC":
        n, m = self.shape
        nat = _native_csr(self.col, self.row, self.data, m)
        if nat is not None:
            return SparseCSC(indptr=nat[0], indices=nat[1], data=nat[2],
                             shape=self.shape)
        order = _two_key_order(self.col, self.row, n)
        indptr = np.zeros(m + 1, dtype=np.int64)
        np.cumsum(
            np.bincount(self.col, minlength=m), out=indptr[1:]
        )
        return SparseCSC(
            indptr=indptr,
            indices=self.row[order],
            data=self.data[order],
            shape=self.shape,
        )


@dataclasses.dataclass
class SparseCSR(SparseMatrix):
    """Compressed sparse rows: indptr (n+1), indices (nnz) cols, data (nnz)."""

    indptr: np.ndarray
    indices: np.ndarray
    data: np.ndarray
    shape: tuple[int, int]

    def __post_init__(self):
        self.indptr = np.asarray(self.indptr, dtype=np.int64)
        self.indices = np.asarray(self.indices, dtype=np.int32)
        self.data = np.asarray(self.data)
        self.shape = (int(self.shape[0]), int(self.shape[1]))
        if len(self.indptr) != self.shape[0] + 1:
            raise ValueError(
                f"indptr length {len(self.indptr)} != rows+1 "
                f"({self.shape[0] + 1})"
            )

    @property
    def nnz(self) -> int:
        return len(self.data)

    def row_lengths(self) -> np.ndarray:
        return np.diff(self.indptr)

    def to_coo(self) -> SparseCOO:
        row = np.repeat(
            np.arange(self.shape[0], dtype=np.int32), self.row_lengths()
        )
        return SparseCOO(
            row=row, col=self.indices, data=self.data, shape=self.shape
        )

    def to_csr(self) -> "SparseCSR":
        return self


@dataclasses.dataclass
class SparseCSC(SparseMatrix):
    """Compressed sparse columns: indptr (m+1), indices (nnz) rows, data."""

    indptr: np.ndarray
    indices: np.ndarray
    data: np.ndarray
    shape: tuple[int, int]

    def __post_init__(self):
        self.indptr = np.asarray(self.indptr, dtype=np.int64)
        self.indices = np.asarray(self.indices, dtype=np.int32)
        self.data = np.asarray(self.data)
        self.shape = (int(self.shape[0]), int(self.shape[1]))
        if len(self.indptr) != self.shape[1] + 1:
            raise ValueError(
                f"indptr length {len(self.indptr)} != cols+1 "
                f"({self.shape[1] + 1})"
            )

    @property
    def nnz(self) -> int:
        return len(self.data)

    def to_coo(self) -> SparseCOO:
        col = np.repeat(
            np.arange(self.shape[1], dtype=np.int32), np.diff(self.indptr)
        )
        return SparseCOO(
            row=self.indices, col=col, data=self.data, shape=self.shape
        )

    def to_csc(self) -> "SparseCSC":
        return self


def from_dense(dense: np.ndarray, threshold: float = 0.0) -> SparseCOO:
    """Extract |v| > threshold entries of a dense matrix into COO."""
    dense = np.asarray(dense)
    row, col = np.nonzero(np.abs(dense) > threshold)
    return SparseCOO(
        row=row.astype(np.int32),
        col=col.astype(np.int32),
        data=dense[row, col],
        shape=dense.shape,
    )


def from_scipy(mat) -> SparseMatrix:
    """Adapt a scipy.sparse matrix (any format) without copying data arrays."""
    fmt = getattr(mat, "format", None)
    if fmt == "csr":
        return SparseCSR(mat.indptr, mat.indices, mat.data, mat.shape)
    if fmt == "csc":
        return SparseCSC(mat.indptr, mat.indices, mat.data, mat.shape)
    coo = mat.tocoo()
    return SparseCOO(coo.row, coo.col, coo.data, coo.shape)
