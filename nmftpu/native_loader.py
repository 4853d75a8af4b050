"""ctypes bindings for the native host library (native/nmftpu_io.h).

Mirrors the reference's binding model (SURVEY.md C19: dlopen the .so and
bind flat C entry points at runtime; the NMFGPU_ROOT-style override here is
NMFTPU_NATIVE_LIB). Falls back silently to the pure-python implementations
when the library has not been built — `available()` reports which path is
active, and `build()` compiles it in place with make.
"""

from __future__ import annotations

import ctypes
import os
import subprocess

import numpy as np

_REPO_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
_DEFAULT_SO = os.path.join(_REPO_ROOT, "native", "build", "libnmftpu_io.so")

_lib = None
_lib_checked = False

# Inputs below this nonzero count take the pure-numpy paths (ctypes
# overhead dominates and tests keep byte-identical numpy behavior).
NATIVE_MIN_NNZ = 1 << 20


def _load():
    global _lib, _lib_checked
    if _lib_checked:
        return _lib
    _lib_checked = True
    path = os.environ.get("NMFTPU_NATIVE_LIB", _DEFAULT_SO)
    if not os.path.exists(path):
        return None
    try:
        lib = ctypes.CDLL(path)
    except OSError:
        return None
    lib.nmio_version.restype = ctypes.c_int32
    lib.nmio_parse.restype = ctypes.c_void_p
    lib.nmio_parse.argtypes = [ctypes.c_char_p, ctypes.c_int32]
    lib.nmio_nnz.restype = ctypes.c_int64
    lib.nmio_nnz.argtypes = [ctypes.c_void_p]
    lib.nmio_n_users.restype = ctypes.c_int32
    lib.nmio_n_users.argtypes = [ctypes.c_void_p]
    lib.nmio_n_items.restype = ctypes.c_int32
    lib.nmio_n_items.argtypes = [ctypes.c_void_p]
    lib.nmio_fill_coo.restype = ctypes.c_int32
    lib.nmio_fill_coo.argtypes = [ctypes.c_void_p] + [ctypes.c_void_p] * 4
    lib.nmio_fill_ids.restype = ctypes.c_int32
    lib.nmio_fill_ids.argtypes = [ctypes.c_void_p] * 3
    lib.nmio_free.argtypes = [ctypes.c_void_p]
    lib.nmio_last_error.restype = ctypes.c_char_p
    lib.nmio_coo_to_csr.restype = ctypes.c_int32
    lib.nmio_coo_to_csr.argtypes = [
        ctypes.c_int64, ctypes.c_int32,
        ctypes.c_void_p, ctypes.c_void_p, ctypes.c_void_p, ctypes.c_void_p,
    ]
    for name, argtypes in (
        ("nmio_csr_build",
         [ctypes.c_int64, ctypes.c_int64] + [ctypes.c_void_p] * 6),
        ("nmio_ell_count",
         [ctypes.c_void_p, ctypes.c_int64, ctypes.c_int32,
          ctypes.c_void_p, ctypes.c_int32, ctypes.c_void_p]),
        ("nmio_ell_fill",
         [ctypes.c_void_p, ctypes.c_void_p, ctypes.c_void_p,
          ctypes.c_int64, ctypes.c_int32, ctypes.c_void_p,
          ctypes.c_int32, ctypes.c_void_p, ctypes.c_void_p,
          ctypes.c_void_p]),
    ):
        try:
            fn = getattr(lib, name)
        except AttributeError:
            # stale .so from before these entry points — callers fall
            # back to numpy
            continue
        fn.restype = ctypes.c_int32
        fn.argtypes = argtypes
    _lib = lib
    return _lib


def available() -> bool:
    return _load() is not None


def build(quiet: bool = True) -> bool:
    """Compile the native library in place (requires g++/make)."""
    global _lib_checked, _lib
    try:
        subprocess.run(
            ["make", "-C", os.path.join(_REPO_ROOT, "native")],
            check=True,
            capture_output=quiet,
        )
    except (subprocess.CalledProcessError, FileNotFoundError):
        return False
    _lib_checked = False
    _lib = None
    return available()


def _ptr(a: np.ndarray):
    return a.ctypes.data_as(ctypes.c_void_p)


def parse_movielens(path: str, implicit: bool = False):
    """Native parse. Returns (rows, cols, vals, ts, user_ids, item_ids) or
    raises RuntimeError (caller decides whether to fall back)."""
    lib = _load()
    if lib is None:
        raise RuntimeError("native library not built")
    handle = lib.nmio_parse(path.encode(), 1 if implicit else 0)
    if not handle:
        raise RuntimeError(
            f"nmio_parse failed: {lib.nmio_last_error().decode()}"
        )
    try:
        nnz = lib.nmio_nnz(handle)
        n_u = lib.nmio_n_users(handle)
        n_i = lib.nmio_n_items(handle)
        rows = np.empty(nnz, np.int32)
        cols = np.empty(nnz, np.int32)
        vals = np.empty(nnz, np.float32)
        ts = np.empty(nnz, np.int64)
        if lib.nmio_fill_coo(handle, _ptr(rows), _ptr(cols), _ptr(vals),
                             _ptr(ts)) != 0:
            raise RuntimeError("nmio_fill_coo failed")
        user_ids = np.empty(n_u, np.int64)
        item_ids = np.empty(n_i, np.int64)
        if lib.nmio_fill_ids(handle, _ptr(user_ids), _ptr(item_ids)) != 0:
            raise RuntimeError("nmio_fill_ids failed")
    finally:
        lib.nmio_free(handle)
    return rows, cols, vals, ts, user_ids, item_ids


def coo_to_csr(rows: np.ndarray, cols: np.ndarray, n_rows: int):
    """Native COO->CSR: returns (indptr int64[n_rows+1], perm int64[nnz])."""
    lib = _load()
    if lib is None:
        raise RuntimeError("native library not built")
    rows = np.ascontiguousarray(rows, np.int32)
    cols = np.ascontiguousarray(cols, np.int32)
    nnz = len(rows)
    indptr = np.zeros(n_rows + 1, np.int64)
    perm = np.empty(nnz, np.int64)
    rc = lib.nmio_coo_to_csr(
        nnz, n_rows, _ptr(rows), _ptr(cols), _ptr(indptr), _ptr(perm)
    )
    if rc != 0:
        raise RuntimeError(f"nmio_coo_to_csr failed (rc={rc})")
    return indptr, perm


def has_csr_build() -> bool:
    lib = _load()
    return lib is not None and hasattr(lib, "nmio_csr_build")


def csr_build(rows: np.ndarray, cols: np.ndarray, vals: np.ndarray,
              n_rows: int):
    """Fused native COO->CSR: counting-sort fill + parallel per-row col
    sort, no permutation round-trip. Returns (indptr int64, indices
    int32, data float32). Raises RuntimeError when unavailable —
    callers fall back to the numpy path."""
    lib = _load()
    if lib is None or not hasattr(lib, "nmio_csr_build"):
        raise RuntimeError("native csr_build unavailable")
    rows = np.ascontiguousarray(rows, np.int32)
    cols = np.ascontiguousarray(cols, np.int32)
    vals = np.ascontiguousarray(vals, np.float32)
    nnz = len(rows)
    indptr = np.zeros(n_rows + 1, np.int64)
    out_cols = np.empty(nnz, np.int32)
    out_vals = np.empty(nnz, np.float32)
    rc = lib.nmio_csr_build(
        nnz, n_rows, _ptr(rows), _ptr(cols), _ptr(vals),
        _ptr(indptr), _ptr(out_cols), _ptr(out_vals),
    )
    if rc != 0:
        raise RuntimeError(f"nmio_csr_build failed (rc={rc})")
    return indptr, out_cols, out_vals


def ell_build(indptr: np.ndarray, indices: np.ndarray, data: np.ndarray,
              seg_max: int, widths, pad_segments=None):
    """Native bucketed-ELL fill (the sparse_ell layout). Returns a list
    of (vals (nseg_p, w) f32, cols (nseg_p, w) i32, rows (nseg_p,) i32,
    nseg, width) per NON-EMPTY bucket, segments in the numpy builder's
    global order. `pad_segments(nseg) -> nseg_p` applies the caller's
    padding policy at ALLOCATION time (pad tail stays zero except rows,
    which repeat the last real row so the segment scatter-add can claim
    sorted indices)."""
    lib = _load()
    if lib is None or not hasattr(lib, "nmio_ell_fill"):
        raise RuntimeError("native ell_build unavailable")
    indptr = np.ascontiguousarray(indptr, np.int64)
    indices = np.ascontiguousarray(indices, np.int32)
    data = np.ascontiguousarray(data, np.float32)
    widths_arr = np.ascontiguousarray(widths, np.int32)
    nw = len(widths_arr)
    n_rows = len(indptr) - 1
    counts = np.zeros(nw, np.int64)
    rc = lib.nmio_ell_count(
        _ptr(indptr), n_rows, int(seg_max), _ptr(widths_arr), nw,
        _ptr(counts),
    )
    if rc != 0:
        raise RuntimeError(f"nmio_ell_count failed (rc={rc})")
    pad = pad_segments if pad_segments is not None else (lambda ns: ns)
    vals_b, cols_b, rows_b = [], [], []
    vp = (ctypes.c_void_p * nw)()
    cp = (ctypes.c_void_p * nw)()
    rp = (ctypes.c_void_p * nw)()
    for b in range(nw):
        ns, w = int(counts[b]), int(widths_arr[b])
        ns_p = max(int(pad(ns)), ns) if ns else 0
        v = np.zeros((ns_p, w), np.float32)
        c = np.zeros((ns_p, w), np.int32)
        r = np.zeros(ns_p, np.int32)
        vals_b.append(v)
        cols_b.append(c)
        rows_b.append(r)
        vp[b] = v.ctypes.data
        cp[b] = c.ctypes.data
        rp[b] = r.ctypes.data
    rc = lib.nmio_ell_fill(
        _ptr(indptr), _ptr(indices), _ptr(data), n_rows, int(seg_max),
        _ptr(widths_arr), nw, ctypes.cast(vp, ctypes.c_void_p),
        ctypes.cast(cp, ctypes.c_void_p),
        ctypes.cast(rp, ctypes.c_void_p),
    )
    if rc != 0:
        raise RuntimeError(f"nmio_ell_fill failed (rc={rc})")
    out = []
    for b in range(nw):
        ns = int(counts[b])
        if ns == 0:
            continue
        rows_b[b][ns:] = rows_b[b][ns - 1]
        out.append((vals_b[b], cols_b[b], rows_b[b], ns,
                    int(widths_arr[b])))
    return out
