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
