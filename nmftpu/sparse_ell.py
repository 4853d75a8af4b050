"""Gather-based ELL sparse engine (SURVEY.md §7-PR3's padded-row layout).

The chunked-COO path (sparse_ops) is scatter-bound: every nonzero
scatter-adds an r-vector, O(nnz*r) scattered elements. This layout makes
the hot loop gather-only:

* Each row of V is split into SEGMENTS of at most `seg_max` nonzeros, and
  segments are grouped into power-of-two-width BUCKETS (8/32/128/512 wide,
  zero-padded to the bucket width) — the standard answer to power-law row
  lengths (padding waste is bounded by 2x within a bucket).
* A segment's contribution `sum_k v_k * H[:, col_k]` is a pure GATHER plus
  an einsum. Only the (num_segments, r) segment results are scatter-added
  into rows — ~nnz/seg_max + n rows instead of nnz, i.e. orders of
  magnitude less scatter.
* Row-major ELL computes V H^T; the column-major twin (same container
  built on V^T) computes (W^T V)^T. SDDMM gathers both factor slices per
  nonzero, again scatter-free.

All shapes are static per bucket; buckets are a short python loop inside
jit. Device arrays live in a registered pytree so the whole structure
passes through jit/scan unchanged.
"""

from __future__ import annotations

import dataclasses
import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

from nmftpu import sparse as host_sparse

DEFAULT_BUCKETS = (8, 32, 128, 512)


@functools.partial(
    jax.tree_util.register_dataclass,
    data_fields=["vals", "cols", "out_row"],
    meta_fields=["width"],
)
@dataclasses.dataclass(frozen=True)
class EllBucket:
    """Segments of uniform padded width. vals/cols: (nseg, width);
    out_row[s] = destination row of segment s."""

    vals: jax.Array
    cols: jax.Array
    out_row: jax.Array
    width: int


@functools.partial(
    jax.tree_util.register_dataclass,
    data_fields=["buckets"],
    meta_fields=["shape", "nnz"],
)
@dataclasses.dataclass(frozen=True)
class EllRows:
    """Row-segmented ELL of a sparse matrix (for V @ H^T style products)."""

    buckets: tuple
    shape: tuple[int, int]
    nnz: int


def build_ell_rows(
    mat: host_sparse.SparseMatrix,
    dtype=jnp.float32,
    seg_max: int = 512,
    buckets: tuple[int, ...] = DEFAULT_BUCKETS,
    chunk_segments: int = 2048,
) -> EllRows:
    """Host-side builder: CSR -> bucketed padded segments."""
    csr = mat.to_csr()
    n, m = csr.shape
    assert buckets[-1] >= seg_max

    per_bucket: dict[int, list] = {w: [] for w in buckets}
    for row in range(n):
        s, e = csr.indptr[row], csr.indptr[row + 1]
        for off in range(s, e, seg_max):
            seg_len = min(seg_max, e - off)
            width = next(w for w in buckets if w >= seg_len)
            per_bucket[width].append((row, off, seg_len))

    out = []
    for width, segs in per_bucket.items():
        if not segs:
            continue
        nseg = len(segs)
        # pad segment count so scans can use fixed chunk sizes
        nseg_p = ((nseg + chunk_segments - 1) // chunk_segments) * (
            chunk_segments if nseg > chunk_segments else 1
        )
        nseg_p = max(nseg_p, nseg)
        vals = np.zeros((nseg_p, width), dtype=np.dtype(dtype))
        cols = np.zeros((nseg_p, width), dtype=np.int32)
        rows = np.zeros((nseg_p,), dtype=np.int32)
        for i, (row, off, seg_len) in enumerate(segs):
            vals[i, :seg_len] = csr.data[off:off + seg_len]
            cols[i, :seg_len] = csr.indices[off:off + seg_len]
            rows[i] = row
        out.append(EllBucket(
            vals=jnp.asarray(vals), cols=jnp.asarray(cols),
            out_row=jnp.asarray(rows), width=width,
        ))
    return EllRows(buckets=tuple(out), shape=(n, m), nnz=csr.nnz)


def _bucket_rowsums(bucket: EllBucket, H, chunk: int,
                    gather_dtype=None):
    """Per-segment sum_k v_k * H[:, col_k] -> (nseg, r), scatter-free.

    gather_dtype=jnp.bfloat16 halves gather traffic (the dominant cost at
    high rank) at bf16 numerator precision; None keeps H's dtype."""
    H = jnp.asarray(H)
    if gather_dtype is not None:
        H = H.astype(gather_dtype)
    r = H.shape[0]
    nseg = bucket.vals.shape[0]
    if nseg <= chunk:
        g = jnp.take(H, bucket.cols.reshape(-1), axis=1)   # (r, nseg*w)
        g = g.T.reshape(nseg, bucket.width, r)
        return jnp.einsum(
            "sk,skr->sr", bucket.vals.astype(g.dtype), g,
            preferred_element_type=jnp.float32,
        )
    T = (nseg + chunk - 1) // chunk
    pad = T * chunk - nseg
    vals = jnp.pad(bucket.vals, ((0, pad), (0, 0))).reshape(
        T, chunk, bucket.width
    )
    cols = jnp.pad(bucket.cols, ((0, pad), (0, 0))).reshape(
        T, chunk, bucket.width
    )

    def body(_, x):
        v, c = x
        g = jnp.take(H, c.reshape(-1), axis=1)
        g = g.T.reshape(chunk, bucket.width, r)
        return None, jnp.einsum(
            "sk,skr->sr", v.astype(g.dtype), g,
            preferred_element_type=jnp.float32,
        )

    _, res = lax.scan(body, None, (vals, cols))
    return res.reshape(T * chunk, r)[:nseg]


def v_ht_ell(ell: EllRows, H, chunk: int = 2048,
             gather_dtype=None) -> jax.Array:
    """V @ H^T -> (n, r). Gathers dominate; the only scatter is the
    per-segment row accumulation (#segments ≈ n + nnz/seg_max)."""
    H = jnp.asarray(H)
    n = ell.shape[0]
    r = H.shape[0]
    out = jnp.zeros((n, r), jnp.float32)
    for bucket in ell.buckets:
        seg = _bucket_rowsums(bucket, H, chunk, gather_dtype=gather_dtype)
        out = out.at[bucket.out_row].add(seg)
    return out.astype(H.dtype)


def sddmm_ell(ell: EllRows, W, H, chunk: int = 2048) -> EllRows:
    """(W H) sampled at the nonzero positions, returned as an EllRows with
    the same structure whose vals are the sampled products (padding lanes
    yield W[row]·H[:,0] garbage but their v=0 partners zero them in use —
    callers only consume these values multiplied by original vals)."""
    W = jnp.asarray(W)
    H = jnp.asarray(H)
    new_buckets = []
    for bucket in ell.buckets:
        nseg, width = bucket.vals.shape
        w_rows = W[bucket.out_row]                        # (nseg, r)

        def sample(cols_blk, w_blk):
            g = jnp.take(H, cols_blk.reshape(-1), axis=1)
            g = g.T.reshape(cols_blk.shape[0], width, H.shape[0])
            return jnp.einsum("sr,skr->sk", w_blk, g)

        if nseg <= chunk:
            s = sample(bucket.cols, w_rows)
        else:
            T = (nseg + chunk - 1) // chunk
            pad = T * chunk - nseg
            cols = jnp.pad(bucket.cols, ((0, pad), (0, 0))).reshape(
                T, chunk, width
            )
            wr = jnp.pad(w_rows, ((0, pad), (0, 0))).reshape(
                T, chunk, W.shape[1]
            )
            _, s = lax.scan(
                lambda _, x: (None, sample(x[0], x[1])), None, (cols, wr)
            )
            s = s.reshape(T * chunk, width)[:nseg]
        new_buckets.append(EllBucket(
            vals=s, cols=bucket.cols, out_row=bucket.out_row,
            width=width,
        ))
    return EllRows(buckets=tuple(new_buckets), shape=ell.shape,
                   nnz=ell.nnz)


def map_values(ell: EllRows, fn) -> EllRows:
    """Elementwise transform of stored values (padding stays harmless as
    long as fn(0)-lanes are only ever used multiplied by true-value 0)."""
    return EllRows(
        buckets=tuple(
            EllBucket(vals=fn(b.vals), cols=b.cols, out_row=b.out_row,
                      width=b.width)
            for b in ell.buckets
        ),
        shape=ell.shape, nnz=ell.nnz,
    )


def combine_values(a: EllRows, b: EllRows, fn) -> EllRows:
    """Elementwise combine of two structurally identical EllRows."""
    return EllRows(
        buckets=tuple(
            EllBucket(vals=fn(x.vals, y.vals), cols=x.cols,
                      out_row=x.out_row, width=x.width)
            for x, y in zip(a.buckets, b.buckets)
        ),
        shape=a.shape, nnz=a.nnz,
    )


@functools.partial(
    jax.tree_util.register_dataclass,
    data_fields=["rows", "cols"],
    meta_fields=[],
)
@dataclasses.dataclass(frozen=True)
class EllPair:
    """Row-major ELL of V plus row-major ELL of V^T (= column-major of V):
    everything the MU family needs, gather-only."""

    rows: EllRows      # for V @ H^T
    cols: EllRows      # ELL of V^T, for (W^T V)^T = V^T W

    @property
    def shape(self):
        return self.rows.shape


def build_ell_pair(mat: host_sparse.SparseMatrix, dtype=jnp.float32,
                   **kw) -> EllPair:
    return EllPair(
        rows=build_ell_rows(mat, dtype=dtype, **kw),
        cols=build_ell_rows(mat.T, dtype=dtype, **kw),
    )


def wt_v_ell(pair: EllPair, W, chunk: int = 2048) -> jax.Array:
    """W^T V -> (r, m) via the transposed container: (V^T W)^T."""
    return v_ht_ell(pair.cols, jnp.asarray(W).T, chunk=chunk).T


def mu_update_frobenius_ell(pair: EllPair, W, H, eps=1e-9, order="WH"):
    """Sparse MU (Frobenius) on the gather-only layout."""

    def upd_w(W, H):
        return W * (v_ht_ell(pair.rows, H) / (W @ (H @ H.T) + eps))

    def upd_h(W, H):
        return H * (wt_v_ell(pair, W) / ((W.T @ W) @ H + eps))

    if order == "WH":
        W = upd_w(W, H)
        H = upd_h(W, H)
    else:
        H = upd_h(W, H)
        W = upd_w(W, H)
    return W, H


def mu_update_frobenius_weighted_ell(pair: EllPair, W, H, alpha,
                                     eps=1e-9, order="WH"):
    """Confidence-weighted MU (c = 1 + alpha*v at nonzeros) on ELL."""
    cv_rows = map_values(pair.rows, lambda v: v * (1.0 + alpha * v))
    cv_cols = map_values(pair.cols, lambda v: v * (1.0 + alpha * v))

    def upd_w(W, H):
        s = sddmm_ell(pair.rows, W, H)
        swh = combine_values(pair.rows, s, lambda v, wh: v * wh)
        denom = W @ (H @ H.T) + alpha * v_ht_ell(swh, H) + eps
        return W * (v_ht_ell(cv_rows, H) / denom)

    def upd_h(W, H):
        Wt = jnp.asarray(W).T
        Ht = jnp.asarray(H).T
        s = sddmm_ell(pair.cols, Ht, Wt)
        swh = combine_values(pair.cols, s, lambda v, wh: v * wh)
        denom = (W.T @ W) @ H + alpha * v_ht_ell(swh, Wt).T + eps
        return H * (v_ht_ell(cv_cols, Wt).T / denom)

    if order == "WH":
        W = upd_w(W, H)
        H = upd_h(W, H)
    else:
        H = upd_h(W, H)
        W = upd_w(W, H)
    return W, H


def _solve_clamped(gram, rhs, shift, off, eps):
    r = gram.shape[0]
    A = gram + (shift + eps) * jnp.eye(r, dtype=gram.dtype)
    if off:
        A = A + off * jnp.ones((r, r), gram.dtype)
    return jnp.maximum(jax.scipy.linalg.solve(A, rhs, assume_a="pos"), 0.0)


def als_family_update_ell(
    pair: EllPair, W, H, shift_w=0.0, shift_h=0.0, off_w=0.0, off_h=0.0,
    eps=1e-9, order="WH",
):
    """ALS/ACLS/AHCLS on the gather-only layout: the right-hand sides are
    the two ELL SpMMs, the r×r solves are exact."""

    def upd_w(W, H):
        rhs = v_ht_ell(pair.rows, H).T                    # (r, n)
        return _solve_clamped(H @ H.T, rhs, shift_w, off_w, eps).T

    def upd_h(W, H):
        return _solve_clamped(W.T @ W, wt_v_ell(pair, W), shift_h, off_h,
                              eps)

    if order == "WH":
        W = upd_w(W, H)
        H = upd_h(W, H)
    else:
        H = upd_h(W, H)
        W = upd_w(W, H)
    return W, H


def gdcls_update_ell(pair: EllPair, W, H, lambda_tik=0.0, eps=1e-9,
                     order="WH"):
    def upd_w(W, H):
        return W * (v_ht_ell(pair.rows, H) / (W @ (H @ H.T) + eps))

    def upd_h(W, H):
        return _solve_clamped(W.T @ W, wt_v_ell(pair, W), lambda_tik, 0.0,
                              eps)

    if order == "WH":
        W = upd_w(W, H)
        H = upd_h(W, H)
    else:
        H = upd_h(W, H)
        W = upd_w(W, H)
    return W, H


def nsnmf_update_kl_ell(pair: EllPair, W, H, S, eps=1e-9, order="WH"):
    """nsNMF under KL on ELL: SDDMM/gather half-steps with the smoothed
    partners (S@H stands in for H, W@S for W)."""

    def upd_w(W, H):
        SH = S @ H
        s = sddmm_ell(pair.rows, W, SH)
        ratio = combine_values(pair.rows, s, lambda v, wh: v / (wh + eps))
        denom = jnp.maximum(jnp.sum(SH, axis=1), eps)[None, :]
        return W * (v_ht_ell(ratio, SH) / denom)

    def upd_h(W, H):
        WS = W @ S
        WSt = jnp.asarray(WS).T
        s = sddmm_ell(pair.cols, jnp.asarray(H).T, WSt)
        ratio = combine_values(pair.cols, s, lambda v, wh: v / (wh + eps))
        denom = jnp.maximum(jnp.sum(WS, axis=0), eps)[:, None]
        return H * (v_ht_ell(ratio, WSt).T / denom)

    if order == "WH":
        W = upd_w(W, H)
        H = upd_h(W, H)
    else:
        H = upd_h(W, H)
        W = upd_w(W, H)
    return W, H


def nsnmf_update_ell(pair: EllPair, W, H, S, eps=1e-9, order="WH"):
    """nsNMF (Frobenius) on ELL: MU against the smoothed partners."""

    def upd_w(W, H):
        SH = S @ H
        return W * (v_ht_ell(pair.rows, SH) / (W @ (SH @ SH.T) + eps))

    def upd_h(W, H):
        WS = W @ S
        return H * (wt_v_ell(pair, WS) / ((WS.T @ WS) @ H + eps))

    if order == "WH":
        W = upd_w(W, H)
        H = upd_h(W, H)
    else:
        H = upd_h(W, H)
        W = upd_w(W, H)
    return W, H


def sum_v_sq_ell(ell: EllRows) -> jax.Array:
    """||V||_F^2 from the stored (zero-padded) values."""
    return sum(jnp.sum(b.vals * b.vals) for b in ell.buckets)


def frobenius_error_ell(pair: EllPair, W, H, sum_v_sq=None) -> jax.Array:
    """Gram-trick ||V - WH||_F using the gather-only W^T V."""
    if sum_v_sq is None:
        sum_v_sq = sum_v_sq_ell(pair.rows)
    WtV = wt_v_ell(pair, W)
    cross = jnp.sum(WtV * H)
    quad = jnp.sum((W.T @ W) * (H @ H.T))
    return jnp.sqrt(jnp.maximum(sum_v_sq - 2.0 * cross + quad, 0.0))


def kl_error_ell(pair: EllPair, W, H, eps=1e-12) -> jax.Array:
    """D_KL(V || WH) with the nonzero log terms sampled via gather-SDDMM."""
    s = sddmm_ell(pair.rows, W, H)
    total = jnp.asarray(0.0, jnp.float32)
    for orig, samp in zip(pair.rows.buckets, s.buckets):
        v = orig.vals
        wh = samp.vals
        term = jnp.where(
            v > 0,
            v * jnp.log(jnp.maximum(v, eps) / jnp.maximum(wh, eps)),
            0.0,
        )
        total = total + jnp.sum(term) - jnp.sum(v)
    return total + jnp.sum(W, axis=0) @ jnp.sum(H, axis=1)


def mu_update_kl_ell(pair: EllPair, W, H, eps=1e-9, order="WH"):
    """Sparse MU (KL): SDDMM ratio on each container, then gather-SpMM."""

    def ratio_rows(W, H):
        s = sddmm_ell(pair.rows, W, H)
        return combine_values(pair.rows, s,
                              lambda v, wh: v / (wh + eps))

    def ratio_cols(W, H):
        # container holds V^T; sample (H^T W^T)= (WH)^T at its nonzeros
        s = sddmm_ell(pair.cols, jnp.asarray(H).T, jnp.asarray(W).T)
        return combine_values(pair.cols, s,
                              lambda v, wh: v / (wh + eps))

    def upd_w(W, H):
        numer = v_ht_ell(ratio_rows(W, H), H)
        denom = jnp.maximum(jnp.sum(H, axis=1), eps)[None, :]
        return W * (numer / denom)

    def upd_h(W, H):
        numer = v_ht_ell(ratio_cols(W, H), jnp.asarray(W).T).T
        denom = jnp.maximum(jnp.sum(W, axis=0), eps)[:, None]
        return H * (numer / denom)

    if order == "WH":
        W = upd_w(W, H)
        H = upd_h(W, H)
    else:
        H = upd_h(W, H)
        W = upd_w(W, H)
    return W, H
