"""Fused Pallas ELL SpMM: gather · multiply · segment-reduce in-kernel.

This is the Pallas sparse-matmul the north star names (BASELINE.json
"fused Pallas matmul/SpMM kernels"; the reference's cuSPARSE-csrmm analog,
SURVEY.md C11/C13): per padded segment of an `EllBucket`, the kernel
gathers table rows by column index, scales them by the stored values, and
reduces the segment — one VMEM pass, no HBM intermediates.

Why it is OPT-IN rather than the default: on the current libtpu/Mosaic
build the in-kernel gather menu is (probe receipts, PERF.md round 2)

  * ``tpu.dynamic_gather`` (take_along_axis)  -> backend compiler crash
  * per-row HBM DMA (``make_async_copy``)     -> runtime FAILED_PRECONDITION
  * dynamic row loads from a VMEM-resident table ref  -> WORKS (~11 ns/row)

so this kernel uses the one working form — and XLA's own HLO gather
measures 2.1 ns/row, which is why `sparse_ell._bucket_rowsums` (the XLA
formulation) remains the engine default.  Select the kernel with
``NmfConfig(use_pallas=True)`` on the ELL engine; it is exact (f32
accumulation), parity-tested against the XLA path, and will inherit any
future libtpu gather fix without API changes.

Constraints of the working form: the whole (m, r) table must be
VMEM-resident alongside one segment block, so availability is gated on
``m * r * 4B <= VMEM_TABLE_BUDGET`` (default 8 MiB of the ~16 MiB/core).
The block-bucketed scalable variant needs exactly the per-block DMA this
backend rejects.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl

# the table and one (chunk, width) block of vals/cols/out must co-reside
# in ~16 MiB of VMEM; leave headroom for Mosaic's own buffers
VMEM_TABLE_BUDGET = 8 * 1024 * 1024


def available() -> bool:
    try:
        from jax.experimental.pallas import tpu as pltpu  # noqa: F401

        return True
    except Exception:  # pragma: no cover
        return False


def table_fits(m: int, r: int, itemsize: int = 4) -> bool:
    """Whether the (m, r) gather table is VMEM-residable for this kernel."""
    return m * r * itemsize <= VMEM_TABLE_BUDGET


def _make_seg_rowsum_kernel(width: int):
    """Kernel factory closing over the static segment width.

    vals/cols arrive FLAT as (C*width, 1) so every in-kernel scalar read
    uses lane index 0 — Mosaic cannot prove a dynamic lane index is
    128-aligned (`c_ref[s, k]` fails to compile), but dynamic SUBLANE
    indices are fine. Per segment s: o[s] = Σ_k v[s*w+k] · t[c[s*w+k]].

    The inner gather is a dynamic single-row VMEM load (`pl.ds(col, 1)`)
    — the only in-kernel gather form that executes on this backend (see
    module docstring). f32 accumulation regardless of table dtype."""

    def kernel(v_ref, c_ref, t_ref, o_ref):
        F = v_ref.shape[0]
        r = t_ref.shape[1]
        C = F // width

        def seg_body(s, carry):
            base = s * width

            def nz_body(k, acc):
                i = base + k
                col = c_ref[i, 0]
                row = t_ref[pl.ds(col, 1), :].astype(jnp.float32)
                return acc + v_ref[i, 0].astype(jnp.float32) * row

            acc = lax.fori_loop(
                0, width, nz_body, jnp.zeros((1, r), jnp.float32)
            )
            o_ref[pl.ds(s, 1), :] = acc
            return carry

        lax.fori_loop(0, C, seg_body, 0)

    return kernel


@functools.partial(
    jax.jit, static_argnames=("chunk", "interpret")
)
def bucket_rowsums_pallas(vals, cols, Ht, chunk: int = 512,
                          interpret: bool = False):
    """Per-segment Σ_k v_k · Ht[col_k] -> (nseg, r) for one ELL bucket.

    Drop-in twin of `sparse_ell._bucket_rowsums` (same contract: pad
    lanes are (col=0, val=0), so they contribute nothing).
    """
    nseg, w = vals.shape
    m, r = Ht.shape
    if not table_fits(m, r, Ht.dtype.itemsize):
        raise ValueError(
            f"Pallas ELL SpMM needs the ({m}, {r}) table VMEM-resident "
            f"({m * r * Ht.dtype.itemsize} B > {VMEM_TABLE_BUDGET} B "
            "budget); use the default XLA engine for this shape"
        )
    # single grid step per call: multi-step grids replicate the
    # grid-invariant table block per pipeline stage (scoped-VMEM OOM),
    # and XLA stages each call's whole result in scoped VMEM — both
    # bound the per-call segment count; larger buckets loop via
    # bucket_accumulate_pallas.
    C = min(chunk, nseg)
    G = (nseg + C - 1) // C
    pad = G * C - nseg
    if pad:
        vals = jnp.pad(vals, ((0, pad), (0, 0)))
        cols = jnp.pad(cols, ((0, pad), (0, 0)))
    T = 1
    OC = C
    # flat (F, 1) layout: in-kernel scalar reads keep a static lane index
    vals_g = vals.reshape(G, OC * w, 1)
    cols_g = cols.reshape(G, OC * w, 1)

    kwargs = {}
    if not interpret:
        from jax.experimental.pallas import tpu as pltpu

        kwargs["compiler_params"] = pltpu.CompilerParams(
            vmem_limit_bytes=min(
                max(4 * m * r * Ht.dtype.itemsize, 16 << 20), 100 << 20
            ),
        )

    call = pl.pallas_call(
        _make_seg_rowsum_kernel(w),
        grid=(T,),
        in_specs=[
            pl.BlockSpec((C * w, 1), lambda g: (g, 0)),
            pl.BlockSpec((C * w, 1), lambda g: (g, 0)),
            pl.BlockSpec((m, r), lambda g: (0, 0)),
        ],
        out_specs=pl.BlockSpec((C, r), lambda g: (g, 0)),
        out_shape=jax.ShapeDtypeStruct((OC, r), jnp.float32),
        interpret=interpret,
        **kwargs,
    )

    if G == 1:
        return call(vals_g[0], cols_g[0], Ht)[:nseg]
    # XLA stages each call's result in scoped VMEM (16 MiB); a mapped
    # (G, OC, r) stack re-triggers the same OOM, so multi-group callers
    # must use bucket_accumulate_pallas (scan + scatter-add carry).
    raise ValueError(
        f"bucket of {nseg} segments needs the accumulate form; call "
        "bucket_accumulate_pallas / v_ht_ell_pallas instead"
    )


def bucket_accumulate_pallas(bucket, Ht, out, chunk: int = 512,
                             interpret: bool = False):
    """Scatter-accumulate one bucket into `out` (n, r): per group of OC
    segments, the Pallas kernel produces (OC, r) segment sums (bounded
    scoped-VMEM footprint) and an XLA sorted scatter-add folds them into
    the running output — no (nseg, r) intermediate ever materializes."""
    vals, cols, rows = bucket.vals, bucket.cols, bucket.out_row
    nseg, w = vals.shape
    m, r = Ht.shape
    C = min(chunk, nseg)
    # one grid step per pallas_call (OC = C): Mosaic allocates the
    # grid-invariant table block once per pipeline stage, so multi-step
    # grids multiply the 6.8 MB table into scoped-VMEM OOM; the group
    # loop lives in the lax.scan below instead.
    OC = C
    G = (nseg + OC - 1) // OC
    pad = G * OC - nseg
    if pad:
        vals = jnp.pad(vals, ((0, pad), (0, 0)))
        cols = jnp.pad(cols, ((0, pad), (0, 0)))
        # pad segments carry zero values; route them at the last row so
        # the non-decreasing out_row contract (sorted scatter) holds
        rows = jnp.pad(rows, (0, pad), mode="edge")
    if G == 1:
        seg = bucket_rowsums_pallas(vals, cols, Ht, chunk=C,
                                    interpret=interpret)
        return out.at[rows].add(
            seg, indices_are_sorted=True, mode="promise_in_bounds"
        )

    vals_g = vals.reshape(G, OC, w)
    cols_g = cols.reshape(G, OC, w)
    rows_g = rows.reshape(G, OC)

    def body(acc, xs):
        v, c, rr = xs
        seg = bucket_rowsums_pallas(v, c, Ht, chunk=C,
                                    interpret=interpret)
        return acc.at[rr].add(
            seg, indices_are_sorted=True, mode="promise_in_bounds"
        ), None

    out, _ = lax.scan(body, out, (vals_g, cols_g, rows_g))
    return out


def v_ht_ell_pallas(ell, H, chunk: int = 512, interpret: bool = False):
    """V @ H^T -> (n, r) with the Pallas kernel doing each bucket's
    gather-multiply-reduce; only the final per-segment row accumulation
    stays an XLA sorted scatter (same as the default engine)."""
    H = jnp.asarray(H)
    Ht = H.T
    n = ell.shape[0]
    r = H.shape[0]
    out = jnp.zeros((n, r), jnp.float32)
    for bucket in ell.buckets:
        out = bucket_accumulate_pallas(
            bucket, Ht, out, chunk=chunk, interpret=interpret
        )
    return out.astype(H.dtype)


def wt_v_ell_pallas(pair, W, chunk: int = 512, interpret: bool = False):
    """W^T V -> (r, m) via the transposed container: (V^T W)^T."""
    return v_ht_ell_pallas(
        pair.cols, jnp.asarray(W).T, chunk=chunk, interpret=interpret
    ).T


def mu_update_frobenius_ell_pallas(pair, W, H, eps=1e-9, order="WH",
                                   interpret: bool = False):
    """Sparse MU (Frobenius) with both SpMM directions on the Pallas
    kernel; denominators/Grams identical to `mu_update_frobenius_ell`."""

    def upd_w(W, H):
        numer = v_ht_ell_pallas(pair.rows, H, interpret=interpret)
        return W * (numer / (W @ (H @ H.T) + eps))

    def upd_h(W, H):
        numer = wt_v_ell_pallas(pair, W, interpret=interpret)
        return H * (numer / ((W.T @ W) @ H + eps))

    if order == "WH":
        W = upd_w(W, H)
        H = upd_h(W, H)
    else:
        H = upd_h(W, H)
        W = upd_w(W, H)
    return W, H


def spmm_supported(shape, rank, itemsize: int = 4) -> bool:
    """Both gather tables (Ht for V@H^T, W for V^T W) must fit VMEM."""
    n, m = shape
    return table_fits(m, rank, itemsize) and table_fits(n, rank, itemsize)
