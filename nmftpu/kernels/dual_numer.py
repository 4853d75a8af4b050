"""Fused dual-numerator kernel: both MU numerators from ONE V read.

Gauss–Seidel MU reads V twice per iteration (once per numerator GEMM —
inherent: the second half-step's numerator uses the first's fresh
factor). Jacobi coupling (`mu_style="jacobi"`, linalg.dense) computes
both numerators from the SAME (W, H) — which makes them fusable: this
kernel streams V's (bn, bm) tiles once and produces

    numer_w = Vq @ Hq^T   (n, r) int32 -> f32 * (scale_v * scale_h)
    numer_h = Wq^T @ Vq   (r, m) int32 -> f32 * (scale_v * scale_w)

with both contractions as int8 x int8 -> int32 on the MXU's double-rate
path. Probe receipts (PERF.md round 5): Mosaic lowers int8 dot_generals
at the chip's full double rate — a lone (4096, 4096) x (4096, 256) GEMM
measures ~406 TOP/s, and THIS kernel's winning schedule (2-D grid,
bn = bm = 1024, W transposed so the n-contraction runs over its lane
dim, the H-side numerator accumulated into a VMEM-resident full-width
output via dynamic-slice stores) measures 42.4 us for BOTH numerators
= 405 TOP/s — against 244-304 TOP/s for the 1-D column-panel schedule
and the sublane-contraction W layout. The earlier round-1/2 "hand GEMM
loses to XLA" receipts were f32/bf16 pipelines; int8 is different.

Grid (i, j) over (n/bn, m/bm) tiles, j minor:
  * numer_w block (bn, r) at i accumulates over j (consecutive
    revisits — Mosaic keeps it in VMEM);
  * numer_h is ONE full (r, m) int32 VMEM block (4 MB at the headline
    shape), zeroed at i == 0 and accumulated at [:, j*bm : (j+1)*bm]
    each step;
  * W rides transposed (r, n) whole; V contributes one (bn, bm) tile.

Reference anchor: SURVEY.md C3/C13 (the reference's MU update kernel
family); the oracle is the XLA formulation in
linalg.dense.mu_update_frobenius_int8x8 (bit-identical quantization and
scale fold — tests/test_jacobi.py).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def available() -> bool:
    return jax.default_backend() == "tpu"


def _kernel(bm, v_ref, wt_ref, h_ref, nw_ref, nh_ref):
    # grid (i, j), j minor: nw's (bn, r) block accumulates over its
    # consecutive j revisits; nh is ONE full-width (r, m) VMEM block
    # accumulated at [:, j*bm:(j+1)*bm] each step (this is the
    # measured-fastest schedule: 42.4 us for both numerators = 405
    # TOP/s standalone — the in-kernel-epilogue and 1-D-panel
    # variants both measured slower, receipts in PERF round 5)
    i = pl.program_id(0)
    j = pl.program_id(1)
    v = v_ref[:]                       # (bn, bm) int8

    @pl.when(j == 0)
    def _():
        nw_ref[:] = jnp.zeros(nw_ref.shape, jnp.int32)

    nw_ref[:] += lax.dot_general(
        v, h_ref[:],                   # (r, bm) int8
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.int32,
    )                                  # (bn, r)

    # W arrives TRANSPOSED (r, n): the n-contraction then runs over
    # W's lane dim (measured 291 vs 244 TOP/s standalone for the
    # sublane-contraction (n, r) form)
    part = lax.dot_general(
        wt_ref[:], v,                  # (r, bn) int8, (bn, bm)
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.int32,
    )                                  # (r, bm)
    sl = pl.ds(j * bm, bm)

    @pl.when(i == 0)
    def _():
        nh_ref[:, sl] = jnp.zeros(part.shape, jnp.int32)

    nh_ref[:, sl] = nh_ref[:, sl] + part


@functools.partial(jax.jit, static_argnames=("bn", "bm", "interpret"))
def _dual_numer_int8(Vq, Wqt, Hq, bn, bm, interpret=False):
    n, m = Vq.shape
    r = Wqt.shape[0]
    grid = (n // bn, m // bm)
    kern = functools.partial(_kernel, bm)
    nw, nh = pl.pallas_call(
        kern,
        grid=grid,
        in_specs=[
            pl.BlockSpec((bn, bm), lambda i, j: (i, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((r, bn), lambda i, j: (0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((r, bm), lambda i, j: (0, j),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((bn, r), lambda i, j: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((r, m), lambda i, j: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((n, r), jnp.int32),
            jax.ShapeDtypeStruct((r, m), jnp.int32),
        ],
        interpret=interpret,
        # the resident set (V tile double-buffered + W + the full-width
        # numer_h accumulator) exceeds the 16 MB default scoped-vmem
        # budget; v5e has 128 MB physical VMEM
        compiler_params=None if interpret else pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
    )(Vq, Wqt, Hq)
    return nw, nh


def dual_numerators_int8(Vq, scale_v, W, H, bn=1024, bm=1024,
                         interpret=False):
    """Both Jacobi-MU numerators from one V pass.

    Vq: (n, m) int8 with symmetric scale `scale_v` (true V =
    scale_v * Vq); W (n, r), H (r, m) f32 factors — quantized here per
    call (cheap VPU O((n+m)r), exactly as the XLA int8x8 path does per
    half-step). Returns (numer_w (n, r) f32 ~= V @ H^T,
    numer_h (r, m) f32 ~= W^T @ V) with both scales folded in.
    Shapes must tile (n % bn == 0, m % bm == 0); the caller falls back
    to the XLA path otherwise.
    """
    from nmftpu.linalg.dense import quantize_sym

    Vq = jnp.asarray(Vq)
    n, m = Vq.shape
    if n % bn != 0 or m % bm != 0:
        raise ValueError(
            f"(n, m) = {(n, m)} must tile into (bn, bm) = {(bn, bm)}"
        )
    scale_w, Wq = quantize_sym(W)
    scale_h, Hq = quantize_sym(H)
    nw, nh = _dual_numer_int8(Vq, Wq.T, Hq, bn, bm,
                              interpret=interpret)
    numer_w = nw.astype(jnp.float32) * (scale_v * scale_h)
    numer_h = nh.astype(jnp.float32) * (scale_v * scale_w)
    return numer_w, numer_h
