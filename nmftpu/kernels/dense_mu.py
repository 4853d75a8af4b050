"""Fused dense MU update kernels.

One Lee–Seung half-step for H is
    H <- H * (W^T V) / ((W^T W) H + eps)
The naive XLA lowering materializes numerator and denominator (r, m) arrays
in HBM. Here the whole half-step is a single Pallas kernel over a
(m-tiles, n-tiles) grid with the contraction dimension innermost: each
m-tile accumulates W^T V in VMEM scratch across n-tiles and, on the last
n-tile, applies the Gram denominator and the multiply/divide epilogue in
registers before writing the updated H tile — V is read once, H once,
H' written once.

Matmuls run on the MXU as bf16 x bf16 -> f32 (the TPU-native fast path,
matching XLA's default f32 matmul precision); the epilogue runs in f32 on
the VPU. Inputs are zero-padded to tile multiples by the wrappers; padded
rows/columns are exact no-ops (zero numerator, eps-guarded denominator,
zero H) and are cropped on return.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def available() -> bool:
    """True when a Mosaic-compiled TPU backend is the default."""
    return jax.default_backend() == "tpu"


def _round_up(x: int, mult: int) -> int:
    return ((x + mult - 1) // mult) * mult


def _pad2(x, rows, cols):
    pr, pc = rows - x.shape[0], cols - x.shape[1]
    if pr == 0 and pc == 0:
        return x
    return jnp.pad(x, ((0, pr), (0, pc)))


# ---------------------------------------------------------------------------
# Whole-contraction schedule (PERF.md): the entire reduction dimension sits
# in VMEM, so each grid step is one large MXU dot + the fused epilogue.
# Matches XLA's GEMM efficiency (the split-K grid below loses ~2x); chosen
# automatically whenever the strips fit VMEM.
# ---------------------------------------------------------------------------

_VMEM_BUDGET = 13 * 1024 * 1024


def _h_whole_kernel(wt_ref, v_ref, h_ref, g_ref, out_ref, *, eps, mxu):
    # mxu=False (interpret mode on CPU): stay in f32 — the CPU backend has
    # no bf16 GEMM; numerics are a superset of the bf16 path.
    ct = jnp.bfloat16 if mxu else jnp.float32
    v = v_ref[:].astype(ct)
    num = jnp.dot(wt_ref[:].astype(ct), v,
                  preferred_element_type=jnp.float32)
    h = h_ref[:].astype(jnp.float32)
    den = jnp.dot(g_ref[:].astype(ct), h.astype(ct),
                  preferred_element_type=jnp.float32)
    out_ref[:] = (h * num / (den + eps)).astype(out_ref.dtype)


def _h_whole_fits(n, m, r, tile_m, v_bytes) -> bool:
    need = (
        r * n * 2                      # Wt strip (bf16)
        + 2 * n * tile_m * v_bytes     # V strip, double-buffered
        + 2 * r * tile_m * 4 * 2       # H block + out block
        + r * r * 2
    )
    return need <= _VMEM_BUDGET


def _h_update_whole(Vp, Wp, Hp, Gp, eps, tile_m, interpret):
    rp, mp = Hp.shape
    np_ = Vp.shape[0]
    Wt = (Wp.T if interpret else Wp.astype(jnp.bfloat16).T)
    return pl.pallas_call(
        functools.partial(_h_whole_kernel, eps=eps, mxu=not interpret),
        grid=(mp // tile_m,),
        in_specs=[
            pl.BlockSpec((rp, np_), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((np_, tile_m), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((rp, tile_m), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((rp, rp), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((rp, tile_m), lambda i: (0, i),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((rp, mp), Hp.dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel",),
        ),
        interpret=interpret,
    )(Wt, Vp, Hp, Gp if interpret else Gp.astype(jnp.bfloat16))


def _w_whole_kernel(v_ref, ht_ref, w_ref, g_ref, out_ref, *, eps, mxu):
    ct = jnp.bfloat16 if mxu else jnp.float32
    v = v_ref[:].astype(ct)
    num = jnp.dot(v, ht_ref[:].astype(ct),
                  preferred_element_type=jnp.float32)
    w = w_ref[:].astype(jnp.float32)
    den = jnp.dot(w.astype(ct), g_ref[:].astype(ct),
                  preferred_element_type=jnp.float32)
    out_ref[:] = (w * num / (den + eps)).astype(out_ref.dtype)


def _w_whole_fits(n, m, r, tile_n, v_bytes) -> bool:
    need = (
        m * r * 2
        + 2 * tile_n * m * v_bytes
        + 2 * tile_n * r * 4 * 2
        + r * r * 2
    )
    return need <= _VMEM_BUDGET


def _w_update_whole(Vp, Wp, Hp, Gp, eps, tile_n, interpret):
    np_, rp = Wp.shape
    mp = Vp.shape[1]
    Ht = (Hp.T if interpret else Hp.astype(jnp.bfloat16).T)
    return pl.pallas_call(
        functools.partial(_w_whole_kernel, eps=eps, mxu=not interpret),
        grid=(np_ // tile_n,),
        in_specs=[
            pl.BlockSpec((tile_n, mp), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((mp, rp), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((tile_n, rp), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((rp, rp), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((tile_n, rp), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((np_, rp), Wp.dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel",),
        ),
        interpret=interpret,
    )(Vp, Ht, Wp, Gp if interpret else Gp.astype(jnp.bfloat16))


# ---------------------------------------------------------------------------
# Split-K schedule (fallback for contraction strips beyond VMEM):
# Fused H half-step: H' = H * (W^T V) / (G H + eps), G = W^T W
# ---------------------------------------------------------------------------


def _h_update_kernel(w_ref, v_ref, h_ref, g_ref, out_ref, acc_ref, *, eps):
    n_idx = pl.program_id(1)
    n_total = pl.num_programs(1)

    @pl.when(n_idx == 0)
    def _():
        acc_ref[:] = jnp.zeros_like(acc_ref)

    w = w_ref[:].astype(jnp.bfloat16)           # (TN, r)
    v = v_ref[:].astype(jnp.bfloat16)           # (TN, TM)
    acc_ref[:] += jax.lax.dot_general(
        w, v, dimension_numbers=(((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )                                           # (r, TM)

    @pl.when(n_idx == n_total - 1)
    def _():
        h = h_ref[:].astype(jnp.float32)        # (r, TM)
        g = g_ref[:].astype(jnp.bfloat16)       # (r, r)
        den = jnp.dot(
            g, h.astype(jnp.bfloat16), preferred_element_type=jnp.float32
        )
        out_ref[:] = (h * acc_ref[:] / (den + eps)).astype(out_ref.dtype)


@functools.partial(
    jax.jit, static_argnames=("eps", "tile_m", "tile_n", "interpret")
)
def h_update_fused(
    V, W, H, G, eps=1e-9, tile_m=512, tile_n=1024, interpret=False
):
    """H * (W^T V) / (G H + eps) in one kernel. V (n,m), W (n,r), H (r,m),
    G (r,r) = W^T W (computed by the caller — O(nr^2), one small GEMM)."""
    n, m = V.shape
    r = H.shape[0]
    rp = _round_up(r, 128)
    tile_m = min(tile_m, _round_up(m, 128))
    tile_n = min(tile_n, _round_up(n, 128))
    mp = _round_up(m, tile_m)
    np_ = _round_up(n, tile_n)

    Vp = _pad2(V, np_, mp)
    Wp = _pad2(W, np_, rp)
    Hp = _pad2(H, rp, mp)
    Gp = _pad2(G, rp, rp)

    wk_tile = min(256, _round_up(m, 128))
    if mp % wk_tile == 0 and _h_whole_fits(
        np_, mp, rp, wk_tile, Vp.dtype.itemsize
    ):
        out = _h_update_whole(Vp, Wp, Hp, Gp, eps, wk_tile, interpret)
        return out[:r, :m]

    grid = (mp // tile_m, np_ // tile_n)
    out = pl.pallas_call(
        functools.partial(_h_update_kernel, eps=eps),
        grid=grid,
        in_specs=[
            pl.BlockSpec((tile_n, rp), lambda i, j: (j, 0),
                         memory_space=pltpu.VMEM),            # W
            pl.BlockSpec((tile_n, tile_m), lambda i, j: (j, i),
                         memory_space=pltpu.VMEM),            # V
            pl.BlockSpec((rp, tile_m), lambda i, j: (0, i),
                         memory_space=pltpu.VMEM),            # H
            pl.BlockSpec((rp, rp), lambda i, j: (0, 0),
                         memory_space=pltpu.VMEM),            # G
        ],
        out_specs=pl.BlockSpec((rp, tile_m), lambda i, j: (0, i),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((rp, mp), H.dtype),
        scratch_shapes=[pltpu.VMEM((rp, tile_m), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary"),
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * np_ * mp * rp + 2 * rp * rp * mp,
            bytes_accessed=(np_ * mp + np_ * rp + 2 * rp * mp) * 4,
            transcendentals=0,
        ),
        interpret=interpret,
    )(Wp, Vp, Hp, Gp)
    return out[:r, :m]


# ---------------------------------------------------------------------------
# Fused W half-step: W' = W * (V H^T) / (W G + eps), G = H H^T
# ---------------------------------------------------------------------------


def _w_update_kernel(v_ref, h_ref, w_ref, g_ref, out_ref, acc_ref, *, eps):
    m_idx = pl.program_id(1)
    m_total = pl.num_programs(1)

    @pl.when(m_idx == 0)
    def _():
        acc_ref[:] = jnp.zeros_like(acc_ref)

    v = v_ref[:].astype(jnp.bfloat16)           # (TN, TM)
    h = h_ref[:].astype(jnp.bfloat16)           # (r, TM)
    acc_ref[:] += jax.lax.dot_general(
        v, h, dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )                                           # (TN, r)

    @pl.when(m_idx == m_total - 1)
    def _():
        w = w_ref[:].astype(jnp.float32)        # (TN, r)
        g = g_ref[:].astype(jnp.bfloat16)       # (r, r)
        den = jnp.dot(
            w.astype(jnp.bfloat16), g, preferred_element_type=jnp.float32
        )
        out_ref[:] = (w * acc_ref[:] / (den + eps)).astype(out_ref.dtype)


@functools.partial(
    jax.jit, static_argnames=("eps", "tile_m", "tile_n", "interpret")
)
def w_update_fused(
    V, W, H, G, eps=1e-9, tile_m=1024, tile_n=512, interpret=False
):
    """W * (V H^T) / (W G + eps) in one kernel; G (r,r) = H H^T."""
    n, m = V.shape
    r = H.shape[0]
    rp = _round_up(r, 128)
    tile_m = min(tile_m, _round_up(m, 128))
    tile_n = min(tile_n, _round_up(n, 128))
    mp = _round_up(m, tile_m)
    np_ = _round_up(n, tile_n)

    Vp = _pad2(V, np_, mp)
    Wp = _pad2(W, np_, rp)
    Hp = _pad2(H, rp, mp)
    Gp = _pad2(G, rp, rp)

    wk_tile = min(256, _round_up(n, 128))
    if np_ % wk_tile == 0 and _w_whole_fits(
        np_, mp, rp, wk_tile, Vp.dtype.itemsize
    ):
        out = _w_update_whole(Vp, Wp, Hp, Gp, eps, wk_tile, interpret)
        return out[:n, :r]

    grid = (np_ // tile_n, mp // tile_m)
    out = pl.pallas_call(
        functools.partial(_w_update_kernel, eps=eps),
        grid=grid,
        in_specs=[
            pl.BlockSpec((tile_n, tile_m), lambda i, j: (i, j),
                         memory_space=pltpu.VMEM),            # V
            pl.BlockSpec((rp, tile_m), lambda i, j: (0, j),
                         memory_space=pltpu.VMEM),            # H
            pl.BlockSpec((tile_n, rp), lambda i, j: (i, 0),
                         memory_space=pltpu.VMEM),            # W
            pl.BlockSpec((rp, rp), lambda i, j: (0, 0),
                         memory_space=pltpu.VMEM),            # G
        ],
        out_specs=pl.BlockSpec((tile_n, rp), lambda i, j: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((np_, rp), W.dtype),
        scratch_shapes=[pltpu.VMEM((tile_n, rp), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary"),
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * np_ * mp * rp + 2 * np_ * rp * rp,
            bytes_accessed=(np_ * mp + np_ * rp * 2 + rp * mp) * 4,
            transcendentals=0,
        ),
        interpret=interpret,
    )(Vp, Hp, Wp, Gp)
    return out[:n, :r]


# ---------------------------------------------------------------------------
# Standalone fused multiply-divide (the reference's elementwise MU kernel)
# ---------------------------------------------------------------------------


def _muldiv_kernel(x_ref, num_ref, den_ref, out_ref, *, eps):
    out_ref[:] = x_ref[:] * num_ref[:] / (den_ref[:] + eps)


def fused_multiply_divide(X, numer, denom, eps=1e-9, interpret=False):
    """X * numer / (denom + eps) — one VPU pass (SURVEY.md C13)."""
    return pl.pallas_call(
        functools.partial(_muldiv_kernel, eps=eps),
        out_shape=jax.ShapeDtypeStruct(X.shape, X.dtype),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 3,
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        interpret=interpret,
    )(X, numer, denom)


# ---------------------------------------------------------------------------
# Full fused MU iteration
# ---------------------------------------------------------------------------


def mu_update_frobenius_fused(
    V, W, H, eps=1e-9, order="WH", interpret=False
):
    """One full MU (Frobenius) iteration with fused half-step kernels.
    Semantics identical to nmftpu.linalg.dense.mu_update_frobenius."""
    if order == "WH":
        W = w_update_fused(V, W, H, H @ H.T, eps=eps, interpret=interpret)
        H = h_update_fused(V, W, H, W.T @ W, eps=eps, interpret=interpret)
    else:
        H = h_update_fused(V, W, H, W.T @ W, eps=eps, interpret=interpret)
        W = w_update_fused(V, W, H, H @ H.T, eps=eps, interpret=interpret)
    return W, H
