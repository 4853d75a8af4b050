"""Fused HALS column-sweep kernel.

One HALS half-step is a cyclic Gauss–Seidel sweep over the r columns of
W (reference behavior: SURVEY.md C3/C13 — the reference's per-algorithm
CUDA kernels; sklearn `_cdnmf_fast._update_cdnmf_fast` is the semantic
oracle):

    for t in 0..r:  W[:, t] <- max(W[:, t] - (W G[:, t] - XHt[:, t]) / G[t, t], 0)

The sweep is sequential in t but INDEPENDENT ACROSS ROWS of W — the one
shipped path where a hand kernel structurally beats XLA on this
backend: XLA must carry the (n, r) state through r/block sequential
loop steps, paying HBM round-trips and per-step dispatch each time,
while this kernel grids over row tiles and keeps the W tile, the XHt
tile and the Gram G resident in VMEM across the ENTIRE sweep. HBM
traffic is one read of W and XHt and one write of W' per half-step —
the same traffic as a single elementwise pass.

Inside the kernel the sweep is blocked exactly like
`linalg.dense._hals_half_sweep_blocked` (the same update in exact
arithmetic): per column block, one (b, r) x (r, tile_n) MXU dot forms
the gradient base; the b-step in-block chain applies rank-1 VPU
corrections.

Layout is TRANSPOSED relative to the XLA path — every per-column array
is (1, tile_n) or (b, tile_n), so the long axis rides the 128 lanes
(the first, untransposed cut of this kernel worked on (tile_n, 1)
columns: one lane of 128 busy, and it measured SLOWER than XLA).
Transposing also turns every dynamic slice into a SUBLANE slice, the
one dynamic-indexing form this backend executes well (receipts in
PERF.md round 2) — so the outer block loop is a plain fori_loop and the
program stays small (the fully-unrolled variant took ~400 s of Mosaic
compile time).

The in-block correction coefficients are fed as a host-precomputed
stack of TRANSPOSED diagonal blocks (`GbbT[kb*b + t, s'] =
G[s+s', s+t]`, i.e. column t of the stacked block carries
G[s+t, s+t']), so the kernel needs no lane-dynamic access into G and
no symmetry assumption.

Padding: rows (lanes) pad with zeros — their updates are
self-contained no-ops, cropped on return; columns pad G with zeros so
the hess==0 skip branch (sklearn semantics) makes padded columns exact
no-ops.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def available() -> bool:
    """True when a Mosaic-compiled TPU backend is the default."""
    return jax.default_backend() == "tpu"


def _round_up(x: int, mult: int) -> int:
    return ((x + mult - 1) // mult) * mult


def _sweep_kernel_t(xht_ref, gt_ref, gbbt_ref, w_ref, out_ref, *,
                    r, block):
    # out_ref doubles as the working W^T buffer (VMEM-resident across
    # the whole sweep); each block's base GEMM re-reads it so later
    # blocks see every earlier block's update (Gauss–Seidel across
    # blocks).
    out_ref[:] = w_ref[:]

    def do_block(kb, carry):
        s = kb * block
        GbT = gt_ref[pl.ds(s, block), :]          # (b, r) = G[:, s:s+b].T
        Wt = out_ref[:]                           # (r, tile_n)
        base = (
            jnp.dot(GbT, Wt, preferred_element_type=jnp.float32)
            - xht_ref[pl.ds(s, block), :]
        )                                         # (b, tile_n)
        Wb = out_ref[pl.ds(s, block), :]          # (b, tile_n)
        GbbT = gbbt_ref[pl.ds(s, block), :]       # (b, b), transposed blk
        new_rows = []
        for t in range(block):
            hess = GbbT[t:t + 1, t:t + 1]         # (1, 1) == G[s+t, s+t]
            w_row = Wb[t:t + 1, :]                # (1, tile_n)
            grad = base[t:t + 1, :]
            ok = hess != 0
            new = jnp.maximum(
                w_row - grad / jnp.where(ok, hess, 1.0), 0.0)
            new = jnp.where(ok, new, w_row)
            delta = new - w_row
            # Shift the gradients of the not-yet-visited columns
            # (rows of base): base[s'] += delta * G[s+t, s+s'].
            base = base + GbbT[:, t:t + 1] * delta
            new_rows.append(new)
        # Rows t read their ORIGINAL Wb value at their turn (each
        # column updates once per sweep), so Wb itself never needs
        # rebuilding — the updated rows land here in one write.
        out_ref[pl.ds(s, block), :] = jnp.concatenate(new_rows, axis=0)
        return carry

    lax.fori_loop(0, r // block, do_block, 0)


# Per-grid-step VMEM: three (rp, tile_n) f32 blocks, double-buffered,
# plus the grid-invariant G/GbbT — sized like kernels.dense_mu.
_VMEM_BUDGET = 13 * 1024 * 1024


def _auto_tile(rp: int, n: int) -> int:
    tile = _VMEM_BUDGET // (3 * 2 * 4 * rp)
    tile = max(128, min(4096, (tile // 128) * 128))
    return min(tile, _round_up(n, 128))


@functools.partial(
    jax.jit, static_argnames=("block", "tile_n", "interpret"))
def hals_sweep(XHt, G, W, *, block=16, tile_n=None, interpret=False):
    """One blocked Gauss–Seidel HALS half-sweep, fused in Pallas.

    XHt : (n, r) gradient numerator (V @ H.T - l1, or V.T @ W - l1)
    G   : (r, r) Gram (+ l2 diagonal)
    W   : (n, r) factor being swept
    Returns the swept (n, r) factor; same math as
    `linalg.dense._hals_half_sweep` in exact arithmetic. In f32 the
    summation order differs from both XLA sweeps (the base GEMM runs
    transposed), so agreement is roundoff-level, not bit-identity.
    """
    n, r = W.shape
    f32 = jnp.float32
    XHt, G, W = XHt.astype(f32), G.astype(f32), W.astype(f32)
    block = min(block, r)
    rp = _round_up(max(r, block), block)
    if tile_n is None:
        tile_n = _auto_tile(rp, n)
    else:
        tile_n = min(tile_n, _round_up(n, 128))
    np_ = _round_up(n, tile_n)
    if rp != r or np_ != n:
        XHt = jnp.pad(XHt, ((0, np_ - n), (0, rp - r)))
        W = jnp.pad(W, ((0, np_ - n), (0, rp - r)))
        G = jnp.pad(G, ((0, rp - r), (0, rp - r)))
    # Transposed-block correction stack: GbbT[kb*b+t, s'] = G[s+s', s+t]
    # (the .T below), so GbbT[:, t] supplies G[s+t, s+t'] — exactly the
    # column the correction step consumes; no symmetry assumption.
    nb = rp // block
    GbbT = jnp.concatenate(
        [G[k * block:(k + 1) * block, k * block:(k + 1) * block].T
         for k in range(nb)], axis=0)              # (rp, block)
    out_t = pl.pallas_call(
        functools.partial(_sweep_kernel_t, r=rp, block=block),
        grid=(np_ // tile_n,),
        in_specs=[
            pl.BlockSpec((rp, tile_n), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((rp, rp), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((rp, block), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((rp, tile_n), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((rp, tile_n), lambda i: (0, i),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((rp, np_), f32),
        interpret=interpret,
    )(XHt.T, G.T, GbbT, W.T)
    return out_t.T[:n, :r]
