"""Fused GEMM + count-above-threshold kernel: the certificate pass at
table-read bandwidth.

`retrieval.mips._count_above` (the exactness certificate's core) is a
blocked GEMM followed by a compare-reduce; XLA materializes each
(b, block) score tile in HBM between the two — ~20 GB of score traffic
for a 512-query batch over m=10.49M, the dominant cost of the certify
pass (measured +12–22 ms over the reservoir scan, PERF round 5). This
kernel keeps the score tile in VMEM and emits only the per-row int32
counts, the same structural move as the reservoir kernel
(kernels/mips_reservoir.py) — pay the table read once, never the score
write.

Grid (q_blocks, tiles), tile minor: each step scores one (r, T) table
tile on the MXU and accumulates sum(score > theta) into the (BQ, 1)
count block (revisited consecutively over tiles). Table padding
columns (gid >= m_items) never count. bf16/int8 tables ONLY (f32
tables would score bf16-rounded queries against the oracle's f32×f32
dot — rejected rather than silently diverging). Dtype rules match
`retrieval.mips._score_dot`'s int8/bf16 path: bf16 operands, f32
accumulation; per-dimension int8 scales fold into the query side
before the kernel (order-preserving and bit-identical to the oracle's
fold); a SCALAR scale folds into theta (s > theta/hs — the oracle
multiplies the score instead, so counts are ulp-equivalent, not
bit-identical, exactly at rounding boundaries of hs*s == theta).

Reference anchor: SURVEY.md §5.7 (the retrieval layer the reference
lacks); the oracle is `retrieval.mips._count_above`, parity-tested in
interpret mode.
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


def _kernel(m_items, tile, wq_ref, h_ref, th_ref, cnt_ref):
    j = pl.program_id(1)

    @pl.when(j == 0)
    def _():
        cnt_ref[:] = jnp.zeros(cnt_ref.shape, jnp.int32)

    h = h_ref[:]
    if jnp.issubdtype(h.dtype, jnp.integer):
        h = h.astype(jnp.bfloat16)
    s = lax.dot_general(
        wq_ref[:], h,
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )                                             # (BQ, T) in VMEM only
    col = lax.broadcasted_iota(jnp.int32, s.shape, 1)
    gid = j * tile + col
    above = (s > th_ref[:]) & (gid < m_items)
    cnt_ref[:] += jnp.sum(above, axis=1, dtype=jnp.int32)[:, None]


@functools.partial(
    jax.jit, static_argnames=("m_items", "tile", "q_block", "interpret")
)
def _count_scan(Wq, Hp, theta, m_items, tile, q_block, interpret=False):
    b = Wq.shape[0]
    r = Wq.shape[1]
    grid = (b // q_block, Hp.shape[1] // tile)
    kern = functools.partial(_kernel, m_items, tile)
    cnt = pl.pallas_call(
        kern,
        grid=grid,
        in_specs=[
            pl.BlockSpec((q_block, r), lambda i, j: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((r, tile), lambda i, j: (0, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((q_block, 1), lambda i, j: (i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((q_block, 1), lambda i, j: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, 1), jnp.int32),
        interpret=interpret,
    )(Wq.astype(jnp.bfloat16), Hp, theta)
    return cnt[:, 0]


def count_above_fused(Wq, H, theta, h_scale=None, tile=4096,
                      q_block=None, m_items=None, interpret=False):
    """Per-row count of items scoring strictly above theta, one fused
    pass. Wq (b, r) f32; H (r, m) bf16/int8 (int8 carries
    `h_scale` exactly as retrieval.mips._score_dot — a (r,) vector
    folds into the queries, a scalar divides theta); theta (b,) f32.
    m_items marks a pre-padded table's true width. Returns (b,) int32.
    Rows whose theta is -inf count every real item (matching the XLA
    pass). bf16/int8 tables only (see module docstring)."""
    Wq = jnp.asarray(Wq)
    H = jnp.asarray(H)
    theta = jnp.asarray(theta, jnp.float32)
    b, r = Wq.shape
    m = H.shape[1] if m_items is None else m_items
    if H.dtype == jnp.float32:
        raise ValueError(
            "count_above_fused supports bfloat16/int8 tables only — "
            "an f32 table's oracle keeps f32 queries, which this "
            "kernel's bf16 cast cannot reproduce"
        )
    if h_scale is not None:
        hs = jnp.asarray(h_scale)
        if not jnp.issubdtype(H.dtype, jnp.integer):
            raise ValueError("h_scale needs an integer item table")
        if hs.ndim == 1:
            Wq = Wq.astype(jnp.float32) * hs
        else:
            # scalar scale: true score = hs * s  =>  s > theta/hs
            theta = theta / hs
    elif jnp.issubdtype(H.dtype, jnp.integer):
        raise ValueError("an integer item table needs h_scale")
    if q_block is None:
        q_block = min(512, max(8, b))
    bp = -(-b // q_block) * q_block
    if bp != b:
        Wq = jnp.pad(Wq, ((0, bp - b), (0, 0)))
        # padded rows: +inf threshold => they count nothing
        theta = jnp.pad(theta, (0, bp - b),
                        constant_values=jnp.inf)
    mp = -(-H.shape[1] // tile) * tile
    Hp = H if mp == H.shape[1] else jnp.pad(H, ((0, 0), (0, mp - H.shape[1])))
    cnt = _count_scan(Wq, Hp, theta.reshape(-1, 1), m, tile, q_block,
                      interpret=interpret)
    return cnt[:b]
