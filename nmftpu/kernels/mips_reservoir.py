"""Fused GEMM + top-2-per-slot reservoir scan for top-k MIPS serving.

The megablock serving path (retrieval/mips.py, PERF.md round 4) is
bounded by SCORE traffic, not table traffic: XLA materializes each
(b, block) score tile in HBM between the scoring GEMM and
`approx_max_k`, so a 512-query batch over m=10.49M items moves ~40 GB
of scores against a 2.7 GB item table. This kernel fuses the two: the
score tile lives only in VMEM, and the HBM bill drops to ONE read of
the item table per batch (plus the tiny carry), the same structural
argument as the HALS sweep kernel (kernels/hals_sweep.py) — keep the
state resident, pay memory traffic once.

Reduction: a RESERVOIR of R slots per query, slot = item_id mod R,
keeping the best TWO (score, id) pairs per slot. Each grid step scores
one (r, T=R) table tile on the MXU and merges it elementwise into the
carry on the VPU — no gathers, no scatters, no sorts (the op families
the probe receipts in PERF.md round 2 showed this backend executes
well). The final exact `lax.top_k` runs over the (b, 2R) candidates
outside the kernel.

Recall analysis (balanced/hashed item ids ~ uniform over slots): a
rank-i item is missed only if >= 2 higher-ranked items share its slot,
so E[missed among top-k] ~= C(k, 3)/R^2 -> recall@100 ~= 0.99990 at
R=4096, 0.999976 at R=8192 (top-1 reservoirs would need R~65k for the
same — that's why the kernel keeps two). Measured numbers live in
PERF.md / BENCH_retrieval_10m.json next to the approx_max_k path.

Reference anchor: the reference library has no retrieval layer at all
(SURVEY.md §5.7 — the 10M-item axis is the headline capability gap the
TPU build closes); the oracle for this kernel is the exact blocked scan
in retrieval/mips.py.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG = float("-inf")


def available() -> bool:
    """True when a Mosaic-compiled TPU backend is the default."""
    return jax.default_backend() == "tpu"


def _kernel(m_items, tile, wq_ref, h_ref, s1_ref, i1_ref, s2_ref,
            i2_ref):
    j = pl.program_id(1)

    @pl.when(j == 0)
    def _():
        s1_ref[:] = jnp.full(s1_ref.shape, NEG, jnp.float32)
        s2_ref[:] = jnp.full(s2_ref.shape, NEG, jnp.float32)
        i1_ref[:] = jnp.zeros(i1_ref.shape, jnp.int32)
        i2_ref[:] = jnp.zeros(i2_ref.shape, jnp.int32)

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
    # table padding columns (gid >= m) must never surface
    s = jnp.where(gid < m_items, s, NEG)

    s1, s2 = s1_ref[:], s2_ref[:]
    i1, i2 = i1_ref[:], i2_ref[:]
    beats1 = s > s1
    s2_ref[:] = jnp.maximum(jnp.minimum(s, s1), s2)
    i2_ref[:] = jnp.where(beats1, i1, jnp.where(s > s2, gid, i2))
    s1_ref[:] = jnp.maximum(s, s1)
    i1_ref[:] = jnp.where(beats1, gid, i1)


@functools.partial(
    jax.jit,
    static_argnames=("m_items", "slots", "q_block", "interpret"),
)
def _reservoir_scan(Wq, Hp, m_items, slots, q_block, interpret=False):
    """Grid-scan Hp's (r, slots) tiles, returning the (b, 2*slots)
    reservoir candidates (scores, ids). Hp must be column-padded to a
    multiple of `slots`; Wq row-padded to a multiple of q_block."""
    b, r = Wq.shape
    ntiles = Hp.shape[1] // slots
    nq = b // q_block
    grid = (nq, ntiles)
    kern = functools.partial(_kernel, m_items, slots)
    out_shape = [
        jax.ShapeDtypeStruct((b, slots), jnp.float32),
        jax.ShapeDtypeStruct((b, slots), jnp.int32),
        jax.ShapeDtypeStruct((b, slots), jnp.float32),
        jax.ShapeDtypeStruct((b, slots), jnp.int32),
    ]
    out_spec = pl.BlockSpec((q_block, slots), lambda i, j: (i, 0),
                            memory_space=pltpu.VMEM)
    s1, i1, s2, i2 = pl.pallas_call(
        kern,
        grid=grid,
        in_specs=[
            pl.BlockSpec((q_block, r), lambda i, j: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((r, slots), lambda i, j: (0, j),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[out_spec] * 4,
        out_shape=out_shape,
        interpret=interpret,
        # the per-step working set (4 carry blocks + the score tile at
        # (q_block, slots) + the double-buffered table tile) exceeds
        # the 16 MB default scoped-vmem budget for q_block=512 batches
        # beyond ~512 queries; v5e has 128 MB physical VMEM
        compiler_params=None if interpret else pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
    )(Wq.astype(jnp.bfloat16), Hp)
    return (jnp.concatenate([s1, s2], axis=1),
            jnp.concatenate([i1, i2], axis=1))


@functools.partial(
    jax.jit,
    static_argnames=("k", "slots", "q_block", "interpret", "m_items"),
)
def reservoir_topk_mips(Wq, H, k, slots=4096, seen=None, h_scale=None,
                        q_block=None, interpret=False, m_items=None):
    """Top-k MIPS via the fused reservoir kernel.

    Wq: (b, r) f32/bf16 queries; H: (r, m) item table (f32, bf16 or
    int8 — int8 carries `h_scale` exactly as retrieval/mips._score_dot).
    seen: optional (b, S) padded item-id array, excluded EXACTLY from
    the returned top-k by the same oversampled drop as
    `topk_mips_excluded` (candidates = 2*slots >> k + S).
    m_items: true item count when H was PRE-padded to a slots multiple
    (serving pads once at table load; per-call padding would copy the
    multi-GB table every batch) — columns >= m_items never surface.
    Returns (scores (b, k), indices (b, k)).
    """
    from nmftpu.retrieval.mips import _drop_seen

    Wq = jnp.asarray(Wq)
    H = jnp.asarray(H)
    b, r = Wq.shape
    m = H.shape[1] if m_items is None else m_items
    if seen is not None and k + seen.shape[1] > 2 * slots:
        raise ValueError(
            f"k + seen width = {k + seen.shape[1]} exceeds the "
            f"2*slots = {2 * slots} reservoir candidates; raise slots "
            "or trim the per-user seen lists"
        )
    if h_scale is not None and not jnp.issubdtype(H.dtype, jnp.integer):
        raise ValueError(
            "h_scale is only meaningful with an integer item table"
        )
    if h_scale is None and jnp.issubdtype(H.dtype, jnp.integer):
        raise ValueError(
            "an integer item table needs its quantization scale "
            "(h_scale)"
        )
    vector_scale = h_scale is not None and jnp.asarray(h_scale).ndim == 1
    if vector_scale:
        # per-dimension scales (true H = diag(h_scale) @ H_int8) fold
        # into the QUERY side — free on the scan (see mips._score_dot)
        Wq = Wq.astype(jnp.float32) * jnp.asarray(h_scale)
    if q_block is None:
        q_block = min(512, max(8, b))
    bp = -(-b // q_block) * q_block
    if bp != b:
        Wq = jnp.pad(Wq, ((0, bp - b), (0, 0)))
    mp = -(-H.shape[1] // slots) * slots
    Hp = H if mp == H.shape[1] else jnp.pad(
        H, ((0, 0), (0, mp - H.shape[1])))
    cand_s, cand_i = _reservoir_scan(Wq, Hp, m, slots, q_block,
                                     interpret=interpret)
    cand_s = cand_s[:b]
    cand_i = cand_i[:b]
    if h_scale is not None and not vector_scale:
        cand_s = cand_s * h_scale
    if seen is not None:
        return _drop_seen(cand_s, cand_i, jnp.asarray(seen), k)
    top_s, pos = lax.top_k(cand_s, k)
    return top_s, jnp.take_along_axis(cand_i, pos, axis=1)
