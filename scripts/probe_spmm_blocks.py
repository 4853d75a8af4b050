"""Round-2 probe: building blocks of the blocked-ELL Pallas SpMM.

Design under test (STATUS.md §6 recipe + pallas_guide):
  - table block (B, r) VMEM-resident; chunk of F = B nonzeros
  - cols stored flat as (F, 1) int32; broadcast to (F, r) in kernel
  - gather via take_along_axis(table, idx, axis=0)  [tpu.dynamic_gather]
  - segment-reduce width-w groups via static block-diagonal 0/1 matmul
    (MXU), or strided-slice accumulation (VPU) if it lowers
  - scalar-prefetch block index driving the table BlockSpec index_map

Each probe reports OK/FAIL + slope timing where meaningful.
"""

import functools
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def slope_time(fn, *args, lo=50, hi=250):
    """us per op via k-iteration fori_loop slope (see PERF.md method)."""
    import jax
    import jax.numpy as jnp

    def run_k(k, *a):
        def body(_, acc):
            return acc + jnp.sum(fn(*a))
        return jax.lax.fori_loop(0, k, body, jnp.asarray(0.0, jnp.float32))

    f = jax.jit(run_k, static_argnums=(0,))
    float(f(lo, *args)); float(f(hi, *args))
    ts = {}
    for k in (lo, hi):
        best = 1e9
        for _ in range(3):
            t0 = time.perf_counter()
            float(f(k, *args))
            best = min(best, time.perf_counter() - t0)
        ts[k] = best
    return (ts[hi] - ts[lo]) / (hi - lo) * 1e6


def main():
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    jax.config.update("jax_compilation_cache_dir", "/tmp/nmftpu_jax_cache")
    print("devices:", jax.devices(), flush=True)

    rng = np.random.default_rng(0)
    B = 2048          # table block rows == chunk nonzeros F
    r = 128
    w = 32            # segment width
    S = B // w        # segments per chunk

    table = jnp.asarray(rng.uniform(0.1, 1.0, (B, r)), jnp.float32)
    cols = jnp.asarray(rng.integers(0, B, (B, 1)), jnp.int32)
    vals = jnp.asarray(rng.uniform(0.1, 1.0, (B, 1)), jnp.float32)

    want_g = np.asarray(table)[np.asarray(cols)[:, 0]]
    want_seg = (np.asarray(vals) * want_g).reshape(S, w, r).sum(1)

    # ---- P1: gather via broadcast take_along_axis + val multiply ----
    def k_gather(t_ref, c_ref, v_ref, o_ref):
        idx = jnp.broadcast_to(c_ref[:], (B, r))
        g = jnp.take_along_axis(t_ref[:], idx, axis=0)
        o_ref[:] = v_ref[:] * g

    try:
        f = lambda t, c, v: pl.pallas_call(
            k_gather,
            out_shape=jax.ShapeDtypeStruct((B, r), jnp.float32),
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 3,
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        )(t, c, v)
        out = f(table, cols, vals)
        np.testing.assert_allclose(np.asarray(out), np.asarray(vals) * want_g,
                                   rtol=1e-5)
        us = slope_time(f, table, cols, vals)
        print(f"P1 gather+mul (B={B},r={r}): OK  {us:.1f} us "
              f"({B/us*1e6/1e9:.2f} Grows/s)", flush=True)
    except Exception as e:
        print(f"P1 gather+mul FAILED: {type(e).__name__}: {str(e)[:200]}",
              flush=True)

    # ---- P2: + static block-diagonal selection matmul (full chunk) ----
    def k_sel(t_ref, c_ref, v_ref, o_ref):
        idx = jnp.broadcast_to(c_ref[:], (B, r))
        g = jnp.take_along_axis(t_ref[:], idx, axis=0)
        gv = (v_ref[:] * g).astype(jnp.bfloat16)
        seg_of = jax.lax.broadcasted_iota(jnp.int32, (S, B), 1) // w
        sel = (seg_of == jax.lax.broadcasted_iota(jnp.int32, (S, B), 0))
        o_ref[:] = jnp.dot(sel.astype(jnp.bfloat16), gv,
                           preferred_element_type=jnp.float32)

    try:
        f2 = lambda t, c, v: pl.pallas_call(
            k_sel,
            out_shape=jax.ShapeDtypeStruct((S, r), jnp.float32),
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 3,
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        )(t, c, v)
        out = f2(table, cols, vals)
        np.testing.assert_allclose(np.asarray(out), want_seg, rtol=2e-2,
                                   atol=1e-2)
        us = slope_time(f2, table, cols, vals)
        print(f"P2 gather+sel-matmul (w={w}): OK  {us:.1f} us "
              f"({B/us*1e6/1e9:.2f} Gnnz/s)", flush=True)
    except Exception as e:
        print(f"P2 sel-matmul FAILED: {type(e).__name__}: {str(e)[:200]}",
              flush=True)

    # ---- P3: strided-slice accumulation instead of matmul ----
    def k_stride(t_ref, c_ref, v_ref, o_ref):
        idx = jnp.broadcast_to(c_ref[:], (B, r))
        g = jnp.take_along_axis(t_ref[:], idx, axis=0)
        gv = v_ref[:] * g
        acc = gv[0::w, :]
        for off in range(1, w):
            acc = acc + gv[off::w, :]
        o_ref[:] = acc

    try:
        f3 = lambda t, c, v: pl.pallas_call(
            k_stride,
            out_shape=jax.ShapeDtypeStruct((S, r), jnp.float32),
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 3,
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        )(t, c, v)
        out = f3(table, cols, vals)
        np.testing.assert_allclose(np.asarray(out), want_seg, rtol=1e-4)
        us = slope_time(f3, table, cols, vals)
        print(f"P3 gather+strided-reduce: OK  {us:.1f} us", flush=True)
    except Exception as e:
        print(f"P3 strided-reduce FAILED: {type(e).__name__}: "
              f"{str(e)[:200]}", flush=True)

    # ---- P4: row-sum to (B, 1) (SDDMM shape) ----
    def k_rowsum(t_ref, c_ref, v_ref, o_ref):
        idx = jnp.broadcast_to(c_ref[:], (B, r))
        g = jnp.take_along_axis(t_ref[:], idx, axis=0)
        o_ref[:] = jnp.sum(v_ref[:] * g, axis=1, keepdims=True)

    try:
        f4 = lambda t, c, v: pl.pallas_call(
            k_rowsum,
            out_shape=jax.ShapeDtypeStruct((B, 1), jnp.float32),
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 3,
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        )(t, c, v)
        out = f4(table, cols, vals)
        np.testing.assert_allclose(
            np.asarray(out)[:, 0],
            (np.asarray(vals) * want_g).sum(1), rtol=1e-5)
        us = slope_time(f4, table, cols, vals)
        print(f"P4 gather+rowsum(SDDMM): OK  {us:.1f} us", flush=True)
    except Exception as e:
        print(f"P4 rowsum FAILED: {type(e).__name__}: {str(e)[:200]}",
              flush=True)

    # ---- P5: grid + scalar-prefetch block index selecting table block ----
    NBLK = 4
    NCHUNK = 8
    big_table = jnp.asarray(rng.uniform(0.1, 1.0, (NBLK * B, r)),
                            jnp.float32)
    blkidx = jnp.asarray(rng.integers(0, NBLK, (NCHUNK,)), jnp.int32)
    blkidx = jnp.sort(blkidx)
    cols_m = jnp.asarray(rng.integers(0, B, (NCHUNK * B, 1)), jnp.int32)
    vals_m = jnp.asarray(rng.uniform(0.1, 1.0, (NCHUNK * B, 1)),
                         jnp.float32)

    bt = np.asarray(big_table).reshape(NBLK, B, r)
    want5 = np.zeros((NCHUNK * S, r), np.float32)
    for gidx in range(NCHUNK):
        blk = int(blkidx[gidx])
        c = np.asarray(cols_m)[gidx * B:(gidx + 1) * B, 0]
        v = np.asarray(vals_m)[gidx * B:(gidx + 1) * B, 0]
        gv = v[:, None] * bt[blk][c]
        want5[gidx * S:(gidx + 1) * S] = gv.reshape(S, w, r).sum(1)

    def k_grid(bidx_ref, t_ref, c_ref, v_ref, o_ref):
        idx = jnp.broadcast_to(c_ref[:], (B, r))
        g = jnp.take_along_axis(t_ref[:], idx, axis=0)
        gv = (v_ref[:] * g).astype(jnp.bfloat16)
        seg_of = jax.lax.broadcasted_iota(jnp.int32, (S, B), 1) // w
        sel = (seg_of == jax.lax.broadcasted_iota(jnp.int32, (S, B), 0))
        o_ref[:] = jnp.dot(sel.astype(jnp.bfloat16), gv,
                           preferred_element_type=jnp.float32)

    try:
        grid_spec = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(NCHUNK,),
            in_specs=[
                pl.BlockSpec((B, r), lambda g, bidx: (bidx[g], 0)),
                pl.BlockSpec((B, 1), lambda g, bidx: (g, 0)),
                pl.BlockSpec((B, 1), lambda g, bidx: (g, 0)),
            ],
            out_specs=pl.BlockSpec((S, r), lambda g, bidx: (g, 0)),
        )
        f5 = lambda bi, t, c, v: pl.pallas_call(
            k_grid,
            out_shape=jax.ShapeDtypeStruct((NCHUNK * S, r), jnp.float32),
            grid_spec=grid_spec,
        )(bi, t, c, v)
        out = f5(blkidx, big_table, cols_m, vals_m)
        np.testing.assert_allclose(np.asarray(out), want5, rtol=2e-2,
                                   atol=1e-2)
        us = slope_time(f5, blkidx, big_table, cols_m, vals_m)
        print(f"P5 grid+prefetch blockspec: OK  {us:.1f} us total "
              f"({NCHUNK*B/us*1e6/1e9:.2f} Gnnz/s)", flush=True)
    except Exception as e:
        print(f"P5 grid+prefetch FAILED: {type(e).__name__}: "
              f"{str(e)[:300]}", flush=True)

    # ---- P6: bf16 table gather ----
    tb16 = table.astype(jnp.bfloat16)

    def k_gather16(t_ref, c_ref, v_ref, o_ref):
        idx = jnp.broadcast_to(c_ref[:], (B, r))
        g = jnp.take_along_axis(t_ref[:], idx, axis=0)
        o_ref[:] = v_ref[:] * g.astype(jnp.float32)

    try:
        f6 = lambda t, c, v: pl.pallas_call(
            k_gather16,
            out_shape=jax.ShapeDtypeStruct((B, r), jnp.float32),
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 3,
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        )(t, c, v)
        out = f6(tb16, cols, vals)
        np.testing.assert_allclose(np.asarray(out), np.asarray(vals)
                                   * want_g, rtol=1e-2, atol=1e-2)
        us = slope_time(f6, tb16, cols, vals)
        print(f"P6 bf16-table gather: OK  {us:.1f} us", flush=True)
    except Exception as e:
        print(f"P6 bf16 gather FAILED: {type(e).__name__}: {str(e)[:200]}",
              flush=True)


if __name__ == "__main__":
    main()
