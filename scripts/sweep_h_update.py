"""Microbench: h_update kernel variants vs. the jnp equivalent.
Run: python scripts/sweep_h_update.py"""

import functools
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    jax.config.update("jax_compilation_cache_dir", "/tmp/nmftpu_jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    rng = np.random.default_rng(0)
    n = m = 4096
    r = 256
    V32 = jnp.asarray(rng.uniform(0.1, 1.0, (n, m)), jnp.float32)
    W32 = jnp.asarray(rng.uniform(0.1, 1.0, (n, r)), jnp.float32)
    H32 = jnp.asarray(rng.uniform(0.1, 1.0, (r, m)), jnp.float32)
    flops = 2 * n * m * r + 2 * r * r * m

    def rate(fn, args, label):
        def run_k(k, *a):
            def body(_, H):
                return fn(*a[:-1], H)
            return jnp.sum(jax.lax.fori_loop(0, k, body, a[-1]))

        f = jax.jit(run_k, static_argnums=(0,))
        try:
            float(f(20, *args)); float(f(100, *args))
            ts = {}
            for k in (20, 100):
                best = 1e9
                for _ in range(3):
                    t0 = time.perf_counter()
                    float(f(k, *args))
                    best = min(best, time.perf_counter() - t0)
                ts[k] = best
            slope = (ts[100] - ts[20]) / 80
            print(f"{label:44s} {flops / slope / 1e12:8.1f} TFLOP/s",
                  flush=True)
        except Exception as e:
            msg = str(e).split("\n")[0][:120]
            print(f"{label:44s} FAILED {type(e).__name__}: {msg}",
                  flush=True)

    # jnp reference (f32 and with bf16 V)
    def jnp_h(V, W, H):
        return H * (W.T @ V) / ((W.T @ W) @ H + 1e-9)

    rate(jnp_h, (V32, W32, H32), "jnp f32")
    rate(jnp_h, (V32.astype(jnp.bfloat16).astype(jnp.float32), W32, H32),
         "jnp f32 (noop)")
    Vb = V32.astype(jnp.bfloat16)
    def jnp_h_bf16(V, W, H):
        num = jax.lax.dot_general(
            W.astype(jnp.bfloat16), V,
            dimension_numbers=(((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        return H * num / ((W.T @ W) @ H + 1e-9)
    rate(jnp_h_bf16, (Vb, W32, H32), "jnp bf16-V")

    # pallas variant A: current layout (W untransposed)
    from nmftpu.kernels import dense_mu as K
    def pall_a(V, W, H):
        return K.h_update_fused(V, W, H, W.T @ W, eps=1e-9,
                                tile_m=512, tile_n=1024)
    rate(pall_a, (V32, W32, H32), "pallas A (Wt in-kernel)")

    # pallas variant B: W pre-transposed outside, clean (r,TN)@(TN,TM)
    def mk_b(tile_m, tile_n, vdtype):
        def kern(wt_ref, v_ref, h_ref, g_ref, out_ref, acc_ref):
            nj = pl.program_id(1)
            @pl.when(nj == 0)
            def _():
                acc_ref[:] = jnp.zeros_like(acc_ref)
            wt = wt_ref[:].astype(jnp.bfloat16)          # (r, TN)
            v = v_ref[:].astype(jnp.bfloat16)            # (TN, TM)
            acc_ref[:] += jnp.dot(wt, v,
                                  preferred_element_type=jnp.float32)
            @pl.when(nj == pl.num_programs(1) - 1)
            def _():
                h = h_ref[:].astype(jnp.float32)
                den = jnp.dot(g_ref[:].astype(jnp.bfloat16),
                              h.astype(jnp.bfloat16),
                              preferred_element_type=jnp.float32)
                out_ref[:] = (h * acc_ref[:] / (den + 1e-9)).astype(
                    out_ref.dtype)

        @jax.jit
        def call(Wt, V, H, G):
            grid = (m // tile_m, n // tile_n)
            return pl.pallas_call(
                kern,
                grid=grid,
                in_specs=[
                    pl.BlockSpec((r, tile_n), lambda i, j: (0, j),
                                 memory_space=pltpu.VMEM),
                    pl.BlockSpec((tile_n, tile_m), lambda i, j: (j, i),
                                 memory_space=pltpu.VMEM),
                    pl.BlockSpec((r, tile_m), lambda i, j: (0, i),
                                 memory_space=pltpu.VMEM),
                    pl.BlockSpec((r, r), lambda i, j: (0, 0),
                                 memory_space=pltpu.VMEM),
                ],
                out_specs=pl.BlockSpec((r, tile_m), lambda i, j: (0, i),
                                       memory_space=pltpu.VMEM),
                out_shape=jax.ShapeDtypeStruct((r, m), jnp.float32),
                scratch_shapes=[pltpu.VMEM((r, tile_m), jnp.float32)],
                compiler_params=pltpu.CompilerParams(
                    dimension_semantics=("parallel", "arbitrary")),
            )(Wt, V, H, G)

        def h_upd(V, W, H):
            return call(W.T, V, H, W.T @ W)
        return h_upd

    for tm, tn in [(512, 512), (512, 1024), (1024, 512), (512, 2048)]:
        rate(mk_b(tm, tn, jnp.float32), (V32, W32, H32),
             f"pallas B Wt-outside tm={tm} tn={tn}")

    # variant C: bf16 V storage + B layout
    hb = mk_b(512, 1024, jnp.bfloat16)
    rate(hb, (Vb, W32, H32), "pallas C bf16-V tm=512 tn=1024")


if __name__ == "__main__":
    main()
