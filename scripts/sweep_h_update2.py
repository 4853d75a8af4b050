"""h_update kernel round 2: whole contraction inside one kernel instance
(grid only over m tiles), so the MXU sees one large dot per step."""

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
    Vb = V32.astype(jnp.bfloat16)
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
            print(f"{label:44s} FAILED {type(e).__name__}: "
                  f"{str(e).splitlines()[0][:120]}", flush=True)

    def jnp_ref(V, W, H):
        num = jax.lax.dot_general(
            W.astype(jnp.bfloat16), V if V.dtype == jnp.bfloat16
            else V.astype(jnp.bfloat16),
            (((0,), (0,)), ((), ())), preferred_element_type=jnp.float32)
        return H * num / ((W.T @ W) @ H + 1e-9)

    rate(jnp_ref, (V32, W32, H32), "jnp f32-V")

    def mk(tile_m, vdtype):
        def kern(wt_ref, v_ref, h_ref, g_ref, out_ref):
            wt = wt_ref[:]                                # (r, n) bf16
            v = v_ref[:]                                  # (n, TM)
            if v.dtype != jnp.bfloat16:
                v = v.astype(jnp.bfloat16)
            num = jnp.dot(wt, v, preferred_element_type=jnp.float32)
            h = h_ref[:].astype(jnp.float32)
            den = jnp.dot(g_ref[:], h.astype(jnp.bfloat16),
                          preferred_element_type=jnp.float32)
            out_ref[:] = (h * num / (den + 1e-9)).astype(out_ref.dtype)

        @jax.jit
        def call(Wt_b, V, H, G_b):
            return pl.pallas_call(
                kern,
                grid=(m // tile_m,),
                in_specs=[
                    pl.BlockSpec((r, n), lambda i: (0, 0),
                                 memory_space=pltpu.VMEM),
                    pl.BlockSpec((n, tile_m), lambda i: (0, i),
                                 memory_space=pltpu.VMEM),
                    pl.BlockSpec((r, tile_m), lambda i: (0, i),
                                 memory_space=pltpu.VMEM),
                    pl.BlockSpec((r, r), lambda i: (0, 0),
                                 memory_space=pltpu.VMEM),
                ],
                out_specs=pl.BlockSpec((r, tile_m), lambda i: (0, i),
                                       memory_space=pltpu.VMEM),
                out_shape=jax.ShapeDtypeStruct((r, m), jnp.float32),
                compiler_params=pltpu.CompilerParams(
                    dimension_semantics=("parallel",),
                ),
            )(Wt_b, V, H, G_b)

        def h_upd(V, W, H):
            Wb = W.astype(jnp.bfloat16)
            return call(Wb.T, V, H,
                        (W.T @ W).astype(jnp.bfloat16))
        return h_upd

    for tm in (128, 256):
        rate(mk(tm, jnp.float32), (V32, W32, H32),
             f"pallas whole-K f32-V tm={tm}")
    for tm in (128, 256, 512):
        rate(mk(tm, jnp.bfloat16), (Vb, W32, H32),
             f"pallas whole-K bf16-V tm={tm}")


if __name__ == "__main__":
    main()
