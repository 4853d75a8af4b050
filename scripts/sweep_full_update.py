"""Decisive full-update comparison at k=100/500 (reliable slope):
jnp f32 vs whole-K pallas bf16 vs whole-K pallas int8, plus lone halves."""

import functools as ft
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
    scale = float(jnp.max(V32)) / 127.0
    Vq = jnp.clip(jnp.round(V32 / scale), -127, 127).astype(jnp.int8)
    Vb = V32.astype(jnp.bfloat16)
    sc = jnp.asarray([scale], jnp.float32)
    flops_full = 4 * n * m * r + 4 * n * r * r + 4 * m * r * r

    TM = 256
    TN = 256

    def h_kern(scale_ref, wt_ref, v_ref, h_ref, g_ref, out_ref):
        v = v_ref[:]
        if v.dtype != jnp.bfloat16:
            v = v.astype(jnp.bfloat16)
        num = jnp.dot(wt_ref[:], v, preferred_element_type=jnp.float32)
        num = num * scale_ref[0]
        h = h_ref[:].astype(jnp.float32)
        den = jnp.dot(g_ref[:], h.astype(jnp.bfloat16),
                      preferred_element_type=jnp.float32)
        out_ref[:] = (h * num / (den + 1e-9)).astype(out_ref.dtype)

    def w_kern(scale_ref, v_ref, ht_ref, w_ref, g_ref, out_ref):
        v = v_ref[:]
        if v.dtype != jnp.bfloat16:
            v = v.astype(jnp.bfloat16)
        num = jnp.dot(v, ht_ref[:], preferred_element_type=jnp.float32)
        num = num * scale_ref[0]
        w = w_ref[:].astype(jnp.float32)
        den = jnp.dot(w.astype(jnp.bfloat16), g_ref[:],
                      preferred_element_type=jnp.float32)
        out_ref[:] = (w * num / (den + 1e-9)).astype(out_ref.dtype)

    def mk_h(vdt):
        @jax.jit
        def call(sc, Wt_b, V, H, G_b):
            return pl.pallas_call(
                h_kern,
                grid=(m // TM,),
                in_specs=[
                    pl.BlockSpec(memory_space=pltpu.SMEM),
                    pl.BlockSpec((r, n), lambda i: (0, 0),
                                 memory_space=pltpu.VMEM),
                    pl.BlockSpec((n, TM), lambda i: (0, i),
                                 memory_space=pltpu.VMEM),
                    pl.BlockSpec((r, TM), lambda i: (0, i),
                                 memory_space=pltpu.VMEM),
                    pl.BlockSpec((r, r), lambda i: (0, 0),
                                 memory_space=pltpu.VMEM),
                ],
                out_specs=pl.BlockSpec((r, TM), lambda i: (0, i),
                                       memory_space=pltpu.VMEM),
                out_shape=jax.ShapeDtypeStruct((r, m), jnp.float32),
                compiler_params=pltpu.CompilerParams(
                    dimension_semantics=("parallel",)),
            )(sc, Wt_b, V, H, G_b)
        return call

    def mk_w(vdt):
        @jax.jit
        def call(sc, V, Ht_b, W, G_b):
            return pl.pallas_call(
                w_kern,
                grid=(n // TN,),
                in_specs=[
                    pl.BlockSpec(memory_space=pltpu.SMEM),
                    pl.BlockSpec((TN, m), lambda i: (i, 0),
                                 memory_space=pltpu.VMEM),
                    pl.BlockSpec((m, r), lambda i: (0, 0),
                                 memory_space=pltpu.VMEM),
                    pl.BlockSpec((TN, r), lambda i: (i, 0),
                                 memory_space=pltpu.VMEM),
                    pl.BlockSpec((r, r), lambda i: (0, 0),
                                 memory_space=pltpu.VMEM),
                ],
                out_specs=pl.BlockSpec((TN, r), lambda i: (i, 0),
                                       memory_space=pltpu.VMEM),
                out_shape=jax.ShapeDtypeStruct((n, r), jnp.float32),
                compiler_params=pltpu.CompilerParams(
                    dimension_semantics=("parallel",)),
            )(sc, V, Ht_b, W, G_b)
        return call

    h_call = mk_h(None)
    w_call = mk_w(None)
    one = jnp.asarray([1.0], jnp.float32)

    def full_pallas(V, svals, W, H):
        Hb = H.astype(jnp.bfloat16)
        W = w_call(svals, V, Hb.T, W, (H @ H.T).astype(jnp.bfloat16))
        Wb = W.astype(jnp.bfloat16)
        H = h_call(svals, Wb.T, V, H, (W.T @ W).astype(jnp.bfloat16))
        return W, H

    def rate(fn, static_args, label, flops=flops_full):
        def run_k(k, *a):
            sa = a[:len(static_args)]
            init = a[len(static_args):]
            out = jax.lax.fori_loop(0, k, lambda i, c: fn(*sa, *c), init)
            return sum(jnp.sum(o) for o in out)

        args = tuple(static_args) + (W32, H32)
        f = jax.jit(run_k, static_argnums=(0,))
        try:
            float(f(100, *args)); float(f(500, *args))
            ts = {}
            for k in (100, 500):
                best = 1e9
                for _ in range(3):
                    t0 = time.perf_counter()
                    float(f(k, *args))
                    best = min(best, time.perf_counter() - t0)
                ts[k] = best
            slope = (ts[500] - ts[100]) / 400
            print(f"{label:40s} {slope*1e6:9.1f} us/iter "
                  f"{flops/slope/1e12:7.1f} TFLOP/s", flush=True)
        except Exception as e:
            print(f"{label:40s} FAILED {type(e).__name__}: "
                  f"{str(e).splitlines()[0][:120]}", flush=True)

    from nmftpu.linalg import dense as D

    rate(lambda V, W, H: D.mu_update_frobenius(V, W, H, 1e-9), (V32,),
         "jnp f32 FULL")
    rate(lambda V, W, H: D.mu_update_frobenius_bf16v(V, W, H), (Vb,),
         "jnp bf16v FULL")
    rate(lambda V, s, W, H: full_pallas(V, s, W, H), (Vb, one),
         "pallas whole-K bf16 FULL")
    rate(lambda V, s, W, H: full_pallas(V, s, W, H), (Vq, sc),
         "pallas whole-K int8 FULL")


if __name__ == "__main__":
    main()
