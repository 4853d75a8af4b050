"""Dual-orientation int8 V + tall factors: every kernel access contiguous.

W (n,r) and Ht (m,r) stay row-major tall matrices; V is stored int8 twice
(row-major and transposed). Both half-steps become (strip, K) @ (K, r)
dots with contiguous strips. Sweep TM and compare against the jnp f32
ceiling."""

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
    Ht32 = jnp.asarray(rng.uniform(0.1, 1.0, (m, r)), jnp.float32)
    scale = float(jnp.max(V32)) / 127.0
    Vq = jnp.clip(jnp.round(V32 / scale), -127, 127).astype(jnp.int8)
    Vqt = Vq.T.copy()  # contiguous transpose, built once
    sc = jnp.asarray([scale], jnp.float32)
    flops_full = 4 * n * m * r + 4 * n * r * r + 4 * m * r * r

    def tall_kernel(scale_ref, v_ref, f_ref, x_ref, g_ref, out_ref):
        """x' = x * (scale * Vstrip @ f) / (x @ g + eps); strip rows of
        either V or V^T; f = partner tall factor (K, r) bf16; g (r, r)."""
        v = v_ref[:].astype(jnp.bfloat16)
        num = jnp.dot(v, f_ref[:], preferred_element_type=jnp.float32)
        num = num * scale_ref[0]
        x = x_ref[:].astype(jnp.float32)
        den = jnp.dot(x.astype(jnp.bfloat16), g_ref[:],
                      preferred_element_type=jnp.float32)
        out_ref[:] = (x * num / (den + 1e-9)).astype(out_ref.dtype)

    def mk(rows, cols, tile):
        @jax.jit
        def call(sc, Vstrip_src, F_b, X, G_b):
            return pl.pallas_call(
                tall_kernel,
                grid=(rows // tile,),
                in_specs=[
                    pl.BlockSpec(memory_space=pltpu.SMEM),
                    pl.BlockSpec((tile, cols), lambda i: (i, 0),
                                 memory_space=pltpu.VMEM),
                    pl.BlockSpec((cols, r), lambda i: (0, 0),
                                 memory_space=pltpu.VMEM),
                    pl.BlockSpec((tile, r), lambda i: (i, 0),
                                 memory_space=pltpu.VMEM),
                    pl.BlockSpec((r, r), lambda i: (0, 0),
                                 memory_space=pltpu.VMEM),
                ],
                out_specs=pl.BlockSpec((tile, r), lambda i: (i, 0),
                                       memory_space=pltpu.VMEM),
                out_shape=jax.ShapeDtypeStruct((rows, r), jnp.float32),
                compiler_params=pltpu.CompilerParams(
                    dimension_semantics=("parallel",)),
            )(sc, Vstrip_src, F_b, X, G_b)
        return call

    def full(tile):
        w_call = mk(n, m, tile)
        h_call = mk(m, n, tile)

        def step(Vq, Vqt, sc, W, Ht):
            Hb = Ht.astype(jnp.bfloat16)
            G = (Ht.T @ Ht).astype(jnp.bfloat16)
            W = w_call(sc, Vq, Hb, W, G)
            Wb = W.astype(jnp.bfloat16)
            G2 = (W.T @ W).astype(jnp.bfloat16)
            Ht = h_call(sc, Vqt, Wb, Ht, G2)
            return W, Ht
        return step

    def rate(fn, static_args, label):
        ns = len(static_args)

        def run_k(k, *a):
            sa, init = a[:ns], a[ns:]
            out = jax.lax.fori_loop(0, k, lambda i, c: fn(*sa, *c), init)
            return sum(jnp.sum(o) for o in out)

        args = tuple(static_args) + (W32, Ht32)
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
            print(f"{label:44s} {slope*1e6:9.1f} us/iter "
                  f"{flops_full/slope/1e12:7.1f} TFLOP/s", flush=True)
        except Exception as e:
            print(f"{label:44s} FAILED {type(e).__name__}: "
                  f"{str(e).splitlines()[0][:120]}", flush=True)

    for tile in (128, 256, 512):
        rate(full(tile), (Vq, Vqt, sc),
             f"tall int8 dual-V tile={tile}")

    # reference: jnp f32 with tall Ht (same carry layout for fairness)
    from nmftpu.linalg import dense as D

    def jnp_tall(V, W, Ht):
        W, H = D.mu_update_frobenius(V, W, Ht.T, 1e-9)
        return W, H.T

    rate(jnp_tall, (V32,), "jnp f32 (tall carry)")


if __name__ == "__main__":
    main()
