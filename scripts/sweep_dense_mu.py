"""Tile/variant sweep for the fused dense MU kernels on the real TPU.
Usage: python scripts/sweep_dense_mu.py"""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    import jax
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir", "/tmp/nmftpu_jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    from nmftpu.kernels import dense_mu as K
    from nmftpu.linalg import dense as D

    rng = np.random.default_rng(0)
    n = m = 4096
    r = 256
    V = jnp.asarray(rng.uniform(0.1, 1.0, (n, m)), jnp.float32)
    W0 = jnp.asarray(rng.uniform(0.1, 1.0, (n, r)), jnp.float32)
    H0 = jnp.asarray(rng.uniform(0.1, 1.0, (r, m)), jnp.float32)
    flops = 4 * n * m * r + 4 * n * r * r + 4 * m * r * r

    def rate(update, label):
        def run_k(V, W, H, k):
            def body(_, c):
                return update(V, c[0], c[1])
            W, H = jax.lax.fori_loop(0, k, body, (W, H))
            return jnp.sum(W) + jnp.sum(H)

        f = jax.jit(run_k, static_argnums=(3,))
        try:
            float(f(V, W0, H0, 20))
            float(f(V, W0, H0, 100))
            ts = {}
            for k in (20, 100):
                best = 1e9
                for _ in range(3):
                    t0 = time.perf_counter()
                    float(f(V, W0, H0, k))
                    best = min(best, time.perf_counter() - t0)
                ts[k] = best
            slope = (ts[100] - ts[20]) / 80
            print(f"{label:40s} {flops / slope / 1e12:8.1f} TFLOP/s")
        except Exception as e:
            print(f"{label:40s} FAILED {type(e).__name__}: {e}")

    rate(lambda V, W, H: D.mu_update_frobenius(V, W, H, 1e-9), "jnp")

    for tm, tn in [(512, 512), (512, 1024), (1024, 512), (256, 2048),
                   (1024, 1024), (2048, 512)]:
        rate(
            lambda V, W, H, tm=tm, tn=tn: (
                (lambda W2: (W2, K.h_update_fused(
                    V, W2, H, W2.T @ W2, eps=1e-9, tile_m=tm, tile_n=tn)))(
                    K.w_update_fused(V, W, H, H @ H.T, eps=1e-9,
                                     tile_m=tm, tile_n=tn))
            ),
            f"pallas tm={tm} tn={tn}",
        )


if __name__ == "__main__":
    main()
