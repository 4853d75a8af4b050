"""Measure the int8-quantized fused MU path vs jnp on the real TPU."""

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
    from nmftpu.kernels import quantized as Q
    from nmftpu.linalg import dense as D

    rng = np.random.default_rng(0)
    n = m = 4096
    r = 256
    V = jnp.asarray(rng.uniform(0.1, 1.0, (n, m)), jnp.float32)
    W0 = jnp.asarray(rng.uniform(0.1, 1.0, (n, r)), jnp.float32)
    H0 = jnp.asarray(rng.uniform(0.1, 1.0, (r, m)), jnp.float32)
    Vq, scale = Q.quantize_v(V)
    flops = 4 * n * m * r + 4 * n * r * r + 4 * m * r * r

    def rate(update, operand, label):
        def run_k(O, W, H, k):
            def body(_, c):
                return update(O, c[0], c[1])
            W, H = jax.lax.fori_loop(0, k, body, (W, H))
            return jnp.sum(W) + jnp.sum(H)
        f = jax.jit(run_k, static_argnums=(3,))
        try:
            float(f(operand, W0, H0, 20)); float(f(operand, W0, H0, 100))
            ts = {}
            for k in (20, 100):
                best = 1e9
                for _ in range(3):
                    t0 = time.perf_counter()
                    float(f(operand, W0, H0, k))
                    best = min(best, time.perf_counter() - t0)
                ts[k] = best
            slope = (ts[100] - ts[20]) / 80
            print(f"{label:40s} {flops/slope/1e12:8.1f} TFLOP/s", flush=True)
        except Exception as e:
            print(f"{label:40s} FAILED {type(e).__name__}: "
                  f"{str(e).splitlines()[0][:110]}", flush=True)

    rate(lambda V, W, H: D.mu_update_frobenius(V, W, H, 1e-9), V, "jnp f32")
    rate(
        lambda O, W, H: Q.mu_update_frobenius_q(O[0], O[1], W, H),
        (Vq, scale), "pallas int8-V",
    )
    # jnp with bf16-V storage for reference
    Vb = V.astype(jnp.bfloat16)
    def jnp_bf16(Vb, W, H):
        Vf = Vb  # let XLA pick layouts; dots in bf16
        Wn = W * (jax.lax.dot_general(Vf, H.astype(jnp.bfloat16),
                  (((1,), (1,)), ((), ())),
                  preferred_element_type=jnp.float32)
                  / (W @ (H @ H.T) + 1e-9))
        Hn = H * (jax.lax.dot_general(Wn.astype(jnp.bfloat16), Vf,
                  (((0,), (0,)), ((), ())),
                  preferred_element_type=jnp.float32)
                  / ((Wn.T @ Wn) @ H + 1e-9))
        return Wn, Hn
    rate(jnp_bf16, Vb, "jnp bf16-V")


if __name__ == "__main__":
    main()
