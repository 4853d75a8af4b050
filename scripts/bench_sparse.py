"""Sparse update-step timing on the real TPU at ML-20M scale.
Measures the chunked scan+scatter COO path (Frobenius + KL MU)."""

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
    from nmftpu import sparse_ops as so
    from nmftpu.data import synthetic_powerlaw_sparse

    n, m, nnz, r = 138_000, 27_000, 20_000_000, 64
    print(f"building synthetic {n}x{m} nnz={nnz} r={r} ...", flush=True)
    sp = synthetic_powerlaw_sparse(n, m, nnz=nnz, seed=0)
    print(f"actual nnz={sp.nnz}", flush=True)
    t0 = time.time()
    coo = so.device_put_sparse(sp, chunk=262144)
    print(f"device_put_sparse {time.time()-t0:.1f}s "
          f"padded={coo.values.shape[0]}", flush=True)

    rng = np.random.default_rng(0)
    W0 = jnp.asarray(rng.uniform(0.1, 1.0, (n, r)), jnp.float32)
    H0 = jnp.asarray(rng.uniform(0.1, 1.0, (r, m)), jnp.float32)

    flops_fro = 8 * coo.values.shape[0] * r + 4 * (n + m) * r * r

    def rate(update, operand, label, flops):
        # operand is threaded as a jit ARGUMENT — a closure would bake
        # multi-GB data into the program as a constant (HTTP 413 on the
        # remote-compile path).
        def run_k(O, W, H, k):
            def body(_, c):
                return update(O, c[0], c[1])
            W, H = jax.lax.fori_loop(0, k, body, (W, H))
            return jnp.sum(W) + jnp.sum(H)
        f = jax.jit(run_k, static_argnums=(3,))
        try:
            t0 = time.time()
            float(f(operand, W0, H0, 2))
            print(f"  [{label}] compile+2it {time.time()-t0:.1f}s",
                  flush=True)
            float(f(operand, W0, H0, 8))
            ts = {}
            for k in (2, 8):
                best = 1e9
                for _ in range(2):
                    t0 = time.perf_counter()
                    float(f(operand, W0, H0, k))
                    best = min(best, time.perf_counter() - t0)
                ts[k] = best
            slope = (ts[8] - ts[2]) / 6
            print(f"{label:24s} {slope*1e3:9.1f} ms/iter  "
                  f"{flops/slope/1e9:8.0f} GFLOP/s", flush=True)
        except Exception as e:
            print(f"{label:24s} FAILED {type(e).__name__}: "
                  f"{str(e).splitlines()[0][:140]}", flush=True)

    import os as _os
    if _os.environ.get("SKIP_SCATTER") != "1":
        rate(lambda O, W, H: so.mu_update_frobenius_sparse(O, W, H),
             coo, "sparse MU fro (scatter)", flops_fro)
        rate(lambda O, W, H: so.mu_update_kl_sparse(O, W, H),
             coo, "sparse MU KL (scatter)", flops_fro * 1.5)

    # densified-bf16 strategy: dense-equivalent FLOPs on the MXU
    from nmftpu import densified as DF
    from nmftpu.linalg import dense as D
    t0 = time.time()
    Vd = DF.densify(coo)
    Vd.block_until_ready()
    print(f"densify {time.time()-t0:.1f}s -> {Vd.shape} bf16", flush=True)
    flops_dense = 4 * n * m * r
    rate(lambda O, W, H: D.mu_update_frobenius_bf16v(O, W, H),
         Vd, "densified MU fro", flops_dense)
    rate(lambda O, W, H: DF.mu_update_kl_densified(O, W, H),
         Vd, "densified MU KL", 2 * flops_dense)


if __name__ == "__main__":
    main()

