"""ELL vs scatter sparse engines on the real TPU (ML-20M scale)."""

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
    from nmftpu import sparse_ell as se
    from nmftpu.data import synthetic_powerlaw_sparse

    n, m, nnz, r = 138_000, 27_000, 20_000_000, 64
    sp = synthetic_powerlaw_sparse(n, m, nnz=nnz, seed=0)
    print(f"nnz={sp.nnz}", flush=True)
    t0 = time.time()
    pair = se.build_ell_pair(sp, seg_max=512, chunk_segments=4096)
    jax.block_until_ready([b.vals for b in pair.rows.buckets])
    padded = sum(int(np.prod(b.vals.shape)) for b in pair.rows.buckets)
    print(f"build_ell_pair {time.time()-t0:.1f}s "
          f"padding_overhead={padded/sp.nnz:.2f}x", flush=True)

    rng = np.random.default_rng(0)
    W0 = jnp.asarray(rng.uniform(0.1, 1.0, (n, r)), jnp.float32)
    H0 = jnp.asarray(rng.uniform(0.1, 1.0, (r, m)), jnp.float32)
    flops = 8 * sp.nnz * r

    def rate(update, operand, label, fl):
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
                  f"{fl/slope/1e9:8.0f} GFLOP/s", flush=True)
        except Exception as e:
            print(f"{label:24s} FAILED {type(e).__name__}: "
                  f"{str(e).splitlines()[0][:140]}", flush=True)

    which = os.environ.get("BENCH_ELL_ONLY", "")
    if which in ("", "fro"):
        rate(lambda O, W, H: se.mu_update_frobenius_ell(O, W, H),
             pair, "ELL MU fro", flops)
    if which in ("", "kl"):
        rate(lambda O, W, H: se.mu_update_kl_ell(O, W, H),
             pair, "ELL MU KL", int(flops * 1.5))


if __name__ == "__main__":
    main()
