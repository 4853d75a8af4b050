"""Retrieval serving benchmark: top-k MIPS throughput (queries/s) over a
large item table (BASELINE.json config #5)."""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

_plat = os.environ.get("NMFTPU_PLATFORM")
if _plat:
    os.environ["JAX_PLATFORMS"] = _plat
    import jax

    jax.config.update("jax_platforms", _plat)


def main():
    import jax
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir", "/tmp/nmftpu_jax_cache")
    from nmftpu.retrieval import topk_mips_blocked

    rng = np.random.default_rng(0)
    m, r, b, k = 2_000_000, 128, 1024, 100
    H = jnp.asarray(rng.standard_normal((r, m)), jnp.float32)
    Wq = jnp.asarray(rng.standard_normal((b, r)), jnp.float32)

    for method in ("exact", "approx"):
        def run(Wq, H, method=method):
            s, i = topk_mips_blocked(Wq, H, k=k, block=32768,
                                     method=method)
            return jnp.sum(s) + jnp.sum(i)

        f = jax.jit(run)
        float(f(Wq, H))  # compile
        ts = []
        for _ in range(5):
            t0 = time.perf_counter()
            float(f(Wq, H))
            ts.append(time.perf_counter() - t0)
        dt = min(ts)
        print(f"[{method:6s}] items={m} rank={r} batch={b} k={k}: "
              f"{dt*1e3:.1f} ms/batch -> {b/dt:,.0f} q/s "
              f"({2*b*m*r/dt/1e12:.1f} TFLOP/s scoring)")


if __name__ == "__main__":
    main()
