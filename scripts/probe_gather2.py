"""Probe 2: the exact Mosaic gather contract — take_along_axis with
indices shaped like the table. If this compiles, the ELL SpMM kernel can
issue table-shaped row-gather batches from a VMEM-resident factor block."""

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
    rng = np.random.default_rng(0)
    mloc, r = 2048, 128
    width = 128
    C = mloc // width                      # segments per gather batch
    Ht = jnp.asarray(rng.uniform(0.1, 1.0, (mloc, r)), jnp.float32)
    cols = jnp.asarray(rng.integers(0, mloc, (C, width)), jnp.int32)
    vals = jnp.asarray(rng.uniform(0.1, 1.0, (C, width)), jnp.float32)

    want = np.einsum("sk,skr->sr", np.asarray(vals),
                     np.asarray(Ht)[np.asarray(cols)])

    def kern(ht_ref, cols_ref, vals_ref, out_ref):
        idx = cols_ref[:].reshape(mloc, 1)            # (mloc, 1)
        idx = jnp.broadcast_to(idx, (mloc, r))        # == table shape
        g = jnp.take_along_axis(ht_ref[:], idx, axis=0)   # (mloc, r)
        g = g.reshape(C, width, r)
        out_ref[:] = jnp.sum(g * vals_ref[:][..., None], axis=1)

    try:
        t0 = time.time()
        out = pl.pallas_call(
            kern,
            out_shape=jax.ShapeDtypeStruct((C, r), jnp.float32),
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 3,
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        )(Ht, cols, vals)
        np.testing.assert_allclose(np.asarray(out), want, rtol=2e-2,
                                   atol=1e-2)
        print(f"table-shaped gather: OK ({time.time()-t0:.1f}s)",
              flush=True)

        # timing: contrast vs XLA take at the same scale
        def pall(Ht, cols, vals):
            return pl.pallas_call(
                kern,
                out_shape=jax.ShapeDtypeStruct((C, r), jnp.float32),
                in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 3,
                out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
            )(Ht, cols, vals)

        def xla(Ht, cols, vals):
            g = jnp.take(Ht, cols.reshape(-1), axis=0).reshape(C, width, r)
            return jnp.einsum("sk,skr->sr", vals, g)

        for name, fn in (("pallas", pall), ("xla take", xla)):
            def run_k(k, Ht, cols, vals):
                def body(_, acc):
                    return acc + jnp.sum(fn(Ht, cols, vals))
                return jax.lax.fori_loop(0, k, body, 0.0)
            f = jax.jit(run_k, static_argnums=(0,))
            float(f(100, Ht, cols, vals)); float(f(500, Ht, cols, vals))
            ts = {}
            for k in (100, 500):
                best = 1e9
                for _ in range(3):
                    t0 = time.perf_counter()
                    float(f(k, Ht, cols, vals))
                    best = min(best, time.perf_counter() - t0)
                ts[k] = best
            slope = (ts[500] - ts[100]) / 400
            rows_per_s = mloc / slope
            print(f"{name:10s} {slope*1e6:8.2f} us/op  "
                  f"{rows_per_s/1e9:.2f} Grow-gathers/s", flush=True)
    except Exception as e:
        print(f"table-shaped gather FAILED: {type(e).__name__}: "
              f"{str(e)[:300]}", flush=True)


if __name__ == "__main__":
    main()
