"""Capability probe: does Mosaic lower dynamic gathers inside a kernel?
Tests jnp.take by traced index vector — the primitive the Pallas ELL SpMM
needs — plus a one-hot-matmul fallback formulation."""

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
    r, mloc, nseg, width = 128, 1024, 256, 128
    H = jnp.asarray(rng.uniform(0.1, 1.0, (r, mloc)), jnp.float32)
    cols = jnp.asarray(rng.integers(0, mloc, (nseg, width)), jnp.int32)
    vals = jnp.asarray(rng.uniform(0.1, 1.0, (nseg, width)), jnp.float32)

    want = np.einsum(
        "sk,skr->sr", np.asarray(vals),
        np.asarray(H).T[np.asarray(cols)],
    )

    # A: jnp.take by flat index inside the kernel
    def kern_take(h_ref, cols_ref, vals_ref, out_ref):
        g = jnp.take(h_ref[:], cols_ref[:].reshape(-1), axis=1)
        g = g.T.reshape(nseg, width, r)
        out_ref[:] = jnp.einsum(
            "sk,skr->sr", vals_ref[:], g,
            preferred_element_type=jnp.float32,
        )

    for label, kern in [("take-axis1", kern_take)]:
        try:
            t0 = time.time()
            out = pl.pallas_call(
                kern,
                out_shape=jax.ShapeDtypeStruct((nseg, r), jnp.float32),
                in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 3,
                out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
            )(H, cols, vals)
            np.testing.assert_allclose(np.asarray(out), want, rtol=2e-2,
                                       atol=1e-2)
            print(f"{label}: OK ({time.time()-t0:.1f}s compile+run)",
                  flush=True)
        except Exception as e:
            print(f"{label}: FAILED {type(e).__name__}: "
                  f"{str(e).splitlines()[0][:160]}", flush=True)

    # A2: row-gather from transposed table (axis=0 — sublane orientation)
    Ht = jnp.asarray(np.asarray(H).T)  # (mloc, r)

    def kern_take0(ht_ref, cols_ref, vals_ref, out_ref):
        g = jnp.take(ht_ref[:], cols_ref[:].reshape(-1), axis=0)
        g = g.reshape(nseg, width, r)
        out_ref[:] = jnp.einsum(
            "sk,skr->sr", vals_ref[:], g,
            preferred_element_type=jnp.float32,
        )

    try:
        t0 = time.time()
        out = pl.pallas_call(
            kern_take0,
            out_shape=jax.ShapeDtypeStruct((nseg, r), jnp.float32),
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 3,
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        )(Ht, cols, vals)
        np.testing.assert_allclose(np.asarray(out), want, rtol=2e-2,
                                   atol=1e-2)
        print(f"take-axis0 rows: OK ({time.time()-t0:.1f}s)", flush=True)
    except Exception as e:
        print(f"take-axis0 rows: FAILED {type(e).__name__}: "
              f"{str(e).splitlines()[0][:160]}", flush=True)

    # A3: take_along_axis (indices shaped like the output)
    def kern_tala(ht_ref, cols_ref, vals_ref, out_ref):
        # gather rows of Ht (mloc, r): idx (nseg*width, r) broadcast
        idx = cols_ref[:].reshape(-1, 1)
        idx = jnp.broadcast_to(idx, (nseg * width, r))
        g = jnp.take_along_axis(ht_ref[:], idx, axis=0)
        g = g.reshape(nseg, width, r)
        out_ref[:] = jnp.einsum(
            "sk,skr->sr", vals_ref[:], g,
            preferred_element_type=jnp.float32,
        )

    try:
        t0 = time.time()
        out = pl.pallas_call(
            kern_tala,
            out_shape=jax.ShapeDtypeStruct((nseg, r), jnp.float32),
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 3,
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        )(Ht, cols, vals)
        np.testing.assert_allclose(np.asarray(out), want, rtol=2e-2,
                                   atol=1e-2)
        print(f"take_along_axis rows: OK ({time.time()-t0:.1f}s)",
              flush=True)
    except Exception as e:
        print(f"take_along_axis rows: FAILED {type(e).__name__}: "
              f"{str(e).splitlines()[0][:160]}", flush=True)

    # B: dynamic-slice row loop (per-segment DMA style, fori over width)
    def kern_ds(h_ref, cols_ref, vals_ref, out_ref):
        def seg_body(s, _):
            def k_body(k, acc):
                c = cols_ref[s, k]
                col = jax.lax.dynamic_slice(h_ref[:], (0, c), (r, 1))
                return acc + vals_ref[s, k] * col[:, 0]
            out_ref[s, :] = jax.lax.fori_loop(
                0, width, k_body, jnp.zeros((r,), jnp.float32)
            )
            return 0
        jax.lax.fori_loop(0, nseg, seg_body, 0)

    try:
        t0 = time.time()
        out = pl.pallas_call(
            kern_ds,
            out_shape=jax.ShapeDtypeStruct((nseg, r), jnp.float32),
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 3,
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        )(H, cols, vals)
        np.testing.assert_allclose(np.asarray(out), want, rtol=2e-2,
                                   atol=1e-2)
        print(f"dynamic-slice loop: OK ({time.time()-t0:.1f}s)", flush=True)
    except Exception as e:
        print(f"dynamic-slice loop: FAILED {type(e).__name__}: "
              f"{str(e).splitlines()[0][:160]}", flush=True)


if __name__ == "__main__":
    main()
