"""HALS performance on the v5e (round-3 verdict item 2): the facade's
default solver needs a perf story.

Measures one full HALS iteration (both half-sweeps + the O(nmr)
numerator GEMMs) at the PERF.md anchor shape (4096^2, r=256) and the
ML-20M factor shape (138k x 27k densified is the engine there; here we
time the dense update at that aspect, r=64), for each sweep
implementation:

  seq     — r sequential dynamic-slice column steps (round-2 shipping)
  blocked — MXU-blocked Gauss-Seidel (block GEMM + rank-1 corrections)
  pallas  — fused VMEM-resident sweep kernel

plus the MU Frobenius step at the same shape as the yardstick
(VERDICT.md target: HALS <= 2-3x MU).

Timing: slope method (k-iteration jitted fori_loop, k in {lo, hi},
min-of-3) per PERF.md — the tunnel's block_until_ready is unreliable.

Writes BENCH_hals.json. Run on axon (default platform); CPU
methodology check via NMFTPU_PLATFORM=cpu.
"""

import json
import os
import sys
import time
from functools import partial

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

_plat = os.environ.get("NMFTPU_PLATFORM")
if _plat:
    os.environ["JAX_PLATFORMS"] = _plat


def main():
    import jax
    import jax.numpy as jnp
    from jax import lax

    if _plat:
        jax.config.update("jax_platforms", _plat)
    jax.config.update("jax_compilation_cache_dir", "/tmp/nmftpu_jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from nmftpu.linalg import dense as D

    out = {"device": str(jax.devices()[0])}
    rng = np.random.default_rng(0)

    def slope(fn, lo, hi, reps=3):
        """fn(k) runs k iterations and forces a host fetch."""
        fn(lo)
        fn(hi)  # warm both programs

        def best(k):
            ts = []
            for _ in range(reps):
                t0 = time.perf_counter()
                fn(k)
                ts.append(time.perf_counter() - t0)
            return min(ts)

        return (best(hi) - best(lo)) / (hi - lo)

    def bench_shape(label, n, m, r, lo, hi):
        V = jnp.asarray(rng.uniform(0.1, 1.0, (n, m)), jnp.float32)
        W0 = jnp.asarray(rng.uniform(0.1, 1.0, (n, r)), jnp.float32)
        H0 = jnp.asarray(rng.uniform(0.1, 1.0, (r, m)), jnp.float32)
        res = {}

        # --- MU yardstick ---
        @partial(jax.jit, static_argnums=(3,), donate_argnums=(1, 2))
        def mu_k(V, W, H, k):
            def body(_, c):
                W, H = c
                return D.mu_update_frobenius(V, W, H, 1e-9)

            W, H = lax.fori_loop(0, k, body, (W, H))
            return jnp.sum(W[:1, :1])

        def run_mu(k):
            float(mu_k(V, W0, H0, k))

        mu_s = slope(run_mu, lo, hi)
        res["mu_ms_per_iter"] = round(mu_s * 1e3, 3)

        # --- HALS per impl ---
        for impl in ("seq", "blocked", "pallas"):
            if impl == "pallas" and jax.default_backend() != "tpu":
                continue

            half = partial(D.hals_half_sweep, impl=impl)

            @partial(jax.jit, static_argnums=(3,), donate_argnums=(1, 2))
            def hals_k(V, W, H, k, half=half):
                eye = jnp.eye(r, dtype=jnp.float32)

                def body(_, c):
                    W, H = c
                    W = half(V @ H.T, H @ H.T + 0.0 * eye, W)
                    H = half(V.T @ W, W.T @ W + 0.0 * eye, H.T).T
                    return W, H

                W, H = lax.fori_loop(0, k, body, (W, H))
                return jnp.sum(W[:1, :1])

            def run(k, hals_k=hals_k):
                float(hals_k(V, W0, H0, k))

            s = slope(run, lo, hi)
            res[f"hals_{impl}_ms_per_iter"] = round(s * 1e3, 3)
            res[f"hals_{impl}_vs_mu"] = round(s / mu_s, 2)
            print(f"{label} hals[{impl}]: {s*1e3:.3f} ms/iter "
                  f"({s/mu_s:.2f}x MU)", flush=True)
        print(f"{label} MU: {mu_s*1e3:.3f} ms/iter", flush=True)
        out[label] = dict(shape=[n, m, r], **res)

    # anchor shape (PERF.md dense table)
    bench_shape("4096x4096_r256", 4096, 4096, 256, 20, 100)
    # ML-20M densified aspect, facade-default rank
    bench_shape("27k_x138k_r64".replace("x", "x"), 27744, 13824, 64, 20, 100)
    # high-rank sweep stress (sequential sweeps hurt most here)
    bench_shape("2048x2048_r512", 2048, 2048, 512, 20, 100)

    path = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "BENCH_hals.json")
    with open(path, "w") as f:
        json.dump(out, f, indent=2)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
