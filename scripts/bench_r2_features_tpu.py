"""TPU benchmarks for the round-2 feature additions (ready to run when
the axon tunnel is up; CPU-runnable for methodology checks with
NMFTPU_PLATFORM=cpu): epoch-fused mini-batch throughput, batched
multi-problem stacks vs solo calls, and the generalized beta objective
per-iteration cost. Writes BENCH_features.json.

Timing follows PERF.md: warm every program before timing, slope over
two budgets where compile/setup could pollute, min-of-3 (the tunnel is
contended)."""

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

_plat = os.environ.get("NMFTPU_PLATFORM")
if _plat:
    os.environ["JAX_PLATFORMS"] = _plat


def main():
    import jax

    if _plat:
        jax.config.update("jax_platforms", _plat)
    jax.config.update("jax_compilation_cache_dir", "/tmp/nmftpu_jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from nmftpu import NmfConfig, compute_batched
    from nmftpu.driver import compute
    from nmftpu.minibatch import minibatch_fit

    rng = np.random.default_rng(0)
    out = {"device": str(jax.devices()[0])}

    def best_of(fn, k=3):
        ts = []
        for _ in range(k):
            t0 = time.perf_counter()
            fn()
            ts.append(time.perf_counter() - t0)
        return min(ts)

    # ------------------------------------------------------------------
    # 1. epoch-fused mini-batch: ML-20M-shaped dense panels
    #    (26744 x 16384 f32 = 1.75 GB resident), batch 4096, rank 64
    # ------------------------------------------------------------------
    import jax.numpy as _jnp

    n, m, r = 26744, 16384, 64
    # device-resident V: re-uploading 1.75 GB per call over the tunnel
    # is seconds of noise that swamps the per-epoch slope
    V = jax.device_put(_jnp.asarray(
        np.abs(rng.normal(size=(n, m))).astype(np.float32)))
    W0 = np.abs(rng.normal(size=(n, r))).astype(np.float32)
    H0 = np.abs(rng.normal(size=(r, m))).astype(np.float32)
    kw = dict(batch_size=4096, tol=0.0, max_no_improvement=None,
              W0=W0, H0=H0)

    def mb(epochs):
        W, H, _, _ = minibatch_fit(V, r, max_iter=epochs, **kw)
        np.asarray(H[:1, :1])  # force host fetch (tunnel-safe sync)

    lo_e, hi_e = 2, 10  # tunnel noise is ~100s of ms: slope needs >1 s
    mb(lo_e)
    mb(hi_e)  # warm both programs
    t2, t1 = best_of(lambda: mb(hi_e)), best_of(lambda: mb(lo_e))
    per_epoch = (t2 - t1) / (hi_e - lo_e)
    steps = -(-n // 4096)
    gflop = 2 * 3 * n * m * r / 1e9  # ~3 O(nmr) GEMMs per step-epoch
    out["minibatch_fused"] = {
        "shape": [n, m, r], "batch": 4096,
        "s_per_epoch_slope": round(per_epoch, 4),
        "ms_per_batch_step": round(per_epoch / steps * 1e3, 3),
        "gflops": round(gflop / per_epoch, 1),
    }
    print(f"minibatch fused: {per_epoch*1e3:.1f} ms/epoch "
          f"({out['minibatch_fused']['gflops']} GFLOP/s)", flush=True)
    del V, W0, H0

    # ------------------------------------------------------------------
    # 2. batched stack (B small problems) vs B solo calls
    # ------------------------------------------------------------------
    B, n2, m2, r2 = 64, 512, 384, 16
    Vs = np.abs(rng.normal(size=(B, n2, m2))).astype(np.float32)
    cfgb = NmfConfig(rank=r2, num_iterations=50, check_interval=50,
                     seed=1)

    def batched():
        res = compute_batched(Vs, cfgb)
        np.asarray(res.W[0, :1, :1])

    def solo():
        for i in range(B):
            compute(Vs[i], cfgb)

    batched()
    solo()  # warm
    t_b, t_s = best_of(batched), best_of(solo, k=2)
    out["batched_stack"] = {
        "B": B, "shape": [n2, m2, r2], "iters": 50,
        "batched_s": round(t_b, 4), "solo_s": round(t_s, 4),
        "speedup": round(t_s / t_b, 2),
    }
    print(f"batched: {t_b*1e3:.0f} ms vs solo {t_s*1e3:.0f} ms "
          f"({t_s/t_b:.1f}x)", flush=True)

    # ------------------------------------------------------------------
    # 3. generalized beta (1.5) dense update vs Frobenius/KL at 4096^2
    #    — raw update-step slope (k-iteration jitted fori_loop): the
    #    driver-level timing is tunnel-noise-dominated at these budgets
    # ------------------------------------------------------------------
    import functools

    import jax.numpy as jnp
    from jax import lax

    from nmftpu.linalg import dense as D

    n3 = m3 = 4096
    r3 = 256
    V3 = jnp.asarray(
        np.abs(rng.normal(size=(n3, m3))).astype(np.float32) + 0.05)
    W3 = jnp.asarray(rng.uniform(0.1, 1.0, (n3, r3)), jnp.float32)
    H3 = jnp.asarray(rng.uniform(0.1, 1.0, (r3, m3)), jnp.float32)

    def slope_update(upd, lo=20, hi=100):
        @functools.partial(jax.jit, static_argnums=(3,),
                           donate_argnums=(1, 2))
        def k_iter(V, W, H, k):
            W, H = lax.fori_loop(0, k, lambda _, c: upd(V, *c), (W, H))
            return jnp.sum(W[:1, :1])

        def run(k):
            float(k_iter(V3, W3, H3, k))

        run(lo)
        run(hi)
        tl, th = best_of(lambda: run(lo)), best_of(lambda: run(hi))
        return (th - tl) / (hi - lo)

    for label, upd in (
        ("frobenius", lambda V, W, H: D.mu_update_frobenius(V, W, H,
                                                            1e-9)),
        ("kl", lambda V, W, H: D.mu_update_kl(V, W, H, 1e-9)),
        ("beta1.5", lambda V, W, H: D.mu_update_beta(V, W, H, 1.5,
                                                     eps=1e-9)),
        ("itakura_saito", lambda V, W, H: D.mu_update_beta(V, W, H, 0.0,
                                                           eps=1e-9)),
    ):
        s = slope_update(upd)
        out[f"dense_{label}_ms_per_iter"] = round(s * 1e3, 3)
        print(f"dense {label}: {s*1e3:.3f} ms/iter", flush=True)

    # ------------------------------------------------------------------
    # 4. iALS (exact weighted ALS) per-iteration at ML-20M sparse shape
    #    vs weighted MU on the same operand (the classic iALS trade:
    #    ~r x the FLOPs for much faster convergence per iteration)
    # ------------------------------------------------------------------
    from nmftpu import sparse as hs
    from nmftpu.sparse_ops import (
        als_update_weighted_sparse, device_put_sparse,
        mu_update_frobenius_weighted_sparse,
    )

    n4, m4, r4, nnz = 138_000, 27_000, 64, 5_300_000
    rows = rng.integers(0, n4, nnz).astype(np.int64)
    cols = rng.integers(0, m4, nnz).astype(np.int64)
    vals = rng.uniform(1.0, 5.0, nnz).astype(np.float32)
    coo = device_put_sparse(hs.SparseCOO(rows, cols, vals, (n4, m4)))
    W4 = jnp.asarray(rng.uniform(0.1, 1.0, (n4, r4)), jnp.float32)
    H4 = jnp.asarray(rng.uniform(0.1, 1.0, (r4, m4)), jnp.float32)

    from nmftpu.sparse_ell import (
        als_update_masked_ell, als_update_weighted_ell_exact,
        build_ell_pair,
    )

    pair = build_ell_pair(hs.SparseCOO(rows, cols, vals, (n4, m4)))

    for label, upd in (
        ("ials_scatter_chol", lambda c, W, H: als_update_weighted_sparse(
            c, W, H, 40.0, lambda_w=0.1, lambda_h=0.1)),
        ("weighted_mu", lambda c, W, H: mu_update_frobenius_weighted_sparse(
            c, W, H, 40.0)),
    ):
        @functools.partial(jax.jit, static_argnums=(3,),
                           donate_argnums=(1, 2))
        def k_iter(c, W, H, k, upd=upd):
            W, H = lax.fori_loop(0, k, lambda _, x: upd(c, *x), (W, H))
            return jnp.sum(W[:1, :1])

        lo, hi = (2, 8) if "chol" in label else (5, 20)

        def run(k, k_iter=k_iter):
            float(k_iter(coo, W4, H4, k))

        run(lo)
        run(hi)
        tl, th = best_of(lambda: run(lo)), best_of(lambda: run(hi))
        s = (th - tl) / (hi - lo)
        out[f"sparse_{label}_ms_per_iter"] = round(s * 1e3, 2)
        print(f"sparse {label} (138k x 27k, 5.3M nnz, r=64): "
              f"{s*1e3:.1f} ms/iter", flush=True)

    # ELL engine iALS/masked-ALS: batched-GEMM Gram deltas (+CG solver)
    for label, upd in (
        ("ials_ell_exact", lambda p, W, H: als_update_weighted_ell_exact(
            p, W, H, 40.0, 0.1, 0.1)),
        ("ials_ell_cg3", lambda p, W, H: als_update_weighted_ell_exact(
            p, W, H, 40.0, 0.1, 0.1, solver="cg", cg_steps=3)),
        ("masked_als_ell_cg3", lambda p, W, H: als_update_masked_ell(
            p, W, H, 0.1, 0.1, solver="cg", cg_steps=3)),
    ):
        @functools.partial(jax.jit, static_argnums=(3,))
        def k_iter(p, W, H, k, upd=upd):
            W, H = lax.fori_loop(0, k, lambda _, c: upd(p, *c), (W, H))
            return jnp.sum(W[:1, :1])

        lo, hi = (2, 8) if "exact" in label else (3, 12)

        def run(k, k_iter=k_iter):
            float(k_iter(pair, W4, H4, k))

        run(lo)
        run(hi)
        tl, th = best_of(lambda: run(lo)), best_of(lambda: run(hi))
        s = (th - tl) / (hi - lo)
        out[f"sparse_{label}_ms_per_iter"] = round(s * 1e3, 2)
        print(f"sparse {label} (138k x 27k, 5.3M nnz, r=64): "
              f"{s*1e3:.1f} ms/iter", flush=True)

    with open(os.path.join(os.path.dirname(os.path.dirname(
            os.path.abspath(__file__))), "BENCH_features.json"), "w") as f:
        json.dump(out, f, indent=2)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
