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
    n, m, r = 26744, 16384, 64
    V = np.abs(rng.normal(size=(n, m))).astype(np.float32)
    W0 = np.abs(rng.normal(size=(n, r))).astype(np.float32)
    H0 = np.abs(rng.normal(size=(r, m))).astype(np.float32)
    kw = dict(batch_size=4096, tol=0.0, max_no_improvement=None,
              W0=W0, H0=H0)

    def mb(epochs):
        W, H, _, _ = minibatch_fit(V, r, max_iter=epochs, **kw)
        np.asarray(H[:1, :1])  # force host fetch (tunnel-safe sync)

    mb(2)
    mb(1)  # warm both programs
    t2, t1 = best_of(lambda: mb(2)), best_of(lambda: mb(1))
    per_epoch = t2 - t1
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
    # ------------------------------------------------------------------
    n3 = m3 = 4096
    r3 = 256
    V3 = np.abs(rng.normal(size=(n3, m3))).astype(np.float32)

    def run_obj(label, **obj_kw):
        def go(iters):
            res = compute(
                V3,
                NmfConfig(rank=r3, num_iterations=iters,
                          check_interval=iters, seed=0, **obj_kw),
            )
            float(res.frobenius_error)

        go(30)
        go(15)
        t30, t15 = best_of(lambda: go(30)), best_of(lambda: go(15))
        ms = (t30 - t15) / 15 * 1e3
        out[f"dense_{label}_ms_per_iter"] = round(ms, 3)
        print(f"dense {label}: {ms:.2f} ms/iter", flush=True)

    run_obj("frobenius")
    run_obj("kl", objective="kullback-leibler")
    run_obj("beta1.5", objective="beta-divergence", beta=1.5)
    run_obj("itakura_saito", objective="itakura-saito")

    with open(os.path.join(os.path.dirname(os.path.dirname(
            os.path.abspath(__file__))), "BENCH_features.json"), "w") as f:
        json.dump(out, f, indent=2)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
