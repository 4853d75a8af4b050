#!/usr/bin/env python
"""Benchmark harness: update-step GFLOP/s per chip (BASELINE.md metric #1).

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

The headline config is the dense MU (Frobenius) update step — the
reference's hot loop (SURVEY.md §3.2) — at an MXU-friendly size. The
baseline anchor is the straightforward unfused-jnp update on the same
hardware (BASELINE.md: the reference's own numbers are unavailable, so the
repo generates its anchors); `value` is the best available path (fused
Pallas kernels when present), so vs_baseline tracks the speedup our kernel
work delivers over naive XLA.

Timing method: the update runs k iterations inside one jitted
`lax.fori_loop` that returns a scalar, timed at two different k; the
GFLOP/s rate comes from the SLOPE between them. This cancels both the
host<->device round-trip (tens of ms over the axon tunnel, where
block_until_ready does not reliably wait) and any fixed dispatch overhead.
"""

import argparse
import json
import sys
import time

import numpy as np


def _mu_flops_per_iter(n, m, r):
    # V H^T + W^T V (2 * 2nmr) + Grams and their applications
    # (2 * (2nr^2 + 2mr^2)) + elementwise O(nr + mr)
    return 4 * n * m * r + 4 * n * r * r + 4 * m * r * r + 3 * (n * r + m * r)


def _timed_rate(step_scalar_fn, flops_per_iter, k_small, k_large):
    """Return (GFLOP/s, spread) from the marginal time between k_small
    and k_large iterations. The headline rate uses min-of-5 at each k
    (the tunnel is contended — identical runs vary up to 1.6x, so min
    tracks the clean rate); `spread` is (max-min)/min over the five
    PAIRED per-rep slopes, recorded so a run-to-run swing in the
    headline is attributable to tunnel variance rather than read as a
    regression (round-3 verdict item 6)."""

    def timed(k, reps):
        ts = []
        for _ in range(reps):
            t0 = time.perf_counter()
            float(step_scalar_fn(k))  # host fetch forces full execution
            ts.append(time.perf_counter() - t0)
        return ts

    # warm both compilations
    float(step_scalar_fn(k_small))
    float(step_scalar_fn(k_large))
    ts_small = timed(k_small, 5)
    ts_large = timed(k_large, 5)
    dk = k_large - k_small

    def stats():
        slope = max((min(ts_large) - min(ts_small)) / dk, 1e-12)
        pair = [max((tl - ts) / dk, 1e-12)
                for ts, tl in zip(ts_small, ts_large)]
        return slope, (max(pair) - min(pair)) / min(pair)

    slope, spread = stats()
    if spread > 0.3:
        # contended-tunnel round: widen to min-of-10 so the headline
        # tracks the clean rate even on a noisy pass
        ts_small += timed(k_small, 5)
        ts_large += timed(k_large, 5)
        slope, spread = stats()
    return flops_per_iter / slope / 1e9, spread


def bench_dense_mu(n, m, r, k_small, k_large, dtype, path):
    """path: "jnp" (the f32 XLA anchor), "pallas" (fused Mosaic f32
    kernels), or "int8" (the v_storage='int8' int8 x int8 MXU update —
    the library's fastest dense path, PERF.md round 2)."""
    import jax
    import jax.numpy as jnp

    from nmftpu.linalg import dense as D

    rng = np.random.default_rng(0)
    dt = jnp.dtype(dtype)
    V = jnp.asarray(rng.uniform(0.1, 1.0, (n, m)), dt)
    W0 = jnp.asarray(rng.uniform(0.1, 1.0, (n, r)), dt)
    H0 = jnp.asarray(rng.uniform(0.1, 1.0, (r, m)), dt)
    operand = V

    if path == "pallas":
        from nmftpu.kernels import dense_mu as K

        if not K.available():
            raise RuntimeError("pallas kernels unavailable")

        def update(V, W, H):
            return K.mu_update_frobenius_fused(V, W, H, eps=1e-9)
    elif path == "int8":
        scale, Vq = D.quantize_sym(V)
        operand = Vq

        def update(Vq, W, H):
            return D.mu_update_frobenius_int8x8(
                Vq, scale, W, H, eps=1e-9
            )
    else:
        def update(V, W, H):
            return D.mu_update_frobenius(V, W, H, eps=1e-9)

    def run_k(V, W, H, k):
        def body(_, c):
            return update(V, c[0], c[1])

        W, H = jax.lax.fori_loop(0, k, body, (W, H))
        return jnp.sum(W) + jnp.sum(H)

    f = jax.jit(run_k, static_argnums=(3,))
    return _timed_rate(
        lambda k: f(operand, W0, H0, k),
        _mu_flops_per_iter(n, m, r),
        k_small, k_large,
    )


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=4096)
    ap.add_argument("--m", type=int, default=4096)
    ap.add_argument("--rank", type=int, default=256)
    ap.add_argument("--k-small", type=int, default=100)
    ap.add_argument("--k-large", type=int, default=500)
    ap.add_argument("--dtype", default="float32")
    ap.add_argument(
        "--assert-floor", type=float, default=None, metavar="GFLOPS",
        help="exit nonzero if the measured rate falls below this floor "
             "(the perf-regression gate for TPU CI, SURVEY.md §4.5); "
             "e.g. --assert-floor 120000 on v5e",
    )
    args = ap.parse_args()

    import jax

    # Persistent compile cache: remote (axon-tunnel) compiles are slow and
    # erratic; cache them across bench invocations.
    try:
        jax.config.update(
            "jax_compilation_cache_dir", "/tmp/nmftpu_jax_cache"
        )
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass

    dev = jax.devices()[0]
    print(f"benchmarking on {dev.platform}:{dev.device_kind}",
          file=sys.stderr)

    baseline, base_spread = bench_dense_mu(
        args.n, args.m, args.rank, args.k_small, args.k_large, args.dtype,
        path="jnp",
    )
    print(f"jnp f32 baseline:  {baseline:.0f} GFLOP/s "
          f"(slope spread {base_spread*100:.0f}%)", file=sys.stderr)
    rates = {"jnp_f32": baseline}
    spreads = {"jnp_f32": base_spread}
    for path in ("int8", "pallas"):
        try:
            rates[path], spreads[path] = bench_dense_mu(
                args.n, args.m, args.rank, args.k_small, args.k_large,
                args.dtype, path=path,
            )
            print(f"{path} path: {rates[path]:.0f} GFLOP/s "
                  f"(slope spread {spreads[path]*100:.0f}%)",
                  file=sys.stderr)
        except Exception as e:
            print(f"{path} path unavailable: {e}", file=sys.stderr)
    # the library's best dense path, NOT clamped to the baseline: on the
    # v5e the int8 x int8 MXU update beats the f32 anchor ~1.6x
    # (effective FLOP/s at the same logical update; quantization error
    # analysis in PERF.md)
    best_name = max(rates, key=rates.get)
    value = rates[best_name]
    print(json.dumps({
        "metric": "mu_update_gflops_per_chip",
        "value": round(value, 2),
        "unit": "GFLOP/s",
        "vs_baseline": round(value / baseline, 4),
        "spread": round(spreads[best_name], 3),
        "baseline_spread": round(base_spread, 3),
    }))
    if args.assert_floor is not None and value < args.assert_floor:
        print(
            f"PERF REGRESSION: {value:.0f} GFLOP/s below floor "
            f"{args.assert_floor:.0f}",
            file=sys.stderr,
        )
        sys.exit(1)


if __name__ == "__main__":
    main()
