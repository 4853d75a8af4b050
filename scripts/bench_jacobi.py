"""Jacobi vs Gauss–Seidel dense MU on the real chip (VERDICT r4 #8).

Measures µs/iter (slope method, min-of-5 pairs — bench.py's harness) for
the f32 and int8×int8 dense MU update under both couplings at the
headline 4096²/r=256 shape, plus a 50-iteration convergence-parity run
from the stock init. Writes BENCH_jacobi.json.

Usage: python scripts/bench_jacobi.py
"""

import json
import os
import sys

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from bench import _mu_flops_per_iter, _timed_rate  # noqa: E402


def main():
    import jax
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir", "/tmp/nmftpu_jax_cache")
    from nmftpu.linalg import dense as D

    n = m = 4096
    r = 256
    dev = jax.devices()[0]
    print(f"device={dev.device_kind} {n}x{m} r={r}", flush=True)

    rng = np.random.default_rng(0)
    V = jnp.asarray(rng.uniform(0.1, 1.0, (n, m)), jnp.float32)
    W0 = jnp.asarray(rng.uniform(0.1, 1.0, (n, r)), jnp.float32)
    H0 = jnp.asarray(rng.uniform(0.1, 1.0, (r, m)), jnp.float32)
    scale, Vq = D.quantize_sym(V)
    flops = _mu_flops_per_iter(n, m, r)

    def run_k_factory(update, operand):
        def run_k(Vx, W, H, k):
            def body(_, c):
                return update(Vx, c[0], c[1])

            W, H = jax.lax.fori_loop(0, k, body, (W, H))
            return jnp.sum(W) + jnp.sum(H)

        f = jax.jit(run_k, static_argnums=(3,))
        return lambda k: f(operand, W0, H0, k)

    rows = {}
    for name, update, operand in (
        ("f32_gs", lambda Vx, W, H: D.mu_update_frobenius(
            Vx, W, H, order="WH"), V),
        ("f32_jacobi", lambda Vx, W, H: D.mu_update_frobenius(
            Vx, W, H, order="jacobi"), V),
        ("int8_gs", lambda Vx, W, H: D.mu_update_frobenius_int8x8(
            Vx, scale, W, H, order="WH"), Vq),
        ("int8_jacobi", lambda Vx, W, H: D.mu_update_frobenius_int8x8(
            Vx, scale, W, H, order="jacobi"), Vq),
        # jacobi with the fused dual-numerator kernel opted in
        # (default off: end-to-end it measures slower than the XLA
        # numerators despite 405 TOP/s standalone — PERF round 5)
        ("int8_jacobi_fused", lambda Vx, W, H:
            D.mu_update_frobenius_int8x8(
                Vx, scale, W, H, order="jacobi", use_fused=True), Vq),
    ):
        rate, spread = _timed_rate(
            run_k_factory(update, operand), flops, 100, 500)
        us = flops / (rate * 1e9) * 1e6
        rows[name] = dict(gflops=round(rate), us_per_iter=round(us, 1),
                          spread=round(spread, 3))
        print(f"{name:12s} {us:7.1f} us/iter  {rate:9.0f} GFLOP/s-equiv "
              f"(spread {spread:.2f})", flush=True)

    # convergence parity from the stock init (50 iterations, f32 + int8)
    def traj(update, operand, k=50):
        errs = []
        W, H = W0, H0
        step = jax.jit(lambda Vx, W, H: update(Vx, W, H))
        for i in range(k):
            W, H = step(operand, W, H)
            if (i + 1) % 10 == 0:
                errs.append(round(float(
                    jnp.linalg.norm(V - W @ H)), 3))
        return errs

    conv = {}
    for name, update, operand in (
        ("f32_gs", lambda Vx, W, H: D.mu_update_frobenius(
            Vx, W, H, order="WH"), V),
        ("f32_jacobi", lambda Vx, W, H: D.mu_update_frobenius(
            Vx, W, H, order="jacobi"), V),
        ("int8_gs", lambda Vx, W, H: D.mu_update_frobenius_int8x8(
            Vx, scale, W, H, order="WH"), Vq),
        ("int8_jacobi", lambda Vx, W, H: D.mu_update_frobenius_int8x8(
            Vx, scale, W, H, order="jacobi"), Vq),
    ):
        conv[name] = traj(update, operand)
        print(f"conv {name:12s} err@10/20/30/40/50: {conv[name]}",
              flush=True)

    out = os.path.join(REPO, "BENCH_jacobi.json")
    with open(out, "w") as f:
        json.dump(dict(device=dev.device_kind, n=n, m=m, r=r,
                       timing="slope min-of-5 pairs (bench.py harness)",
                       rates=rows, convergence_err_every_10=conv), f,
                  indent=1)
    print("wrote", out, flush=True)


if __name__ == "__main__":
    main()
