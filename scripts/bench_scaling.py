"""Weak-scaling harness (BASELINE.md metric #5): sharded sparse update
throughput vs. mesh size, problem size scaled with the device count.

On real pod slices, run on 1 chip / 1 host / N hosts and compare
nnz-throughput per device (target >= 80% weak-scaling efficiency at
N >= 2 hosts). On this single-chip dev box the same harness runs on
virtual CPU devices — methodology validation, not a hardware claim.

Usage:
  NMFTPU_PLATFORM=cpu XLA_FLAGS=--xla_force_host_platform_device_count=8 \
      python scripts/bench_scaling.py --meshes 1x1,1x2,2x2,2x4
"""

import argparse
import json
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

    from nmftpu import NmfConfig
    from nmftpu.data import synthetic_powerlaw_sparse
    from nmftpu.loop import build_runner
    from nmftpu.parallel import make_grid_mesh
    from nmftpu.parallel.driver import _sharded_init, _sharded_ops
    from nmftpu.parallel.mesh import factor_shardings
    from nmftpu.parallel.sharded_coo import partition_sparse

    ap = argparse.ArgumentParser()
    ap.add_argument("--meshes", default="1x1,1x2,2x2,2x4")
    ap.add_argument("--rank", type=int, default=64)
    ap.add_argument("--base-users", type=int, default=2000)
    ap.add_argument("--base-items", type=int, default=1500)
    ap.add_argument("--base-nnz", type=int, default=100_000)
    ap.add_argument("--iters", type=int, default=20)
    args = ap.parse_args()

    results = []
    for mesh_str in args.meshes.split(","):
        pu, pi = (int(x) for x in mesh_str.split("x"))
        ndev = pu * pi
        if ndev > len(jax.devices()):
            print(f"skip {mesh_str}: only {len(jax.devices())} devices",
                  file=sys.stderr)
            continue
        mesh = make_grid_mesh((pu, pi), devices=jax.devices()[:ndev])
        # weak scaling: problem grows with the device count
        n = args.base_users * pu
        m = args.base_items * pi
        nnz = args.base_nnz * ndev
        sp = synthetic_powerlaw_sparse(n, m, nnz=nnz, seed=0)
        cfg = NmfConfig(rank=args.rank, num_iterations=args.iters,
                        check_interval=args.iters, seed=0)

        shardings = factor_shardings(mesh)
        scoo, row_perm, col_perm = partition_sparse(
            sp, (pu, pi), chunk=8192, balance=True,
            out_shardings=shardings["tile"],
        )
        runner = build_runner(cfg, _sharded_ops(cfg, mesh, scoo), None)
        init_fn = _sharded_init(
            sp, scoo, cfg, shardings, row_perm, col_perm, None, None
        )
        W, H = init_fn(jax.random.PRNGKey(0))

        # warm (compile) + timed run; per-iteration time from two lengths
        out = runner(scoo, W, H, jnp.asarray(0, jnp.int32))
        float(out[5])
        ts = []
        for _ in range(3):
            W, H = init_fn(jax.random.PRNGKey(0))
            t0 = time.perf_counter()
            out = runner(scoo, W, H, jnp.asarray(0, jnp.int32))
            float(out[5])
            ts.append(time.perf_counter() - t0)
        per_iter = min(ts) / args.iters
        nnz_rate = sp.nnz / per_iter
        results.append({
            "mesh": mesh_str, "devices": ndev, "nnz": sp.nnz,
            "ms_per_iter": per_iter * 1e3,
            "nnz_per_s_per_device": nnz_rate / ndev,
        })
        print(json.dumps(results[-1]), flush=True)

    if len(results) >= 2:
        base = results[0]["nnz_per_s_per_device"]
        for r in results[1:]:
            eff = r["nnz_per_s_per_device"] / base
            print(f"weak-scaling efficiency {r['mesh']}: {eff:.1%}",
                  flush=True)


if __name__ == "__main__":
    main()
