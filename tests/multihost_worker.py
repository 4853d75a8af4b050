"""Worker process for the multi-host smoke test (not a pytest module).

Invoked as: python multihost_worker.py <coordinator> <nprocs> <pid>
Each process owns 4 virtual CPU devices; together they form the 8-device
global ('users','items') mesh and run a sharded factorization. Prints
RESULT <error> on success (identical on every process)."""

import os
import sys

os.environ["JAX_PLATFORMS"] = "cpu"
os.environ["XLA_FLAGS"] = (
    os.environ.get("XLA_FLAGS", "")
    + " --xla_force_host_platform_device_count=4"
).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402


def main():
    coordinator, nprocs, pid = (
        sys.argv[1], int(sys.argv[2]), int(sys.argv[3])
    )
    sys.path.insert(
        0, os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    )
    from nmftpu.parallel.multihost import initialize_distributed

    initialize_distributed(coordinator, nprocs, pid)
    assert jax.process_count() == nprocs
    assert len(jax.devices()) == 4 * nprocs, len(jax.devices())

    from nmftpu import NmfConfig
    from nmftpu.data import synthetic_powerlaw_sparse
    from nmftpu.parallel import compute_sharded, make_grid_mesh

    mesh = make_grid_mesh((2, 4))
    sp = synthetic_powerlaw_sparse(120, 96, nnz=2500, seed=0)
    cfg = NmfConfig(rank=6, num_iterations=8, check_interval=4, seed=0)
    res = compute_sharded(sp, cfg, mesh=mesh, chunk=256)
    assert res.row_perm is not None  # multi-host path taken
    assert np.isfinite(res.frobenius_error)
    print(f"RESULT {res.frobenius_error:.6f}", flush=True)

    # row-shard ingestion: THIS process feeds only its own half of the
    # rows (its "file shard"); result must match the full-matrix
    # balance=False run exactly (same tiles, same init)
    from nmftpu.parallel.driver import prepare_sharded_rowshards
    from nmftpu.sparse import SparseCOO

    res_full = compute_sharded(sp, cfg, mesh=mesh, chunk=256,
                               balance=False)
    coo = sp.to_coo()
    n, m = sp.shape
    half = 64  # block_rows for n=120 on pu=2 (rounded up to 8)
    lo, hi = pid * half, min((pid + 1) * half, n)
    sel = (coo.row >= lo) & (coo.row < hi)
    local = SparseCOO(coo.row[sel] - lo, coo.col[sel], coo.data[sel],
                      (hi - lo, m))
    plan = prepare_sharded_rowshards(
        local, lo, (n, m), cfg, mesh=mesh, balance=False, chunk=256,
    )
    res_rs = plan.run()
    assert np.isfinite(res_rs.frobenius_error)
    diff = abs(float(res_rs.frobenius_error)
               - float(res_full.frobenius_error))
    assert diff <= 1e-4 * float(res_full.frobenius_error), (
        res_rs.frobenius_error, res_full.frobenius_error)
    print(f"ROWSHARD {res_rs.frobenius_error:.6f}", flush=True)


if __name__ == "__main__":
    main()
