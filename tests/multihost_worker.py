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


def _rowshard_plan(sp, cfg, mesh, pid):
    """Build the per-process row-shard plan: THIS process feeds only its
    own half of the rows (its 'file shard')."""
    from nmftpu.parallel.driver import prepare_sharded_rowshards
    from nmftpu.sparse import SparseCOO

    coo = sp.to_coo()
    n, m = sp.shape
    half = 64  # block_rows for n=120 on pu=2 (rounded up to 8)
    lo, hi = pid * half, min((pid + 1) * half, n)
    sel = (coo.row >= lo) & (coo.row < hi)
    local = SparseCOO(coo.row[sel] - lo, coo.col[sel], coo.data[sel],
                      (hi - lo, m))
    return prepare_sharded_rowshards(
        local, lo, (n, m), cfg, mesh=mesh, balance=False, chunk=256,
    )


def _gather_user_factors(res, n):
    """Allgather the (permuted, padded) multi-host factors and map them
    back to user coordinates — the checkpointable form."""
    import jax.experimental.multihost_utils as mhu

    Wp = np.asarray(mhu.process_allgather(res.W, tiled=True))
    Hp = np.asarray(mhu.process_allgather(res.H, tiled=True))
    return Wp[res.row_perm], Hp[:, res.col_perm]


def main():
    coordinator, nprocs, pid = (
        sys.argv[1], int(sys.argv[2]), int(sys.argv[3])
    )
    phase = os.environ.get("NMFTPU_MH_PHASE", "main")
    ckpt_dir = os.environ.get("NMFTPU_MH_CKPT", "")
    sys.path.insert(
        0, os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    )
    from nmftpu.parallel.multihost import initialize_distributed

    initialize_distributed(coordinator, nprocs, pid)
    assert jax.process_count() == nprocs
    assert len(jax.devices()) == 4 * nprocs, len(jax.devices())

    import dataclasses

    from nmftpu import NmfConfig
    from nmftpu import checkpoint as ckpt
    from nmftpu.data import synthetic_powerlaw_sparse
    from nmftpu.parallel import compute_sharded, make_grid_mesh

    mesh = make_grid_mesh((2, 4))
    sp = synthetic_powerlaw_sparse(120, 96, nnz=2500, seed=0)
    cfg = NmfConfig(rank=6, num_iterations=8, check_interval=4, seed=0)
    n, m = sp.shape

    if phase == "ckpt_die":
        # ROWSHARDS fault-injection phase: run half the budget on the
        # row-shard plan, checkpoint, then host 1 "crashes". Recovery is
        # restart-based (SURVEY.md §5.3): the resume phase below picks
        # up from this checkpoint.
        plan = _rowshard_plan(sp, cfg, mesh, pid)
        half_cfg = dataclasses.replace(cfg, num_iterations=4)
        res = plan.run(half_cfg, unpermute=False)
        W_user, H_user = _gather_user_factors(res, n)
        # orbax save is a COLLECTIVE on multi-host: every process
        # participates (the primary writes, the rest sync)
        ckpt.save(ckpt_dir, W_user, H_user, iteration=4, config=cfg)
        print(f"CKPT {res.frobenius_error:.6f}", flush=True)
        if pid == 1:
            os._exit(1)  # simulated host death after the last checkpoint
        return

    if phase == "resume":
        # restart-from-checkpoint over the SAME rowshards ingestion path
        plan = _rowshard_plan(sp, cfg, mesh, pid)
        ck = ckpt.load(ckpt_dir)
        remaining = dataclasses.replace(
            cfg, num_iterations=cfg.num_iterations - ck.iteration,
            init_method="copy_existing",
        )
        res_resumed = plan.run(remaining, W0=np.asarray(ck.W),
                               H0=np.asarray(ck.H))
        res_full = plan.run(cfg)
        assert np.isfinite(res_resumed.frobenius_error)
        diff = abs(float(res_resumed.frobenius_error)
                   - float(res_full.frobenius_error))
        assert diff <= 1e-3 * float(res_full.frobenius_error), (
            res_resumed.frobenius_error, res_full.frobenius_error)
        print(f"RESUMED {res_resumed.frobenius_error:.6f}", flush=True)
        return

    res = compute_sharded(sp, cfg, mesh=mesh, chunk=256)
    assert res.row_perm is not None  # multi-host path taken
    assert np.isfinite(res.frobenius_error)
    print(f"RESULT {res.frobenius_error:.6f}", flush=True)

    # row-shard ingestion parity vs the full-matrix balance=False run
    # (same tiles, same init)
    res_full = compute_sharded(sp, cfg, mesh=mesh, chunk=256,
                               balance=False)
    plan = _rowshard_plan(sp, cfg, mesh, pid)
    res_rs = plan.run()
    assert np.isfinite(res_rs.frobenius_error)
    diff = abs(float(res_rs.frobenius_error)
               - float(res_full.frobenius_error))
    assert diff <= 1e-4 * float(res_full.frobenius_error), (
        res_rs.frobenius_error, res_full.frobenius_error)
    print(f"ROWSHARD {res_rs.frobenius_error:.6f}", flush=True)

    # iALS (exact confidence-weighted ALS, warm-started CG) on the
    # multi-host grid — the cfg3 algorithm over DCN
    cfg_ials = dataclasses.replace(
        cfg, algorithm="als", alpha_confidence=8.0, lambda_w=0.1,
        lambda_h=0.1, num_iterations=4, als_solver="cg", cg_steps=3,
    )
    res_ials = compute_sharded(sp, cfg_ials, mesh=mesh, chunk=256)
    assert np.isfinite(res_ials.frobenius_error)
    print(f"IALS {res_ials.frobenius_error:.6f}", flush=True)

    # masked completion (mask='observed') on the multi-host grid
    cfg_mask = dataclasses.replace(cfg, mask="observed",
                                   num_iterations=4)
    res_mask = compute_sharded(sp, cfg_mask, mesh=mesh, chunk=256)
    assert np.isfinite(res_mask.frobenius_error)
    print(f"MASKED {res_mask.frobenius_error:.6f} "
          f"{res_mask.rmsd:.6f}", flush=True)

    # generalized beta on the multi-host grid (streamed panel
    # denominators + D_beta metric over DCN)
    cfg_beta = dataclasses.replace(cfg, objective="beta-divergence",
                                   beta=1.5, num_iterations=3)
    res_beta = compute_sharded(sp, cfg_beta, mesh=mesh, chunk=256)
    assert np.isfinite(res_beta.kl_error)
    print(f"BETA {res_beta.kl_error:.6f}", flush=True)

    # round 5: SERVING over the 2-process mesh — sharded top-k + the
    # psum'd per-shard exactness certificate (each process holds only
    # its addressable item shards; _put_global places the table)
    from nmftpu.parallel import factor_shardings, topk_mips_sharded
    from nmftpu.parallel.driver import _put_global
    from nmftpu.parallel.retrieval_sharded import certify_topk_sharded

    W_user, H_user = _gather_user_factors(res, n)
    H_dev = _put_global(H_user.astype(np.float32),
                        factor_shardings(mesh)["H"])
    Wq = W_user[:4].astype(np.float32)
    s, i = topk_mips_sharded(Wq, H_dev, 5, mesh=mesh, block=12)
    cert = certify_topk_sharded(Wq, H_dev, s, 5, mesh=mesh, block=12)
    i_h = np.asarray(i)
    # oracle on host factors
    full = Wq @ H_user
    for row in range(4):
        assert set(i_h[row].tolist()) == set(
            np.argsort(-full[row])[:5].tolist()), row
    assert np.asarray(cert).all()  # exact scan always certifies
    print(f"SERVE {int(np.asarray(cert).sum())} "
          f"{np.sort(i_h, axis=1).tolist()}", flush=True)


if __name__ == "__main__":
    main()
