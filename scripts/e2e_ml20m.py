"""End-to-end graded-config demonstration at ML-20M scale on one chip:
sparse ratings -> densified-bf16 MU factorization -> leave-latest-out
recall@100 (BASELINE.json configs #2/#5). Pass --data ratings.csv to run
on the real dataset; defaults synthesize a power-law matrix of the same
shape."""

import argparse
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--data", default=None)
    ap.add_argument("--rank", type=int, default=64)
    ap.add_argument("--iters", type=int, default=100)
    ap.add_argument("--objective", default="frobenius")
    ap.add_argument("--k", type=int, default=100)
    ap.add_argument("--max-eval-users", type=int, default=20000)
    args = ap.parse_args()

    import jax

    jax.config.update("jax_compilation_cache_dir", "/tmp/nmftpu_jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    import nmftpu
    from nmftpu.data import load_movielens, synthetic_powerlaw_sparse
    from nmftpu.data.movielens import Interactions, train_test_split_by_user
    from nmftpu.retrieval import recall_at_k

    if args.data:
        inter = load_movielens(args.data)
    else:
        sp = synthetic_powerlaw_sparse(
            138_000, 27_000, nnz=40_000_000, alpha_user=0.9,
            alpha_item=0.9, seed=0,
        )
        rng = np.random.default_rng(0)
        inter = Interactions(
            matrix=sp,
            user_ids=np.arange(sp.shape[0]),
            item_ids=np.arange(sp.shape[1]),
            timestamps=rng.integers(1, 10**9, sp.nnz),
        )
    print(f"interactions: {inter.n_users} x {inter.n_items}, "
          f"nnz={inter.matrix.nnz}", flush=True)

    train, test_pairs = train_test_split_by_user(inter, holdout_per_user=1)
    print(f"train nnz={train.nnz}, test pairs={len(test_pairs)}",
          flush=True)

    t0 = time.time()
    res = nmftpu.nmf(
        train.to_csr(), args.rank,
        objective=args.objective,
        num_iterations=args.iters, check_interval=20, seed=0,
    )
    print(f"factorized in {time.time()-t0:.1f}s wall "
          f"({res.elapsed_ms:.0f} ms in-loop), "
          f"iters={res.num_iterations}", flush=True)
    print(f"frobenius_error={res.frobenius_error:.1f} "
          f"rmsd={res.rmsd:.5f}", flush=True)
    errs = res.stats.errors
    print(f"error trajectory: {errs[0]:.1f} -> {errs[-1]:.1f}", flush=True)

    # recall@k on a sample of held-out users
    if len(test_pairs) > args.max_eval_users:
        sel = np.random.default_rng(1).choice(
            len(test_pairs), args.max_eval_users, replace=False
        )
        test_pairs = test_pairs[sel]
    t0 = time.time()
    rec = recall_at_k(
        np.asarray(res.W), res.H, test_pairs, train=train, k=args.k,
        batch_users=2048, block=8192,
    )
    print(f"recall@{args.k} = {rec:.4f} on {len(test_pairs)} held-out "
          f"pairs ({time.time()-t0:.1f}s eval)", flush=True)


if __name__ == "__main__":
    main()
