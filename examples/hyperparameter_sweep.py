"""Hyperparameter sweep with the prepare/run plan API: the device layout
(ELL buckets / densified matrix / mesh partition) is built ONCE with
`prepare_sparse`, then every sweep point is a `plan.run(...)` — rank and
every loop/algorithm knob may vary per run (the layout is rank-
independent); only dtype is pinned at prepare time. Model selection by
held-out recall@k."""

import dataclasses

from _common import base_parser, load_or_synthesize


def main():
    ap = base_parser(__doc__)
    ap.add_argument("--ranks", default="16,32,64",
                    help="comma-separated ranks to sweep")
    ap.add_argument("--alphas", default="0,20,40",
                    help="confidence weights to sweep")
    ap.add_argument("--recall-k", type=int, default=50)
    args = ap.parse_args()
    import time

    import numpy as np

    from nmftpu import NmfConfig
    from nmftpu.data import train_test_split_by_user
    from nmftpu.retrieval import recall_at_k
    from nmftpu.sparse_ops import prepare_sparse

    inter = load_or_synthesize(
        args.data, 20_000, 8_000, 400_000, seed=2, implicit=True
    )
    train, test_pairs = train_test_split_by_user(inter)
    rng = np.random.default_rng(0)
    sel = (rng.choice(len(test_pairs), 5_000, replace=False)
           if len(test_pairs) > 5_000 else slice(None))
    pairs = test_pairs[sel]

    base = NmfConfig(rank=16, num_iterations=args.iters or 40,
                     check_interval=10, seed=0)
    t0 = time.time()
    plan = prepare_sparse(train.to_csr(), base)
    print(f"layout prepared once ({plan.strategy}) in "
          f"{time.time() - t0:.1f}s")

    best = (-1.0, None)
    for rank in (int(r) for r in args.ranks.split(",")):
        for alpha in (float(a) for a in args.alphas.split(",")):
            cfg = dataclasses.replace(base, rank=rank,
                                      alpha_confidence=alpha)
            t0 = time.time()
            res = plan.run(cfg)
            rec = recall_at_k(np.asarray(res.W), res.H, pairs,
                              train=train, k=args.recall_k)
            print(f"rank={rank:4d} alpha={alpha:5.1f}  "
                  f"recall@{args.recall_k}={rec:.4f}  "
                  f"err={res.frobenius_error:9.2f}  "
                  f"{time.time() - t0:5.1f}s")
            if rec > best[0]:
                best = (rec, (rank, alpha))
    print(f"best: rank={best[1][0]} alpha={best[1][1]} "
          f"recall@{args.recall_k}={best[0]:.4f}")


if __name__ == "__main__":
    main()
