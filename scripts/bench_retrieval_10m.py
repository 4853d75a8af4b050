"""Retrieval serving at the 10M-item scale (BASELINE.json config #5;
round-1 verdict item 5): bandwidth-shaped bench of blocked top-k MIPS
with block-bucketed seen-exclusion, exact vs approx with candidate-k'
sweep.

m is chosen block-divisible so the kernel takes the zero-copy path (no
padded duplicate of the 2.5 GB table). Synthetic seen lists (~100/user)
exercise the exclusion scatter exactly as production would.

Usage: python scripts/bench_retrieval_10m.py [--items 10485760]
"""

import argparse
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--items", type=int, default=640 * 16384)  # 10.49M
    ap.add_argument("--rank", type=int, default=64)
    ap.add_argument("--batch", type=int, default=512)
    ap.add_argument("--k", type=int, default=100)
    ap.add_argument("--block", type=int, default=16384)
    ap.add_argument("--seen", type=int, default=100)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir", "/tmp/nmftpu_jax_cache")
    from nmftpu.retrieval.exclusion import build_block_exclusion
    from nmftpu.retrieval.mips import topk_mips_blocked
    from nmftpu.sparse import SparseCSR

    m, r, b, k = args.items, args.rank, args.batch, args.k
    rng = np.random.default_rng(0)
    print(f"items={m/1e6:.2f}M rank={r} batch={b} k={k} "
          f"block={args.block}", flush=True)
    print(f"H table: {m*r*4/1e9:.2f} GB f32", flush=True)

    H = jax.device_put(
        jnp.asarray(rng.standard_normal((r, m), dtype=np.float32))
    )
    Wq = jnp.asarray(rng.standard_normal((b, r), dtype=np.float32))

    # synthetic seen lists for the batch users (ids 0..b-1)
    seen_counts = rng.poisson(args.seen, b).clip(1, 4 * args.seen)
    indptr = np.concatenate([[0], np.cumsum(seen_counts)]).astype(np.int64)
    indices = rng.integers(0, m, int(indptr[-1])).astype(np.int64)
    csr = SparseCSR(indptr, indices, np.ones(len(indices), np.float32),
                    (b, m))
    t0 = time.perf_counter()
    lists = build_block_exclusion(np.arange(b), csr, m, args.block)
    t_build = time.perf_counter() - t0
    print(f"exclusion build (host): {t_build*1e3:.1f} ms for "
          f"{indptr[-1]} seen pairs -> E={lists[0].shape[1]}", flush=True)

    score_gb = m * r * 4 / 1e9  # H read once per batch

    def bench(label, **kw):
        fn = lambda Wq: topk_mips_blocked(  # noqa: E731
            Wq, H, k, block=args.block, exclude_lists=lists, **kw
        )
        # warm
        s, i = fn(Wq)
        float(jnp.sum(s))
        best = 1e9
        for _ in range(5):
            t0 = time.perf_counter()
            s, i = fn(Wq)
            float(jnp.sum(s))
            best = min(best, time.perf_counter() - t0)
        qps = b / best
        print(f"{label:34s} {best*1e3:8.1f} ms/batch  {qps:10.0f} q/s  "
              f"({score_gb/best:.0f} GB/s table read)", flush=True)
        return s, i, best

    s_ex, i_ex, t_ex = bench("exact")
    results = {}
    for ck in (32, 100, 256, 512):
        s_ap, i_ap, t_ap = bench(f"approx candidate_k={ck}",
                                 method="approx", candidate_k=ck)
        # recall vs exact
        got, want = np.asarray(i_ap), np.asarray(i_ex)
        rec = np.mean([
            len(set(got[u]) & set(want[u])) / k for u in range(b)
        ])
        results[ck] = (t_ap, rec)
        print(f"    recall vs exact: {rec:.4f}  "
              f"speedup {t_ex/t_ap:.1f}x", flush=True)

    # seen items must never surface
    got = np.asarray(i_ex)
    viol = 0
    for u in range(b):
        su = set(indices[indptr[u]:indptr[u+1]].tolist())
        viol += len(su & set(got[u].tolist()))
    print(f"seen-exclusion violations (exact): {viol}", flush=True)


if __name__ == "__main__":
    main()
