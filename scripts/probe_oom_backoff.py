"""Validate the serving OOM backoff against the REAL compiler error.

BENCH_retrieval_10m.json records that the f32/r256 megablock scan at
m=10.49M raises inside XLA; `Recommender._scan_with_backoff` matches
the error text against _OOM_MARKERS and halves the block. This probe
builds the failing configuration on the actual chip and confirms (a)
the raw error really matches the markers and (b) a Recommender serving
that table succeeds after automatic backoff. The Recommender is
assembled around a device-resident table (a host H would mean a
10.7 GB tunnel upload).

Usage: python scripts/probe_oom_backoff.py
"""

import os
import sys
import warnings

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def main():
    import jax
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir", "/tmp/nmftpu_jax_cache")
    from nmftpu.serving import Recommender, _is_oom

    m, r, b = 640 * 16384, 256, 512
    key = jax.random.PRNGKey(7)
    # one-shot jit build (bits->normal fuses into one buffer; the
    # chunk+concatenate form doubles peak memory and leaves the chip
    # too full for ANY scan) — same as bench_retrieval_10m.py
    gen = jax.jit(lambda kk: jax.random.normal(kk, (r, m), jnp.float32))
    H = gen(key)
    H.block_until_ready()
    print(f"f32 table resident: {r * m * 4 / 1e9:.1f} GB", flush=True)

    rec = Recommender.__new__(Recommender)
    rec.W = np.random.default_rng(0).standard_normal(
        (b, r)).astype(np.float32)
    rec.mesh = None
    rec.block = 1 << 20           # the recorded failing default
    rec.method = "approx"
    rec.table_dtype = "float32"
    rec._h_scale = None
    rec.reservoir_slots = 4096
    rec._m_items = m
    rec._H_unpadded = None
    rec.H = H
    rec._train_csr = None
    rec._prepared = None

    backoffs = []
    orig_warn = warnings.warn

    def loud_warn(msg, *a, **k):
        if "retrying with" in str(msg):
            backoffs.append(str(msg))
            print("BACKOFF:", str(msg)[:110], flush=True)
        return orig_warn(msg, *a, **k)

    # control: the SAME scan at block=16384 with no prior failed
    # attempts (round 4 measured 231 q/s at this config)
    rec.block = 16384
    s, i = rec.recommend(np.arange(b), k=100, exclude_seen=False)
    print("control block=16384 fresh: OK", flush=True)
    rec.block = 1 << 20

    warnings.warn = loud_warn
    try:
        s, i = rec.recommend(np.arange(b), k=100, exclude_seen=False)
    finally:
        warnings.warn = orig_warn
    print(f"final block: {rec.block} (started 1048576), "
          f"backoffs: {len(backoffs)}")
    assert backoffs, "expected at least one OOM backoff"
    assert s.shape == (b, 100) and np.isfinite(s).all()
    print("OOM BACKOFF VALIDATED on the real boundary", flush=True)


if __name__ == "__main__":
    main()
