"""Streaming / out-of-core NMF: fit a model you could never hold in
device memory, three ways —

  1. `MiniBatchNMF` on an np.memmap (only batch panels ever reach the
     device; the epoch-fused path compiles one program per epoch when
     the matrix DOES fit),
  2. `OnlineNMF.partial_fit` on an unbounded row stream (resident
     device state: H + two r x m accumulators, nothing else),
  3. the same stream with H column-sharded over a device mesh
     (items axis beyond one chip's HBM).

Run: NMFTPU_PLATFORM=cpu python examples/streaming_minibatch.py
"""

import os
import tempfile

import numpy as np

from _common import base_parser  # noqa: F401  (applies platform env)


def main():
    base_parser(__doc__).parse_args()
    rng = np.random.default_rng(0)
    n, m, r = 4096, 512, 16
    H_true = np.abs(rng.normal(size=(r, m))).astype(np.float32)

    # ------------------------------------------------------------------
    # 1. out-of-core fit from an np.memmap (stand-in for a dataset on
    #    disk that outsizes HBM)
    # ------------------------------------------------------------------
    from nmftpu import MiniBatchNMF

    path = os.path.join(tempfile.mkdtemp(), "ratings.dat")
    mm = np.memmap(path, dtype=np.float32, mode="w+", shape=(n, m))
    for lo in range(0, n, 1024):  # write it in chunks, like an ETL job
        Wb = np.abs(rng.normal(size=(1024, r)))
        mm[lo:lo + 1024] = (Wb @ H_true).astype(np.float32)
    mm.flush()

    V = np.memmap(path, dtype=np.float32, mode="r", shape=(n, m))
    model = MiniBatchNMF(n_components=r, batch_size=1024, max_iter=8,
                         tol=0.0, max_no_improvement=None,
                         random_state=0)
    W = model.fit_transform(V)
    print(f"memmap fit: W {W.shape}, reconstruction_err_ "
          f"{model.reconstruction_err_:.2f} "
          f"({model.n_steps_} mini-batch steps)")

    # ------------------------------------------------------------------
    # 2. a true row stream: batches arrive, the model updates, no V
    #    exists anywhere in full
    # ------------------------------------------------------------------
    from nmftpu import OnlineNMF

    stream_model = OnlineNMF(r, batch_size=1024, seed=0)
    for step in range(24):
        Wb = np.abs(rng.normal(size=(1024, r)))
        batch = (Wb @ H_true).astype(np.float32)
        stream_model.partial_fit(batch)
    probe_W = np.abs(rng.normal(size=(256, r))).astype(np.float32)
    probe = (probe_W @ H_true).astype(np.float32)
    Wp = np.asarray(stream_model.transform(probe))
    err = np.linalg.norm(probe - Wp @ np.asarray(stream_model.H))
    rel = err / np.linalg.norm(probe)
    print(f"stream fit: {stream_model.n_steps} steps, holdout relative "
          f"error {rel:.3f}")

    # ------------------------------------------------------------------
    # 3. the same, with H/A/B column-sharded over a device mesh —
    #    the item axis can exceed one chip
    # ------------------------------------------------------------------
    import jax

    if len(jax.devices()) >= 2:
        from nmftpu.parallel import make_grid_mesh

        mesh = make_grid_mesh()  # all visible devices
        sharded = OnlineNMF(r, batch_size=1024, seed=0, mesh=mesh)
        for step in range(4):
            Wb = np.abs(rng.normal(size=(1024, r)))
            sharded.partial_fit((Wb @ H_true).astype(np.float32))
        ndev = len({s.device.id for s in sharded.H.addressable_shards})
        print(f"sharded stream: H lives on {ndev} devices, "
              f"{sharded.H.addressable_shards[0].data.shape} per shard")
    else:
        print("sharded stream: skipped (single device)")


if __name__ == "__main__":
    main()
