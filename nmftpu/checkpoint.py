"""Checkpoint / resume (SURVEY.md §5.4).

The reference's only resume mechanism is warm-starting via
initMethod=CopyExisting (the caller keeps W/H). Here checkpointing is
first-class: orbax writes the (possibly sharded) W/H factors plus the
iteration counter and config fingerprint; `resume` restores them and the
driver continues via the same CopyExisting semantics — so a killed
multi-host job restarts from the last checkpoint (the fail-fast +
restart-based recovery model of JAX multi-host, SURVEY.md §5.3).
"""

from __future__ import annotations

import dataclasses
import json
import os
from typing import Any

import jax
import numpy as np

try:
    import orbax.checkpoint as ocp

    _HAS_ORBAX = True
except Exception:  # pragma: no cover
    _HAS_ORBAX = False

from nmftpu.config import NmfConfig


def _config_fingerprint(config: NmfConfig) -> str:
    d = dataclasses.asdict(config)
    d = {k: (v.value if hasattr(v, "value") else v) for k, v in d.items()}
    return json.dumps(d, sort_keys=True)


@dataclasses.dataclass
class Checkpoint:
    W: Any
    H: Any
    iteration: int
    config_fingerprint: str


def save(path: str, W, H, iteration: int, config: NmfConfig) -> None:
    """Write factors + progress. Works for replicated and sharded arrays
    (orbax handles NamedSharding-distributed saves); falls back to .npz
    when orbax is unavailable."""
    path = os.path.abspath(path)
    meta = {
        "iteration": int(iteration),
        "config_fingerprint": _config_fingerprint(config),
    }
    if _HAS_ORBAX:
        ckptr = ocp.StandardCheckpointer()
        ckptr.save(
            os.path.join(path, "factors"),
            {"W": W, "H": H},
            force=True,
        )
        ckptr.wait_until_finished()
        with open(os.path.join(path, "meta.json"), "w") as f:
            json.dump(meta, f)
    else:  # pragma: no cover
        os.makedirs(path, exist_ok=True)
        np.savez(
            os.path.join(path, "factors.npz"),
            W=np.asarray(W), H=np.asarray(H),
        )
        with open(os.path.join(path, "meta.json"), "w") as f:
            json.dump(meta, f)


def load(path: str) -> Checkpoint:
    path = os.path.abspath(path)
    with open(os.path.join(path, "meta.json")) as f:
        meta = json.load(f)
    if _HAS_ORBAX and os.path.isdir(os.path.join(path, "factors")):
        ckptr = ocp.StandardCheckpointer()
        tree = ckptr.restore(os.path.join(path, "factors"))
        W, H = tree["W"], tree["H"]
    else:  # pragma: no cover
        data = np.load(os.path.join(path, "factors.npz"))
        W, H = data["W"], data["H"]
    return Checkpoint(
        W=W, H=H,
        iteration=meta["iteration"],
        config_fingerprint=meta["config_fingerprint"],
    )


def resume(path: str, V, config: NmfConfig, strict: bool = True, **kwargs):
    """Continue a factorization from a checkpoint: CopyExisting warm start
    with the remaining iteration budget. `V` may be dense, an nmftpu sparse
    container, or anything `nmftpu.nmf` accepts; extra kwargs forward to
    the driver (mesh=... routes through compute_sharded)."""
    from nmftpu import driver, sparse as host_sparse, sparse_ops
    from nmftpu.config import Initialization

    ck = load(path)
    if strict and ck.config_fingerprint != _config_fingerprint(config):
        raise ValueError(
            "checkpoint was written under a different NmfConfig; pass "
            "strict=False to resume anyway"
        )
    # Budget already exhausted => remaining = 0: the driver runs ZERO
    # update steps (CopyExisting + num_iterations=0 is an evaluate-only
    # pass), so the stored factors come back unchanged but with REAL
    # error/frobenius_error/rmsd and converged=False — callers gating on
    # convergence or comparing errors keep their contract.
    remaining = max(0, config.num_iterations - ck.iteration)
    cfg = dataclasses.replace(
        config,
        init_method=Initialization.COPY_EXISTING,
        num_iterations=remaining,
        num_runs=1,
    )
    mesh = kwargs.pop("mesh", None)
    if mesh is not None:
        from nmftpu.parallel import compute_sharded

        return compute_sharded(
            V, cfg, mesh=mesh, W0=ck.W, H0=ck.H, **kwargs
        )
    if isinstance(V, host_sparse.SparseMatrix):
        return sparse_ops.compute_sparse(V, cfg, W0=ck.W, H0=ck.H, **kwargs)
    return driver.compute(V, cfg, W0=ck.W, H0=ck.H, **kwargs)
