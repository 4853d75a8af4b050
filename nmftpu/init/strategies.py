"""The six initialization strategies (SURVEY.md C8).

The reference (nmfgpu paper, R Journal 8(2) 2016) exposes:
  CopyExisting, AllRandomValues, MeanColumns, KMeansAndRandomValues,
  KMeansAndNonNegativeWTV (H = max(0, W^T V)), KMeansAndAbsoluteWTV
  (H = |W^T V|).

Random magnitudes follow the sklearn 'random' convention — uniform scaled by
sqrt(mean(V) / rank) — which puts the initial WH on the same scale as V and
keeps MU well conditioned; the reference's exact scaling is unknowable (empty
mount) and only affects the pre-convergence transient.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from nmftpu.config import Initialization
from nmftpu.init.kmeans import kmeans_columns


def _random_uniform(key, shape, scale, dtype):
    # Strictly positive (avoids exact zeros, which MU can never leave).
    u = jax.random.uniform(key, shape, dtype=dtype, minval=0.0, maxval=1.0)
    return (u + jnp.asarray(1e-4, dtype)) * scale


def initialize_factors(
    V,
    rank: int,
    method: Initialization,
    key,
    W0=None,
    H0=None,
    kmeans_max_iter: int = 25,
    mean_v=None,
):
    """Produce initial (W, H) for a dense or densified-stat view of V.

    V: (n, m) array (for sparse inputs the caller passes dense statistics —
    see nmftpu.sparse.sparse_initialize_factors, which reuses the same
    strategy semantics without densifying).
    mean_v: optional precomputed mean of V (used for the random scale).
    """
    n, m = V.shape
    dtype = V.dtype
    if mean_v is None:
        mean_v = jnp.mean(V)
    scale = jnp.sqrt(jnp.maximum(mean_v, 1e-12) / rank).astype(dtype)
    kw, kh, kk = jax.random.split(key, 3)

    if method is Initialization.COPY_EXISTING:
        if W0 is None or H0 is None:
            raise ValueError("COPY_EXISTING requires both W0 and H0")
        # Always copy: the driver donates W/H into the update loop, and the
        # user's warm-start buffers must survive multi-run restarts.
        return (
            jnp.array(W0, dtype=dtype, copy=True),
            jnp.array(H0, dtype=dtype, copy=True),
        )

    if method is Initialization.ALL_RANDOM_VALUES:
        W = _random_uniform(kw, (n, rank), scale, dtype)
        H = _random_uniform(kh, (rank, m), scale, dtype)
        return W, H

    if method is Initialization.MEAN_COLUMNS:
        # Each W column = mean of `q` random columns of V (paper's
        # MeanColumns strategy; q = max(5, m // rank) bounded by m).
        q = int(min(max(5, m // max(rank, 1)), m))
        cols = jax.random.randint(kk, (rank, q), 0, m)
        picked = jnp.take(V, cols.reshape(-1), axis=1).reshape(n, rank, q)
        W = jnp.mean(picked, axis=2)
        H = _random_uniform(kh, (rank, m), scale, dtype)
        return W, H

    if method in (
        Initialization.NNDSVD,
        Initialization.NNDSVDA,
        Initialization.NNDSVDAR,
    ):
        import numpy as np

        from nmftpu.init.nndsvd import nndsvd_init

        # host-side one-time SVD seeding (deterministic; the 'ar'
        # variant's fill noise is seeded from the run key)
        seed = int(jax.random.randint(kk, (), 0, 2**31 - 1))
        W, H = nndsvd_init(np.asarray(V), rank, variant=method.value,
                           seed=seed)
        return jnp.asarray(W, dtype), jnp.asarray(H, dtype)

    if method in (
        Initialization.K_MEANS_AND_RANDOM_VALUES,
        Initialization.K_MEANS_AND_NON_NEGATIVE_WTV,
        Initialization.K_MEANS_AND_ABSOLUTE_WTV,
    ):
        centroids, _ = kmeans_columns(V, rank, kk, max_iter=kmeans_max_iter)
        W = jnp.maximum(centroids, 0.0) + jnp.asarray(1e-6, dtype)
        if method is Initialization.K_MEANS_AND_RANDOM_VALUES:
            H = _random_uniform(kh, (rank, m), scale, dtype)
        elif method is Initialization.K_MEANS_AND_NON_NEGATIVE_WTV:
            H = jnp.maximum(W.T @ V, 0.0) + jnp.asarray(1e-6, dtype)
        else:  # K_MEANS_AND_ABSOLUTE_WTV
            H = jnp.abs(W.T @ V) + jnp.asarray(1e-6, dtype)
        return W, H

    raise ValueError(f"unknown initialization method: {method}")
