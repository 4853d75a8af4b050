"""NNDSVD initialization (Boutsidis & Gallopoulos, Pattern Recognition
2008): seed W/H from the truncated SVD's nonnegative parts.

Beyond the reference's six strategies (SURVEY.md C8) — added because it
is sklearn's DEFAULT init (`_initialize_nmf`, init=None → 'nndsvda'),
so the drop-in estimator (nmftpu.sklearn_api) needs it for faithful
porting. Deterministic (exact SVD; NNDSVD's per-component
positive-vs-negative-part choice makes the output invariant to the
SVD's sign ambiguity), so nndsvd/nndsvda runs reproduce bit-for-bit
without a seed.

This is a HOST-side, one-time computation (like the reference's init
strategies it runs before the device loop): dense inputs use LAPACK
SVD, sparse inputs a truncated scipy `svds` so the matrix is never
densified. On meshes it runs on one host and is then sharded — fine at
init-sized costs, not for the 100M-row regime (use the mesh-native
k-means/random inits there).
"""

from __future__ import annotations

import numpy as np

_VARIANTS = ("nndsvd", "nndsvda", "nndsvdar")


def _truncated_svd(X, rank: int):
    """(U[:, :r], S[:r], Vt[:r]) for dense ndarray / scipy.sparse /
    nmftpu SparseMatrix."""
    from nmftpu.sparse import SparseMatrix

    if isinstance(X, SparseMatrix):
        csr = X.to_csr()
        try:
            import scipy.sparse as sps

            X = sps.csr_matrix(
                (csr.data, csr.indices, csr.indptr), shape=csr.shape
            )
        except ImportError:  # scipy absent: densify (init-time only)
            X = np.asarray(csr.todense())

    if hasattr(X, "tocsr") and hasattr(X, "nnz"):  # scipy.sparse
        from scipy.sparse.linalg import svds

        if rank < min(X.shape):
            # deterministic starting vector: ARPACK's default v0 is
            # random, which would make the init differ call-to-call.
            # A constant v0 can stall ARPACK on adversarial spectra
            # (e.g. v0 orthogonal to the dominant subspace), so fall
            # back to seeded random v0's, and finally to dense LAPACK
            # when the matrix is small enough to densify.
            k = min(X.shape)
            starts = [np.ones(k, dtype=np.float64)]
            for s in (0, 1):
                starts.append(
                    np.random.default_rng(s).standard_normal(k))
            err = None
            for v0 in starts:
                try:
                    U, S, Vt = svds(X.asfptype(), k=rank, v0=v0)
                except Exception as e:  # ArpackNoConvergence/ArpackError
                    err = e
                    continue
                if np.all(np.isfinite(S)) and np.all(S >= 0):
                    order = np.argsort(S)[::-1]  # svds returns ascending
                    return U[:, order], S[order], Vt[order]
            if X.shape[0] * X.shape[1] > 50_000_000:
                raise RuntimeError(
                    "nndsvd: truncated svds failed to converge on all "
                    "start vectors and the matrix is too large to "
                    "densify; use init_method='kmeans*' or 'random' "
                    f"instead (last error: {err})")
        X = np.asarray(X.todense())

    X = np.asarray(X)
    U, S, Vt = np.linalg.svd(X, full_matrices=False)
    return U[:, :rank], S[:rank], Vt[:rank]


def nndsvd_init(X, rank: int, variant: str = "nndsvda", eps: float = 1e-6,
                seed: int = 0):
    """Return (W, H) numpy factors; semantics match sklearn's
    `_initialize_nmf(init=variant)`.

    variant: "nndsvd" keeps the structural zeros; "nndsvda" fills them
    with mean(X); "nndsvdar" fills them with small seeded random values.
    """
    if variant not in _VARIANTS:
        raise ValueError(f"variant must be one of {_VARIANTS}")
    n, m = X.shape
    if rank > min(n, m):
        raise ValueError(
            f"nndsvd requires rank <= min(shape) = {min(n, m)}, got {rank}"
        )
    U, S, Vt = _truncated_svd(X, rank)
    W = np.zeros((n, rank))
    H = np.zeros((rank, m))

    # The per-component loop below follows the canonical published
    # algorithm (Boutsidis & Gallopoulos 2008, Algorithm NNDSVD) in
    # sklearn's formulation/naming (sklearn.decomposition._nmf
    # `_initialize_nmf`, BSD-3) — kept textually close on purpose: the
    # facade guarantees bit-parity with sklearn's init, so the exact
    # operation order (norms, tie-breaks, /100 variant fills) must
    # match that implementation.

    # leading singular triplet is nonnegative up to sign
    W[:, 0] = np.sqrt(S[0]) * np.abs(U[:, 0])
    H[0, :] = np.sqrt(S[0]) * np.abs(Vt[0, :])

    for j in range(1, rank):
        x, y = U[:, j], Vt[j, :]
        x_p, y_p = np.maximum(x, 0.0), np.maximum(y, 0.0)
        x_n, y_n = np.abs(np.minimum(x, 0.0)), np.abs(np.minimum(y, 0.0))
        x_p_nrm, y_p_nrm = np.linalg.norm(x_p), np.linalg.norm(y_p)
        x_n_nrm, y_n_nrm = np.linalg.norm(x_n), np.linalg.norm(y_n)
        m_p, m_n = x_p_nrm * y_p_nrm, x_n_nrm * y_n_nrm
        if m_p > m_n:
            u, v, sigma = x_p / max(x_p_nrm, 1e-30), \
                y_p / max(y_p_nrm, 1e-30), m_p
        else:
            u, v, sigma = x_n / max(x_n_nrm, 1e-30), \
                y_n / max(y_n_nrm, 1e-30), m_n
        lbd = np.sqrt(S[j] * sigma)
        W[:, j] = lbd * u
        H[j, :] = lbd * v

    W[W < eps] = 0.0
    H[H < eps] = 0.0

    if variant == "nndsvda":
        if hasattr(X, "nnz"):  # scipy.sparse or nmftpu container
            total = X.shape[0] * X.shape[1]
            avg = float(np.sum(X.data if hasattr(X, "data") else
                               X.to_csr().data)) / total
        else:
            avg = float(np.mean(np.asarray(X)))
        W[W == 0.0] = avg
        H[H == 0.0] = avg
    elif variant == "nndsvdar":
        if hasattr(X, "nnz"):
            total = X.shape[0] * X.shape[1]
            avg = float(np.sum(X.data if hasattr(X, "data") else
                               X.to_csr().data)) / total
        else:
            avg = float(np.mean(np.asarray(X)))
        rng = np.random.default_rng(seed)
        W[W == 0.0] = np.abs(
            avg * rng.standard_normal(int((W == 0.0).sum())) / 100.0
        )
        H[H == 0.0] = np.abs(
            avg * rng.standard_normal(int((H == 0.0).sum())) / 100.0
        )
    return W, H
