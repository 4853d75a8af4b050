"""sklearn drop-in: take code written for sklearn.decomposition.NMF,
swap the import, and run it on the nmftpu engines — then keep going
where sklearn stops (fold-in serving for new users, device meshes).

Run: NMFTPU_PLATFORM=cpu python examples/sklearn_dropin.py
"""

import numpy as np

from _common import base_parser, load_or_synthesize


def main():
    args = base_parser(__doc__).parse_args()

    # ------------------------------------------------------------------
    # The "existing sklearn code": only the import line changes.
    # ------------------------------------------------------------------
    # from sklearn.decomposition import NMF
    from nmftpu.sklearn_api import NMF

    inter = load_or_synthesize(args.data, 943, 1682, 100_000)
    V = np.asarray(inter.matrix.todense(), dtype=np.float32)

    model = NMF(n_components=32, init="random", solver="mu",
                beta_loss="frobenius",
                max_iter=150 if args.iters is None else args.iters,
                tol=0.0, random_state=0)
    W = model.fit_transform(V)
    print(f"fit: W {W.shape}, components_ {model.components_.shape}, "
          f"reconstruction_err_ {model.reconstruction_err_:.3f}, "
          f"n_iter_ {model.n_iter_}")

    # project users unseen at training time (sklearn transform semantics;
    # runs the fold-in path, so it stays cheap at huge item counts)
    new_users = V[:8] * (np.random.default_rng(1).uniform(
        size=V[:8].shape) < 0.5)
    W_new = model.transform(new_users)
    err = np.linalg.norm(new_users - W_new @ model.components_)
    print(f"transform: {W_new.shape} new-user factors, proj err {err:.3f}")

    # sklearn composition utilities work
    from sklearn.base import clone

    kl = clone(model).set_params(beta_loss="kullback-leibler",
                                 max_iter=60)
    kl.fit(V)
    print(f"clone -> KL refit: reconstruction_err_ "
          f"{kl.reconstruction_err_:.3f}")

    # ------------------------------------------------------------------
    # Past the sklearn surface: the same estimator on sparse input and
    # (where devices allow) a 2-D device mesh.
    # ------------------------------------------------------------------
    import jax

    sparse_model = NMF(n_components=32, max_iter=60, tol=0.0,
                       random_state=0, strategy="auto")
    sparse_model.fit(inter.matrix)  # nmftpu sparse container, no densify
    print(f"sparse fit: err {sparse_model.reconstruction_err_:.3f}")

    if len(jax.devices()) >= 2:
        from nmftpu.parallel import make_grid_mesh

        mesh_model = NMF(n_components=16, max_iter=30, tol=0.0,
                         mesh=make_grid_mesh())
        mesh_model.fit(inter.matrix)
        print(f"mesh fit over {len(jax.devices())} devices: "
              f"err {mesh_model.reconstruction_err_:.3f}")


if __name__ == "__main__":
    main()
