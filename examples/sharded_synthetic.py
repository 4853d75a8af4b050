"""Config #4: row/col-sharded NMF on a synthetic power-law sparse matrix
over a 2-D ('users','items') device mesh with psum collectives.

Scale --users/--items/--nnz up on real pod slices; defaults are sized for
an 8-virtual-device CPU mesh."""

from _common import base_parser


def main():
    ap = base_parser(__doc__)
    ap.add_argument("--users", type=int, default=4000)
    ap.add_argument("--items", type=int, default=3000)
    ap.add_argument("--nnz", type=int, default=200_000)
    ap.add_argument("--rank", type=int, default=64)
    args = ap.parse_args()

    import jax
    from nmftpu import NmfConfig
    from nmftpu.data import synthetic_powerlaw_sparse
    from nmftpu.parallel import compute_sharded, make_grid_mesh
    from nmftpu.parallel.sharded_coo import balance_report, partition_sparse

    mesh = make_grid_mesh()
    print(f"mesh: {dict(zip(mesh.axis_names, mesh.devices.shape))} over "
          f"{mesh.devices.size} x {jax.devices()[0].platform}")

    sp = synthetic_powerlaw_sparse(
        args.users, args.items, nnz=args.nnz, seed=0
    )
    rep = balance_report(
        partition_sparse(sp, tuple(mesh.devices.shape), balance=True)[0]
    )
    print(f"tile balance: imbalance={rep['imbalance']:.2f} "
          f"padding={rep['padding_fraction']:.1%}")

    cfg = NmfConfig(
        rank=args.rank, num_iterations=args.iters or 50,
        check_interval=10, seed=0,
    )
    res = compute_sharded(sp, cfg, mesh=mesh)
    print(f"iterations={res.num_iterations} "
          f"frobenius_error={res.frobenius_error:.2f} "
          f"elapsed={res.elapsed_ms:.0f} ms")


if __name__ == "__main__":
    main()
