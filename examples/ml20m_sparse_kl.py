"""Config #2: MovieLens-20M sparse CSR NMF, rank 64, KL divergence,
single chip. V never densifies — SDDMM/SpMM updates throughout."""

from _common import base_parser, load_or_synthesize


def main():
    ap = base_parser(__doc__)
    ap.add_argument("--rank", type=int, default=64)
    args = ap.parse_args()
    import nmftpu
    from nmftpu.utils import JsonlLogger

    inter = load_or_synthesize(
        args.data, 20_000, 8_000, 400_000, seed=1
    )
    sp = inter.matrix.to_csr()

    cb = None
    logger = None
    if args.log:
        logger = JsonlLogger(args.log).bind(config="ml20m_sparse_kl")
        cb = logger.as_callback()

    res = nmftpu.nmf(
        sp, args.rank,
        algorithm="mu", objective="kullback-leibler",
        num_iterations=args.iters or 100,
        check_interval=10, seed=0,
        callback=cb,
    )
    print(f"iterations={res.num_iterations} kl_error={res.kl_error:.2f}")
    print(f"frobenius_error={res.frobenius_error:.2f} "
          f"elapsed={res.elapsed_ms:.0f} ms")
    if logger:
        logger.close()


if __name__ == "__main__":
    main()
