"""Config #1: MovieLens-100K dense NMF, rank 32, Frobenius, single host."""

import numpy as np

from _common import base_parser, load_or_synthesize


def main():
    args = base_parser(__doc__).parse_args()
    import nmftpu
    from nmftpu.utils import JsonlLogger

    inter = load_or_synthesize(args.data, 943, 1682, 100_000)
    V = inter.matrix.todense()  # 100K scale is comfortably dense

    cb = None
    logger = None
    if args.log:
        logger = JsonlLogger(args.log).bind(config="ml100k_dense")
        cb = logger.as_callback()

    res = nmftpu.nmf(
        V, 32,
        algorithm="mu", objective="frobenius",
        num_iterations=args.iters or 200,
        threshold=1e-3, check_interval=10, seed=0,
        callback=cb,
    )
    rel = res.frobenius_error / np.linalg.norm(V)
    print(f"iterations={res.num_iterations} converged={res.converged}")
    print(f"frobenius_error={res.frobenius_error:.4f} (relative {rel:.4f})")
    print(f"rmsd={res.rmsd:.6f} elapsed={res.elapsed_ms:.0f} ms")
    if logger:
        logger.close()


if __name__ == "__main__":
    main()
