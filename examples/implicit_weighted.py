"""Config #3: implicit-feedback confidence-weighted NMF on click events,
rank 128. Confidence c = 1 + alpha * v on observed entries, 1 elsewhere.

--solver mu   : multiplicative weighted updates (all engines/meshes,
                low-precision V storage) — the throughput choice.
--solver ials : exact per-row weighted solves (Hu–Koren–Volinsky iALS);
                lower weighted objective per iteration, O(nnz·r²) Gram
                deltas + batched r×r Cholesky per half-step."""

from _common import base_parser, load_or_synthesize


def main():
    ap = base_parser(__doc__)
    ap.add_argument("--rank", type=int, default=128)
    ap.add_argument("--alpha", type=float, default=40.0)
    ap.add_argument("--solver", choices=("mu", "ials"), default="mu")
    args = ap.parse_args()
    import nmftpu

    inter = load_or_synthesize(
        args.data, 20_000, 8_000, 400_000, seed=2, implicit=True
    )
    res = nmftpu.nmf(
        inter.matrix, args.rank,
        algorithm="mu" if args.solver == "mu" else "als",
        objective="frobenius",
        alpha_confidence=args.alpha,
        lambda_w=0.1 if args.solver == "ials" else 0.0,
        lambda_h=0.1 if args.solver == "ials" else 0.0,
        num_iterations=args.iters or 50,
        check_interval=10, seed=0,
    )
    print(f"solver={args.solver} iterations={res.num_iterations} "
          f"frobenius_error={res.frobenius_error:.2f} "
          f"elapsed={res.elapsed_ms:.0f} ms")


if __name__ == "__main__":
    main()
