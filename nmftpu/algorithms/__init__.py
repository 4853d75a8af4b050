"""Algorithm registry: maps (Algorithm, Objective, knobs) to a jit-friendly
update step (SURVEY.md L2/C3–C7 and the dispatcher's algorithm dispatch in
C2). Dense path; the sparse dispatch lives in nmftpu.sparse_ops."""

from nmftpu.algorithms.registry import build_dense_update

__all__ = ["build_dense_update"]
