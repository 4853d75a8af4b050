"""Double-precision support (SURVEY.md C1/C2: the reference's
nmfgpu_compute dispatches {algorithm x float/double}). Every update rule
is dtype-generic; float64 requires JAX x64 mode, and the drivers REFUSE
to run float64 without it rather than let JAX silently truncate to f32.
x64 is process-global (the test conftest enables it), so the negative
test runs in a subprocess with x64 OFF."""

import os
import subprocess
import sys
import textwrap

import numpy as np
import pytest

from nmftpu import Algorithm, NmfConfig, Objective
from nmftpu import sparse as hs
from nmftpu.driver import compute


def _run_sub(body: str, x64: bool) -> str:
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    prog = textwrap.dedent("""\
        import os
        os.environ["JAX_PLATFORMS"] = "cpu"
        import jax; jax.config.update("jax_platforms", "cpu")
        import numpy as np
        import nmftpu
        from nmftpu import NmfConfig
        from nmftpu.driver import compute
        from nmftpu import sparse as hs
    """) + textwrap.dedent(body)
    env = dict(os.environ, PYTHONPATH=repo, JAX_PLATFORMS="cpu")
    env.pop("XLA_FLAGS", None)
    if x64:
        env["JAX_ENABLE_X64"] = "1"
    else:
        env.pop("JAX_ENABLE_X64", None)
    out = subprocess.run(
        [sys.executable, "-c", prog], env=env, capture_output=True,
        text=True, timeout=600,
    )
    assert out.returncode == 0, out.stderr[-2000:]
    return out.stdout


def test_float64_without_x64_raises():
    out = _run_sub("""
        V = np.random.default_rng(0).uniform(0.1, 1.0, (10, 8))
        try:
            compute(V, NmfConfig(rank=2, num_iterations=2,
                                 dtype="float64"))
            print("NO-RAISE")
        except ValueError as e:
            assert "x64" in str(e)
            print("RAISED OK")
    """, x64=False)
    assert "RAISED OK" in out


def test_float64_dense_all_algorithms(rng):
    """conftest enables x64, so f64 runs in-process here: every
    algorithm + the KL objective produce float64 factors and finite,
    decreasing errors."""
    V = rng.uniform(0.1, 1.0, (24, 20))
    for alg in Algorithm:
        r = compute(V, NmfConfig(rank=3, num_iterations=8,
                                 dtype="float64", algorithm=alg))
        assert np.asarray(r.W).dtype == np.float64, alg
        assert np.isfinite(r.frobenius_error), alg
    r1 = compute(V, NmfConfig(rank=3, num_iterations=2, dtype="float64"))
    r2 = compute(V, NmfConfig(rank=3, num_iterations=30, dtype="float64"))
    assert r2.frobenius_error < r1.frobenius_error
    rk = compute(V, NmfConfig(rank=3, num_iterations=8, dtype="float64",
                              objective=Objective.KL))
    assert np.asarray(rk.W).dtype == np.float64
    assert np.isfinite(rk.kl_error)


def test_float64_sparse_engines_agree(rng):
    dense = rng.uniform(0.2, 2.0, (30, 26))
    dense[rng.uniform(size=dense.shape) > 0.4] = 0.0
    dense[:, 0] = 1.0
    dense[0, :] = 1.0
    sp = hs.from_dense(dense)
    cfg = NmfConfig(rank=3, num_iterations=6, dtype="float64")
    import nmftpu

    r_sc = nmftpu.compute_sparse(sp, cfg, strategy="scatter")
    r_el = nmftpu.compute_sparse(sp, cfg, strategy="ell")
    r_df = nmftpu.compute_sparse(sp, cfg, strategy="densified")
    for r in (r_sc, r_el, r_df):
        assert np.asarray(r.W).dtype == np.float64
    # scatter and ELL are exact-storage: bit-comparable trajectories
    np.testing.assert_allclose(r_sc.frobenius_error, r_el.frobenius_error,
                               rtol=1e-12)
    # densified stores V in bf16 by design (PERF.md): close, not equal
    np.testing.assert_allclose(r_sc.frobenius_error, r_df.frobenius_error,
                               rtol=1e-3)


def test_float64_sharded(rng):
    dense = rng.uniform(0.2, 2.0, (30, 26))
    dense[rng.uniform(size=dense.shape) > 0.4] = 0.0
    dense[:, 0] = 1.0
    dense[0, :] = 1.0
    sp = hs.from_dense(dense)
    import nmftpu
    from nmftpu.parallel import make_grid_mesh

    from nmftpu import Initialization

    W0 = rng.uniform(0.1, 1.0, (30, 3))
    H0 = rng.uniform(0.1, 1.0, (3, 26))
    cfg = NmfConfig(rank=3, num_iterations=6, dtype="float64",
                    init_method=Initialization.COPY_EXISTING)
    r = nmftpu.compute_sharded(sp, cfg, mesh=make_grid_mesh((2, 4)),
                               chunk=256, W0=W0, H0=H0)
    assert np.asarray(r.W).dtype == np.float64
    r_sc = nmftpu.compute_sparse(sp, cfg, strategy="scatter",
                                 W0=W0, H0=H0)
    np.testing.assert_allclose(r.frobenius_error, r_sc.frobenius_error,
                               rtol=1e-9)
