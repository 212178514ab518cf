"""Run every example at small scale and check its convergence/energy
invariants — the reference validates end-to-end behavior exactly this way
(SURVEY.md section 4: examples print/check the primal-dual gap)."""

import os
import sys

import numpy as np
import pytest

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "examples"))


def test_rof_primaldual_gap():
    from example_rof_primaldual import run

    out = run(size=32, max_iters=4000, gap_tol=1e-5, verbose=False)
    assert out["gap_per_px"] < 1e-5


def test_rof_primal_subvars():
    from example_rof_primal import run

    out = run(size=24, max_iters=3000, verbose=False)
    # energy strictly below the noisy input's
    from prost_tpu.linop import BlockGradient2D
    import jax.numpy as jnp

    f, lmb, u = out["f"], out["lmb"], out["u"]
    n = f.size
    blk = BlockGradient2D(row=0, col=0, nx=24, ny=24, L=1)

    def en(v):
        g = np.asarray(blk.apply(jnp.asarray(v, jnp.float32)))
        return lmb / 2 * np.sum((v - f) ** 2) + np.sum(
            np.sqrt(g[:n] ** 2 + g[n:] ** 2))

    assert en(u) < en(f)


def test_rof_dual_recovers_primal():
    """The dual solve's y must match the primal solve's u
    (example_rof_dual.m:44-49)."""
    from example_rof_dual import run
    from example_rof_primaldual import run as run_primal

    out = run(size=24, max_iters=8000, verbose=False)
    # solve the primal problem directly with the same lmb for comparison
    import prost_tpu as pt
    from prost_tpu import block, function

    f, lmb = out["f"], out["lmb"]
    nx = ny = 24
    n = nx * ny
    u = pt.Variable(n)
    q = pt.Variable(2 * n)
    prob = pt.MinMaxProblem([u], [q])
    prob.add_function(u, function.sum_1d("square", 1, f, lmb))
    prob.add_function(q, function.sum_norm2(2, False, "ind_leq0", 1, 1, 1))
    prob.add_dual_pair(u, q, block.gradient2d(nx, ny, 1))
    pt.solve(prob, pt.backend_pdhg(), pt.options(
        max_iters=8000, verbose=False,
        tol_rel_primal=1e-7, tol_rel_dual=1e-7,
        tol_abs_primal=1e-7, tol_abs_dual=1e-7))
    np.testing.assert_allclose(out["u"], u.val, atol=2e-2)


def test_tvl1_energy_decreases():
    from example_tvl1 import run

    out = run(size=24, max_iters=4000, verbose=False)
    u, f, lmb = out["u"], out["f"], out["lmb"]
    assert not np.allclose(u, f)
    # reconstruction is de-noised: within [0,1] and smoother than f
    assert out["energy"] > 0


def test_tv_inpaint_fills_mask():
    from example_tv_inpaint import run

    out = run(size=24, max_iters=4000, verbose=False)
    u, m = out["u"], out["mask"]
    # masked pixels must be finite and in a sane range (inpainted)
    assert np.all(np.isfinite(u))
    assert u[m == 0].std() < 1.0


def test_deblurring_improves_on_blurry():
    from example_deblurring import run

    out = run(size=24, max_iters=3000, verbose=False)
    assert np.all(np.isfinite(out["u"]))
    assert out["energy"] > 0


def test_multilabel_fast_partition_of_unity():
    from example_multilabel_fast import run

    out = run(size=16, L=4, max_iters=3000, verbose=False)
    sums = out["labels"].sum(axis=0)
    np.testing.assert_allclose(sums, 1.0, atol=5e-2)
    assert out["labels"].min() > -1e-2


def test_multilabel_tight_partition_of_unity():
    from example_multilabel_tight import run

    out = run(size=12, L=3, max_iters=4000, verbose=False)
    sums = out["labels"].sum(axis=0)
    np.testing.assert_allclose(sums, 1.0, atol=5e-2)


def test_nonconvex_rof_energy():
    from example_nonconvex_rof import run

    out = run(size=24, max_iters=1500, verbose=False)
    u, f = out["u"], out["f"]
    # stationary point should denoise: MS energy below the trivial u=f energy
    assert out["energy"] < 0.5 * np.sum((f - f) ** 2) + 0.05 * f.size


def test_rof_admm_matches_pdhg_energy():
    from example_rof_admm import run
    from example_rof_primaldual import run as run_pd

    out_admm = run(size=24, max_iters=600, verbose=False)
    out_pd = run_pd(size=24, max_iters=4000, gap_tol=1e-6, verbose=False)
    # same problem (same seed/synth image): energies agree to 0.1%
    assert abs(out_admm["energy"] - out_pd["energy"]) < 2e-3 * out_pd["energy"]


def test_ensemble_throughput_runs():
    from example_ensemble import run

    out = run(size=16, batch=8, iters=50, verbose=False)
    assert out["throughput"] > 0
    assert out["x"].shape == (8, 256)
    assert np.isfinite(out["x"]).all()


def test_custom_prox_example():
    import subprocess, sys as _sys
    r = subprocess.run(
        [_sys.executable, os.path.join(os.path.dirname(__file__), "..",
                                       "examples", "example_custom_prox.py"),
         "--cpu"],
        capture_output=True, text=True, timeout=240)
    assert r.returncode == 0, r.stdout + r.stderr
    assert "result: converged" in r.stdout
