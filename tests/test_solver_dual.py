"""solve_dual option + Problem.dualize tests (solver.cu:80-84, 199-251;
problem.cu:539-547)."""

import numpy as np
import jax.numpy as jnp
import pytest

import prost_tpu as pt
from prost_tpu.backend import BackendPDHG, PDHGOptions
from prost_tpu.linop import BlockGradient2D, DualLinearOperator, LinearOperator
from prost_tpu.prox import ProxElem1D, ProxElemNorm2, ProxMoreau


def rof_problem(nx, ny, f, lmb):
    n = nx * ny
    grad = BlockGradient2D(row=0, col=0, nx=nx, ny=ny, L=1)
    prox_g = [ProxElem1D(index=0, size=n, fun="square",
                         coeffs=(1.0, f.astype(np.float32), lmb,
                                 0.0, 0.0, 0.0, 0.0))]
    pn = ProxElemNorm2(index=0, size=2 * n, count=n, dim=2, interleaved=False,
                       fun="abs", coeffs=(1.0, 0.0, 1.0, 0.0, 0.0, 0.0, 0.0))
    return pt.Problem.create(
        LinearOperator.create([grad]), prox_g=prox_g,
        prox_fstar=[ProxMoreau(index=0, size=2 * n, child=pn)])


def test_dualize_swaps_everything():
    f = np.random.RandomState(0).rand(64).astype(np.float32)
    prob = rof_problem(8, 8, f, 5.0)
    dual = prob.dualize()
    assert dual.nrows == prob.ncols and dual.ncols == prob.nrows
    assert isinstance(dual.linop, DualLinearOperator)
    assert dual.prox_g is prob.prox_fstar
    assert dual.prox_fstar is prob.prox_g
    # dual linop forward = -K^T (dual_linearoperator.cu:39-59)
    y = jnp.asarray(np.random.RandomState(1).rand(prob.nrows), jnp.float32)
    np.testing.assert_allclose(
        np.asarray(dual.linop.apply(y)),
        -np.asarray(prob.linop.apply_adjoint(y)), atol=1e-6)
    # double dualize returns the original operator view
    assert prob.dualize().dualize().linop is prob.linop


def test_solve_dual_matches_primal_solve():
    """opts.solve_dual runs PDHG on (f*, g*, -K^T) and un-swaps the
    result: x/y/z/w must match the primal solve at convergence."""
    nx = ny = 16
    n = nx * ny
    f = np.random.RandomState(2).rand(n).astype(np.float32)
    prob = rof_problem(nx, ny, f, 5.0)

    def solve(dual):
        opts = pt.SolverOptions(
            max_iters=6000, verbose=False, solve_dual=dual,
            tol_rel_primal=1e-7, tol_rel_dual=1e-7,
            tol_abs_primal=1e-7, tol_abs_dual=1e-7)
        solver = pt.Solver(
            prob, lambda p, o: BackendPDHG(p, PDHGOptions(), o), opts)
        return solver.solve()

    rp = solve(False)
    rd = solve(True)
    assert rd.x.shape == rp.x.shape
    assert rd.y.shape == rp.y.shape
    np.testing.assert_allclose(rd.x, rp.x, atol=3e-3)
    # the ROF dual y is non-unique where grad u == 0; its divergence
    # K^T y (which determines the primal) is unique — compare that
    div_p = np.asarray(prob.linop.apply_adjoint(jnp.asarray(rp.y)))
    div_d = np.asarray(prob.linop.apply_adjoint(jnp.asarray(rd.y)))
    np.testing.assert_allclose(div_d, div_p, atol=5e-3)


def test_solve_dual_swaps_warm_start():
    """x0/y0 are swapped on entry (solver.cu:80-84): warm-starting the
    dual solve from a converged primal pair converges immediately."""
    nx = ny = 12
    n = nx * ny
    f = np.random.RandomState(3).rand(n).astype(np.float32)
    prob = rof_problem(nx, ny, f, 5.0)
    opts = pt.SolverOptions(
        max_iters=5000, verbose=False,
        tol_rel_primal=1e-6, tol_rel_dual=1e-6,
        tol_abs_primal=1e-6, tol_abs_dual=1e-6)
    r = pt.Solver(prob, lambda p, o: BackendPDHG(p, PDHGOptions(), o),
                  opts).solve()

    import dataclasses
    warm = dataclasses.replace(opts, solve_dual=True, x0=r.x, y0=r.y)
    r2 = pt.Solver(prob, lambda p, o: BackendPDHG(p, PDHGOptions(), o),
                   warm).solve()
    assert r2.iterations <= max(r.iterations // 2, 60)
