"""ADMM backend + CGLS tests.

CGLS is checked against a dense normal-equations oracle; ADMM is checked by
solving the same ROF problem as the PDHG smoke test and lasso-style problems
with known solutions, mirroring how the reference validates ADMM only through
its examples (it ships no ADMM unit test).
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

import prost_tpu as pt
from prost_tpu.backend import ADMMOptions, BackendADMM, BackendPDHG, PDHGOptions
from prost_tpu.backend.cgls import cgls_solve
from prost_tpu.linop import BlockDense, BlockGradient2D, LinearOperator
from prost_tpu.prox import ProxElem1D, ProxElemNorm2, ProxMoreau


def test_cgls_matches_dense_solve():
    rng = np.random.RandomState(0)
    m, n = 40, 25
    A = rng.randn(m, n).astype(np.float32)
    b = rng.randn(m).astype(np.float32)
    shift = 1.0

    Aj = jnp.asarray(A)
    x, iters = cgls_solve(
        lambda v: Aj @ v,
        lambda v: Aj.T @ v,
        jnp.asarray(b),
        jnp.zeros(n, jnp.float32),
        shift,
        1e-6,
        500,
    )
    expected = np.linalg.solve(A.T @ A + shift * np.eye(n), A.T @ b)
    np.testing.assert_allclose(np.asarray(x), expected, rtol=1e-3, atol=1e-4)


def test_cgls_warm_start_stays_at_solution():
    """Warm-starting from the solution must not drift away (the ADMM backend
    relies on this with cg_max_iter=10).  CGLS's stopping rule is relative to
    the *initial* normal-equations residual, so it may still take iterations;
    the invariant is that x stays put."""
    rng = np.random.RandomState(1)
    m, n = 30, 20
    A = jnp.asarray(rng.randn(m, n).astype(np.float32))
    b = jnp.asarray(rng.randn(m).astype(np.float32))
    x, _ = cgls_solve(lambda v: A @ v, lambda v: A.T @ v,
                      b, jnp.zeros(n, jnp.float32), 1.0, 1e-7, 500)
    x2, _ = cgls_solve(lambda v: A @ v, lambda v: A.T @ v,
                       b, x, 1.0, 1e-6, 10)
    np.testing.assert_allclose(np.asarray(x2), np.asarray(x), atol=1e-4)


def rof_problem(nx, ny, f, lmb):
    n = nx * ny
    grad = BlockGradient2D(row=0, col=0, nx=nx, ny=ny, L=1)
    linop = LinearOperator.create([grad])
    prox_g = [
        ProxElem1D(index=0, size=n, fun="square",
                   coeffs=(1.0, f.astype(np.float32), lmb, 0.0, 0.0, 0.0, 0.0))
    ]
    pn = ProxElemNorm2(index=0, size=2 * n, count=n, dim=2, interleaved=False,
                       fun="abs", coeffs=(1.0, 0.0, 1.0, 0.0, 0.0, 0.0, 0.0))
    prox_f = [pn]
    return pt.Problem.create(linop, prox_g=prox_g, prox_f=prox_f)


def rof_energy(prob, u, f, lmb, n):
    g = np.asarray(prob.linop.apply(jnp.asarray(u)))
    return lmb / 2 * np.sum((u - f) ** 2) + np.sum(
        np.sqrt(g[:n] ** 2 + g[n:] ** 2)
    )


def test_admm_rof_matches_pdhg():
    nx = ny = 24
    n = nx * ny
    rng = np.random.RandomState(3)
    f = rng.rand(n).astype(np.float32)
    lmb = 5.0
    prob = rof_problem(nx, ny, f, lmb)

    opts = pt.SolverOptions(
        max_iters=400, verbose=False,
        tol_rel_primal=1e-7, tol_rel_dual=1e-7,
        tol_abs_primal=1e-7, tol_abs_dual=1e-7,
    )
    admm = pt.Solver(
        prob, lambda p, o: BackendADMM(p, ADMMOptions(), o), opts
    )
    res_admm = admm.solve()

    # PDHG ground truth on an equivalent problem (prox_fstar via Moreau)
    opts2 = pt.SolverOptions(
        max_iters=4000, verbose=False,
        tol_rel_primal=1e-8, tol_rel_dual=1e-8,
        tol_abs_primal=1e-8, tol_abs_dual=1e-8,
    )
    pdhg = pt.Solver(
        prob, lambda p, o: BackendPDHG(p, PDHGOptions(), o), opts2
    )
    res_pdhg = pdhg.solve()

    en_admm = rof_energy(prob, res_admm.x, f, lmb, n)
    en_pdhg = rof_energy(prob, res_pdhg.x, f, lmb, n)
    assert en_admm <= en_pdhg * 1.002 + 1e-5
    np.testing.assert_allclose(res_admm.x, res_pdhg.x, atol=5e-3)


def test_admm_least_squares_exact():
    """g = ||x - a||^2/2 (square prox), f = ||z - b||^2/2, z = K x: a strongly
    convex quadratic with closed-form solution."""
    rng = np.random.RandomState(4)
    m, n = 12, 8
    K = rng.randn(m, n).astype(np.float32)
    a = rng.randn(n).astype(np.float32)
    b = rng.randn(m).astype(np.float32)

    linop = LinearOperator.create([BlockDense.create(0, 0, K)])
    prox_g = [ProxElem1D(index=0, size=n, fun="square",
                         coeffs=(1.0, a, 1.0, 0.0, 0.0, 0.0, 0.0))]
    prox_f = [ProxElem1D(index=0, size=m, fun="square",
                         coeffs=(1.0, b, 1.0, 0.0, 0.0, 0.0, 0.0))]
    prob = pt.Problem.create(linop, prox_g=prox_g, prox_f=prox_f)

    opts = pt.SolverOptions(
        max_iters=2000, verbose=False,
        tol_rel_primal=1e-7, tol_rel_dual=1e-7,
        tol_abs_primal=1e-7, tol_abs_dual=1e-7,
    )
    solver = pt.Solver(prob, lambda p, o: BackendADMM(p, ADMMOptions(), o), opts)
    res = solver.solve()

    expected = np.linalg.solve(np.eye(n) + K.T @ K, a + K.T @ b)
    np.testing.assert_allclose(res.x, expected, atol=2e-3)


def test_admm_current_solution_duals():
    """y, w from current_solution satisfy the optimality structure
    w ~= -K^T y at convergence."""
    nx = ny = 12
    n = nx * ny
    rng = np.random.RandomState(5)
    f = rng.rand(n).astype(np.float32)
    prob = rof_problem(nx, ny, f, 5.0)
    opts = pt.SolverOptions(
        max_iters=500, verbose=False,
        tol_rel_primal=1e-7, tol_rel_dual=1e-7,
        tol_abs_primal=1e-7, tol_abs_dual=1e-7,
    )
    solver = pt.Solver(prob, lambda p, o: BackendADMM(p, ADMMOptions(), o), opts)
    res = solver.solve()
    kty = np.asarray(prob.linop.apply_adjoint(jnp.asarray(res.y)))
    np.testing.assert_allclose(res.w, -kty, atol=5e-3)
