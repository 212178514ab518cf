"""Fused Pallas ADMM chunk (ops/fused_admm.py) vs the generic ADMM path.

Runs in Pallas interpreter mode on CPU; the real-TPU path is exercised by
bench.py --all.
"""

import numpy as np
import pytest

import prost_tpu as pt
from prost_tpu.backend.admm import ADMMOptions, BackendADMM
from prost_tpu.linop import BlockGradient2D, LinearOperator
from prost_tpu.ops import FusedROFADMM
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
        prox_fstar=[ProxMoreau(index=0, size=2 * n, child=pn)],
    )


def _opts(**kw):
    kw.setdefault("verbose", False)
    kw.setdefault("tol_rel_primal", 0.0)
    kw.setdefault("tol_rel_dual", 0.0)
    kw.setdefault("tol_abs_primal", 0.0)
    kw.setdefault("tol_abs_dual", 0.0)
    return pt.SolverOptions(**kw)


@pytest.mark.parametrize("residual_iter", [1, 7, 10])
def test_fused_admm_matches_generic(residual_iter):
    nx = ny = 16
    rng = np.random.RandomState(3)
    f = rng.rand(nx * ny).astype(np.float32)
    prob = rof_problem(nx, ny, f, 8.0)
    aopts = ADMMOptions(residual_iter=residual_iter)

    gen = BackendADMM(prob, aopts, _opts())
    gs = gen.run(gen.initial_state(), 40)

    fus = FusedROFADMM(prob, aopts, _opts(), interpret=True)
    assert fus.rof is not None
    fs = fus.run(fus.initial_state(), 40)

    assert int(fs.iteration) == int(gs.iteration) == 40
    # The fused kernel evaluates prox_f analytically (shrinkage) where the
    # generic path evaluates a double Moreau wrap; agreement is to f32
    # arithmetic, not bitwise.
    np.testing.assert_allclose(np.asarray(fs.x_half), np.asarray(gs.x_half),
                               atol=5e-5)
    np.testing.assert_allclose(np.asarray(fs.z_half), np.asarray(gs.z_half),
                               atol=5e-5)
    np.testing.assert_allclose(np.asarray(fs.cg_warm),
                               np.asarray(gs.cg_warm), atol=5e-4)
    np.testing.assert_allclose(float(fs.rho), float(gs.rho), rtol=1e-6)
    np.testing.assert_allclose(
        float(fs.primal_residual), float(gs.primal_residual), rtol=1e-3)
    for a, b in zip(fus.current_solution(fs), gen.current_solution(gs)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=2e-3)


def test_fused_admm_rho_adaptation_engages():
    """With real tolerances the Boyd rho adaptation fires; fused and
    generic must adapt identically."""
    nx = ny = 12
    rng = np.random.RandomState(5)
    f = rng.rand(nx * ny).astype(np.float32)
    prob = rof_problem(nx, ny, f, 4.0)
    aopts = ADMMOptions(residual_iter=5)
    sopts = _opts(tol_rel_primal=1e-2, tol_rel_dual=1e-2,
                  tol_abs_primal=1e-3, tol_abs_dual=1e-3)

    gen = BackendADMM(prob, aopts, sopts)
    gs = gen.run(gen.initial_state(), 50)
    fus = FusedROFADMM(prob, aopts, sopts, interpret=True)
    fs = fus.run(fus.initial_state(), 50)
    assert float(gs.rho) != pytest.approx(1.0)  # adaptation engaged
    np.testing.assert_allclose(float(fs.rho), float(gs.rho), rtol=1e-6)
    np.testing.assert_allclose(np.asarray(fs.x_half), np.asarray(gs.x_half),
                               atol=1e-4)


def test_fused_admm_full_solve_converges():
    nx = ny = 16
    rng = np.random.RandomState(6)
    f = rng.rand(nx * ny).astype(np.float32)
    prob = rof_problem(nx, ny, f, 8.0)
    aopts = ADMMOptions(residual_iter=10)
    sopts = _opts(max_iters=3000, tol_rel_primal=1e-4, tol_rel_dual=1e-4,
                  tol_abs_primal=1e-4, tol_abs_dual=1e-4)
    solver = pt.Solver(
        prob, lambda p, o: FusedROFADMM(p, aopts, o, interpret=True), sopts)
    res = solver.solve()
    assert res.result == pt.ConvergenceResult.CONVERGED
    # energy close to the PDHG solution of the same problem
    pd = pt.Solver(
        prob, lambda p, o: pt.backend_pdhg().create(p, o), sopts).solve()

    def energy(u):
        u2 = np.asarray(u).reshape(nx, ny)
        gx = np.diff(u2, axis=0, append=u2[-1:, :])
        gy = np.diff(u2, axis=1, append=u2[:, -1:])
        tv = np.sqrt(gx**2 + gy**2).sum()
        return 8.0 / 2 * ((np.asarray(u).ravel() - f) ** 2).sum() + tv

    e_admm = energy(res.x)
    e_pdhg = energy(pd.x)
    assert abs(e_admm - e_pdhg) < 5e-3 * abs(e_pdhg)
