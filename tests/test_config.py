"""Config / dtype / device-management tests."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

import prost_tpu as pt


def test_list_devices_and_set_device():
    devs = pt.list_devices()
    assert len(devs) == 8  # virtual CPU mesh from conftest
    pt.set_device(1)
    x = jnp.zeros(4) + 1.0
    assert list(x.devices())[0] == devs[1]
    pt.set_device(0)


def test_f64_solve_parity():
    """Full ROF solve in float64 (x64 enabled) reaches a tighter residual
    than single precision typically reaches — the reference's double mode (config.hpp:6-7)."""
    from prost_tpu.backend import BackendPDHG, PDHGOptions
    from prost_tpu.linop import BlockGradient2D, LinearOperator
    from prost_tpu.prox import ProxElem1D, ProxElemNorm2, ProxMoreau

    jax.config.update("jax_enable_x64", True)
    pt.set_dtype(jnp.float64)
    try:
        nx = ny = 16
        n = nx * ny
        rng = np.random.RandomState(0)
        f = rng.rand(n)
        grad = BlockGradient2D(row=0, col=0, nx=nx, ny=ny, L=1)
        prox_g = [ProxElem1D(index=0, size=n, fun="square",
                             coeffs=(1.0, f, 5.0, 0.0, 0.0, 0.0, 0.0))]
        pn = ProxElemNorm2(index=0, size=2 * n, count=n, dim=2,
                           interleaved=False, fun="abs",
                           coeffs=(1.0, 0.0, 1.0, 0.0, 0.0, 0.0, 0.0))
        prob = pt.Problem.create(
            LinearOperator.create([grad]), prox_g=prox_g,
            prox_fstar=[ProxMoreau(index=0, size=2 * n, child=pn)])
        assert prob.scaling_left.dtype == jnp.float64
        opts = pt.SolverOptions(max_iters=20000, verbose=False,
                                tol_rel_primal=1e-8, tol_rel_dual=1e-8,
                                tol_abs_primal=1e-8, tol_abs_dual=1e-8)
        solver = pt.Solver(
            prob, lambda p, o: BackendPDHG(p, PDHGOptions(), o), opts)
        res = solver.solve()
        assert res.x.dtype == np.float64
        assert res.result == pt.ConvergenceResult.CONVERGED
    finally:
        pt.set_dtype(jnp.float32)
        jax.config.update("jax_enable_x64", False)
