"""Fused volumetric-TV kernel (ops/fused_vol.py) vs the generic path.

Runs in Pallas interpreter mode on CPU; the real-TPU path is exercised by
tools/tpu_verify.py (vol case).
"""

import numpy as np
import jax.numpy as jnp
import pytest

import prost_tpu as pt
from prost_tpu.backend import BackendPDHG, PDHGOptions
from prost_tpu.linop import BlockGradient3D, LinearOperator
from prost_tpu.ops import FusedROFPDHG
from prost_tpu.prox import ProxElem1D, ProxElemNorm2, ProxMoreau


def vol_problem(L, nx, ny, f, lmb, dataterm="square"):
    n = L * nx * ny
    grad = BlockGradient3D(row=0, col=0, nx=nx, ny=ny, L=L)
    prox_g = [ProxElem1D(index=0, size=n, fun=dataterm,
                         coeffs=(1.0, f.astype(np.float32), lmb,
                                 0.0, 0.0, 0.0, 0.0))]
    pn = ProxElemNorm2(index=0, size=3 * n, count=n, dim=3,
                       interleaved=False, fun="abs",
                       coeffs=(1.0, 0.0, 1.0, 0.0, 0.0, 0.0, 0.0))
    return pt.Problem.create(
        LinearOperator.create([grad]), prox_g=prox_g,
        prox_fstar=[ProxMoreau(index=0, size=3 * n, child=pn)],
    )


def _opts(**kw):
    kw.setdefault("verbose", False)
    for k in ("tol_rel_primal", "tol_rel_dual",
              "tol_abs_primal", "tol_abs_dual"):
        kw.setdefault(k, 0.0)
    return pt.SolverOptions(**kw)


@pytest.mark.parametrize("residual_iter,dataterm",
                         [(1, "square"), (7, "square"), (10, "abs")])
def test_fused_vol_matches_generic(residual_iter, dataterm):
    L, nx, ny = 4, 16, 16
    rng = np.random.RandomState(3)
    f = rng.rand(L * nx * ny).astype(np.float32)
    prob = vol_problem(L, nx, ny, f, 6.0, dataterm)
    popts = PDHGOptions(stepsize="boyd", residual_iter=residual_iter,
                        scale_steps_operator=False)

    gen = BackendPDHG(prob, popts, _opts())
    gs = gen.run(gen.initial_state(), 41)

    fus = FusedROFPDHG(prob, popts, _opts(), interpret=True)
    assert fus.vol is not None and fus.vol["n_bands"] == 1
    fs = fus.run(fus.initial_state(), 41)

    assert int(fs.iteration) == int(gs.iteration) == 41
    np.testing.assert_allclose(np.asarray(fs.x), np.asarray(gs.x),
                               atol=2e-5)
    np.testing.assert_allclose(np.asarray(fs.y), np.asarray(gs.y),
                               atol=2e-5)
    np.testing.assert_allclose(float(fs.tau), float(gs.tau), rtol=1e-6)
    np.testing.assert_allclose(
        float(fs.primal_residual), float(gs.primal_residual), rtol=1e-3)


@pytest.mark.parametrize("n_bands", [2, 4])
def test_vol_banded_matches_whole(n_bands):
    from prost_tpu.ops.fused_vol import (vol_fused_chunk,
                                         vol_fused_chunk_banded)

    rng = np.random.RandomState(5)
    L, nx, ny = 3, 128, 32
    u = jnp.asarray(rng.rand(L, nx, ny), jnp.float32)
    q = jnp.asarray(0.1 * rng.randn(3, L, nx, ny), jnp.float32)
    # clean dead dual coordinates (fused canonicalization; the Dirichlet
    # label axis has none)
    q = q.at[0, :, -1, :].set(0.0).at[1, :, :, -1].set(0.0)
    f = jnp.asarray(rng.rand(L, nx, ny), jnp.float32)
    w = jnp.ones_like(u)
    args = (0.9, 1.1, 1.0, 6.0, 0.5, 10)
    ref = vol_fused_chunk(u, q, f, w, *args, interpret=True)
    ban = vol_fused_chunk_banded(u, q, f, w, *args, n_bands,
                                 interpret=True)
    for i, (a, b) in enumerate(zip(ref[:4], ban[:4])):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=1e-6, err_msg=f"out[{i}]")
    np.testing.assert_allclose(np.asarray(ref[4]), np.asarray(ban[4]),
                               rtol=1e-5)


def test_vol_banded_end_to_end_matches_generic():
    L, nx, ny = 3, 64, 16
    rng = np.random.RandomState(7)
    f = rng.rand(L * nx * ny).astype(np.float32)
    prob = vol_problem(L, nx, ny, f, 6.0)
    popts = PDHGOptions(stepsize="boyd", residual_iter=5,
                        scale_steps_operator=False)
    gen = BackendPDHG(prob, popts, _opts())
    gs = gen.run(gen.initial_state(), 31)

    fus = FusedROFPDHG(prob, popts, _opts(), interpret=True)
    assert fus.vol is not None
    fus.vol["n_bands"] = 2  # force the banded route at test size
    fs = fus.run(fus.initial_state(), 31)
    np.testing.assert_allclose(np.asarray(fs.x), np.asarray(gs.x),
                               atol=2e-5)
    np.testing.assert_allclose(float(fs.tau), float(gs.tau), rtol=1e-6)


def test_vol_full_solve_converges():
    L, nx, ny = 3, 24, 24
    rng = np.random.RandomState(8)
    f = rng.rand(L * nx * ny).astype(np.float32)
    prob = vol_problem(L, nx, ny, f, 8.0)
    popts = PDHGOptions(stepsize="boyd", residual_iter=5,
                        scale_steps_operator=False)
    sopts = _opts(max_iters=4000, tol_rel_primal=1e-5, tol_rel_dual=1e-5,
                  tol_abs_primal=1e-5, tol_abs_dual=1e-5)
    solver = pt.Solver(
        prob, lambda p, o: FusedROFPDHG(p, popts, o, interpret=True),
        sopts)
    res = solver.solve()
    assert res.result == pt.ConvergenceResult.CONVERGED


@pytest.mark.parametrize("n_bands", [2, 4])
def test_vol_banded_double_buffer_matches_whole(n_bands):
    """The double-buffered banded vol kernel (shared run_banded_db
    pipeline) must match the whole-volume kernel."""
    from prost_tpu.ops.fused_vol import (vol_fused_chunk,
                                         vol_fused_chunk_banded)

    L, nx, ny = 3, 64, 16
    ri = 3
    rng = np.random.RandomState(25)
    u = jnp.asarray(rng.rand(L, nx, ny), jnp.float32)
    q = jnp.asarray(0.2 * rng.randn(3, L, nx, ny), jnp.float32)
    # clean dead dual coordinates (fused canonicalization; the Dirichlet
    # label axis has none)
    q = q.at[0, :, -1, :].set(0.0).at[1, :, :, -1].set(0.0)
    f = jnp.asarray(rng.rand(L, nx, ny), jnp.float32)
    w = jnp.ones_like(u)
    args = (0.9, 1.1, 1.0, 6.0, 1.0)

    ref = vol_fused_chunk(u, q, f, w, *args, ri, interpret=True)
    db = vol_fused_chunk_banded(u, q, f, w, *args, ri, n_bands,
                                interpret=True, double_buffer=True)
    for a, b in zip(ref[:4], db[:4]):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=3e-7, rtol=3e-7)
    np.testing.assert_allclose(np.asarray(ref[4]), np.asarray(db[4]),
                               rtol=1e-5, atol=1e-10)


def test_vol_multichunk_matches_generic():
    """Phase B0 (multi-chunk vol launches with in-kernel adaptation)
    must follow the launch-per-chunk trajectory exactly."""
    L, nx, ny = 4, 16, 16
    rng = np.random.RandomState(28)
    f = rng.rand(L * nx * ny).astype(np.float32)
    prob = vol_problem(L, nx, ny, f, 6.0)
    popts = PDHGOptions(stepsize="boyd", residual_iter=5,
                        scale_steps_operator=False)
    t = 1e-5
    sopts = _opts(tol_rel_primal=t, tol_rel_dual=t, tol_abs_primal=t,
                  tol_abs_dual=t)

    gen = BackendPDHG(prob, popts, sopts)
    gs = gen.run(gen.initial_state(), 200)  # > _K_CHUNKS * ri = 40
    fus = FusedROFPDHG(prob, popts, sopts, interpret=True)
    assert fus.vol is not None and fus.vol["n_bands"] == 1
    fs = fus.run(fus.initial_state(), 200)

    assert int(fs.iteration) == int(gs.iteration)
    np.testing.assert_allclose(np.asarray(fs.x), np.asarray(gs.x),
                               atol=2e-5)
    np.testing.assert_allclose(np.asarray(fs.y), np.asarray(gs.y),
                               atol=2e-5)
    np.testing.assert_allclose(float(fs.tau), float(gs.tau), rtol=1e-6)


def test_vol_banded_multichunk_matches_generic():
    """Phase B0-banded for vol (vol_fused_multichunk_banded) must follow
    the generic trajectory, incl. mid-launch convergence."""
    L, nx, ny = 3, 64, 16
    rng = np.random.RandomState(29)
    f = rng.rand(L * nx * ny).astype(np.float32)
    prob = vol_problem(L, nx, ny, f, 6.0)
    popts = PDHGOptions(stepsize="boyd", residual_iter=3,
                        scale_steps_operator=False)

    def sopts(t):
        return _opts(tol_rel_primal=t, tol_rel_dual=t, tol_abs_primal=t,
                     tol_abs_dual=t)

    gen = BackendPDHG(prob, popts, sopts(1e-5))
    gs = gen.run(gen.initial_state(), 100)
    fus = FusedROFPDHG(prob, popts, sopts(1e-5), interpret=True)
    fus.vol["n_bands"] = 4          # force the banded multichunk path
    fus.vol["double_buffer"] = True
    fs = fus.run(fus.initial_state(), 100)
    assert int(fs.iteration) == int(gs.iteration) == 100
    np.testing.assert_allclose(np.asarray(fs.x), np.asarray(gs.x),
                               atol=2e-5)
    np.testing.assert_allclose(float(fs.tau), float(gs.tau), rtol=1e-6)

    gen = BackendPDHG(prob, popts, sopts(1e-3))
    gs = gen.run(gen.initial_state(), 10000)
    fus = FusedROFPDHG(prob, popts, sopts(1e-3), interpret=True)
    fus.vol["n_bands"] = 4
    fus.vol["double_buffer"] = True
    fs = fus.run(fus.initial_state(), 10000)
    assert bool(fs.converged) == bool(gs.converged)
    assert int(fs.iteration) == int(gs.iteration)
    np.testing.assert_allclose(np.asarray(fs.x), np.asarray(gs.x),
                               atol=2e-4)
