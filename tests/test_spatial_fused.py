"""Halo-exchange sharded fused PDHG (parallel/spatial_fused.py) vs the
generic unsharded path, on the 8-virtual-CPU-device mesh (conftest.py)
with the Pallas kernel in interpreter mode.
"""

import numpy as np
import pytest

import prost_tpu as pt
from prost_tpu.backend import BackendPDHG, PDHGOptions
from prost_tpu.config import ProstError
from prost_tpu.parallel import ShardedFusedROF, make_mesh
from test_fused_rof import rof_problem, _opts


def _mesh(n):
    return make_mesh((n,), axis_names=("sp",))


@pytest.mark.parametrize("n_shards,residual_iter", [(4, 5), (8, 2), (2, 10)])
def test_sharded_fused_matches_generic(n_shards, residual_iter):
    nx, ny = 64, 32
    rng = np.random.RandomState(5)
    f = rng.rand(nx * ny).astype(np.float32)
    prob = rof_problem(nx, ny, f, 12.0)
    popts = PDHGOptions(stepsize="boyd", residual_iter=residual_iter,
                        scale_steps_operator=False)

    gen = BackendPDHG(prob, popts, _opts())
    gs = gen.run(gen.initial_state(), 61)

    sh = ShardedFusedROF(prob, popts, _opts(), _mesh(n_shards),
                         interpret=True)
    ss = sh.run(sh.initial_state(), 61)

    assert int(ss.iteration) == int(gs.iteration) == 61
    np.testing.assert_allclose(np.asarray(ss.x), np.asarray(gs.x), atol=2e-5)
    np.testing.assert_allclose(np.asarray(ss.y), np.asarray(gs.y), atol=2e-5)
    np.testing.assert_allclose(float(ss.tau), float(gs.tau), rtol=1e-6)
    np.testing.assert_allclose(
        float(ss.primal_residual), float(gs.primal_residual), rtol=1e-3)
    np.testing.assert_allclose(
        float(ss.dual_residual), float(gs.dual_residual), rtol=1e-3)


def test_sharded_fused_full_solve_converges():
    nx = ny = 32
    rng = np.random.RandomState(6)
    f = rng.rand(nx * ny).astype(np.float32)
    prob = rof_problem(nx, ny, f, 8.0)
    popts = PDHGOptions(stepsize="boyd", residual_iter=3,
                        scale_steps_operator=False)
    sopts = pt.SolverOptions(max_iters=3000, verbose=False,
                             tol_rel_primal=1e-5, tol_rel_dual=1e-5,
                             tol_abs_primal=1e-5, tol_abs_dual=1e-5)
    solver = pt.Solver(
        prob,
        lambda p, o: ShardedFusedROF(p, popts, o, _mesh(4), interpret=True),
        sopts)
    res = solver.solve()
    assert res.result == pt.ConvergenceResult.CONVERGED


def test_sharded_fused_validates_geometry():
    f = np.random.RandomState(7).rand(24 * 24).astype(np.float32)
    prob = rof_problem(24, 24, f, 8.0)
    # 24 rows over 8 shards = 3 rows/shard < halo
    with pytest.raises(ProstError):
        ShardedFusedROF(prob, PDHGOptions(residual_iter=10,
                                          scale_steps_operator=False),
                        _opts(), _mesh(8), interpret=True)
    # non-divisible rows (24 % 5 != 0)
    with pytest.raises(ProstError):
        ShardedFusedROF(prob, PDHGOptions(residual_iter=1,
                                          scale_steps_operator=False),
                        _opts(), _mesh(5), interpret=True)
