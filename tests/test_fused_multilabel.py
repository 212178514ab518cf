"""Fused Pallas multilabel iteration (ops/fused_multilabel.py) vs the
generic PDHG path.  Runs in Pallas interpreter mode on CPU; the real-TPU
path is exercised by bench.py --all.
"""

import numpy as np
import pytest

import prost_tpu as pt
from prost_tpu import block, function
from prost_tpu.backend import BackendPDHG, PDHGOptions
from prost_tpu.ops import FusedROFPDHG, match_multilabel_structure


def ml_problem(nx, ny, L, lmb=0.5, seed=0):
    """The fast multilabel relaxation of examples/example_multilabel_fast.py
    on random unaries, returned as a finalized modeling-layer problem."""
    n = nx * ny
    rng = np.random.RandomState(seed)
    f = rng.rand(n * L).astype(np.float32)

    u = pt.Variable(n * L)
    q = pt.Variable(2 * n * L)
    s = pt.Variable(n)
    prob = pt.MinMaxProblem([u], [q, s])
    prob.add_function(u, function.sum_1d("ind_geq0", 1, 0, 1, f, 0))
    prob.add_function(q, function.sum_norm2(2 * L, False, "ind_leq0",
                                            1 / lmb, 1, 1))
    prob.add_function(s, function.sum_1d("zero", 1, 0, 1, 1, 0))
    prob.add_dual_pair(u, q, block.gradient2d(nx, ny, L))
    prob.add_dual_pair(u, s, block.sparse_kron_id(np.ones((1, L)), n))
    return prob.finalize(), f


def _opts(**kw):
    kw.setdefault("verbose", False)
    kw.setdefault("tol_rel_primal", 0.0)
    kw.setdefault("tol_rel_dual", 0.0)
    kw.setdefault("tol_abs_primal", 0.0)
    kw.setdefault("tol_abs_dual", 0.0)
    return pt.SolverOptions(**kw)


def test_match_multilabel_structure():
    prob, f = ml_problem(8, 8, 4, lmb=0.7)
    m = match_multilabel_structure(prob)
    assert m is not None
    assert m["nx"] == 8 and m["L"] == 4
    assert m["radius"] == pytest.approx(0.7)
    assert m["d_s"] == 1.0
    np.testing.assert_allclose(np.asarray(m["f"]).ravel(), f)


def test_match_rejects_non_multilabel():
    # simplex-based formulation (no kron block) must not match
    nx = ny = 6
    L = 3
    n = nx * ny
    u = pt.Variable(n * L)
    q = pt.Variable(2 * n * L)
    prob = pt.MinMaxProblem([u], [q])
    prob.add_function(u, function.sum_ind_simplex(L, False))
    prob.add_function(q, function.sum_norm2(2 * L, False, "ind_leq0",
                                            2.0, 1, 1))
    prob.add_dual_pair(u, q, block.gradient2d(nx, ny, L))
    assert match_multilabel_structure(prob.finalize()) is None


@pytest.mark.parametrize("residual_iter", [1, 7, 10])
def test_fused_ml_matches_generic(residual_iter):
    prob, _ = ml_problem(12, 10, 4, lmb=0.4, seed=3)
    popts = PDHGOptions(stepsize="boyd", residual_iter=residual_iter,
                        scale_steps_operator=False)

    gen = BackendPDHG(prob, popts, _opts())
    gs = gen.run(gen.initial_state(), 60)

    fus = FusedROFPDHG(prob, popts, _opts(), interpret=True)
    assert fus.ml is not None and fus.rof is None
    fs = fus.run(fus.initial_state(), 60)

    assert int(fs.iteration) == int(gs.iteration) == 60
    np.testing.assert_allclose(np.asarray(fs.x), np.asarray(gs.x), atol=2e-5)
    np.testing.assert_allclose(np.asarray(fs.y), np.asarray(gs.y), atol=2e-5)
    np.testing.assert_allclose(float(fs.tau), float(gs.tau), rtol=1e-6)
    np.testing.assert_allclose(
        float(fs.primal_residual), float(gs.primal_residual), rtol=1e-3)
    # current_solution parity (z, w reconstruction uses the prev iterates)
    for a, b in zip(fus.current_solution(fs), gen.current_solution(gs)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=5e-5)


@pytest.mark.parametrize("n_bands", [2, 4])
def test_ml_tiled_chunk_bit_equal_to_whole_plane(n_bands):
    """Row-band tiled multilabel chunk == whole-plane chunk, bit-for-bit
    on owned rows (cf. test_fused_rof.py)."""
    import jax.numpy as jnp

    from prost_tpu.ops.fused_multilabel import (ml_fused_chunk,
                                                ml_fused_chunk_tiled)

    L, nx, ny = 3, 48, 24
    ri = 4
    rng = np.random.RandomState(9)
    u = jnp.asarray(rng.rand(L, nx, ny), jnp.float32)
    q = jnp.asarray(0.2 * rng.randn(2 * L, nx, ny), jnp.float32)
    # clean dead dual coordinates (fused canonicalization)
    q = q.at[:L, -1, :].set(0.0).at[L:, :, -1].set(0.0)
    s = jnp.asarray(0.1 * rng.randn(nx, ny), jnp.float32)
    f = jnp.asarray(rng.rand(L, nx, ny), jnp.float32)
    args = (0.9, 1.1, 1.0, 0.5, 1.0)  # tau, sigma, theta, radius, d_s

    ref = ml_fused_chunk(u, q, s, f, *args, ri, interpret=True)
    til = ml_fused_chunk_tiled(u, q, s, f, *args, ri, n_bands,
                               interpret=True)
    for a, b in zip(ref[:6], til[:6]):
        # <= 1 ulp (see test_fused_rof tiled comment)
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=3e-7, rtol=3e-7)
    np.testing.assert_allclose(np.asarray(ref[6]), np.asarray(til[6]),
                               rtol=1e-5, atol=1e-10)


def test_ml_tiled_end_to_end_matches_generic():
    prob, _ = ml_problem(16, 10, 3, lmb=0.4, seed=11)
    popts = PDHGOptions(stepsize="boyd", residual_iter=3,
                        scale_steps_operator=False)
    gen = BackendPDHG(prob, popts, _opts())
    gs = gen.run(gen.initial_state(), 31)

    fus = FusedROFPDHG(prob, popts, _opts(), interpret=True)
    assert fus.ml is not None
    fus.ml["n_bands"] = 2  # force the tiled path on a small plane
    fs = fus.run(fus.initial_state(), 31)
    np.testing.assert_allclose(np.asarray(fs.x), np.asarray(gs.x), atol=2e-5)
    np.testing.assert_allclose(np.asarray(fs.y), np.asarray(gs.y), atol=2e-5)
    np.testing.assert_allclose(float(fs.tau), float(gs.tau), rtol=1e-6)


def test_fused_ml_full_solve_converges():
    prob, _ = ml_problem(10, 10, 3, lmb=0.3, seed=5)
    popts = PDHGOptions(stepsize="boyd", residual_iter=10,
                        scale_steps_operator=False)
    sopts = _opts(max_iters=5000, tol_rel_primal=1e-5, tol_rel_dual=1e-5,
                  tol_abs_primal=1e-5, tol_abs_dual=1e-5)
    solver = pt.Solver(
        prob, lambda p, o: FusedROFPDHG(p, popts, o, interpret=True), sopts)
    res = solver.solve()
    assert res.result == pt.ConvergenceResult.CONVERGED
    # partition of unity at convergence
    L, n = 3, 100
    sums = np.asarray(res.x).reshape(L, n).sum(axis=0)
    np.testing.assert_allclose(sums, 1.0, atol=5e-2)


@pytest.mark.parametrize("n_bands", [2, 4])
def test_ml_banded_chunk_matches_whole_plane(n_bands):
    """Single-launch grid-banded ml kernel (manual HBM halo DMAs) == the
    whole-plane kernel to <= 1 ulp."""
    import jax.numpy as jnp

    from prost_tpu.ops.fused_multilabel import (ml_fused_chunk,
                                                ml_fused_chunk_banded)

    L, nx, ny = 3, 64, 24
    ri = 4
    rng = np.random.RandomState(19)
    u = jnp.asarray(rng.rand(L, nx, ny), jnp.float32)
    q = jnp.asarray(0.2 * rng.randn(2 * L, nx, ny), jnp.float32)
    # clean dead dual coordinates (fused canonicalization)
    q = q.at[:L, -1, :].set(0.0).at[L:, :, -1].set(0.0)
    s = jnp.asarray(0.1 * rng.randn(nx, ny), jnp.float32)
    f = jnp.asarray(rng.rand(L, nx, ny), jnp.float32)
    args = (0.9, 1.1, 1.0, 0.5, 1.0)

    ref = ml_fused_chunk(u, q, s, f, *args, ri, interpret=True)
    ban = ml_fused_chunk_banded(u, q, s, f, *args, ri, n_bands,
                                interpret=True)
    for a, b in zip(ref[:6], ban[:6]):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=3e-7, rtol=3e-7)
    np.testing.assert_allclose(np.asarray(ref[6]), np.asarray(ban[6]),
                               rtol=1e-5, atol=1e-10)


@pytest.mark.parametrize("n_bands", [2, 4])
def test_ml_banded_double_buffer_matches_whole_plane(n_bands):
    """The double-buffered banded ml kernel (shared run_banded_db
    pipeline) must match the whole-plane kernel too."""
    import jax.numpy as jnp

    from prost_tpu.ops.fused_multilabel import (ml_fused_chunk,
                                                ml_fused_chunk_banded)

    L, nx, ny = 3, 64, 24
    ri = 4
    rng = np.random.RandomState(20)
    u = jnp.asarray(rng.rand(L, nx, ny), jnp.float32)
    q = jnp.asarray(0.2 * rng.randn(2 * L, nx, ny), jnp.float32)
    # clean dead dual coordinates (fused canonicalization)
    q = q.at[:L, -1, :].set(0.0).at[L:, :, -1].set(0.0)
    s = jnp.asarray(0.1 * rng.randn(nx, ny), jnp.float32)
    f = jnp.asarray(rng.rand(L, nx, ny), jnp.float32)
    args = (0.9, 1.1, 1.0, 0.5, 1.0)

    ref = ml_fused_chunk(u, q, s, f, *args, ri, interpret=True)
    db = ml_fused_chunk_banded(u, q, s, f, *args, ri, n_bands,
                               interpret=True, double_buffer=True)
    for a, b in zip(ref[:6], db[:6]):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=3e-7, rtol=3e-7)
    np.testing.assert_allclose(np.asarray(ref[6]), np.asarray(db[6]),
                               rtol=1e-5, atol=1e-10)


@pytest.mark.parametrize("stepsize", ["boyd", "goldstein"])
def test_ml_multichunk_matches_generic(stepsize):
    """Phase B0 (multi-chunk ml launches with in-kernel adaptation) must
    follow the launch-per-chunk trajectory exactly (cf. the ROF
    multichunk test)."""
    from prost_tpu.ops import FusedROFPDHG

    nx = ny = 16
    L = 3
    prob, _ = ml_problem(nx, ny, L, lmb=0.5, seed=21)
    popts = PDHGOptions(stepsize=stepsize, residual_iter=5,
                        scale_steps_operator=False)
    t = 1e-5
    sopts = pt.SolverOptions(verbose=False, tol_rel_primal=t,
                             tol_rel_dual=t, tol_abs_primal=t,
                             tol_abs_dual=t)

    gen = BackendPDHG(prob, popts, sopts)
    gs = gen.run(gen.initial_state(), 200)  # > _K_CHUNKS * ri = 40
    fus = FusedROFPDHG(prob, popts, sopts, interpret=True)
    assert fus.ml is not None and fus.ml["n_bands"] == 1
    fs = fus.run(fus.initial_state(), 200)

    assert int(fs.iteration) == int(gs.iteration)
    assert bool(fs.converged) == bool(gs.converged)
    np.testing.assert_allclose(np.asarray(fs.x), np.asarray(gs.x),
                               atol=2e-5)
    np.testing.assert_allclose(np.asarray(fs.y), np.asarray(gs.y),
                               atol=2e-5)
    np.testing.assert_allclose(float(fs.tau), float(gs.tau), rtol=1e-6)


def test_ml_banded_multichunk_matches_generic():
    """Phase B0-banded for multilabel (ml_fused_multichunk_banded:
    grid (K, bands), in-place ping-pong slots, in-kernel adaptation)
    must follow the generic trajectory, incl. mid-launch convergence."""
    from prost_tpu.ops import FusedROFPDHG

    nx, ny, L = 64, 16, 3
    prob, _ = ml_problem(nx, ny, L, lmb=0.5, seed=22)
    popts = PDHGOptions(stepsize="boyd", residual_iter=3,
                        scale_steps_operator=False)

    def sopts(t):
        return pt.SolverOptions(verbose=False, tol_rel_primal=t,
                                tol_rel_dual=t, tol_abs_primal=t,
                                tol_abs_dual=t)

    gen = BackendPDHG(prob, popts, sopts(1e-5))
    gs = gen.run(gen.initial_state(), 100)
    fus = FusedROFPDHG(prob, popts, sopts(1e-5), interpret=True)
    fus.ml["n_bands"] = 4          # force the banded multichunk path
    fus.ml["double_buffer"] = True
    fs = fus.run(fus.initial_state(), 100)
    assert int(fs.iteration) == int(gs.iteration) == 100
    np.testing.assert_allclose(np.asarray(fs.x), np.asarray(gs.x),
                               atol=2e-5)
    np.testing.assert_allclose(np.asarray(fs.y), np.asarray(gs.y),
                               atol=2e-5)
    np.testing.assert_allclose(float(fs.tau), float(gs.tau), rtol=1e-6)

    gen = BackendPDHG(prob, popts, sopts(1e-3))
    gs = gen.run(gen.initial_state(), 10000)
    fus = FusedROFPDHG(prob, popts, sopts(1e-3), interpret=True)
    fus.ml["n_bands"] = 4
    fus.ml["double_buffer"] = True
    fs = fus.run(fus.initial_state(), 10000)
    assert bool(fs.converged) == bool(gs.converged)
    assert int(fs.iteration) == int(gs.iteration)
    np.testing.assert_allclose(np.asarray(fs.x), np.asarray(gs.x),
                               atol=2e-4)
