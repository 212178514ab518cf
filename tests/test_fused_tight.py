"""Fused Pallas tight-multilabel iteration (ops/fused_tight.py) vs the
generic PDHG path.

Runs in Pallas interpreter mode on CPU; problem construction mirrors
examples/example_multilabel_tight.py.
"""

import numpy as np
import pytest

import prost_tpu as pt
from prost_tpu import block, function
from prost_tpu.backend import BackendPDHG, PDHGOptions
from prost_tpu.ops import FusedROFPDHG, match_tight_structure


def pair_local_matrix(L):
    k = L * (L - 1) // 2
    P = np.zeros((2 * k, 2 * L))
    idx = 0
    for i in range(L):
        for j in range(i + 1, L):
            P[idx, i] = 1.0
            P[idx, j] = -1.0
            P[idx + k, i + L] = 1.0
            P[idx + k, j + L] = -1.0
            idx += 1
    return P


def tight_problem(nx, ny, L=3, lmb=1.0, seed=0):
    n = nx * ny
    k = L * (L - 1) // 2
    rng = np.random.RandomState(seed)
    f = rng.rand(n * L)
    P = pair_local_matrix(L)

    u = pt.Variable(n * L)
    v = pt.Variable(2 * n * k)
    q = pt.Variable(2 * n * L)
    p = pt.Variable(2 * n * k)
    s = pt.Variable(n)
    prob = pt.MinMaxProblem([u, v], [q, p, s])
    prob.add_function(u, function.sum_1d("ind_geq0", 1, 0, 1, f, 0))
    prob.add_function(p, function.sum_norm2(2, False, "ind_leq0",
                                            1 / lmb, 1, 1))
    prob.add_function(s, function.sum_1d("zero", 1, 0, 1, 1, 0))
    prob.add_dual_pair(u, q, block.gradient2d(nx, ny, L))
    prob.add_dual_pair(u, s, block.sparse_kron_id(np.ones((1, L)), n))
    prob.add_dual_pair(v, p, block.identity())
    prob.add_dual_pair(v, q, block.sparse_kron_id(P.T, n))
    return prob.finalize()


def _opts():
    return pt.SolverOptions(verbose=False, tol_rel_primal=0, tol_rel_dual=0,
                            tol_abs_primal=0, tol_abs_dual=0)


def test_match_tight_structure():
    L = 3
    m = match_tight_structure(tight_problem(12, 12, L=L, lmb=2.0))
    assert m is not None
    assert m["L"] == L and m["k"] == 3
    assert m["radius"] == pytest.approx(2.0)  # b/a = 1/(1/lmb)
    assert m["d_s"] == 1.0
    # preconditioner constants: Sigma_q = 1/(2 + (L-1)), Sigma_p = 1,
    # Sigma_s = 1/L, Tau_u = 1/5, Tau_v = 1/3
    sig_q, sig_p, sig_s, tau_u, tau_v = m["consts"]
    assert sig_q == pytest.approx(1.0 / (L + 1), rel=1e-5)
    assert sig_p == pytest.approx(1.0, rel=1e-5)
    assert sig_s == pytest.approx(1.0 / L, rel=1e-5)
    assert tau_u == pytest.approx(0.2, rel=1e-5)
    assert tau_v == pytest.approx(1.0 / 3.0, rel=1e-5)
    assert len(m["taps"]) == 4 * m["k"]


def test_fast_relaxation_does_not_match_tight():
    # the fast relaxation (no pairwise coupling) has a different shape
    n = 12 * 12
    L = 3
    u = pt.Variable(n * L)
    q = pt.Variable(2 * n * L)
    s = pt.Variable(n)
    prob = pt.MinMaxProblem([u], [q, s])
    prob.add_function(u, function.sum_1d("ind_geq0", 1, 0, 1, 0.5, 0))
    prob.add_function(q, function.sum_norm2(2 * L, False, "ind_leq0",
                                            1, 1, 1))
    prob.add_function(s, function.sum_1d("zero", 1, 0, 1, 1, 0))
    prob.add_dual_pair(u, q, block.gradient2d(12, 12, L))
    prob.add_dual_pair(u, s, block.sparse_kron_id(np.ones((1, L)), n))
    assert match_tight_structure(prob.finalize()) is None


@pytest.mark.parametrize("residual_iter", [1, 10])
def test_fused_tight_matches_generic(residual_iter):
    prob = tight_problem(14, 14, L=3, lmb=1.0, seed=2)
    popts = PDHGOptions(stepsize="boyd", residual_iter=residual_iter,
                        scale_steps_operator=False)

    gen = BackendPDHG(prob, popts, _opts())
    gs = gen.run(gen.initial_state(), 60)

    fus = FusedROFPDHG(prob, popts, _opts(), interpret=True)
    assert fus.tight is not None
    fs = fus.run(fus.initial_state(), 60)

    assert int(fs.iteration) == int(gs.iteration) == 60
    np.testing.assert_allclose(np.asarray(fs.x), np.asarray(gs.x), atol=3e-5)
    np.testing.assert_allclose(np.asarray(fs.y), np.asarray(gs.y), atol=3e-5)
    np.testing.assert_allclose(float(fs.tau), float(gs.tau), rtol=1e-6)
    np.testing.assert_allclose(
        float(fs.primal_residual), float(gs.primal_residual), rtol=1e-3)
    np.testing.assert_allclose(
        float(fs.dual_residual), float(gs.dual_residual), rtol=1e-3)


def test_fused_tight_full_solve_converges():
    prob = tight_problem(12, 12, L=3, lmb=0.5, seed=3)
    popts = PDHGOptions(stepsize="boyd", residual_iter=10,
                        scale_steps_operator=False)
    sopts = pt.SolverOptions(max_iters=8000, verbose=False,
                             tol_rel_primal=1e-4, tol_rel_dual=1e-4,
                             tol_abs_primal=1e-4, tol_abs_dual=1e-4)
    solver = pt.Solver(
        prob, lambda p, o: FusedROFPDHG(p, popts, o, interpret=True), sopts)
    res = solver.solve()
    assert res.result == pt.ConvergenceResult.CONVERGED


@pytest.mark.parametrize("n_bands", [2, 4])
def test_tight_tiled_chunk_bit_equal_to_whole_plane(n_bands):
    """Row-band tiled tight chunk == whole-plane chunk, bit-for-bit on
    owned rows (cf. test_fused_rof.py)."""
    import jax.numpy as jnp

    from prost_tpu.ops.fused_tight import (match_tight_structure,
                                           tight_fused_chunk,
                                           tight_fused_chunk_tiled)

    nx, ny, L = 32, 16, 3
    k = L * (L - 1) // 2
    prob = tight_problem(nx, ny, L=L, lmb=0.8, seed=4)
    m = match_tight_structure(prob)
    assert m is not None
    ri = 4
    rng = np.random.RandomState(10)
    u = jnp.asarray(rng.rand(L, nx, ny), jnp.float32)
    v = jnp.asarray(0.1 * rng.randn(2 * k, nx, ny), jnp.float32)
    q = jnp.asarray(0.2 * rng.randn(2 * L, nx, ny), jnp.float32)
    p = jnp.asarray(0.1 * rng.randn(2 * k, nx, ny), jnp.float32)
    s = jnp.asarray(0.1 * rng.randn(nx, ny), jnp.float32)
    args = (0.9, 1.1, 1.0, m["radius"], m["d_s"])

    ref = tight_fused_chunk(u, v, q, p, s, m["f"], *args, ri,
                            m["taps"], m["consts"], interpret=True)
    til = tight_fused_chunk_tiled(u, v, q, p, s, m["f"], *args, ri,
                                  m["taps"], m["consts"], n_bands,
                                  interpret=True)
    for a, b in zip(ref[0] + ref[1], til[0] + til[1]):
        # <= 1 ulp (see test_fused_rof tiled comment)
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=3e-7, rtol=3e-7)
    np.testing.assert_allclose(np.asarray(ref[2]), np.asarray(til[2]),
                               rtol=1e-5, atol=1e-10)


@pytest.mark.parametrize("n_bands", [2, 4])
def test_tight_banded_chunk_matches_whole_plane(n_bands):
    """Single-launch grid-banded tight kernel (manual HBM halo DMAs) ==
    the whole-plane kernel to <= 1 ulp."""
    import jax.numpy as jnp

    from prost_tpu.ops.fused_tight import (match_tight_structure,
                                           tight_fused_chunk,
                                           tight_fused_chunk_banded)

    nx, ny, L = 64, 16, 3
    k = L * (L - 1) // 2
    prob = tight_problem(nx, ny, L=L, lmb=0.8, seed=4)
    m = match_tight_structure(prob)
    assert m is not None
    ri = 4
    rng = np.random.RandomState(11)
    u = jnp.asarray(rng.rand(L, nx, ny), jnp.float32)
    v = jnp.asarray(0.1 * rng.randn(2 * k, nx, ny), jnp.float32)
    q = jnp.asarray(0.2 * rng.randn(2 * L, nx, ny), jnp.float32)
    p = jnp.asarray(0.1 * rng.randn(2 * k, nx, ny), jnp.float32)
    s = jnp.asarray(0.1 * rng.randn(nx, ny), jnp.float32)
    args = (0.9, 1.1, 1.0, m["radius"], m["d_s"])

    ref = tight_fused_chunk(u, v, q, p, s, m["f"], *args, ri,
                            m["taps"], m["consts"], interpret=True)
    ban = tight_fused_chunk_banded(u, v, q, p, s, m["f"], *args, ri,
                                   m["taps"], m["consts"], n_bands,
                                   interpret=True)
    for a, b in zip(ref[0] + ref[1], ban[0] + ban[1]):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=3e-7, rtol=3e-7)
    np.testing.assert_allclose(np.asarray(ref[2]), np.asarray(ban[2]),
                               rtol=1e-5, atol=1e-10)


def test_tight_tiled_end_to_end_matches_generic():
    prob = tight_problem(16, 12, L=3, lmb=0.8, seed=5)
    popts = PDHGOptions(stepsize="boyd", residual_iter=3,
                        scale_steps_operator=False)
    gen = BackendPDHG(prob, popts, _opts())
    gs = gen.run(gen.initial_state(), 31)

    fus = FusedROFPDHG(prob, popts, _opts(), interpret=True)
    assert fus.tight is not None
    fus.tight["n_bands"] = 2  # force the tiled path on a small plane
    fs = fus.run(fus.initial_state(), 31)
    np.testing.assert_allclose(np.asarray(fs.x), np.asarray(gs.x), atol=2e-5)
    np.testing.assert_allclose(np.asarray(fs.y), np.asarray(gs.y), atol=2e-5)
    np.testing.assert_allclose(float(fs.tau), float(gs.tau), rtol=1e-6)


@pytest.mark.parametrize("n_shards", [2, 4, 8])
def test_sharded_fused_tight_matches_generic(n_shards):
    from prost_tpu.parallel import ShardedFusedTight, make_mesh

    prob = tight_problem(64 if n_shards == 8 else 32, 12, L=3, lmb=0.8,
                         seed=6)
    popts = PDHGOptions(stepsize="boyd", residual_iter=3,
                        scale_steps_operator=False)
    gen = BackendPDHG(prob, popts, _opts())
    gs = gen.run(gen.initial_state(), 31)

    mesh = make_mesh((n_shards,), axis_names=("sp",))
    sh = ShardedFusedTight(prob, popts, _opts(), mesh, interpret=True)
    ss = sh.run(sh.initial_state(), 31)

    assert int(ss.iteration) == int(gs.iteration) == 31
    np.testing.assert_allclose(np.asarray(ss.x), np.asarray(gs.x), atol=2e-5)
    np.testing.assert_allclose(np.asarray(ss.y), np.asarray(gs.y), atol=2e-5)
    np.testing.assert_allclose(float(ss.tau), float(gs.tau), rtol=1e-6)


@pytest.mark.parametrize("n_bands", [2, 4])
def test_tight_banded_double_buffer_matches_whole_plane(n_bands):
    """The double-buffered banded tight kernel (shared run_banded_db
    pipeline) must match the whole-plane kernel."""
    import jax.numpy as jnp

    from prost_tpu.ops.fused_tight import (match_tight_structure,
                                           tight_fused_chunk,
                                           tight_fused_chunk_banded)

    nx, ny, L = 64, 16, 3
    k = L * (L - 1) // 2
    prob = tight_problem(nx, ny, L=L, lmb=0.8, seed=4)
    m = match_tight_structure(prob)
    assert m is not None
    ri = 4
    rng = np.random.RandomState(12)
    u = jnp.asarray(rng.rand(L, nx, ny), jnp.float32)
    v = jnp.asarray(0.1 * rng.randn(2 * k, nx, ny), jnp.float32)
    q = jnp.asarray(0.2 * rng.randn(2 * L, nx, ny), jnp.float32)
    p = jnp.asarray(0.1 * rng.randn(2 * k, nx, ny), jnp.float32)
    s = jnp.asarray(0.1 * rng.randn(nx, ny), jnp.float32)
    args = (0.9, 1.1, 1.0, m["radius"], m["d_s"])

    ref = tight_fused_chunk(u, v, q, p, s, m["f"], *args, ri,
                            m["taps"], m["consts"], interpret=True)
    db = tight_fused_chunk_banded(u, v, q, p, s, m["f"], *args, ri,
                                  m["taps"], m["consts"], n_bands,
                                  interpret=True, double_buffer=True)
    for a, b in zip(ref[0] + ref[1], db[0] + db[1]):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=3e-7, rtol=3e-7)
    np.testing.assert_allclose(np.asarray(ref[2]), np.asarray(db[2]),
                               rtol=1e-5, atol=1e-10)
