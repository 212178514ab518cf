"""Modeling-layer tests: variables, min_max/min problems, function/block
factories, solve, debug eval entry points.

Patterns mirror the reference examples: ROF via the modeling API
(example_rof_primaldual.m), sub-variable partitioning (example_rof_primal.m),
min_problem with constraints (example_deblurring.m), and the eval_prox /
eval_linop debug paths used by all reference unit tests.
"""

import numpy as np
import jax.numpy as jnp
import pytest

import prost_tpu as pt
from prost_tpu import block, function


def test_variable_indexing_and_subvars():
    u = pt.Variable(100)
    a = pt.SubVariable(u, 60)
    b = pt.SubVariable(u, 40)
    q = pt.Variable(50)
    prob = pt.MinMaxProblem([u], [q])
    assert u.idx == 0 and a.idx == 0 and b.idx == 60 and q.idx == 0
    assert prob.ncols == 100 and prob.nrows == 50


def test_subvar_size_mismatch_raises():
    u = pt.Variable(100)
    pt.SubVariable(u, 60)
    pt.SubVariable(u, 30)  # only 90 of 100
    with pytest.raises(pt.ProstError):
        pt.MinMaxProblem([u], [pt.Variable(10)])


def test_unregistered_variable_raises():
    u, q = pt.Variable(10), pt.Variable(10)
    prob = pt.MinMaxProblem([u], [q])
    with pytest.raises(pt.ProstError):
        prob.add_function(pt.Variable(10), function.zero())


def test_block_size_mismatch_raises():
    u, q = pt.Variable(10), pt.Variable(7)
    prob = pt.MinMaxProblem([u], [q])
    with pytest.raises(pt.ProstError):
        prob.add_dual_pair(u, q, block.dense(np.ones((5, 10))))


def _rof_energy(u, f, lmb, nx, ny):
    from prost_tpu.linop import BlockGradient2D
    g = np.asarray(
        BlockGradient2D(row=0, col=0, nx=nx, ny=ny, L=1).apply(jnp.asarray(u))
    )
    n = nx * ny
    return lmb / 2 * np.sum((u - f) ** 2) + np.sum(
        np.sqrt(g[:n] ** 2 + g[n:] ** 2)
    )


def test_rof_via_modeling_api():
    """The canonical flow (example_rof_primaldual.m) through the Python
    modeling API end-to-end."""
    nx = ny = 24
    n = nx * ny
    lmb = 5.0
    rng = np.random.RandomState(0)
    f = rng.rand(n).astype(np.float32)

    u = pt.Variable(n)
    q = pt.Variable(2 * n)
    prob = pt.MinMaxProblem([u], [q])
    prob.add_function(u, function.sum_1d("square", 1, f, lmb))
    prob.add_function(
        q, function.conjugate(function.sum_norm2(2, False, "abs"))
    )
    prob.add_dual_pair(u, q, block.gradient2d(nx, ny, 1))

    res = pt.solve(
        prob,
        pt.backend_pdhg(),
        pt.options(max_iters=2500, verbose=False,
                   tol_rel_primal=1e-6, tol_rel_dual=1e-6,
                   tol_abs_primal=1e-6, tol_abs_dual=1e-6),
    )
    assert u.val.shape == (n,)
    assert q.val.shape == (2 * n,)
    np.testing.assert_array_equal(u.val, res.x)
    en = _rof_energy(u.val, f, lmb, nx, ny)
    en_f = _rof_energy(f, f, lmb, nx, ny)
    assert en < en_f


def test_min_problem_constrained_form():
    """min_problem: min ||u - a||^2/2 + ||z - b||^2/2 s.t. z = K u has a
    closed-form solution (example_deblurring.m pattern)."""
    rng = np.random.RandomState(1)
    m, n = 15, 10
    K = rng.randn(m, n).astype(np.float32)
    a = rng.randn(n).astype(np.float32)
    b = rng.randn(m).astype(np.float32)

    u = pt.Variable(n)
    z = pt.Variable(m)
    prob = pt.MinProblem([u], [z])
    prob.add_function(u, function.sum_1d("square", 1, a))
    prob.add_function(z, function.sum_1d("square", 1, b))
    prob.add_constraint(u, z, block.dense(K))

    res = pt.solve(
        prob,
        pt.backend_admm(),
        pt.options(max_iters=2000, verbose=False,
                   tol_rel_primal=1e-7, tol_rel_dual=1e-7,
                   tol_abs_primal=1e-7, tol_abs_dual=1e-7),
    )
    expected = np.linalg.solve(np.eye(n) + K.T @ K, a + K.T @ b)
    np.testing.assert_allclose(u.val, expected, atol=2e-3)
    np.testing.assert_allclose(z.val, K @ expected, atol=5e-3)


def test_block_replace_on_duplicate():
    """add_dual_pair twice on the same pair replaces the block
    (min_max_problem.m:157-172)."""
    u, q = pt.Variable(6), pt.Variable(6)
    prob = pt.MinMaxProblem([u], [q])
    prob.add_function(u, function.sum_1d("square", 1, np.zeros(6)))
    prob.add_dual_pair(u, q, block.identity(2.0))
    prob.add_dual_pair(u, q, block.identity(3.0))
    core = prob.finalize()
    x = jnp.arange(6.0)
    np.testing.assert_allclose(np.asarray(core.linop.apply(x)), 3.0 * np.arange(6))


def test_eval_prox_debug_path():
    res, ms = pt.eval_prox(
        function.sum_1d("abs", 1, 0, 1), np.array([3.0, -2.0, 0.5]), tau=1.0
    )
    np.testing.assert_allclose(res, [2.0, -1.0, 0.0], atol=1e-6)
    assert ms >= 0


def test_eval_linop_debug_path():
    K = np.arange(12.0).reshape(3, 4)
    out, rs, cs, ms = pt.eval_linop(
        [(block.dense(K), 0, 0, 3, 4)], np.ones(4)
    )
    np.testing.assert_allclose(out, K @ np.ones(4), atol=1e-5)
    np.testing.assert_allclose(rs, np.abs(K).sum(axis=1), atol=1e-5)
    np.testing.assert_allclose(cs, np.abs(K).sum(axis=0), atol=1e-5)


def test_function_factories_construct():
    """Every factory builds a prox of the right size (registry parity with
    factory.cpp:18-116)."""
    rng = np.random.RandomState(2)
    checks = [
        (function.zero(), 12),
        (function.sum_1d("huber", alpha=0.5), 12),
        (function.sum_norm2(3, False, "abs"), 12),
        (function.sum_ind_simplex(4, False), 12),
        (function.sum_ind_sum(4, False), 12),
        (function.sum_ind_sum2(3, [0, 1, 2, 3, 4, 5], 1.0), 12),
        (function.sum_ind_soc(6, False), 12),
        (function.sum_ind_halfspace(4, False, np.ones(4), 1.0), 12),
        (function.sum_ind_epi_quad(4, False, 1.0, np.zeros(3), 0.0), 12),
        (function.sum_eigen_2x2(False, "ind_geq0"), 16),
        (function.sum_eigen_3x3(False, "abs"), 18),
        (function.sum_eigen_nxn(4, False, "square"), 32),
        (function.sum_singular_nx2(6, False, "sum_1d:abs"), 12),
        (function.sum_mass_norm(4, False), 12),
        (function.sum_ind_comass_ball(5, False), 20),
        (function.ind_range(rng.randn(12, 3)), 12),
        (function.conjugate(function.sum_1d("abs")), 12),
        (function.transform(function.sum_1d("abs"), 2.0, 1.0), 12),
        (function.permute(function.sum_1d("abs"), np.arange(12)[::-1]), 12),
    ]
    for factory, size in checks:
        prox = factory(0, size)
        assert prox.index == 0 and prox.size == size
        arg = jnp.asarray(rng.randn(size).astype(np.float32))
        out = prox.eval_local(arg, jnp.ones(size, jnp.float32), 1.0, False)
        assert out.shape == (size,)


def test_block_factories_construct():
    """Every block factory builds a block matching its declared size
    (registry parity with factory.cpp:118-129)."""
    rng = np.random.RandomState(3)
    K = rng.randn(4, 6)
    checks = [
        (block.sparse(K), 4, 6),
        (block.dense(K), 4, 6),
        (block.diags(5, 5, [1.0, -2.0], [0, 1]), 5, 5),
        (block.identity(), 7, 7),
        (block.zero(), 4, 9),
        (block.gradient2d(4, 5, 2), 80, 40),
        (block.gradient3d(4, 5, 2), 120, 40),
        (block.sparse_kron_id(K, 3), 12, 18),
        (block.dense_kron_id(K, 3), 12, 18),
        (block.id_kron_sparse(K, 3), 12, 18),
        (block.id_kron_dense(K, 3), 12, 18),
    ]
    for factory, m, n in checks:
        blk, sz = factory(0, 0, m, n)
        assert sz == (m, n)
        x = jnp.asarray(rng.randn(n).astype(np.float32))
        assert blk.apply(x).shape == (m,)
        y = jnp.asarray(rng.randn(m).astype(np.float32))
        assert blk.apply_adjoint(y).shape == (n,)
