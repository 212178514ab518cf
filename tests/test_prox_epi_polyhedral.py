"""Oracle test for ProxIndEpiPolyhedral — the prox the reference tests
(matlab/+prost/+test/test_prox_sum_ind_epi_polyhedral.m, quadprog oracle)
but never implements (no factory.cpp registry entry).

Oracle: per-point projection QP solved by scipy SLSQP (an independent
algorithm from the batched dual coordinate descent under test).
"""

import json

import numpy as np
import pytest
from scipy.optimize import minimize

from prost_tpu.modeling import function, wire
from prost_tpu.prox import ProxIndEpiPolyhedral

from test_prox_zoo import run_prox


def _project_qp(x0, y0, A, b):
    """Oracle: min ||x-x0||^2 + (y-y0)^2 s.t. A x - y <= b (SLSQP)."""
    d = x0.size
    z0 = np.concatenate([x0, [y0]])

    def obj(z):
        return 0.5 * np.sum((z - z0) ** 2)

    def grad(z):
        return z - z0

    cons = {"type": "ineq",
            "fun": lambda z: b - (A @ z[:d] - z[d]),
            "jac": lambda z: -np.hstack([A, -np.ones((A.shape[0], 1))])}
    # start from a strictly feasible point (lift y above the max)
    zs = z0.copy()
    zs[d] = max(y0, np.max(A @ x0 - b) + 1.0)
    res = minimize(obj, zs, jac=grad, constraints=[cons], method="SLSQP",
                   options={"maxiter": 300, "ftol": 1e-12})
    return res.x


@pytest.mark.parametrize("d", [1, 2, 3])
def test_epi_polyhedral_vs_qp_oracle(d):
    rng = np.random.RandomState(17 + d)
    m, n_pts = 12, 40
    A = rng.randn(m, d)
    b = rng.randn(m)

    x0 = 10.0 * rng.randn(n_pts, d)
    y0 = 10.0 * rng.randn(n_pts)

    # wire layout of the reference test: per point, m rows of d contiguous
    # coefficients (test_prox_sum_ind_epi_polyhedral.m:17-27)
    rep_a = np.tile(A.reshape(-1), n_pts)
    rep_b = np.tile(b, n_pts)
    count_vec = np.full(n_pts, m)
    index_vec = np.arange(n_pts) * m

    make = function.sum_ind_epi_polyhedral(d + 1, False, rep_a, rep_b,
                                           count_vec, index_vec, sweeps=600)
    p = make(0, n_pts * (d + 1))

    arg = np.concatenate([x0.T.reshape(-1), y0])  # planar: x planes then y
    res = run_prox(p, arg)
    x_proj = res[: n_pts * d].reshape(d, n_pts).T
    y_proj = res[n_pts * d:]

    for i in range(n_pts):
        z = _project_qp(x0[i], y0[i], A, b)
        got = np.concatenate([x_proj[i], [y_proj[i]]])
        np.testing.assert_allclose(got, z, atol=2e-3, rtol=1e-4)


@pytest.mark.parametrize("d", [1, 2])
def test_epi_polyhedral_reference_scale(d):
    """The reference test's exact data regime: m=25 constraints,
    x0/y0 ~ 1000*randn, 1e-3 absolute norm tolerance
    (test_prox_sum_ind_epi_polyhedral.m:4,15-16,52).  That is ~1e-6
    RELATIVE accuracy, which the reference reaches because it computes in
    double (matlab/+prost/private/config.hpp:6-7); here float64 mode with
    projected SOR (omega=1.9) meets the same bar.  A companion check pins
    the documented f32 floor (~eps_f32 * scale)."""
    import jax
    import jax.numpy as jnp

    import prost_tpu as pt

    rng = np.random.RandomState(8954 + d)
    m, n_pts = 25, 16
    A = rng.randn(m, d)
    b = rng.randn(m)
    x0 = 1000.0 * rng.randn(n_pts, d)
    y0 = 1000.0 * rng.randn(n_pts)
    arg = np.concatenate([x0.T.reshape(-1), y0])
    oracle = np.stack([_project_qp(x0[i], y0[i], A, b)
                       for i in range(n_pts)])

    def solve():
        make = function.sum_ind_epi_polyhedral(
            d + 1, False, np.tile(A.reshape(-1), n_pts), np.tile(b, n_pts),
            np.full(n_pts, m), np.arange(n_pts) * m,
            sweeps=20000, tol=1e-12, omega=1.9)
        res = run_prox(make(0, n_pts * (d + 1)), arg)
        x_proj = res[: n_pts * d].reshape(d, n_pts).T
        y_proj = res[n_pts * d:]
        return np.stack(
            [np.concatenate([x_proj[i], [y_proj[i]]])
             for i in range(n_pts)])

    # f32 floor: eps_f32 * scale-1000 data leaves ~1e-3-scale absolute
    # error no matter how many sweeps run (documented in the class)
    got32 = solve()
    assert np.linalg.norm(got32 - oracle, axis=1).max() < 3e-2

    # f64: the reference's own regime — meets its 1e-3 norm check
    jax.config.update("jax_enable_x64", True)
    pt.set_dtype(jnp.float64)
    try:
        got64 = solve()
    finally:
        pt.set_dtype(jnp.float32)
        jax.config.update("jax_enable_x64", False)
    assert np.linalg.norm(got64 - oracle, axis=1).max() < 1e-3


def test_epi_polyhedral_early_exit_matches_full_sweeps():
    """The while_loop early exit must not change results vs a huge fixed
    sweep budget (it only stops once updates stagnate below tol)."""
    rng = np.random.RandomState(11)
    d, m, n_pts = 2, 6, 10
    A, b = rng.randn(m, d), rng.randn(m)
    args = dict(coeff_a=np.tile(A.reshape(-1), n_pts),
                coeff_b=np.tile(b, n_pts),
                count_vec=np.full(n_pts, m), index_vec=np.arange(n_pts) * m)
    p_fast = function.sum_ind_epi_polyhedral(d + 1, False, sweeps=400,
                                             **args)(0, n_pts * (d + 1))
    p_slow = function.sum_ind_epi_polyhedral(d + 1, False, sweeps=5000,
                                             tol=0.0,
                                             **args)(0, n_pts * (d + 1))
    arg = 10 * rng.randn(p_fast.size)
    np.testing.assert_allclose(run_prox(p_fast, arg), run_prox(p_slow, arg),
                               atol=1e-4)


def test_epi_polyhedral_ragged_counts_and_feasible_identity():
    """Ragged per-point constraint counts; feasible points stay fixed."""
    rng = np.random.RandomState(3)
    d, n_pts = 2, 8
    counts = rng.randint(2, 7, size=n_pts)
    idx = np.concatenate([[0], np.cumsum(counts)[:-1]])
    As = [rng.randn(c, d) for c in counts]
    bs = [rng.rand(c) + 0.5 for c in counts]

    rep_a = np.concatenate([a.reshape(-1) for a in As])
    rep_b = np.concatenate(bs)

    make = function.sum_ind_epi_polyhedral(d + 1, False, rep_a, rep_b,
                                           counts, idx, sweeps=500)
    p = make(0, n_pts * (d + 1))

    # points with y0 >= f(x0) are feasible -> projection is the identity
    x0 = 0.1 * rng.randn(n_pts, d)
    y0 = np.array([np.max(A @ x + 1.0) for A, x in zip(As, x0)])
    arg = np.concatenate([x0.T.reshape(-1), y0])
    np.testing.assert_allclose(run_prox(p, arg), arg, atol=1e-6)

    # infeasible points match the per-point QP oracle
    y_bad = np.array([np.max(A @ x - b) - 3.0
                      for A, b, x in zip(As, bs, x0)])
    arg = np.concatenate([x0.T.reshape(-1), y_bad])
    res = run_prox(p, arg)
    x_proj = res[: n_pts * d].reshape(d, n_pts).T
    y_proj = res[n_pts * d:]
    for i in range(n_pts):
        z = _project_qp(x0[i], y_bad[i], As[i], bs[i])
        got = np.concatenate([x_proj[i], [y_proj[i]]])
        np.testing.assert_allclose(got, z, atol=2e-3, rtol=1e-4)


def test_epi_polyhedral_wire_roundtrip():
    rng = np.random.RandomState(5)
    d, m, n_pts = 2, 5, 6
    make = function.sum_ind_epi_polyhedral(
        d + 1, False, np.tile(rng.randn(m, d).reshape(-1), n_pts),
        np.tile(rng.randn(m), n_pts), np.full(n_pts, m),
        np.arange(n_pts) * m)
    p = make(0, n_pts * (d + 1))
    spec = wire.to_prox_spec(p)
    q = wire.from_prox_spec(json.loads(json.dumps(spec)))
    assert isinstance(q, ProxIndEpiPolyhedral)
    arg = rng.randn(p.size)
    np.testing.assert_allclose(run_prox(p, arg), run_prox(q, arg),
                               atol=1e-5)
