"""Oracle and property tests for the prox layer, following the reference's
test strategy (SURVEY.md §4): closed-form numpy oracles + metamorphic
properties (Moreau involution, transform algebra, permutation conjugation).
"""

import numpy as np
import jax.numpy as jnp
import pytest

from prost_tpu.prox import (
    ProxElem1D,
    ProxElemIndSimplex,
    ProxElemIndSum,
    ProxElemNorm2,
    ProxIndEpiQuad,
    ProxIndHalfspace,
    ProxIndRange,
    ProxIndSOC,
    ProxIndSum,
    ProxMoreau,
    ProxPermute,
    ProxTransform,
    ProxZero,
)
from prost_tpu.prox.fun1d import FUN_1D

COEFFS_ID = (1.0, 0.0, 1.0, 0.0, 0.0, 0.0, 0.0)


def run_prox(p, arg, tau_diag=None, tau_scal=1.0, invert=False):
    n = p.size
    if tau_diag is None:
        tau_diag = np.ones(n)
    return np.asarray(
        p.eval_local(jnp.asarray(arg), jnp.asarray(tau_diag), tau_scal, invert)
    )


# ---------------------------------------------------------------- fun1d

def test_fun1d_oracles():
    rng = np.random.RandomState(0)
    x = rng.randn(1000) * 3
    tau = 0.7

    checks = {
        "zero": x,
        "abs": np.sign(x) * np.maximum(np.abs(x) - tau, 0),
        "square": x / (1 + tau),
        "ind_leq0": np.minimum(x, 0),
        "ind_geq0": np.maximum(x, 0),
        "ind_eq0": np.zeros_like(x),
        "ind_box01": np.clip(x, 0, 1),
        "l0": np.where(x * x > 2 * tau, x, 0),
    }
    for name, want in checks.items():
        got = np.asarray(FUN_1D[name](jnp.asarray(x), tau, 0.0, 0.0))
        np.testing.assert_allclose(got, want, atol=1e-6, err_msg=name)


def test_fun1d_max_pos0():
    # prox of f(z)=max(0,z): numeric oracle by minimization over a grid
    x = np.linspace(-3, 3, 41)
    tau = 0.5
    got = np.asarray(FUN_1D["max_pos0"](jnp.asarray(x), tau, 0.0, 0.0))
    zs = np.linspace(-6, 6, 24001)
    for xi, gi in zip(x, got):
        en = np.maximum(zs, 0) + (zs - xi) ** 2 / (2 * tau)
        zi = zs[np.argmin(en)]
        assert abs(gi - zi) < 1e-3, (xi, gi, zi)


@pytest.mark.parametrize("fun,alpha,beta", [
    ("huber", 0.3, 0.0),
    ("truncquad", 2.0, 1.0),
    ("trunclin", 2.0, 1.0),
    ("lq", 0.5, 0.0),
    ("lq", 1.5, 0.0),
    ("lq", 0.7, 0.0),
])
def test_fun1d_grid_oracle(fun, alpha, beta):
    """Compare against brute-force minimization of f(z) + (z-x)^2/(2 tau)."""
    def f_oracle(z, name, alpha, beta):
        if name == "huber":
            return np.where(np.abs(z) <= alpha,
                            z * z / (2 * alpha), np.abs(z) - alpha / 2)
        if name == "truncquad":
            return np.minimum(alpha * z * z, beta)
        if name == "trunclin":
            return np.minimum(alpha * np.abs(z), beta)
        if name == "lq":
            return np.abs(z) ** alpha
        raise ValueError(name)

    x = np.linspace(-3, 3, 25)
    tau = 0.6
    got = np.asarray(FUN_1D[fun](jnp.asarray(x), tau, alpha, beta))
    zs = np.linspace(-8, 8, 64001)
    for xi, gi in zip(x, got):
        en = f_oracle(zs, fun, alpha, beta) + (zs - xi) ** 2 / (2 * tau)
        best = np.min(en)
        en_got = f_oracle(np.array([gi]), fun, alpha, beta)[0] + (gi - xi) ** 2 / (2 * tau)
        # the prox value achieves (almost) the optimal energy
        assert en_got <= best + 1e-3, (fun, xi, gi, en_got, best)


# ---------------------------------------------------------------- elemops

def test_sum_1d_seven_coeffs():
    """prox of c*f(a x - b) + d x + e/2 x^2 vs grid search, f = abs."""
    rng = np.random.RandomState(1)
    n = 16
    a, b, c = 1.5, 0.3, 2.0
    d, e = 0.4, 0.8
    x0 = rng.randn(n) * 2
    tau = 0.9
    p = ProxElem1D(index=0, size=n, fun="abs", coeffs=(a, b, c, d, e, 0.0, 0.0))
    got = run_prox(p, x0, tau_scal=tau)
    zs = np.linspace(-8, 8, 64001)
    for xi, gi in zip(x0, got):
        en = c * np.abs(a * zs - b) + d * zs + e / 2 * zs**2 + (zs - xi) ** 2 / (2 * tau)
        zi = zs[np.argmin(en)]
        assert abs(gi - zi) < 1e-3


def test_sum_norm2_ball_projection():
    """conjugate(sum_norm2 'abs') == projection onto unit 2-ball per vector
    (test_prox_sum_norm2.m pattern)."""
    rng = np.random.RandomState(2)
    count, dim = 100, 2
    n = count * dim
    x0 = rng.randn(n) * 2
    inner = ProxElemNorm2(index=0, size=n, count=count, dim=dim,
                          interleaved=True, fun="abs", coeffs=COEFFS_ID)
    p = ProxMoreau(index=0, size=n, child=inner)
    got = run_prox(p, x0).reshape(count, dim)
    v = x0.reshape(count, dim)
    norms = np.linalg.norm(v, axis=1, keepdims=True)
    want = v / np.maximum(norms, 1.0)
    np.testing.assert_allclose(got, want, atol=1e-5)


def projsplx(y):
    """Simplex-projection oracle (reference test helper projsplx.m)."""
    s = np.sort(y)[::-1]
    css = (np.cumsum(s) - 1) / np.arange(1, len(y) + 1)
    rho = np.max(np.where(s > css)[0])
    return np.maximum(y - css[rho], 0)


@pytest.mark.parametrize("interleaved", [True, False])
def test_simplex(interleaved):
    rng = np.random.RandomState(3)
    count, dim = 50, 8
    n = count * dim
    x0 = rng.randn(n) * 2
    p = ProxElemIndSimplex(index=0, size=n, count=count, dim=dim,
                           interleaved=interleaved)
    got = run_prox(p, x0)
    if interleaved:
        vecs = x0.reshape(count, dim)
        res = got.reshape(count, dim)
    else:
        vecs = x0.reshape(dim, count).T
        res = got.reshape(dim, count).T
    for i in range(count):
        np.testing.assert_allclose(res[i], projsplx(vecs[i]), atol=1e-5)


def test_ind_sum_elemop():
    rng = np.random.RandomState(4)
    count, dim = 30, 5
    n = count * dim
    x0 = rng.randn(n)
    p = ProxElemIndSum(index=0, size=n, count=count, dim=dim, interleaved=True)
    got = run_prox(p, x0).reshape(count, dim)
    np.testing.assert_allclose(got.sum(axis=1), 1.0, atol=1e-5)
    # projection onto affine set: x - (sum-1)/d
    v = x0.reshape(count, dim)
    want = v - (v.sum(axis=1, keepdims=True) - 1) / dim
    np.testing.assert_allclose(got, want, atol=1e-5)


# ---------------------------------------------------------------- standalone

def test_soc_projection():
    rng = np.random.RandomState(5)
    count, dim = 40, 4
    n = count * dim
    x0 = rng.randn(n) * 2
    p = ProxIndSOC(index=0, size=n, count=count, dim=dim)
    got = run_prox(p, x0).reshape(dim, count)
    v = x0.reshape(dim, count)
    for i in range(count):
        x, y = v[: dim - 1, i], v[dim - 1, i]
        nx = np.linalg.norm(x)
        if nx <= y:
            want_x, want_y = x, y
        elif nx <= -y:
            want_x, want_y = 0 * x, 0.0
        else:
            f = (y + nx) / (2 * nx)
            want_x, want_y = f * x, f * nx
        np.testing.assert_allclose(got[: dim - 1, i], want_x, atol=1e-5)
        np.testing.assert_allclose(got[dim - 1, i], want_y, atol=1e-5)


def test_soc_projection_general_alpha():
    """alpha != 1 (beyond the reference, which errors there): check the
    closed form against an SLSQP QP oracle per point."""
    from scipy.optimize import minimize

    rng = np.random.RandomState(15)
    count, dim = 12, 3
    n = count * dim
    x0 = rng.randn(n) * 2
    for alpha in (0.5, 2.0):
        p = ProxIndSOC(index=0, size=n, count=count, dim=dim, alpha=alpha)
        got = run_prox(p, x0).reshape(dim, count)
        v = x0.reshape(dim, count)
        for i in range(count):
            z0 = v[:, i]
            res = minimize(
                lambda z: 0.5 * np.sum((z - z0) ** 2), np.array([0, 0, 1.0]),
                constraints=[{"type": "ineq",
                              "fun": lambda z: z[dim - 1]
                              - alpha * np.linalg.norm(z[: dim - 1])}],
                method="SLSQP", options={"maxiter": 200, "ftol": 1e-14})
            np.testing.assert_allclose(got[:, i], res.x, atol=2e-4)


def test_halfspace_projection():
    rng = np.random.RandomState(6)
    count, dim = 30, 3
    n = count * dim
    x0 = rng.randn(n) * 2
    a = rng.randn(dim)
    b = 0.5
    p = ProxIndHalfspace(index=0, size=n, count=count, dim=dim,
                         a=jnp.asarray(a), b=jnp.asarray([b]))
    got = run_prox(p, x0).reshape(dim, count)
    v = x0.reshape(dim, count)
    for i in range(count):
        x = v[:, i]
        if a @ x <= b:
            want = x
        else:
            want = x - (a @ x - b) / (a @ a) * a
        np.testing.assert_allclose(got[:, i], want, atol=1e-5)
        assert a @ got[:, i] <= b + 1e-4


def test_epi_quad_projection():
    rng = np.random.RandomState(7)
    count, dim = 25, 3  # 2 x-components + y
    n = count * dim
    x0 = rng.randn(n) * 2
    a, c = 0.8, 0.1
    b = rng.randn(dim - 1)
    p = ProxIndEpiQuad(
        index=0, size=n, count=count, dim=dim,
        a=jnp.asarray([a]), b=jnp.asarray(np.repeat(b, count)),  # planar layout
        c=jnp.asarray([c]),
    )
    got = run_prox(p, x0).reshape(dim, count)
    v = x0.reshape(dim, count)
    for i in range(count):
        x, y = got[: dim - 1, i], got[dim - 1, i]
        # feasibility
        assert y >= a * x @ x + b @ x + c - 1e-4
        # projection property: if inside, unchanged
        x_in, y_in = v[: dim - 1, i], v[dim - 1, i]
        if y_in >= a * x_in @ x_in + b @ x_in + c:
            np.testing.assert_allclose(got[:, i], v[:, i], atol=1e-5)
        else:
            # optimality: projected point minimizes distance on a grid probe
            d_got = np.sum((x - x_in) ** 2) + (y - y_in) ** 2
            for _ in range(200):
                xt = x + rng.randn(dim - 1) * 0.05
                yt = a * xt @ xt + b @ xt + c
                d_t = np.sum((xt - x_in) ** 2) + (yt - y_in) ** 2
                assert d_got <= d_t + 1e-3


def test_ind_sum_standalone_weighted():
    rng = np.random.RandomState(8)
    size = 40
    x0 = rng.randn(size)
    taus = rng.rand(size) + 0.5
    inds = np.arange(0, 20).reshape(4, 5)  # 4 groups of 5
    p = ProxIndSum(index=0, size=size, count=4, dim=5, sum_target=1.0,
                   inds=jnp.asarray(inds))
    got = run_prox(p, x0, tau_diag=taus)
    # untouched indices unchanged
    np.testing.assert_allclose(got[20:], x0[20:], atol=1e-6)
    for g in range(4):
        ii = inds[g]
        np.testing.assert_allclose(got[ii].sum(), 1.0, atol=1e-5)
        # tau-weighted: res = arg - tau * corr
        corr = (x0[ii].sum() - 1) / taus[ii].sum()
        np.testing.assert_allclose(got[ii], x0[ii] - taus[ii] * corr, atol=1e-5)


def test_ind_range():
    rng = np.random.RandomState(9)
    size, k = 30, 5
    A = rng.randn(size, k)
    x0 = rng.randn(size)
    p = ProxIndRange.create(0, size, A)
    got = run_prox(p, x0)
    want = A @ np.linalg.solve(A.T @ A, A.T @ x0)
    np.testing.assert_allclose(got, want, atol=1e-4)


def test_ind_range_sparse_matches_dense():
    """Sparse A (the reference's contract, ind_range.m: 'A must be a
    sparse matrix') stays sparse (BCOO matvecs around the dense k x k
    Cholesky) and matches the dense path; precomputed AA honored."""
    import scipy.sparse as ssp
    from jax.experimental import sparse as jsparse

    rng = np.random.RandomState(10)
    size, k = 40, 6
    As = ssp.random(size, k, density=0.3, random_state=rng, format="csr")
    As = As + ssp.random(size, k, density=0.05, random_state=rng) * 2.0
    Ad = np.asarray(As.todense())
    # ensure full column rank
    Ad[:k] += np.eye(k)
    As = ssp.csr_matrix(Ad * (Ad != 0))
    Ad = np.asarray(As.todense())
    x0 = rng.randn(size)

    p_dense = ProxIndRange.create(0, size, Ad)
    p_sparse = ProxIndRange.create(0, size, As)
    assert isinstance(p_sparse.A, jsparse.BCOO)  # NOT densified
    got_d = run_prox(p_dense, x0)
    got_s = run_prox(p_sparse, x0)
    np.testing.assert_allclose(got_s, got_d, atol=1e-5)

    # precomputed AA (the reference requires it; here optional)
    p_aa = ProxIndRange.create(0, size, As, AA=(As.T @ As).todense())
    np.testing.assert_allclose(run_prox(p_aa, x0), got_d, atol=1e-5)

    # wire round trip keeps the sparse representation
    from prost_tpu.modeling import wire
    import json

    spec = wire.to_prox_spec(p_sparse)
    assert "A_sparse" in spec["data"]
    q = wire.from_prox_spec(json.loads(json.dumps(spec)))
    assert isinstance(q.A, jsparse.BCOO)
    np.testing.assert_allclose(run_prox(q, x0), got_d, atol=1e-5)


# ---------------------------------------------------------------- properties

@pytest.mark.parametrize("seed", range(5))
def test_moreau_involution(seed):
    """conjugate(conjugate(prox)) == prox on random sum_1d instances
    (test_prox_conjugate.m)."""
    rng = np.random.RandomState(seed)
    n = 64
    coeffs = tuple(rng.rand(7) + 0.2)
    inner = ProxElem1D(index=0, size=n, fun="square", coeffs=coeffs)
    double = ProxMoreau(index=0, size=n,
                        child=ProxMoreau(index=0, size=n, child=inner))
    x0 = rng.randn(n) * 2
    taus = rng.rand(n) + 0.5
    np.testing.assert_allclose(
        run_prox(inner, x0, tau_diag=taus, tau_scal=0.8),
        run_prox(double, x0, tau_diag=taus, tau_scal=0.8),
        atol=1e-4,
    )


def test_transform_matches_coeffs():
    """transform(sum_1d(f), a..e) == sum_1d(f, a..e)
    (test_prox_transform.m pattern)."""
    rng = np.random.RandomState(11)
    n = 48
    a, b, c, d, e = 1.3, 0.2, 1.7, 0.5, 0.6
    base = ProxElem1D(index=0, size=n, fun="abs", coeffs=COEFFS_ID)
    trans = ProxTransform(index=0, size=n, child=base, a=a, b=b, c=c, d=d, e=e)
    direct = ProxElem1D(index=0, size=n, fun="abs",
                        coeffs=(a, b, c, d, e, 0.0, 0.0))
    x0 = rng.randn(n) * 2
    taus = rng.rand(n) + 0.5
    np.testing.assert_allclose(
        run_prox(trans, x0, tau_diag=taus, tau_scal=0.7),
        run_prox(direct, x0, tau_diag=taus, tau_scal=0.7),
        atol=1e-4,
    )


def test_permute_conjugation():
    """prox of f(Px) == P^{-1} prox_f(P x) (test_prox_permute.m)."""
    rng = np.random.RandomState(12)
    n = 32
    perm = rng.permutation(n)
    inner = ProxElem1D(index=0, size=n, fun="abs",
                       coeffs=(1.0, rng.randn(n).astype(np.float32),
                               1.0, 0.0, 0.0, 0.0, 0.0))
    p = ProxPermute(index=0, size=n, child=inner, perm=jnp.asarray(perm))
    x0 = rng.randn(n)
    taus = rng.rand(n) + 0.5
    got = run_prox(p, x0, tau_diag=taus)
    want = np.empty(n)
    inner_res = run_prox(inner, x0[perm], tau_diag=taus[perm])
    want[perm] = inner_res  # scatter: res[perm[i]] = inner[i]? no —
    # gather semantics: (Px)_i = x_{perm_i}; result un-permuted
    want = np.empty(n)
    want[perm] = np.arange(n)  # placeholder; recompute directly:
    inv = np.argsort(perm)
    want = inner_res[inv]
    np.testing.assert_allclose(got, want, atol=1e-5)


def test_prox_zero_identity():
    x0 = np.random.RandomState(13).randn(20)
    p = ProxZero(index=0, size=20)
    np.testing.assert_allclose(run_prox(p, x0), x0)


def test_nonexpansiveness():
    """All convex proxes are 1-Lipschitz: ||prox(x)-prox(y)|| <= ||x-y||."""
    rng = np.random.RandomState(14)
    n = 60
    protos = [
        ProxElem1D(index=0, size=n, fun="abs", coeffs=COEFFS_ID),
        ProxElem1D(index=0, size=n, fun="huber",
                   coeffs=(1.0, 0.0, 1.0, 0.0, 0.0, 0.4, 0.0)),
        ProxElemNorm2(index=0, size=n, count=n // 3, dim=3,
                      interleaved=True, fun="abs", coeffs=COEFFS_ID),
        ProxElemIndSimplex(index=0, size=n, count=n // 3, dim=3,
                           interleaved=True),
    ]
    for p in protos:
        x = rng.randn(n) * 2
        y = x + rng.randn(n) * 0.1
        px = run_prox(p, x, tau_scal=0.8)
        py = run_prox(p, y, tau_scal=0.8)
        assert np.linalg.norm(px - py) <= np.linalg.norm(x - y) * (1 + 1e-5)


def test_lq_plus_eps_oracle():
    """prox of (|z|+beta)^alpha vs grid minimization (the reference stubs
    this function out, function_1d.hpp:293-306 — we implement it)."""
    from prost_tpu.prox.fun1d import fun_lq_plus_eps

    rng = np.random.RandomState(0)
    for alpha, beta in [(1.5, 0.3), (2.0, 0.1), (1.0, 0.5)]:
        x0 = rng.randn(20) * 3
        tau = 0.7
        z = np.linspace(-10, 10, 100001)
        got = np.asarray(fun_lq_plus_eps(jnp.asarray(x0), tau, alpha, beta))
        for i in range(20):
            en = (z - x0[i]) ** 2 / (2 * tau) + (np.abs(z) + beta) ** alpha
            zopt = z[np.argmin(en)]
            assert abs(got[i] - zopt) < 5e-3


def test_conjugate_transform_shift_identity():
    """conjugate(f(. - b)) == transform(conjugate(f); d=b): the conjugate
    shifting formula (test_prox_conj_trans.m), 10 random seeds."""
    from prost_tpu.modeling import function as fn
    import prost_tpu as pt

    for seed in range(10):
        rng = np.random.RandomState(seed)
        N = 200
        b = rng.rand(N)
        y = rng.rand(N)
        tau = float(rng.rand())
        Tau = rng.rand(N)

        x1, _ = pt.eval_prox(
            fn.conjugate(fn.sum_1d("abs", 1, b, 1, 0, 0)), y, tau, Tau)
        x2, _ = pt.eval_prox(
            fn.transform(fn.conjugate(fn.sum_1d("abs", 1, 0, 1, 0, 0)),
                         1, 0, 1, b, 0), y, tau, Tau)
        np.testing.assert_allclose(x1, x2, atol=1e-5)
