"""Oracle tests for the spectral proxes (eigen / singular / mass norm),
mirroring the reference's MATLAB tests (test_prox_sum_eigen_*.m etc.) with
numpy as the oracle instead of MATLAB's eig/svd.
"""

import numpy as np
import jax.numpy as jnp
import pytest

from prost_tpu.prox.spectral import (
    ProxElemEigen2x2,
    ProxElemEigenNxN,
    ProxElemMassNorm,
    ProxElemSingularNx2,
)

COEFFS_ID = (1.0, 0.0, 1.0, 0.0, 0.0, 0.0, 0.0)


def scalar_prox_oracle(fun, x, tau):
    if fun == "abs":
        return np.sign(x) * np.maximum(np.abs(x) - tau, 0.0)
    if fun == "square":
        return x / (1.0 + tau)
    if fun == "ind_leq0":
        return np.minimum(x, 0.0)
    if fun == "ind_geq0":
        return np.maximum(x, 0.0)
    raise ValueError(fun)


@pytest.mark.parametrize("fun", ["abs", "square", "ind_geq0"])
def test_eigen_2x2(fun):
    rng = np.random.RandomState(0)
    count = 50
    mats = rng.randn(count, 2, 2).astype(np.float64)
    tau = 0.7

    seg = mats.reshape(count, 4).T.reshape(-1)  # planar layout
    p = ProxElemEigen2x2(index=0, size=4 * count, count=count,
                         interleaved=False, fun=fun, coeffs=COEFFS_ID)
    res = np.asarray(
        p.eval_local(jnp.asarray(seg), jnp.full(4 * count, 1.0), tau, False)
    )
    got = res.reshape(4, count).T.reshape(count, 2, 2)

    for i in range(count):
        sym = (mats[i] + mats[i].T) / 2
        w, v = np.linalg.eigh(sym)
        w = scalar_prox_oracle(fun, w, tau)
        want = v @ np.diag(w) @ v.T
        np.testing.assert_allclose(got[i], want, atol=1e-4)


@pytest.mark.parametrize("n", [3, 5, 8])
def test_eigen_nxn(n):
    rng = np.random.RandomState(1)
    count = 20
    mats = rng.randn(count, n, n).astype(np.float64)
    tau = 0.5
    dim = n * n

    seg = mats.reshape(count, dim).T.reshape(-1)
    p = ProxElemEigenNxN(index=0, size=dim * count, count=count, n=n,
                         interleaved=False, fun="abs", coeffs=COEFFS_ID)
    res = np.asarray(
        p.eval_local(jnp.asarray(seg), jnp.full(dim * count, 1.0), tau, False)
    )
    got = res.reshape(dim, count).T.reshape(count, n, n)

    for i in range(count):
        sym = (mats[i] + mats[i].T) / 2
        w, v = np.linalg.eigh(sym)
        w = scalar_prox_oracle("abs", w, tau)
        want = v @ np.diag(w) @ v.T
        np.testing.assert_allclose(got[i], want, atol=1e-4)


@pytest.mark.parametrize("fun,n", [("sum_1d:abs", 2), ("sum_1d:abs", 4),
                                   ("sum_1d:square", 3)])
def test_singular_nx2(fun, n):
    rng = np.random.RandomState(2)
    count = 40
    mats = rng.randn(count, n, 2).astype(np.float64)
    tau = 0.3
    dim = 2 * n

    # layout: two columns concatenated per vector, planar across count
    seg = np.concatenate(
        [mats[:, :, 0], mats[:, :, 1]], axis=1
    ).T.reshape(-1)
    p = ProxElemSingularNx2(index=0, size=dim * count, count=count, dim=dim,
                            interleaved=False, fun=fun, coeffs=COEFFS_ID)
    res = np.asarray(
        p.eval_local(jnp.asarray(seg), jnp.full(dim * count, 1.0), tau, False)
    )
    cols = res.reshape(dim, count).T  # (count, 2n)
    got = np.stack([cols[:, :n], cols[:, n:]], axis=2)

    base = fun.split(":")[1]
    for i in range(count):
        u, s, vt = np.linalg.svd(mats[i], full_matrices=False)
        sp = scalar_prox_oracle(base, s, tau)
        want = u @ np.diag(sp) @ vt
        np.testing.assert_allclose(got[i], want, atol=1e-4)


def test_singular_l1_ball_projection_is_idempotent():
    rng = np.random.RandomState(3)
    count, n = 30, 3
    dim = 2 * n
    mats = rng.randn(count, n, 2) * 2
    seg = np.concatenate([mats[:, :, 0], mats[:, :, 1]], axis=1).T.reshape(-1)
    # ind_l1_ball with alpha=1: nuclear-norm unit ball projection
    p = ProxElemSingularNx2(index=0, size=dim * count, count=count, dim=dim,
                            interleaved=False, fun="ind_l1_ball",
                            coeffs=(1.0, 0.0, 1.0, 0.0, 0.0, 1.0, 0.0))
    ones = jnp.full(dim * count, 1.0)
    r1 = p.eval_local(jnp.asarray(seg), ones, 1.0, False)
    r2 = p.eval_local(r1, ones, 1.0, False)
    # idempotent to float32 accuracy: rank-deficient A^T A loses ~sqrt(eps)
    # in the smin eigenpair (the reference computes in double in-kernel)
    np.testing.assert_allclose(np.asarray(r1), np.asarray(r2), atol=5e-4)
    # nuclear norm <= 1 after projection
    cols = np.asarray(r1).reshape(dim, count).T
    for i in range(count):
        m = np.stack([cols[i, :n], cols[i, n:]], axis=1)
        assert np.linalg.svd(m, compute_uv=False).sum() <= 1 + 1e-5


def _random_bivector(rng, n, count, s1, s2):
    """Build skew matrices with known plane weights via random rotations."""
    tri = ([(0, 1), (0, 2), (0, 3), (1, 2), (1, 3), (2, 3)] if n == 4 else
           [(0, 1), (0, 2), (0, 3), (0, 4), (1, 2), (1, 3), (1, 4),
            (2, 3), (2, 4), (3, 4)])
    Ms, comps = [], []
    for i in range(count):
        q, _ = np.linalg.qr(rng.randn(n, n))
        m = np.zeros((n, n))
        m[0, 1], m[1, 0] = s1[i], -s1[i]
        m[2, 3], m[3, 2] = s2[i], -s2[i]
        M = q @ m @ q.T
        Ms.append(M)
        comps.append([M[a, b] for a, b in tri])
    return np.array(Ms), np.array(comps)


@pytest.mark.parametrize("n", [4, 5])
def test_mass_norm_shrinks_plane_weights(n):
    rng = np.random.RandomState(4)
    count = 16
    dim = 6 if n == 4 else 10
    s1 = rng.rand(count) * 2 + 1.0  # in (1, 3)
    s2 = rng.rand(count) * 0.8     # in (0, 0.8)
    s1, s2 = np.maximum(s1, s2), np.minimum(s1, s2)
    Ms, comps = _random_bivector(rng, n, count, s1, s2)

    tau = 0.5
    seg = comps.T.reshape(-1)
    p = ProxElemMassNorm(index=0, size=dim * count, count=count, n=n,
                         interleaved=False, conjugate=False)
    res = np.asarray(
        p.eval_local(jnp.asarray(seg), jnp.full(dim * count, 1.0), tau, False)
    )
    got = res.reshape(dim, count).T

    # oracle: shrink each plane weight
    t1 = np.maximum(s1 - tau, 0.0)
    t2 = np.maximum(s2 - tau, 0.0)
    _, want = _random_bivector(rng, n, count, t1, t2)
    # can't reuse random rotations; rebuild with the same Ms' planes instead:
    # scale M's plane decomposition directly through eigen-structure: since
    # shrinkage acts per plane, got must equal the bivector rebuilt with the
    # shrunk weights *in the same planes*.  Verify via the singular values of
    # the skew matrix: sqrt of eigenvalues of M M^T.
    tri = ([(0, 1), (0, 2), (0, 3), (1, 2), (1, 3), (2, 3)] if n == 4 else
           [(0, 1), (0, 2), (0, 3), (0, 4), (1, 2), (1, 3), (1, 4),
            (2, 3), (2, 4), (3, 4)])
    for i in range(count):
        M = np.zeros((n, n))
        for k, (a, b) in enumerate(tri):
            M[a, b], M[b, a] = got[i, k], -got[i, k]
        sv = np.sqrt(np.maximum(np.linalg.eigvalsh(M @ M.T), 0))
        top = np.sort(sv)[::-1]
        np.testing.assert_allclose(
            np.sort([top[0], top[2]])[::-1], np.sort([t1[i], t2[i]])[::-1],
            atol=1e-4,
        )


@pytest.mark.parametrize("n", [4, 5])
def test_mass_comass_moreau_identity(n):
    """prox_{tau * mass}(x) == x - tau * P_comass(x / tau): the mass norm's
    conjugate is the comass-ball indicator, so the two implementations must
    satisfy Moreau's identity exactly."""
    rng = np.random.RandomState(5)
    count = 12
    dim = 6 if n == 4 else 10
    seg = rng.randn(dim * count) * 1.5
    tau = 0.8
    ones = jnp.full(dim * count, 1.0)

    mass = ProxElemMassNorm(index=0, size=dim * count, count=count, n=n,
                            interleaved=False, conjugate=False)
    comass = ProxElemMassNorm(index=0, size=dim * count, count=count, n=n,
                              interleaved=False, conjugate=True)

    lhs = np.asarray(mass.eval_local(jnp.asarray(seg), ones, tau, False))
    proj = np.asarray(
        comass.eval_local(jnp.asarray(seg / tau), ones, 1.0, False)
    )
    rhs = seg - tau * proj
    np.testing.assert_allclose(lhs, rhs, atol=1e-4)
