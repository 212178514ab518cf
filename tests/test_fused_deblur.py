"""Fused Pallas deblurring iteration (ops/fused_deblur.py) vs the generic
PDHG path.

Runs in Pallas interpreter mode on CPU; the real-TPU path is exercised by
bench.py.  Problem construction mirrors examples/example_deblurring.py
(conv block + gradient block via MinProblem).
"""

import numpy as np
import jax.numpy as jnp
import pytest

import prost_tpu as pt
from prost_tpu import block, function
from prost_tpu.backend import BackendPDHG, PDHGOptions
from prost_tpu.ops import FusedROFPDHG, match_deblur_structure


def _kernel(k=5):
    """Small motion-ish blur kernel with an asymmetric support."""
    ker = np.zeros((k, k))
    for i in range(k):
        ker[i, i] = 1.0
    ker[0, k - 1] = 0.5
    return ker / ker.sum()


def deblur_problem(nx, ny, lmb=50.0, seed=0, k=5):
    rng = np.random.RandomState(seed)
    f = rng.rand(nx * ny)

    kernel = _kernel(k)
    ny2, nx2 = ny + k - 1, nx + k - 1

    u = pt.Variable(nx * ny)
    v = pt.Variable(nx2 * ny2)
    g = pt.Variable(2 * nx * ny)
    prob = pt.MinProblem([u], [v, g])
    f_blurred = rng.rand(nx2 * ny2)
    prob.add_function(v, function.sum_1d("square", 1, f_blurred, lmb))
    prob.add_function(g, function.sum_norm2(2, False, "abs"))
    prob.add_constraint(u, v, block.conv2d(nx, ny, 1, kernel))
    prob.add_constraint(u, g, block.gradient2d(nx, ny, 1))
    return prob.finalize(), f_blurred


def _opts():
    return pt.SolverOptions(verbose=False, tol_rel_primal=0, tol_rel_dual=0,
                            tol_abs_primal=0, tol_abs_dual=0)


def test_match_deblur_structure():
    prob, f_blurred = deblur_problem(16, 16, lmb=25.0)
    b = BackendPDHG(prob, PDHGOptions(scale_steps_operator=False), _opts())
    m = match_deblur_structure(prob, b.prox_g, b.prox_fstar)
    assert m is not None
    assert m["nx"] == 16 and m["nx2"] == 20 and m["lmb"] == 25.0
    assert m["radius"] == 1.0
    np.testing.assert_allclose(np.asarray(m["fb"]).ravel(),
                               f_blurred.astype(np.float32))
    # gradient-row Sigma = 1/2, Tau = 1/(sum|k| + 4) = 1/5
    assert m["sig_q"] == pytest.approx(0.5)
    assert m["tau_t"] == pytest.approx(0.2, rel=1e-5)
    # conv-row Sigma plane: interior 1/sum|k| = 1, smaller than the
    # boundary values (fewer taps -> smaller row sums -> larger Sigma)
    sv = np.asarray(m["sv"])
    assert sv[10, 10] == pytest.approx(1.0, rel=1e-5)
    assert sv.max() >= sv[10, 10]


def test_no_match_on_wrong_structure():
    # plain ROF (no conv block) must not match the deblur kernel
    from prost_tpu.linop import BlockGradient2D, LinearOperator
    from prost_tpu.prox import ProxElem1D, ProxElemNorm2, ProxMoreau

    n = 16 * 16
    f = np.random.RandomState(1).rand(n).astype(np.float32)
    grad = BlockGradient2D(row=0, col=0, nx=16, ny=16, L=1)
    prox_g = [ProxElem1D(index=0, size=n, fun="square",
                         coeffs=(1.0, f, 8.0, 0.0, 0.0, 0.0, 0.0))]
    pn = ProxElemNorm2(index=0, size=2 * n, count=n, dim=2, interleaved=False,
                       fun="abs", coeffs=(1.0, 0.0, 1.0, 0.0, 0.0, 0.0, 0.0))
    prob = pt.Problem.create(
        LinearOperator.create([grad]), prox_g=prox_g,
        prox_fstar=[ProxMoreau(index=0, size=2 * n, child=pn)])
    b = BackendPDHG(prob, PDHGOptions(scale_steps_operator=False), _opts())
    assert match_deblur_structure(prob, b.prox_g, b.prox_fstar) is None


@pytest.mark.parametrize("residual_iter", [1, 7, 10])
def test_fused_deblur_matches_generic(residual_iter):
    nx = ny = 20
    prob, _ = deblur_problem(nx, ny, lmb=40.0, seed=2)
    popts = PDHGOptions(stepsize="boyd", residual_iter=residual_iter,
                        scale_steps_operator=False)

    gen = BackendPDHG(prob, popts, _opts())
    gs = gen.run(gen.initial_state(), 60)

    fus = FusedROFPDHG(prob, popts, _opts(), interpret=True)
    assert fus.deblur is not None
    fs = fus.run(fus.initial_state(), 60)

    assert int(fs.iteration) == int(gs.iteration) == 60
    np.testing.assert_allclose(np.asarray(fs.x), np.asarray(gs.x), atol=3e-5)
    np.testing.assert_allclose(np.asarray(fs.y), np.asarray(gs.y), atol=3e-5)
    np.testing.assert_allclose(float(fs.tau), float(gs.tau), rtol=1e-6)
    np.testing.assert_allclose(
        float(fs.primal_residual), float(gs.primal_residual), rtol=1e-3)
    np.testing.assert_allclose(
        float(fs.dual_residual), float(gs.dual_residual), rtol=1e-3)


def test_fused_deblur_full_solve_converges():
    prob, _ = deblur_problem(16, 16, lmb=30.0, seed=3)
    popts = PDHGOptions(stepsize="boyd", residual_iter=10,
                        scale_steps_operator=False)
    sopts = pt.SolverOptions(max_iters=6000, verbose=False,
                             tol_rel_primal=1e-5, tol_rel_dual=1e-5,
                             tol_abs_primal=1e-5, tol_abs_dual=1e-5)
    solver = pt.Solver(
        prob, lambda p, o: FusedROFPDHG(p, popts, o, interpret=True), sopts)
    res = solver.solve()
    assert res.result == pt.ConvergenceResult.CONVERGED


@pytest.mark.parametrize("n_bands", [2, 3])
def test_deblur_tiled_chunk_bit_equal_to_whole_plane(n_bands):
    """Row-band tiled deblur chunk == whole-plane chunk on owned rows.
    The conv taps widen the halo (deblur_halo_rows); nx2 need not divide
    n_bands (n_bands=3 exercises the shorter last band)."""
    from prost_tpu.ops.fused_deblur import (deblur_fused_chunk,
                                            deblur_fused_chunk_tiled,
                                            match_deblur_structure)

    nx, ny, k = 28, 12, 3
    prob, _ = deblur_problem(nx, ny, lmb=25.0, seed=2, k=k)
    b = BackendPDHG(prob, PDHGOptions(scale_steps_operator=False), _opts())
    m = match_deblur_structure(prob, b.prox_g, b.prox_fstar)
    assert m is not None
    nx2, ny2 = m["nx2"], m["ny2"]
    ri = 2
    rng = np.random.RandomState(12)

    def emb(a):
        out = np.zeros(a.shape[:-2] + (nx2, ny2), np.float32)
        out[..., :nx, :ny] = a
        return jnp.asarray(out)

    x = emb(rng.rand(nx, ny).astype(np.float32))
    q = emb(0.2 * rng.randn(2, nx, ny).astype(np.float32))
    yv = jnp.asarray(0.1 * rng.randn(nx2, ny2), jnp.float32)
    args = (0.9, 1.1, 1.0, m["lmb"], m["radius"])

    ref = deblur_fused_chunk(x, yv, q, m["fb"], m["sv"], *args, ri,
                             nx, ny, m["taps"], m["sig_q"], m["tau_t"],
                             interpret=True)
    til = deblur_fused_chunk_tiled(x, yv, q, m["fb"], m["sv"], *args, ri,
                                   nx, ny, m["taps"], m["sig_q"],
                                   m["tau_t"], n_bands, interpret=True)
    for a, b_ in zip(ref[:6], til[:6]):
        # ulp-level: interpret-mode XLA contracts FMAs differently for
        # the band shapes (observed max 1 ulp on 1/420 elements)
        np.testing.assert_allclose(np.asarray(a), np.asarray(b_),
                                   atol=1e-6, rtol=1e-6)
    np.testing.assert_allclose(np.asarray(ref[6]), np.asarray(til[6]),
                               rtol=1e-5, atol=1e-10)


@pytest.mark.parametrize("n_bands", [2, 3])
def test_deblur_banded_chunk_matches_whole_plane(n_bands):
    """Single-launch grid-banded deblur kernel (manual HBM DMAs with
    zero-filled domain-edge halos) == whole-plane kernel.  nx=46 makes
    nx2=48 split into 8-multiple rows for both band counts."""
    from prost_tpu.ops.fused_deblur import (deblur_banded_ok,
                                            deblur_fused_chunk,
                                            deblur_fused_chunk_banded,
                                            match_deblur_structure)

    nx, ny, k = 46, 12, 3
    prob, _ = deblur_problem(nx, ny, lmb=25.0, seed=2, k=k)
    b = BackendPDHG(prob, PDHGOptions(scale_steps_operator=False), _opts())
    m = match_deblur_structure(prob, b.prox_g, b.prox_fstar)
    assert m is not None
    nx2, ny2 = m["nx2"], m["ny2"]
    assert deblur_banded_ok(nx2, n_bands)
    ri = 2
    rng = np.random.RandomState(13)

    def emb(a):
        out = np.zeros(a.shape[:-2] + (nx2, ny2), np.float32)
        out[..., :nx, :ny] = a
        return jnp.asarray(out)

    x = emb(rng.rand(nx, ny).astype(np.float32))
    q = emb(0.2 * rng.randn(2, nx, ny).astype(np.float32))
    yv = jnp.asarray(0.1 * rng.randn(nx2, ny2), jnp.float32)
    args = (0.9, 1.1, 1.0, m["lmb"], m["radius"])

    ref = deblur_fused_chunk(x, yv, q, m["fb"], m["sv"], *args, ri,
                             nx, ny, m["taps"], m["sig_q"], m["tau_t"],
                             interpret=True)
    ban = deblur_fused_chunk_banded(x, yv, q, m["fb"], m["sv"], *args, ri,
                                    nx, ny, m["taps"], m["sig_q"],
                                    m["tau_t"], n_bands, interpret=True)
    for a, b_ in zip(ref[:6], ban[:6]):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b_),
                                   atol=1e-6, rtol=1e-6)
    np.testing.assert_allclose(np.asarray(ref[6]), np.asarray(ban[6]),
                               rtol=1e-5, atol=1e-10)


def test_deblur_tiled_end_to_end_matches_generic():
    prob, _ = deblur_problem(20, 12, lmb=25.0, seed=3, k=3)
    popts = PDHGOptions(stepsize="boyd", residual_iter=2,
                        scale_steps_operator=False)
    gen = BackendPDHG(prob, popts, _opts())
    gs = gen.run(gen.initial_state(), 21)

    fus = FusedROFPDHG(prob, popts, _opts(), interpret=True)
    assert fus.deblur is not None
    fus.deblur["n_bands"] = 2  # force the tiled path
    fs = fus.run(fus.initial_state(), 21)
    np.testing.assert_allclose(np.asarray(fs.x), np.asarray(gs.x), atol=2e-5)
    np.testing.assert_allclose(np.asarray(fs.y), np.asarray(gs.y), atol=2e-5)
    np.testing.assert_allclose(float(fs.tau), float(gs.tau), rtol=1e-6)


@pytest.mark.parametrize("n_shards", [2, 4])
def test_sharded_fused_deblur_matches_generic(n_shards):
    from prost_tpu.parallel import ShardedFusedDeblur, make_mesh

    # nx2 = nx + 2; 4 shards need rows >= halo 12 -> nx2 = 64
    nx = {2: 30, 4: 62}[n_shards]
    prob, _ = deblur_problem(nx, 12, lmb=25.0, seed=4, k=3)
    popts = PDHGOptions(stepsize="boyd", residual_iter=2,
                        scale_steps_operator=False)
    gen = BackendPDHG(prob, popts, _opts())
    gs = gen.run(gen.initial_state(), 21)

    mesh = make_mesh((n_shards,), axis_names=("sp",))
    sh = ShardedFusedDeblur(prob, popts, _opts(), mesh, interpret=True)
    assert sh.halo == (2 * 2 + 2) * 2
    ss = sh.run(sh.initial_state(), 21)

    assert int(ss.iteration) == int(gs.iteration) == 21
    np.testing.assert_allclose(np.asarray(ss.x), np.asarray(gs.x), atol=2e-5)
    np.testing.assert_allclose(np.asarray(ss.y), np.asarray(gs.y), atol=2e-5)
    np.testing.assert_allclose(float(ss.tau), float(gs.tau), rtol=1e-6)


@pytest.mark.parametrize("n_bands", [2, 4])
def test_deblur_banded_double_buffer_matches_whole(n_bands):
    """The double-buffered banded deblur kernel (inlined conditional
    pipeline: edge bands zero-fill + fetch valid rows, interior bands
    full windows) must match the whole-plane kernel."""
    nx = ny = 122
    k = 7
    nx2 = ny2 = nx + k - 1  # 128: nb=2 -> 64 rows, nb=4 -> 32 >= halo 24
    taps = tuple((dx, dy, 1.0 / (16 * (1 + dx + dy)))
                 for dx in range(0, k, 2) for dy in range(0, k, 2))
    rng = np.random.RandomState(27)

    def emb(a):
        out = np.zeros(a.shape[:-2] + (nx2, ny2), np.float32)
        out[..., :nx, :ny] = a
        return jnp.asarray(out)

    x = emb(rng.rand(nx, ny).astype(np.float32))
    q = emb(0.2 * rng.randn(2, nx, ny).astype(np.float32))
    yv = jnp.asarray(0.1 * rng.randn(nx2, ny2), jnp.float32)
    fb = jnp.asarray(rng.rand(nx2, ny2), jnp.float32)
    sv = jnp.asarray(0.5 + rng.rand(nx2, ny2), jnp.float32)
    from prost_tpu.ops.fused_deblur import (deblur_fused_chunk,
                                            deblur_fused_chunk_banded)

    # ri=1 keeps the conv-reach halo (8-rounded 24) within 32-row bands
    args = (0.9, 1.1, 1.0, 25.0, 0.5, 1, nx, ny, taps, 0.5, 0.2)
    ref = deblur_fused_chunk(x, yv, q, fb, sv, *args, interpret=True)
    db = deblur_fused_chunk_banded(x, yv, q, fb, sv, *args, n_bands,
                                   interpret=True, double_buffer=True)
    for i, (a, b) in enumerate(zip(ref[:6], db[:6])):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=3e-7, rtol=3e-7,
                                   err_msg=f"out[{i}]")
    np.testing.assert_allclose(np.asarray(ref[6]), np.asarray(db[6]),
                               rtol=1e-5, atol=1e-10)
