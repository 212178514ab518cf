"""Fused Pallas ROF iteration (ops/fused_rof.py) vs the generic PDHG path.

Runs in Pallas interpreter mode on CPU; the real-TPU path is exercised by
bench.py.
"""

import numpy as np
import jax.numpy as jnp
import pytest

import prost_tpu as pt
from prost_tpu.backend import BackendPDHG, PDHGOptions
from prost_tpu.linop import BlockGradient2D, LinearOperator
from prost_tpu.ops import FusedROFPDHG, match_rof_structure
from prost_tpu.prox import ProxElem1D, ProxElemNorm2, ProxMoreau


def rof_problem(nx, ny, f, lmb):
    n = nx * ny
    grad = BlockGradient2D(row=0, col=0, nx=nx, ny=ny, L=1)
    prox_g = [ProxElem1D(index=0, size=n, fun="square",
                         coeffs=(1.0, f.astype(np.float32), lmb,
                                 0.0, 0.0, 0.0, 0.0))]
    pn = ProxElemNorm2(index=0, size=2 * n, count=n, dim=2, interleaved=False,
                       fun="abs", coeffs=(1.0, 0.0, 1.0, 0.0, 0.0, 0.0, 0.0))
    return pt.Problem.create(
        LinearOperator.create([grad]), prox_g=prox_g,
        prox_fstar=[ProxMoreau(index=0, size=2 * n, child=pn)],
    )


def _opts():
    return pt.SolverOptions(verbose=False, tol_rel_primal=0, tol_rel_dual=0,
                            tol_abs_primal=0, tol_abs_dual=0)


def test_match_rof_structure():
    f = np.random.RandomState(0).rand(16 * 16).astype(np.float32)
    prob = rof_problem(16, 16, f, 8.0)
    m = match_rof_structure(prob)
    assert m is not None
    assert m["nx"] == 16 and m["lmb"] == 8.0
    np.testing.assert_allclose(np.asarray(m["f"]).ravel(), f)


def _tv_problem(nx, ny, data_fun, data_coeffs, fstar_direct=None):
    n = nx * ny
    grad = BlockGradient2D(row=0, col=0, nx=nx, ny=ny, L=1)
    prox_g = [ProxElem1D(index=0, size=n, fun=data_fun, coeffs=data_coeffs)]
    if fstar_direct is None:
        pn = ProxElemNorm2(index=0, size=2 * n, count=n, dim=2,
                           interleaved=False, fun="abs",
                           coeffs=(1.0, 0.0, 1.0, 0.0, 0.0, 0.0, 0.0))
        prox_fstar = [ProxMoreau(index=0, size=2 * n, child=pn)]
    else:
        prox_fstar = [fstar_direct]
    return pt.Problem.create(
        LinearOperator.create([grad]), prox_g=prox_g, prox_fstar=prox_fstar)


def test_match_tvl1_and_wsquare_structures():
    nx = ny = 8
    n = nx * ny
    rng = np.random.RandomState(1)
    f = rng.rand(n).astype(np.float32)
    # TV-L1: abs data term, dual ball via direct norm2 ind_leq0
    ball = ProxElemNorm2(index=0, size=2 * n, count=n, dim=2,
                         interleaved=False, fun="ind_leq0",
                         coeffs=(2.0, 1.0, 1.0, 0.0, 0.0, 0.0, 0.0))
    m = match_rof_structure(
        _tv_problem(nx, ny, "abs", (1.0, f, 1.5, 0.0, 0.0, 0.0, 0.0),
                    fstar_direct=ball))
    assert m is not None and m["dataterm"] == "abs"
    assert m["radius"] == pytest.approx(0.5)  # b/a = 1/2

    # inpainting: masked square (a = mask)
    mask = (rng.rand(n) > 0.3).astype(np.float32)
    m2 = match_rof_structure(
        _tv_problem(nx, ny, "square",
                    (mask, f * mask, 7.0, 0.0, 0.0, 0.0, 0.0)))
    assert m2 is not None and m2["dataterm"] == "wsquare"
    np.testing.assert_allclose(np.asarray(m2["w"]).ravel(), mask**2)

    # huber data term: genuinely unsupported -> no match
    assert match_rof_structure(
        _tv_problem(nx, ny, "huber", (1.0, f, 1.0, 0.0, 0.0, 0.5, 0.0))
    ) is None


@pytest.mark.parametrize("data_fun,coeffs", [
    ("abs", "tvl1"),
    ("square", "masked"),
])
def test_fused_tvl1_inpaint_match_generic(data_fun, coeffs):
    nx = ny = 24
    n = nx * ny
    rng = np.random.RandomState(7)
    f = rng.rand(n).astype(np.float32)
    if coeffs == "tvl1":
        cf = (1.0, f, 1.0, 0.0, 0.0, 0.0, 0.0)
    else:
        mask = (rng.rand(n) > 0.4).astype(np.float32)
        cf = (mask, f * mask, 7.0, 0.0, 0.0, 0.0, 0.0)
    prob = _tv_problem(nx, ny, data_fun, cf)
    popts = PDHGOptions(stepsize="boyd", residual_iter=10,
                        scale_steps_operator=False)

    gen = BackendPDHG(prob, popts, _opts())
    gs = gen.run(gen.initial_state(), 60)
    fus = FusedROFPDHG(prob, popts, _opts(), interpret=True)
    assert fus.rof is not None
    fs = fus.run(fus.initial_state(), 60)
    np.testing.assert_allclose(np.asarray(fs.x), np.asarray(gs.x), atol=2e-5)
    np.testing.assert_allclose(np.asarray(fs.y), np.asarray(gs.y), atol=2e-5)


@pytest.mark.parametrize("residual_iter", [1, 7, 10])
def test_fused_matches_generic(residual_iter):
    nx = ny = 24
    rng = np.random.RandomState(2)
    f = rng.rand(nx * ny).astype(np.float32)
    prob = rof_problem(nx, ny, f, 16.0)
    popts = PDHGOptions(stepsize="boyd", residual_iter=residual_iter,
                        scale_steps_operator=False)

    gen = BackendPDHG(prob, popts, _opts())
    gs = gen.run(gen.initial_state(), 60)

    fus = FusedROFPDHG(prob, popts, _opts(), interpret=True)
    assert fus.rof is not None
    fs = fus.run(fus.initial_state(), 60)

    assert int(fs.iteration) == int(gs.iteration) == 60
    np.testing.assert_allclose(np.asarray(fs.x), np.asarray(gs.x), atol=2e-5)
    np.testing.assert_allclose(np.asarray(fs.y), np.asarray(gs.y), atol=2e-5)
    np.testing.assert_allclose(float(fs.tau), float(gs.tau), rtol=1e-6)
    np.testing.assert_allclose(
        float(fs.primal_residual), float(gs.primal_residual), rtol=1e-3)


def test_fused_full_solve_converges():
    nx = ny = 24
    rng = np.random.RandomState(3)
    f = rng.rand(nx * ny).astype(np.float32)
    prob = rof_problem(nx, ny, f, 8.0)
    popts = PDHGOptions(stepsize="boyd", residual_iter=10,
                        scale_steps_operator=False)
    sopts = pt.SolverOptions(max_iters=3000, verbose=False,
                             tol_rel_primal=1e-6, tol_rel_dual=1e-6,
                             tol_abs_primal=1e-6, tol_abs_dual=1e-6)
    solver = pt.Solver(
        prob, lambda p, o: FusedROFPDHG(p, popts, o, interpret=True), sopts)
    res = solver.solve()
    assert res.result == pt.ConvergenceResult.CONVERGED


def test_band_count_geometry():
    from prost_tpu.ops.fused_rof import band_count

    assert band_count(512, 512, 10) == 1          # whole plane fits
    nb = band_count(2048, 2048, 10)               # needs tiling
    assert nb is not None and nb > 1 and 2048 % nb == 0
    rows = 2048 // nb
    assert rows >= 2 * 10 + 2                     # bands taller than halo
    # one extended band fits the budget (20 live planes)
    assert (rows + 2 * 22) * 2048 * 4 * 20 <= 96 * 1024 * 1024
    assert band_count(4096, 4096, 10) is not None
    # pathological: rows would be thinner than the halo -> no tiling
    assert band_count(64, 600000, 10) is None


@pytest.mark.parametrize("n_bands", [2, 4])
def test_tiled_chunk_bit_equal_to_whole_plane(n_bands):
    """Row-band tiled chunk == whole-plane chunk, bit-for-bit on owned
    rows (same math as the sharded halo equivalence)."""
    from prost_tpu.ops.fused_rof import rof_fused_chunk, rof_fused_chunk_tiled

    nx = ny = 64
    ri = 6
    rng = np.random.RandomState(5)
    x = jnp.asarray(rng.rand(nx, ny), jnp.float32)
    q = jnp.asarray(0.3 * rng.randn(2, nx, ny), jnp.float32)
    # clean dead dual coordinates (the fused kernels' documented
    # canonicalization; run-level glue enforces it for warm starts)
    q = q.at[0, -1, :].set(0.0).at[1, :, -1].set(0.0)
    f = jnp.asarray(rng.rand(nx, ny), jnp.float32)
    w = f
    args = (0.9, 1.1, 1.0, 8.0, 1.0)  # tau, sigma, theta, lmb, radius

    ref = rof_fused_chunk(x, q, f, w, *args, ri, interpret=True)
    til = rof_fused_chunk_tiled(x, q, f, w, *args, ri, n_bands,
                                interpret=True)
    for a, b in zip(ref[:4], til[:4]):
        # owned rows match to <= 1 ulp (interpret-mode XLA may compile
        # the ball projection's rsqrt differently for band shapes)
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=3e-7, rtol=3e-7)
    # norms: per-band partial sums reduce in a different order than the
    # whole-plane reduction -> f32 rounding only
    np.testing.assert_allclose(np.asarray(ref[4]), np.asarray(til[4]),
                               rtol=1e-5, atol=1e-10)


@pytest.mark.parametrize("n_bands", [2, 4, 8])
def test_banded_chunk_matches_whole_plane(n_bands):
    """The single-launch grid-banded kernel (manual HBM->VMEM halo DMAs,
    blocked owned-row outputs) == the whole-plane kernel to <= 1 ulp."""
    from prost_tpu.ops.fused_rof import (rof_fused_chunk,
                                         rof_fused_chunk_banded)

    nx = ny = 64
    ri = 6
    rng = np.random.RandomState(15)
    x = jnp.asarray(rng.rand(nx, ny), jnp.float32)
    q = jnp.asarray(0.3 * rng.randn(2, nx, ny), jnp.float32)
    # clean dead dual coordinates (fused canonicalization)
    q = q.at[0, -1, :].set(0.0).at[1, :, -1].set(0.0)
    f = jnp.asarray(rng.rand(nx, ny), jnp.float32)
    args = (0.9, 1.1, 1.0, 8.0, 1.0)

    ref = rof_fused_chunk(x, q, f, f, *args, ri, interpret=True)
    ban = rof_fused_chunk_banded(x, q, f, f, *args, ri, n_bands,
                                 interpret=True)
    for a, b in zip(ref[:4], ban[:4]):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=3e-7, rtol=3e-7)
    np.testing.assert_allclose(np.asarray(ref[4]), np.asarray(ban[4]),
                               rtol=1e-5, atol=1e-10)


def test_tiled_end_to_end_matches_generic():
    """FusedROFPDHG with the tiled kernel forced (n_bands=4) follows the
    generic trajectory exactly, including residuals/adaptation.  nx must
    give 8-aligned band rows (the banded kernel's DMA constraint)."""
    nx = ny = 64
    rng = np.random.RandomState(6)
    f = rng.rand(nx * ny).astype(np.float32)
    prob = rof_problem(nx, ny, f, 16.0)
    popts = PDHGOptions(stepsize="boyd", residual_iter=5,
                        scale_steps_operator=False)

    gen = BackendPDHG(prob, popts, _opts())
    gs = gen.run(gen.initial_state(), 40)

    fus = FusedROFPDHG(prob, popts, _opts(), interpret=True)
    assert fus.rof is not None
    fus.rof["n_bands"] = 4  # force the tiled path on a small plane
    fs = fus.run(fus.initial_state(), 40)

    np.testing.assert_allclose(np.asarray(fs.x), np.asarray(gs.x), atol=2e-5)
    np.testing.assert_allclose(np.asarray(fs.y), np.asarray(gs.y), atol=2e-5)
    np.testing.assert_allclose(float(fs.tau), float(gs.tau), rtol=1e-6)


def test_cpu_without_interpret_falls_back():
    f = np.random.RandomState(4).rand(16 * 16).astype(np.float32)
    prob = rof_problem(16, 16, f, 8.0)
    b = FusedROFPDHG(prob, PDHGOptions(scale_steps_operator=False), _opts())
    assert b.rof is None  # CPU, no interpret -> generic path
    s = b.run(b.initial_state(), 10)
    assert int(s.iteration) == 10


def test_banded_double_buffer_matches_whole():
    """The double-buffered banded kernel (cross-grid-step DMA pipelining)
    must match the whole-plane chunk on owned rows."""
    from prost_tpu.ops.fused_rof import (rof_fused_chunk,
                                         rof_fused_chunk_banded)

    rng = np.random.RandomState(31)
    nx, ny = 128, 32
    x = jnp.asarray(rng.rand(nx, ny), jnp.float32)
    q = jnp.asarray(0.1 * rng.randn(2, nx, ny), jnp.float32)
    # clean dead dual coordinates (the fused kernels' documented
    # canonicalization; run-level glue enforces it for warm starts)
    q = q.at[0, -1, :].set(0.0).at[1, :, -1].set(0.0)
    f = jnp.asarray(rng.rand(nx, ny), jnp.float32)
    w = jnp.ones_like(x)
    args = (0.9, 1.1, 1.0, 16.0, 0.5, 10)
    ref = rof_fused_chunk(x, q, f, w, *args, interpret=True)
    for nb in (2, 4):
        db = rof_fused_chunk_banded(x, q, f, w, *args, nb, interpret=True,
                                    double_buffer=True)
        for i, (a, b) in enumerate(zip(ref[:4], db[:4])):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       atol=1e-6, err_msg=f"nb{nb} out{i}")
        np.testing.assert_allclose(np.asarray(ref[4]), np.asarray(db[4]),
                                   rtol=1e-5)


@pytest.mark.parametrize("stepsize", ["boyd", "goldstein", "alg1"])
def test_multichunk_in_kernel_adaptation_matches_generic(stepsize):
    """Phase B0 (multi-chunk launches with IN-KERNEL boyd/goldstein
    adaptation and convergence test, fused_rof.rof_fused_multichunk) must
    follow the launch-per-chunk trajectory exactly: same iterates, same
    adapted step sizes, same stopping iteration.  Nonzero tolerances make
    the adaptation branches actually fire."""
    nx = ny = 24
    rng = np.random.RandomState(2)
    f = rng.rand(nx * ny).astype(np.float32)
    prob = rof_problem(nx, ny, f, 16.0)
    popts = PDHGOptions(stepsize=stepsize, residual_iter=5,
                        scale_steps_operator=False)
    t = 1e-5
    sopts = pt.SolverOptions(verbose=False, tol_rel_primal=t, tol_rel_dual=t,
                             tol_abs_primal=t, tol_abs_dual=t)

    gen = BackendPDHG(prob, popts, sopts)
    gs = gen.run(gen.initial_state(), 200)  # > _K_CHUNKS * ri = 40
    fus = FusedROFPDHG(prob, popts, sopts, interpret=True)
    assert fus.rof is not None and fus.rof["n_bands"] == 1
    fs = fus.run(fus.initial_state(), 200)

    assert int(fs.iteration) == int(gs.iteration)
    assert bool(fs.converged) == bool(gs.converged)
    np.testing.assert_allclose(np.asarray(fs.x), np.asarray(gs.x), atol=2e-5)
    np.testing.assert_allclose(np.asarray(fs.y), np.asarray(gs.y), atol=2e-5)
    np.testing.assert_allclose(float(fs.tau), float(gs.tau), rtol=1e-6)
    np.testing.assert_allclose(float(fs.sigma), float(gs.sigma), rtol=1e-6)
    np.testing.assert_allclose(
        float(fs.primal_residual), float(gs.primal_residual), rtol=1e-3)


def test_multichunk_convergence_mid_launch():
    """Convergence inside a multi-chunk launch must stop at the SAME
    iteration as the generic path (post-convergence chunks are branched
    around in-kernel), and current_solution must see the matching
    x_prev/y_prev pair."""
    nx = ny = 24
    rng = np.random.RandomState(2)
    f = rng.rand(nx * ny).astype(np.float32)
    prob = rof_problem(nx, ny, f, 16.0)
    popts = PDHGOptions(stepsize="boyd", residual_iter=5,
                        scale_steps_operator=False)
    t = 2e-4
    sopts = pt.SolverOptions(verbose=False, tol_rel_primal=t, tol_rel_dual=t,
                             tol_abs_primal=t, tol_abs_dual=t)

    gen = BackendPDHG(prob, popts, sopts)
    gs = gen.run(gen.initial_state(), 10000)
    fus = FusedROFPDHG(prob, popts, sopts, interpret=True)
    fs = fus.run(fus.initial_state(), 10000)

    assert bool(fs.converged) and bool(gs.converged)
    assert int(fs.iteration) == int(gs.iteration)
    np.testing.assert_allclose(np.asarray(fs.x), np.asarray(gs.x), atol=2e-5)
    for a, b in zip(fus.current_solution(fs), gen.current_solution(gs)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=5e-4)


def test_banded_multichunk_matches_generic():
    """Phase B0-banded (multi-chunk banded launches: grid = (K, bands),
    in-place ping-pong slots, in-kernel adaptation on SMEM scratch) must
    follow the generic trajectory, including mid-launch convergence with
    an odd executed-chunk count (final state in slot 1)."""
    nx, ny = 96, 24
    rng = np.random.RandomState(2)
    f = rng.rand(nx * ny).astype(np.float32)
    prob = rof_problem(nx, ny, f, 16.0)
    popts = PDHGOptions(stepsize="boyd", residual_iter=4,
                        scale_steps_operator=False)

    def sopts(t):
        return pt.SolverOptions(verbose=False, tol_rel_primal=t,
                                tol_rel_dual=t, tol_abs_primal=t,
                                tol_abs_dual=t)

    gen = BackendPDHG(prob, popts, sopts(1e-5))
    gs = gen.run(gen.initial_state(), 140)
    fus = FusedROFPDHG(prob, popts, sopts(1e-5), interpret=True)
    fus.rof["n_bands"] = 4          # force the banded multichunk path
    fus.rof["double_buffer"] = True
    fs = fus.run(fus.initial_state(), 140)
    assert int(fs.iteration) == int(gs.iteration) == 140
    np.testing.assert_allclose(np.asarray(fs.x), np.asarray(gs.x),
                               atol=2e-5)
    np.testing.assert_allclose(np.asarray(fs.y), np.asarray(gs.y),
                               atol=2e-5)
    np.testing.assert_allclose(float(fs.tau), float(gs.tau), rtol=1e-6)

    gen = BackendPDHG(prob, popts, sopts(4e-4))
    gs = gen.run(gen.initial_state(), 10000)
    fus = FusedROFPDHG(prob, popts, sopts(4e-4), interpret=True)
    fus.rof["n_bands"] = 4
    fus.rof["double_buffer"] = True
    fs = fus.run(fus.initial_state(), 10000)
    assert bool(fs.converged) == bool(gs.converged)
    assert int(fs.iteration) == int(gs.iteration)
    np.testing.assert_allclose(np.asarray(fs.x), np.asarray(gs.x),
                               atol=2e-4)


def test_dirty_dual_warm_start_is_canonicalized():
    """The fused path's ONLY documented trajectory deviation from the
    generic path: a user warm start carrying mass on the DEAD dual
    coordinates (q_x's last row / q_y's last column multiply
    structurally-zero rows of K) is projected off them once per run —
    the maskless adjoint stencils require the zero-boundary invariant
    (fused_rof._project_dead_dual).  The generic path instead lets the
    dead mass decay multiplicatively.  Pin both behaviors: (a) clean
    warm starts still match the generic path exactly, (b) a dirty warm
    start converges to the same solution (the dead coordinates never
    enter K^T y, so the primal trajectory difference vanishes)."""
    nx = ny = 16
    n = nx * ny
    rng = np.random.RandomState(17)
    f = rng.rand(n).astype(np.float32)
    opts = PDHGOptions(stepsize="boyd", residual_iter=5,
                       scale_steps_operator=False)
    sopts = pt.SolverOptions(verbose=False, tol_rel_primal=0,
                             tol_rel_dual=0, tol_abs_primal=0,
                             tol_abs_dual=0)

    y0 = 0.1 * rng.randn(2 * n).astype(np.float32)
    # make it dirty exactly on the dead coordinates
    y0_planes = y0.reshape(2, nx, ny).copy()
    y0_planes[0, -1, :] = 1.0
    y0_planes[1, :, -1] = -1.0
    dirty = y0_planes.reshape(-1)

    def run(backend_cls, y0v, iters):
        prob = rof_problem(nx, ny, f, 16.0)
        kw = {"interpret": True} if backend_cls is FusedROFPDHG else {}
        b = backend_cls(prob, opts, sopts, **kw)
        s = b.initial_state()
        import dataclasses
        s = dataclasses.replace(s, y=jnp.asarray(y0v))
        return b.run(s, iters)

    # (a) clean warm start: fused == generic bitwise on the iterate
    clean = np.where(
        (np.arange(2 * n).reshape(2, nx, ny) >= 0), y0_planes, 0.0)
    clean[0, -1, :] = 0.0
    clean[1, :, -1] = 0.0
    clean = clean.reshape(-1)
    fs = run(FusedROFPDHG, clean, 26)
    gs = run(BackendPDHG, clean, 26)
    np.testing.assert_allclose(np.asarray(fs.x), np.asarray(gs.x),
                               atol=1e-6)

    # (b) dirty warm start: x-trajectories agree (dead coords never touch
    # K^T y); the fused run zeroes the dead dual coords, the generic one
    # decays them — solutions coincide
    fd = run(FusedROFPDHG, dirty, 1001)
    gd = run(BackendPDHG, dirty, 1001)
    np.testing.assert_allclose(np.asarray(fd.x), np.asarray(gd.x),
                               atol=5e-4)
    q = np.asarray(fd.y).reshape(2, nx, ny)
    assert np.all(q[0, -1, :] == 0.0) and np.all(q[1, :, -1] == 0.0)
