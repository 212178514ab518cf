"""Fused Pallas ADMM chunk (ops/fused_admm.py) vs the generic ADMM path.

Runs in Pallas interpreter mode on CPU; the real-TPU path is exercised by
bench.py --all.
"""

import numpy as np
import pytest

import prost_tpu as pt
from prost_tpu.backend.admm import ADMMOptions, BackendADMM
from prost_tpu.linop import BlockGradient2D, LinearOperator
from prost_tpu.ops import FusedROFADMM
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


def _opts(**kw):
    kw.setdefault("verbose", False)
    kw.setdefault("tol_rel_primal", 0.0)
    kw.setdefault("tol_rel_dual", 0.0)
    kw.setdefault("tol_abs_primal", 0.0)
    kw.setdefault("tol_abs_dual", 0.0)
    return pt.SolverOptions(**kw)


@pytest.mark.parametrize("residual_iter", [1, 7, 10])
def test_fused_admm_matches_generic(residual_iter):
    nx = ny = 16
    rng = np.random.RandomState(3)
    f = rng.rand(nx * ny).astype(np.float32)
    prob = rof_problem(nx, ny, f, 8.0)
    aopts = ADMMOptions(residual_iter=residual_iter)

    gen = BackendADMM(prob, aopts, _opts())
    gs = gen.run(gen.initial_state(), 40)

    fus = FusedROFADMM(prob, aopts, _opts(), interpret=True)
    assert fus.rof is not None
    fs = fus.run(fus.initial_state(), 40)

    assert int(fs.iteration) == int(gs.iteration) == 40
    # The fused kernel evaluates prox_f analytically (shrinkage) where the
    # generic path evaluates a double Moreau wrap; agreement is to f32
    # arithmetic, not bitwise.
    np.testing.assert_allclose(np.asarray(fs.x_half), np.asarray(gs.x_half),
                               atol=5e-5)
    np.testing.assert_allclose(np.asarray(fs.z_half), np.asarray(gs.z_half),
                               atol=5e-5)
    np.testing.assert_allclose(np.asarray(fs.cg_warm),
                               np.asarray(gs.cg_warm), atol=5e-4)
    np.testing.assert_allclose(float(fs.rho), float(gs.rho), rtol=1e-6)
    np.testing.assert_allclose(
        float(fs.primal_residual), float(gs.primal_residual), rtol=1e-3)
    for a, b in zip(fus.current_solution(fs), gen.current_solution(gs)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=2e-3)


def test_fused_admm_rho_adaptation_engages():
    """With real tolerances the Boyd rho adaptation fires; fused and
    generic must adapt identically."""
    nx = ny = 12
    rng = np.random.RandomState(5)
    f = rng.rand(nx * ny).astype(np.float32)
    prob = rof_problem(nx, ny, f, 4.0)
    aopts = ADMMOptions(residual_iter=5)
    sopts = _opts(tol_rel_primal=1e-2, tol_rel_dual=1e-2,
                  tol_abs_primal=1e-3, tol_abs_dual=1e-3)

    gen = BackendADMM(prob, aopts, sopts)
    gs = gen.run(gen.initial_state(), 50)
    fus = FusedROFADMM(prob, aopts, sopts, interpret=True)
    fs = fus.run(fus.initial_state(), 50)
    assert float(gs.rho) != pytest.approx(1.0)  # adaptation engaged
    np.testing.assert_allclose(float(fs.rho), float(gs.rho), rtol=1e-6)
    np.testing.assert_allclose(np.asarray(fs.x_half), np.asarray(gs.x_half),
                               atol=1e-4)


def test_fused_admm_full_solve_converges():
    nx = ny = 16
    rng = np.random.RandomState(6)
    f = rng.rand(nx * ny).astype(np.float32)
    prob = rof_problem(nx, ny, f, 8.0)
    aopts = ADMMOptions(residual_iter=10)
    sopts = _opts(max_iters=3000, tol_rel_primal=1e-4, tol_rel_dual=1e-4,
                  tol_abs_primal=1e-4, tol_abs_dual=1e-4)
    solver = pt.Solver(
        prob, lambda p, o: FusedROFADMM(p, aopts, o, interpret=True), sopts)
    res = solver.solve()
    assert res.result == pt.ConvergenceResult.CONVERGED
    # energy close to the PDHG solution of the same problem
    pd = pt.Solver(
        prob, lambda p, o: pt.backend_pdhg().create(p, o), sopts).solve()

    def energy(u):
        u2 = np.asarray(u).reshape(nx, ny)
        gx = np.diff(u2, axis=0, append=u2[-1:, :])
        gy = np.diff(u2, axis=1, append=u2[:, -1:])
        tv = np.sqrt(gx**2 + gy**2).sum()
        return 8.0 / 2 * ((np.asarray(u).ravel() - f) ** 2).sum() + tv

    e_admm = energy(res.x)
    e_pdhg = energy(pd.x)
    assert abs(e_admm - e_pdhg) < 5e-3 * abs(e_pdhg)


# ---------------------------------------------------------------------------
# Chebyshev projection (the band-local inner solver for large planes)
# ---------------------------------------------------------------------------

def test_generic_cheby_matches_cgls_solution():
    """projection='cheby' (fixed-coefficient, dot-product-free) and the
    reference CGLS are different inexact solvers of the SAME kappa<=2 SPD
    system; at degree 10 both sit at the f32 floor, so the ADMM
    trajectories agree to f32 arithmetic."""
    nx, ny = 32, 24
    rng = np.random.RandomState(11)
    f = rng.rand(nx * ny).astype(np.float32)
    prob = rof_problem(nx, ny, f, 8.0)
    g1 = BackendADMM(prob, ADMMOptions(residual_iter=10), _opts())
    s1 = g1.run(g1.initial_state(), 60)
    g2 = BackendADMM(prob, ADMMOptions(residual_iter=10,
                                       projection="cheby"), _opts())
    s2 = g2.run(g2.initial_state(), 60)
    np.testing.assert_allclose(np.asarray(s1.x_half), np.asarray(s2.x_half),
                               atol=2e-5)
    np.testing.assert_allclose(float(s1.rho), float(s2.rho), rtol=1e-6)


def test_fused_cheby_matches_generic_cheby():
    nx, ny = 48, 32
    rng = np.random.RandomState(12)
    f = rng.rand(nx * ny).astype(np.float32)
    prob = rof_problem(nx, ny, f, 8.0)
    aopts = ADMMOptions(residual_iter=7, projection="cheby")
    gen = BackendADMM(prob, aopts, _opts())
    gs = gen.run(gen.initial_state(), 35)
    fus = FusedROFADMM(prob, aopts, _opts(), interpret=True)
    assert fus.mode == "cheby"
    fs = fus.run(fus.initial_state(), 35)
    np.testing.assert_allclose(np.asarray(fs.x_half), np.asarray(gs.x_half),
                               atol=5e-5)
    np.testing.assert_allclose(np.asarray(fs.cg_warm),
                               np.asarray(gs.cg_warm), atol=5e-4)


@pytest.mark.parametrize("n_bands", [2, 4])
def test_banded_admm_matches_whole_plane(n_bands):
    """The banded per-iteration Chebyshev kernel must reproduce the
    whole-plane fused Chebyshev run (same algebra, different tiling)."""
    nx, ny = 128, 32
    rng = np.random.RandomState(13)
    f = rng.rand(nx * ny).astype(np.float32)
    prob = rof_problem(nx, ny, f, 8.0)
    aopts = ADMMOptions(residual_iter=10, projection="cheby")

    whole = FusedROFADMM(prob, aopts, _opts(), interpret=True)
    assert whole.mode == "cheby"
    ws = whole.run(whole.initial_state(), 40)

    for db in (False, True):  # single- and double-buffered banded runs
        band = FusedROFADMM(prob, aopts, _opts(), interpret=True)
        band.mode = "banded"                  # force the banded path
        band.rof["n_bands"] = n_bands
        band.rof["double_buffer"] = db
        bs = band.run(band.initial_state(), 40)

        assert int(bs.iteration) == int(ws.iteration) == 40
        np.testing.assert_allclose(np.asarray(bs.x_half),
                                   np.asarray(ws.x_half), atol=2e-6)
        np.testing.assert_allclose(np.asarray(bs.z_half),
                                   np.asarray(ws.z_half), atol=2e-6)
        np.testing.assert_allclose(float(bs.primal_residual),
                                   float(ws.primal_residual), rtol=1e-4)
        np.testing.assert_allclose(float(bs.rho), float(ws.rho), rtol=1e-6)


def test_banded_kernel_unit_vs_whole_chunk():
    """One banded launch == one whole-plane cheby chunk iteration,
    including the owned-row norm split."""
    from prost_tpu.ops.fused_admm import admm_banded_iter, admm_fused_chunk

    nx, ny = 128, 32
    rng = np.random.RandomState(14)

    def plane(*lead):
        return jnp_asarray(0.3 * rng.randn(*lead, nx, ny))

    import jax.numpy as jnp

    def jnp_asarray(a):
        return jnp.asarray(a, jnp.float32)

    xh, xp, xd, warm = plane(), plane(), plane(), plane()
    zh, zp, zd = plane(2), plane(2), plane(2)

    # clean dead dual coordinates (fused canonicalization; enforced by
    # the run glue for warm starts)
    def _cl(z):
        return z.at[0, -1, :].set(0.0).at[1, :, -1].set(0.0)

    zh, zp, zd = _cl(zh), _cl(zp), _cl(zd)
    f = jnp_asarray(rng.rand(nx, ny))
    w = jnp_asarray(np.ones((nx, ny)))
    rho = jnp_asarray(np.float32(1.3))
    tols = jnp_asarray(np.full(1, 1e-9))
    ref = admm_fused_chunk(xh, xp, xd, zh, zp, zd, warm, f, w, rho, 8.0,
                           0.5, tols, 1, 10, 1.7, interpret=True,
                           cheby_degree=10)
    ban = admm_banded_iter(xh, xp, xd, zh, zp, zd, warm, f, w, rho, 8.0,
                           0.5, 4, 10, 1.7, interpret=True)
    for i, (a, b) in enumerate(zip(ref[:7], ban[:7])):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-6,
                                   err_msg=f"out[{i}]")
    np.testing.assert_allclose(np.asarray(ref[7]), np.asarray(ban[7]),
                               rtol=1e-5)
    # the double-buffered variant (cross-grid-step DMA pipelining) must
    # match the whole-plane iteration too, at several band counts
    for nb in (2, 4):
        db = admm_banded_iter(xh, xp, xd, zh, zp, zd, warm, f, w, rho,
                              8.0, 0.5, nb, 10, 1.7, interpret=True,
                              double_buffer=True)
        for i, (a, b) in enumerate(zip(ref[:7], db[:7])):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       atol=1e-6,
                                       err_msg=f"db nb{nb} out[{i}]")
        np.testing.assert_allclose(np.asarray(ref[7]), np.asarray(db[7]),
                                   rtol=1e-5)


def test_admm_band_count():
    from prost_tpu.ops.fused_admm import admm_band_count, admm_cheby_halo_rows

    assert admm_cheby_halo_rows(10) == 24
    nb = admm_band_count(2048, 2048, 10)
    assert nb is not None and 2048 % nb == 0
    rows = 2048 // nb
    assert rows % 8 == 0 and rows >= 24
    # tiny plane has no banding need but a valid tiling must still exist
    assert admm_band_count(4096, 4096, 10) is not None
    # pathological: nx with no 8-divisible split above the halo
    assert admm_band_count(40, 64, 10) is None


def test_auto_projection_routes_large_to_banded():
    """projection='auto' resolves to the Chebyshev whole-plane kernel
    (measured 2.5x faster than CGLS) at small sizes and banded cheby
    above the VMEM cap; explicit 'cgls' keeps the reference algebra."""
    nx, ny = 32, 24
    rng = np.random.RandomState(15)
    f = rng.rand(nx * ny).astype(np.float32)
    prob = rof_problem(nx, ny, f, 8.0)
    fus = FusedROFADMM(prob, ADMMOptions(), _opts(), interpret=True)
    assert fus.mode == "cheby"
    fus = FusedROFADMM(prob, ADMMOptions(projection="cgls"), _opts(),
                       interpret=True)
    assert fus.mode == "cgls"

    from prost_tpu.ops import fused_admm as fa
    from prost_tpu.ops.fused_rof import fits_vmem
    assert not fits_vmem(2048, 2048)
    assert fa.admm_band_count(2048, 2048, 10) is not None


def test_admm_multichunk_in_kernel_adaptation_matches_generic():
    """Phase B0 (multi-chunk launches with IN-KERNEL Boyd rho-adaptation
    incl. the dual-variable rescale, fused_admm.admm_fused_multichunk)
    must follow the launch-per-chunk trajectory exactly; nonzero
    tolerances make the adaptation fire, and a loose-tolerance run checks
    that convergence inside a launch stops at the generic iteration."""
    nx = ny = 24
    rng = np.random.RandomState(2)
    f = rng.rand(nx * ny).astype(np.float32)
    prob = rof_problem(nx, ny, f, 16.0)
    aopts = ADMMOptions(residual_iter=5, projection="cheby",
                        cheby_degree=10)

    def sopts(t):
        return pt.SolverOptions(verbose=False, tol_rel_primal=t,
                                tol_rel_dual=t, tol_abs_primal=t,
                                tol_abs_dual=t)

    gen = BackendADMM(prob, aopts, sopts(1e-5))
    gs = gen.run(gen.initial_state(), 200)  # > _K_CHUNKS * ri = 40
    fus = FusedROFADMM(prob, aopts, sopts(1e-5), interpret=True)
    assert fus.mode == "cheby"
    fs = fus.run(fus.initial_state(), 200)
    assert int(fs.iteration) == int(gs.iteration) == 200
    np.testing.assert_allclose(np.asarray(fs.x_half), np.asarray(gs.x_half),
                               atol=2e-5)
    np.testing.assert_allclose(float(fs.rho), float(gs.rho), rtol=1e-6)
    np.testing.assert_allclose(
        float(fs.primal_residual), float(gs.primal_residual), rtol=1e-3)

    gen = BackendADMM(prob, aopts, sopts(3e-4))
    gs = gen.run(gen.initial_state(), 10000)
    fus = FusedROFADMM(prob, aopts, sopts(3e-4), interpret=True)
    fs = fus.run(fus.initial_state(), 10000)
    assert bool(fs.converged) and bool(gs.converged)
    assert int(fs.iteration) == int(gs.iteration)
    np.testing.assert_allclose(np.asarray(fs.x_half), np.asarray(gs.x_half),
                               atol=2e-4)


def test_banded_chunk_kernel_vs_whole_chunk():
    """The chunked banded kernel (admm_banded_chunk: grid = (ri, bands),
    in-place ping-pong slots, z_proj dropped from the DMA'd state) must
    bit-match the whole-plane cheby chunk on every tiling, including the
    n_bands=2 pipeline-drain path and both ping-pong parities."""
    import jax.numpy as jnp

    from prost_tpu.ops.fused_admm import admm_banded_chunk, admm_fused_chunk

    rng = np.random.RandomState(16)
    nx, ny = 128, 32
    xh = jnp.asarray(0.3 * rng.randn(nx, ny), jnp.float32)
    xp_, xd, warm = xh + 0.1, xh * 0.5, xh * 0.2
    zh = jnp.asarray(0.3 * rng.randn(2, nx, ny), jnp.float32)
    zh = zh.at[0, -1, :].set(0.0).at[1, :, -1].set(0.0)  # dead duals
    zd = zh * 0.1
    f = jnp.asarray(rng.rand(nx, ny), jnp.float32)
    w = jnp.ones_like(f)
    rho = jnp.asarray(1.0, jnp.float32)
    ri = 3  # odd count exercises the non-zero final parity slot

    # whole-plane reference needs z_proj consistent with the invariant
    # z_proj == grad(x_proj)
    ii = jnp.arange(nx)[:, None] < nx - 1
    jj = jnp.arange(ny)[None, :] < ny - 1
    zp_ = jnp.stack([jnp.where(ii, jnp.roll(xp_, -1, 0) - xp_, 0.0),
                     jnp.where(jj, jnp.roll(xp_, -1, 1) - xp_, 0.0)])
    tols = jnp.full((int(ri),), 1e-9, jnp.float32)
    ref = admm_fused_chunk(xh, xp_, xd, zh, zp_, zd, warm, f, w, rho,
                           16.0, 0.5, tols, int(ri), 10, 1.7,
                           interpret=True, cheby_degree=10)
    exp = [ref[0], ref[1], ref[2], ref[3], ref[5], ref[6]]

    def dbl(a):
        return jnp.zeros((2,) + a.shape, a.dtype).at[0].set(a)

    for nb, db in ((2, True), (4, True), (4, False)):
        outs = admm_banded_chunk(
            dbl(xh), dbl(xp_), dbl(xd), dbl(zh), dbl(zd), dbl(warm), f, w,
            0, rho, jnp.asarray(1.0), 16.0, 0.5, int(ri), nb, 10, 1.7,
            interpret=True, double_buffer=db)
        slot = int(ri) % 2
        for nm, g, e in zip(["xh", "xp", "xd", "zh", "zd", "warm"],
                            [o[slot] for o in outs[:6]], exp):
            np.testing.assert_allclose(np.asarray(g), np.asarray(e),
                                       atol=1e-6,
                                       err_msg=f"nb={nb} db={db} {nm}")
        np.testing.assert_allclose(np.asarray(outs[6]), np.asarray(ref[7]),
                                   rtol=1e-4)


def test_banded_run_rho_adaptation_matches_whole_plane():
    """End-to-end banded run with NONZERO tolerances: the Boyd
    rho-adaptation (run outside the kernel on the in-kernel norms) and
    its dual rescale (folded into the next chunk as the pending ``fac``)
    must reproduce the whole-plane trajectory."""
    nx, ny = 128, 32
    rng = np.random.RandomState(17)
    f = rng.rand(nx * ny).astype(np.float32)
    prob = rof_problem(nx, ny, f, 8.0)
    aopts = ADMMOptions(residual_iter=5, projection="cheby")
    t = 1e-3  # rho adapts twice and the run converges mid-phase-B
    sopts = pt.SolverOptions(verbose=False, tol_rel_primal=t,
                             tol_rel_dual=t, tol_abs_primal=t,
                             tol_abs_dual=t)

    whole = FusedROFADMM(prob, aopts, sopts, interpret=True)
    assert whole.mode == "cheby"
    ws = whole.run(whole.initial_state(), 100)

    band = FusedROFADMM(prob, aopts, sopts, interpret=True)
    band.mode = "banded"
    band.rof["n_bands"] = 4
    band.rof["double_buffer"] = True
    bs = band.run(band.initial_state(), 100)

    assert int(bs.iteration) == int(ws.iteration)
    assert float(ws.rho) != 1.0  # adaptation actually fired
    np.testing.assert_allclose(float(bs.rho), float(ws.rho), rtol=1e-6)
    np.testing.assert_allclose(np.asarray(bs.x_half),
                               np.asarray(ws.x_half), atol=2e-5)
    np.testing.assert_allclose(np.asarray(bs.x_dual),
                               np.asarray(ws.x_dual), atol=2e-5)
    np.testing.assert_allclose(np.asarray(bs.z_proj),
                               np.asarray(ws.z_proj), atol=2e-5)
