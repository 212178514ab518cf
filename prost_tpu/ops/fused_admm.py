"""Fused Pallas graph-projection ADMM for ROF-structured problems.

Same workload family as ops/fused_rof.py (single gradient2d operator,
square/weighted-square/abs data term, norm2 dual coupling — recognized by
the same ``match_rof_structure``), but solved with the ADMM backend
(BASELINE config 4): per outer iteration a CGLS graph projection onto
{(x, z): z = K~ x} followed by the two prox steps (backend_admm.cu:355-529).

TPU-first design, mirroring the fused PDHG chunk kernel:

* With the constant alpha preconditioners (Sigma = 1/2, Tau = 1/4) the
  scaled operator is a scalar multiple of the gradient:
  K~ = Sigma^{1/2} K Tau^{1/2} = (1/(2 sqrt 2)) grad — so the ENTIRE
  outer iteration INCLUDING the warm-started CGLS inner loop is stencils
  + pointwise + scalar reductions on VMEM-resident planes.  One kernel
  runs a whole residual_iter-sized chunk: the reference pays ~15 kernel
  launches + 2 cuBLAS/cuSPARSE calls per CG step per iteration; here HBM
  sees one load + one store of the 10 state planes per CHUNK.
* The CGLS while-loop becomes a masked fori_loop (fixed cg_max_iter trip
  count, updates predicated on the not-yet-converged flag), reproducing
  cgls_solve's stopping rule exactly; the per-outer-iteration tolerance
  schedule cg_tol_min/(it+1)^cg_tol_pow is precomputed into an SMEM
  vector outside the kernel.
* The four preconditioned residual norms of the chunk's last iteration
  (backend_admm.cu:535-630) reduce in-kernel to SMEM; Boyd rho-adaptation
  with its dual-variable rescale runs OUTSIDE on the returned scalars
  through the exact generic code (``admm_residual_adapt``), so fused and
  generic paths share stopping/adaptation semantics bit-for-bit in
  structure.  rho is constant within a chunk by construction (the
  reference adapts it only at residual iterations).

Large sizes (the whole-plane VMEM cap): CGLS cannot band — every CG step
takes two GLOBAL dot products (alpha, beta), so a row band computing with
local reductions would follow a different CG trajectory than the whole
plane.  But with the constant alpha preconditioner the projection solves

    (I + c_K^2 grad^T grad) u = rhs,   c_K^2 = Sigma*Tau = 1/8,

and the Neumann-Laplacian spectrum [0, 8) puts the operator's spectrum in
[1, 2): condition number <= 2.  A fixed-coefficient CHEBYSHEV iteration
on that interval converges at the same (sqrt(2)-1)/(sqrt(2)+1) = 0.172
per-step rate as CGLS — with ZERO dot products.  All coefficients are
compile-time constants, so the solve is pure stencils + pointwise:
band-local with a recompute halo, exactly like the PDHG banded kernels.
``_admm_banded_call`` runs ONE outer iteration per launch (grid over row
bands, manual halo-window DMAs, halo = 2*degree + 4 rows); cross-band
information exchange happens through HBM between launches.  Banded and
whole-plane Chebyshev paths are bit-equivalent on owned rows; Chebyshev
vs CGLS agree to the projection tolerance (both inexact solvers of the
same SPD system — the reference itself ships an inexact warm-started
CGLS, backend_admm.cu:408-441).  projection="auto" (the default) picks
CGLS whole-plane when the problem fits VMEM and banded Chebyshev when it
does not, so fused ADMM no longer has a size cliff.

Layout contract: x-like planes (nx, ny); z-like arrays (2, nx, ny).
"""

from __future__ import annotations

import dataclasses
from functools import partial

import jax
import jax.numpy as jnp
from jax import lax

from ..backend.admm import (ADMMState, BackendADMM, admm_residual_adapt,
                            admm_step)
from .fused_rof import (_K_CHUNKS, _VMEM_LIMIT, _SQRT_S, _SQRT_T,
                        _project_dead_dual, _shift_ops, fits_vmem,
                        match_rof_structure)

_C_K = _SQRT_S * _SQRT_T  # K~ = c_K * grad


def _cgls_masked(d_x, d_y, u0, tol, maxit: int, ops):
    """cgls_solve (backend/cgls.py) on A = c_K grad, shift = 1, as a
    fixed-trip-count masked loop: identical update/stopping algebra, with
    all post-convergence updates predicated away."""
    _dx, _dy, _dxt, _dyt = ops
    eps = jnp.finfo(d_x.dtype).eps

    def A(u):
        return _C_K * _dx(u), _C_K * _dy(u)

    def At(vx, vy):
        return _C_K * (_dxt(vx) + _dyt(vy))

    ax, ay = A(u0)
    rx, ry = d_x - ax, d_y - ay
    s = At(rx, ry) - u0
    p = s
    gamma0 = jnp.sum(s * s)
    norms0 = jnp.sqrt(gamma0)
    done0 = norms0 < eps

    def body(_, carry):
        x, rx, ry, p, gamma, done = carry
        qx, qy = A(p)
        delta = jnp.sum(qx * qx) + jnp.sum(qy * qy) + jnp.sum(p * p)
        delta = jnp.where(delta <= 0, eps, delta)
        alpha = gamma / delta
        x_n = x + alpha * p
        rx_n = rx - alpha * qx
        ry_n = ry - alpha * qy
        s = At(rx_n, ry_n) - x_n
        gamma_n = jnp.sum(s * s)
        beta = gamma_n / jnp.where(gamma > 0, gamma, 1.0)
        p_n = s + beta * p
        normx = jnp.sqrt(jnp.sum(x_n * x_n))
        conv = (jnp.sqrt(gamma_n) <= norms0 * tol) | (normx * tol >= 1.0)
        # predicate everything on the pre-step done flag
        keep = done
        return (
            jnp.where(keep, x, x_n),
            jnp.where(keep, rx, rx_n),
            jnp.where(keep, ry, ry_n),
            jnp.where(keep, p, p_n),
            jnp.where(keep, gamma, gamma_n),
            keep | conv,
        )

    x, *_ = lax.fori_loop(
        0, maxit, body, (u0, rx, ry, p, gamma0, done0))
    return x


# Chebyshev iteration constants for (I + c_K^2 grad^T grad) with the
# constant alpha preconditioner: spectrum in [1, 2) (Neumann Laplacian
# eigenvalues 4 sin^2 + 4 sin^2 in [0, 8), times c_K^2 = 1/8)
_CHEB_THETA = 1.5   # interval midpoint
_CHEB_DELTA = 0.5   # interval half-width
_CHEB_SIGMA1 = _CHEB_THETA / _CHEB_DELTA


def _cheby_project(d_x, d_y, u0, degree: int, ops):
    """Solve min ||A u - d||^2 + ||u||^2 (A = c_K grad) by ``degree`` steps
    of the classical Chebyshev iteration on the normal equations
    (I + A^T A) u = A^T d, warm-started from u0.  All coefficients are
    Python floats (unrolled, constant-folded) — no reductions, so the
    solve is band-local with a 2-rows-per-step information reach.

    Error bound: 2 * ((sqrt(2)-1)/(sqrt(2)+1))^degree relative to the
    warm-start residual in the M-norm — degree 10 reaches ~4e-8, beyond
    f32 resolution and on par with the reference's cg_max_iter=10 CGLS
    (same per-step contraction rate on this kappa=2 system)."""
    _dx, _dy, _dxt, _dyt = ops
    c2 = _C_K * _C_K

    def M(u):
        return u + c2 * (_dxt(_dx(u)) + _dyt(_dy(u)))

    b = _C_K * (_dxt(d_x) + _dyt(d_y))
    r = b - M(u0)
    x = u0
    d = r * (1.0 / _CHEB_THETA)
    rho_prev = 1.0 / _CHEB_SIGMA1
    for _ in range(degree - 1):
        x = x + d
        r = r - M(d)
        rho_k = 1.0 / (2.0 * _CHEB_SIGMA1 - rho_prev)
        d = rho_k * rho_prev * d + (2.0 * rho_k / _CHEB_DELTA) * r
        rho_prev = rho_k
    return x + d


def admm_cheby_halo_rows(degree: int) -> int:
    """Row-information reach of one banded Chebyshev-ADMM iteration
    (8-rounded for the DMA alignment rule): the degree-(n-1) polynomial in
    M = I + c^2 grad^T grad reaches 2(degree-1) rows, plus rhs/t1 assembly
    (2), the warm-residual M-apply (2), zp = grad(x_proj) (1), and the
    residual iteration's extra stencil (1)."""
    return -(-(2 * int(degree) + 4) // 8) * 8


def _admm_iter(xh, xp, xd, zh, zp, zd, warm, f, dt1_or_w, project, rho,
               lmb, radius, alpha, ops, dataterm: str):
    """One graph-projection ADMM iteration on VMEM-resident planes
    (admm_step in backend/admm.py, specialized to constant Sigma/Tau).
    ``project(d_x, d_y, warm)`` is the inner least-squares solver (masked
    CGLS or Chebyshev).

    z-like values travel as (zx, zy) plane pairs packed in tuples."""
    zh_x, zh_y = zh
    zp_x, zp_y = zp
    zd_x, zd_y = zd
    _dx, _dy, _dxt, _dyt = ops
    inv_sqrt_T = 1.0 / _SQRT_T

    # relaxed arguments (scaled space)
    t1 = (alpha * xh + (1.0 - alpha) * xp + xd) * inv_sqrt_T
    t2_x = _SQRT_S * (zh_x + zd_x)
    t2_y = _SQRT_S * (zh_y + zd_y)

    # graph projection: min ||K~ u - d||^2 + ||u||^2, warm-started
    d_x = t2_x - _C_K * _dx(t1)
    d_y = t2_y - _C_K * _dy(t1)
    u = project(d_x, d_y, warm)

    xp_n = _SQRT_T * (u + t1)
    zp_nx = _dx(xp_n)
    zp_ny = _dy(xp_n)
    xd_n = _SQRT_T * t1 - xp_n
    zd_nx = t2_x / _SQRT_S - zp_nx
    zd_ny = t2_y / _SQRT_S - zp_ny

    # prox_g with effective step Tau/rho = 1/(4 rho)
    te = 0.25 / rho
    arg = xp_n - xd_n
    if dataterm == "square":
        xh_n = (arg + (te * lmb) * f) * (1.0 / (1.0 + te * lmb))
    elif dataterm == "wsquare":
        tw = (te * lmb) * dt1_or_w
        xh_n = (arg + tw * f) / (1.0 + tw)
    else:  # abs — soft shrink via clamp (cf. fused_rof._rof_update)
        dv = arg - f
        xh_n = arg - jnp.clip(dv, -te * lmb, te * lmb)

    # prox_f = shrinkage of the per-pixel 2-vector magnitude by
    # radius * step, inverted step 1/(rho Sigma) = 2/rho
    za_x = zp_nx - zd_nx
    za_y = zp_ny - zd_ny
    shrink = radius * (2.0 / rho)
    nrm = jnp.sqrt(za_x * za_x + za_y * za_y)
    scale = jnp.maximum(nrm - shrink, 0.0) / jnp.where(nrm > 0, nrm, 1.0)
    zh_nx = za_x * scale
    zh_ny = za_y * scale

    return (xh_n, xp_n, xd_n, (zh_nx, zh_ny), (zp_nx, zp_ny),
            (zd_nx, zd_ny), u)


def _admm_norms(xh, xp, xd, zh, zp, zd, rho, ops, nsum=jnp.sum):
    """The four SQUARED preconditioned residual norms of an ADMM iterate
    (backend_admm.cu:535-630) with the constant preconditioners
    Sigma = 1/2, Tau = 1/4.  ``nsum`` restricts to owned rows for
    banded/sharded use."""
    kx_x, kx_y = ops[0](xh), ops[1](xh)
    pr_x = _SQRT_S * (kx_x - zh[0])
    pr_y = _SQRT_S * (kx_y - zh[1])
    pn_x = _SQRT_S * zh[0]
    pn_y = _SQRT_S * zh[1]
    wv = (-rho * 4.0) * (xh - xp + xd)          # -rho / Tau
    y_x = (-rho * 0.5) * (zh[0] - zp[0] + zd[0])  # -rho * Sigma
    y_y = (-rho * 0.5) * (zh[1] - zp[1] + zd[1])
    kty = ops[2](y_x) + ops[3](y_y)
    dn = _SQRT_T * wv
    dr = _SQRT_T * (wv + kty)
    return (
        nsum(pr_x * pr_x) + nsum(pr_y * pr_y),
        nsum(pn_x * pn_x) + nsum(pn_y * pn_y),
        nsum(dr * dr),
        nsum(dn * dn),
    )


def _admm_chunk_kernel(scal_ref, tols_ref, xh_ref, xp_ref, xd_ref,
                       zh_ref, zp_ref, zd_ref, warm_ref, f_ref, w_ref,
                       xho_ref, xpo_ref, xdo_ref, zho_ref, zpo_ref,
                       zdo_ref, warmo_ref, norms_ref, *,
                       count: int, maxit: int, alpha: float, dataterm: str,
                       cheby_degree: int | None = None):
    """A whole residual_iter-sized chunk of ADMM iterations in one kernel,
    residual norms (squared) of the final iteration reduced to SMEM.

    scal_ref (SMEM): [rho, lmb, radius]; tols_ref (SMEM, count): the CG
    tolerance schedule for the chunk's iterations (ignored by the
    Chebyshev projection, whose degree is fixed).
    """
    from jax.experimental.pallas import tpu as pltpu

    rho = scal_ref[0]
    lmb = scal_ref[1]
    radius = scal_ref[2]
    f = f_ref[...]
    w = w_ref[...] if dataterm == "wsquare" else None
    # maskless adjoints: every z-like plane pair keeps zero boundaries
    # (zp = grad(x_proj) is structurally zero there; zh/zd are built
    # from zp and t2, which inherit it), enforced once at entry below —
    # with the Chebyshev projection running ~degree stencil pairs per
    # iteration this drops ~2*degree selects per ADMM iteration
    # (cf. fused_rof._shift_ops)
    ops = _shift_ops(f.shape, pltpu.roll, maskless_adjoint=True)

    zh0 = zh_ref[...]
    zp0 = zp_ref[...]
    zd0 = zd_ref[...]
    (zh0x, zh0y), (zp0x, zp0y), (zd0x, zd0y) = (
        _project_dead_dual(z[0], z[1]) for z in (zh0, zp0, zd0))

    def body(k, carry):
        xh, xp, xd, zh, zp, zd, warm = carry
        if cheby_degree is not None:
            project = partial(_cheby_project, degree=cheby_degree, ops=ops)
        else:
            def project(d_x, d_y, u0):
                return _cgls_masked(d_x, d_y, u0, tols_ref[k], maxit, ops)
        return _admm_iter(
            xh, xp, xd, zh, zp, zd, warm, f, w, project, rho,
            lmb, radius, alpha, ops, dataterm)

    xh, xp, xd, zh, zp, zd, warm = lax.fori_loop(
        0, count, body,
        (xh_ref[...], xp_ref[...], xd_ref[...],
         (zh0x, zh0y), (zp0x, zp0y), (zd0x, zd0y),
         warm_ref[...]))

    norms = _admm_norms(xh, xp, xd, zh, zp, zd, rho, ops)
    for i in range(4):
        norms_ref[i] = norms[i]

    xho_ref[...] = xh
    xpo_ref[...] = xp
    xdo_ref[...] = xd
    zho_ref[0] = zh[0]
    zho_ref[1] = zh[1]
    zpo_ref[0] = zp[0]
    zpo_ref[1] = zp[1]
    zdo_ref[0] = zd[0]
    zdo_ref[1] = zd[1]
    warmo_ref[...] = warm


def admm_fused_chunk(xh, xp, xd, zh, zp, zd, warm, f, w, rho, lmb, radius,
                     cg_tols, count, maxit, alpha,
                     dataterm: str = "square", interpret: bool = False,
                     cheby_degree: int | None = None):
    """``count`` fused ADMM iterations ending on a residual iteration, in
    one kernel.  x-like planes (nx, ny), z-like (2, nx, ny); cg_tols is
    the (count,) CG tolerance schedule (ignored when ``cheby_degree``
    selects the Chebyshev projection).  Returns the updated 7 state
    arrays + the length-4 vector of SQUARED residual norms."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    scal = jnp.stack([
        rho, jnp.asarray(lmb, xh.dtype), jnp.asarray(radius, xh.dtype),
    ])
    plane = pl.BlockSpec(memory_space=pltpu.VMEM)
    smem = pl.BlockSpec(memory_space=pltpu.SMEM)
    out_shape = [jax.ShapeDtypeStruct(a.shape, a.dtype)
                 for a in (xh, xp, xd, zh, zp, zd, warm)]
    out_shape.append(jax.ShapeDtypeStruct((4,), xh.dtype))
    return pl.pallas_call(
        partial(_admm_chunk_kernel, count=int(count), maxit=int(maxit),
                alpha=float(alpha), dataterm=dataterm,
                cheby_degree=cheby_degree),
        out_shape=out_shape,
        in_specs=[smem, smem] + [plane] * 9,
        out_specs=[plane] * 7 + [smem],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=_VMEM_LIMIT),
        interpret=interpret,
    )(scal, cg_tols, xh, xp, xd, zh, zp, zd, warm, f, w)


def admm_adapt_scalars(consts, tols4, it, rho, delta, arb_l, arb_u,
                       pr, pn, dr, dn):
    """In-kernel mirror of ``backend.admm.admm_residual_adapt``'s scalar
    math (backend_admm.cu:632-663): same f32 operations in the same
    order.  ``consts`` = (sqrt_nrows, sqrt_ncols, arb_tau, arb_gamma)
    are compile-time floats; ``it`` is the POST-increment iteration
    counter of the chunk's last iteration (as f32).

    Returns (rho, delta, arb_l, arb_u, dual_rescale_fac, converged)."""
    trp, trd, tap, tad = tols4
    sqrt_nrows, sqrt_ncols, arb_tau, arb_gamma = consts
    eps_pri = sqrt_nrows * tap + trp * pn
    eps_dua = sqrt_ncols * tad + trd * dn
    c1 = (dr < eps_dua) & (arb_tau * it > arb_l)
    c2 = (pr < eps_pri) & (arb_tau * it > arb_u) & ~c1
    rho_new = jnp.where(c1, rho * delta, jnp.where(c2, rho / delta, rho))
    delta_new = jnp.where(c1 | c2, delta * arb_gamma, delta)
    arb_u = jnp.where(c1, it, arb_u)
    arb_l = jnp.where(c2, it, arb_l)
    fac = rho / rho_new
    conv = (pr < eps_pri) & (dr < eps_dua)
    return rho_new, delta_new, arb_l, arb_u, fac, conv


def admm_adapt_consts(problem, opts) -> tuple:
    """The compile-time constant tuple for ``admm_adapt_scalars``."""
    import math

    return (math.sqrt(float(problem.nrows)),
            math.sqrt(float(problem.ncols)),
            float(opts.arb_tau), float(opts.arb_gamma))


def _admm_multichunk_kernel(scal_ref, xh_ref, xp_ref, xd_ref,
                            zh_ref, zp_ref, zd_ref, warm_ref, f_ref, w_ref,
                            xho_ref, xpo_ref, xdo_ref, zho_ref, zpo_ref,
                            zdo_ref, warmo_ref, norms_ref, sout_ref, *,
                            count: int, k_chunks: int, alpha: float,
                            dataterm: str, cheby_degree: int, consts):
    """``k_chunks`` residual_iter-sized Chebyshev-ADMM chunks in ONE
    kernel with the Boyd rho-adaptation (including its dual-variable
    rescale) and the convergence test run IN-KERNEL between chunks —
    the ADMM analog of ``fused_rof._rof_multichunk_kernel``.  rho stays
    constant within each chunk exactly as the reference adapts it only
    at residual iterations.

    scal_ref (SMEM, 11): [rho, lmb, radius, delta, arb_l, arb_u, it0,
    tol_rel_p, tol_rel_d, tol_abs_p, tol_abs_d].  norms_ref (SMEM out,
    4): the last executed chunk's residual norms (sqrt'd).  sout_ref
    (SMEM out, 6): [rho, delta, arb_l, arb_u, converged, chunks_done].
    """
    from jax.experimental.pallas import tpu as pltpu

    lmb = scal_ref[1]
    radius = scal_ref[2]
    it0 = scal_ref[6]
    tols4 = (scal_ref[7], scal_ref[8], scal_ref[9], scal_ref[10])
    f = f_ref[...]
    w = w_ref[...] if dataterm == "wsquare" else None
    # maskless adjoints under the z-plane zero-boundary invariant,
    # enforced once at entry below (see _admm_chunk_kernel)
    ops = _shift_ops(f.shape, pltpu.roll, maskless_adjoint=True)
    zero = jnp.zeros((), f.dtype)

    def chunk(c, carry):
        planes, scal, _ = carry

        def run(t):
            planes_t, scal_t, _ = t
            rho, delta, arb_l, arb_u, conv, done = scal_t

            def body(_, pp):
                xh, xp, xd, zh, zp, zd, warm = pp
                project = partial(_cheby_project, degree=cheby_degree,
                                  ops=ops)
                return _admm_iter(xh, xp, xd, zh, zp, zd, warm, f, w,
                                  project, rho, lmb, radius, alpha, ops,
                                  dataterm)

            xh, xp, xd, zh, zp, zd, warm = lax.fori_loop(
                0, count, body, planes_t)
            nrm = _admm_norms(xh, xp, xd, zh, zp, zd, rho, ops)
            pr = jnp.sqrt(nrm[0])
            pn_ = jnp.sqrt(nrm[1])
            dr = jnp.sqrt(nrm[2])
            dn_ = jnp.sqrt(nrm[3])
            it = it0 + ((c + 1) * count).astype(f.dtype)
            rho2, delta2, al2, au2, fac, cv = admm_adapt_scalars(
                consts, tols4, it, rho, delta, arb_l, arb_u,
                pr, pn_, dr, dn_)
            return ((xh, xp, xd * fac, zh, zp,
                     (zd[0] * fac, zd[1] * fac), warm),
                    (rho2, delta2, al2, au2, cv, done + 1.0),
                    (pr, pn_, dr, dn_))

        conv = scal[4]
        return lax.cond(conv, lambda t: t, run, carry)

    zh0, zp0, zd0 = zh_ref[...], zp_ref[...], zd_ref[...]
    (zh0x, zh0y), (zp0x, zp0y), (zd0x, zd0y) = (
        _project_dead_dual(z[0], z[1]) for z in (zh0, zp0, zd0))
    init = (
        (xh_ref[...], xp_ref[...], xd_ref[...],
         (zh0x, zh0y), (zp0x, zp0y), (zd0x, zd0y),
         warm_ref[...]),
        (scal_ref[0], scal_ref[3], scal_ref[4], scal_ref[5],
         jnp.asarray(False), zero),
        (zero, zero, zero, zero),
    )
    planes, scal, norms = lax.fori_loop(0, k_chunks, chunk, init)
    xh, xp, xd, zh, zp, zd, warm = planes
    rho, delta, arb_l, arb_u, conv, done = scal
    for i in range(4):
        norms_ref[i] = norms[i]
    for i, v in enumerate((rho, delta, arb_l, arb_u,
                           conv.astype(f.dtype), done)):
        sout_ref[i] = v
    xho_ref[...] = xh
    xpo_ref[...] = xp
    xdo_ref[...] = xd
    zho_ref[0] = zh[0]
    zho_ref[1] = zh[1]
    zpo_ref[0] = zp[0]
    zpo_ref[1] = zp[1]
    zdo_ref[0] = zd[0]
    zdo_ref[1] = zd[1]
    warmo_ref[...] = warm


def admm_fused_multichunk(xh, xp, xd, zh, zp, zd, warm, f, w, scal11,
                          count, k_chunks, alpha, cheby_degree, consts,
                          dataterm: str = "square",
                          interpret: bool = False):
    """Up to ``k_chunks * count`` fused Chebyshev-ADMM iterations in ONE
    kernel with in-kernel rho-adaptation/convergence.  ``scal11`` is the
    length-11 SMEM vector documented on ``_admm_multichunk_kernel``.
    Returns the 7 updated state arrays + norms (4, sqrt'd, last executed
    chunk) + sout (6 scalars)."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    plane = pl.BlockSpec(memory_space=pltpu.VMEM)
    smem = pl.BlockSpec(memory_space=pltpu.SMEM)
    out_shape = [jax.ShapeDtypeStruct(a.shape, a.dtype)
                 for a in (xh, xp, xd, zh, zp, zd, warm)]
    out_shape.append(jax.ShapeDtypeStruct((4,), xh.dtype))
    out_shape.append(jax.ShapeDtypeStruct((6,), xh.dtype))
    return pl.pallas_call(
        partial(_admm_multichunk_kernel, count=int(count),
                k_chunks=int(k_chunks), alpha=float(alpha),
                dataterm=dataterm, cheby_degree=int(cheby_degree),
                consts=consts),
        out_shape=out_shape,
        in_specs=[smem] + [plane] * 9,
        out_specs=[plane] * 7 + [smem, smem],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=_VMEM_LIMIT),
        interpret=interpret,
    )(scal11, xh, xp, xd, zh, zp, zd, warm, f, w)


def _admm_banded_kernel(scal_ref, off_ref, xh_hbm, xp_hbm, xd_hbm, zh_hbm,
                        zp_hbm, zd_hbm, warm_hbm, f_hbm, w_hbm,
                        xho, xpo, xdo, zho, zpo, zdo, warmo, norms_ref,
                        xhs, xps, xds, zhs, zps, zds, warms, fs, ws, sem, *,
                        nx: int, ny: int, rows: int, halo: int, degree: int,
                        alpha: float, dataterm: str, with_norms: bool,
                        own_lo: int):
    """ONE banded Chebyshev-ADMM outer iteration: grid over row bands,
    each band DMAs its clamped halo-extended window of the 10 state
    planes (+ f/w) HBM->VMEM, runs `_admm_iter` with the dot-product-free
    Chebyshev projection, and DMAs its owned rows back.  Residual norms
    of the new iterate reduce per-band into the (4, n_bands) SMEM array
    (summed by the caller) — cheap enough to compute every launch, and
    the caller only reads them on residual iterations.

    Same offset discipline as `_rof_banded_kernel`: memory_space=ANY in
    AND out, offsets constructed as 8 * (...) so Mosaic proves sublane
    alignment (interpret mode would CLAMP wrong offsets — hardware
    verification via tools/tpu_verify.py is mandatory after changes
    here)."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    i = pl.program_id(0)
    ext = xhs.shape[0]
    nin = xh_hbm.shape[-2]  # input block height (== nx unless sharded)
    r8, h8, e8, n8 = rows // 8, halo // 8, ext // 8, nin // 8
    o8 = own_lo // 8
    start8 = jnp.clip(o8 + i * r8 - h8, 0, n8 - e8)
    start = 8 * start8
    own_w = 8 * (o8 + i * r8 - start8)  # owned-lo within the window

    def copies(pairs):
        cs = [pltpu.make_async_copy(src, dst, sem) for src, dst in pairs]
        for c in cs:
            c.start()
        for c in cs:
            c.wait()

    fetches = [
        (xh_hbm.at[pl.ds(start, ext)], xhs),
        (xp_hbm.at[pl.ds(start, ext)], xps),
        (xd_hbm.at[pl.ds(start, ext)], xds),
        (zh_hbm.at[:, pl.ds(start, ext)], zhs),
        (zp_hbm.at[:, pl.ds(start, ext)], zps),
        (zd_hbm.at[:, pl.ds(start, ext)], zds),
        (warm_hbm.at[pl.ds(start, ext)], warms),
        (f_hbm.at[pl.ds(start, ext)], fs),
    ]
    if dataterm == "wsquare":
        fetches.append((w_hbm.at[pl.ds(start, ext)], ws))
    copies(fetches)

    shape = (ext, ny)
    ops = _shift_ops(shape, pltpu.roll, row_offset=off_ref[0] + start,
                     nx_global=nx)
    scal0 = scal_ref[0]
    project = partial(_cheby_project, degree=degree, ops=ops)
    w = ws[...] if dataterm == "wsquare" else None
    zh0, zp0, zd0 = zhs[...], zps[...], zds[...]
    xh, xp, xd, zh, zp, zd, u = _admm_iter(
        xhs[...], xps[...], xds[...], (zh0[0], zh0[1]), (zp0[0], zp0[1]),
        (zd0[0], zd0[1]), warms[...], fs[...], w, project, scal0,
        scal_ref[1], scal_ref[2], alpha, ops, dataterm)

    if with_norms:
        lri = lax.broadcasted_iota(jnp.int32, shape, 0)
        owned = (lri >= own_w) & (lri < own_w + rows)

        def nsum(v):
            return jnp.sum(jnp.where(owned, v, 0.0))

        norms = _admm_norms(xh, xp, xd, zh, zp, zd, scal0, ops, nsum)
        for j in range(4):
            norms_ref[j, i] = norms[j]
    else:
        for j in range(4):
            norms_ref[j, i] = jnp.asarray(0.0, xh.dtype)

    # stage results in the (now free) input scratch, DMA owned rows out
    xhs[...] = xh
    xps[...] = xp
    xds[...] = xd
    zhs[0], zhs[1] = zh
    zps[0], zps[1] = zp
    zds[0], zds[1] = zd
    warms[...] = u
    lo = 8 * (i * r8)
    copies([
        (xhs.at[pl.ds(own_w, rows)], xho.at[pl.ds(lo, rows)]),
        (xps.at[pl.ds(own_w, rows)], xpo.at[pl.ds(lo, rows)]),
        (xds.at[pl.ds(own_w, rows)], xdo.at[pl.ds(lo, rows)]),
        (zhs.at[:, pl.ds(own_w, rows)], zho.at[:, pl.ds(lo, rows)]),
        (zps.at[:, pl.ds(own_w, rows)], zpo.at[:, pl.ds(lo, rows)]),
        (zds.at[:, pl.ds(own_w, rows)], zdo.at[:, pl.ds(lo, rows)]),
        (warms.at[pl.ds(own_w, rows)], warmo.at[pl.ds(lo, rows)]),
    ])


def _admm_banded_db_kernel(scal_ref, off_ref, xh_hbm, xp_hbm, xd_hbm,
                           zh_hbm, zp_hbm, zd_hbm, warm_hbm, f_hbm, w_hbm,
                           xho, xpo, xdo, zho, zpo, zdo, warmo, norms_ref,
                           xhs2, xps2, xds2, zhs2, zps2, zds2, warms2, fs2,
                           ws2, in_sem, out_sem, *,
                           nx: int, ny: int, rows: int, halo: int,
                           degree: int, alpha: float, dataterm: str,
                           with_norms: bool, own_lo: int, n_bands: int):
    """DOUBLE-BUFFERED banded Chebyshev-ADMM iteration: band i+1's window
    fetch and band i-1's owned-row writeback overlap band i's compute
    (the same cross-grid-step pipelining as fused_rof's
    `_rof_banded_db_kernel`).  Unlike the PDHG banded kernels — whose
    window DMAs amortize over a residual_iter chunk — this kernel
    refetches every OUTER ITERATION, so hiding the window DMA attacks a
    ~30% share of the iteration time rather than ~1/10th of it."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    i = pl.program_id(0)
    p = lax.rem(i, 2)
    ext = xhs2.shape[1]
    nin = xh_hbm.shape[-2]
    r8, h8, e8, n8 = rows // 8, halo // 8, ext // 8, nin // 8
    o8 = own_lo // 8

    def geom(j):
        start8 = jnp.clip(o8 + j * r8 - h8, 0, n8 - e8)
        return 8 * start8, 8 * (o8 + j * r8 - start8)

    x_pairs = ((xh_hbm, xhs2), (xp_hbm, xps2), (xd_hbm, xds2),
               (warm_hbm, warms2), (f_hbm, fs2))
    z_pairs = ((zh_hbm, zhs2), (zp_hbm, zps2), (zd_hbm, zds2))

    def in_copies(j, buf):
        start, _ = geom(j)
        sem = in_sem.at[buf]
        cs = [pltpu.make_async_copy(
            h.at[pl.ds(start, ext)], s.at[buf], sem) for h, s in x_pairs]
        cs += [pltpu.make_async_copy(
            h.at[:, pl.ds(start, ext)], s.at[buf], sem)
            for h, s in z_pairs]
        if dataterm == "wsquare":
            cs.append(pltpu.make_async_copy(
                w_hbm.at[pl.ds(start, ext)], ws2.at[buf], sem))
        return cs

    def out_copies(j, buf):
        _, own_w = geom(j)
        lo = 8 * (j * r8)
        sem = out_sem.at[buf]
        cs = [pltpu.make_async_copy(
            s.at[buf, pl.ds(own_w, rows)], h.at[pl.ds(lo, rows)], sem)
            for s, h in ((xhs2, xho), (xps2, xpo), (xds2, xdo),
                         (warms2, warmo))]
        cs += [pltpu.make_async_copy(
            s.at[buf, :, pl.ds(own_w, rows)], h.at[:, pl.ds(lo, rows)],
            sem) for s, h in ((zhs2, zho), (zps2, zpo), (zds2, zdo))]
        return cs

    @pl.when(i == 0)
    def _():
        for c in in_copies(0, p):
            c.start()

    for c in in_copies(i, p):
        c.wait()

    # free the other buffer (band i-1's writeback), then prefetch i+1
    @pl.when(i >= 1)
    def _():
        for c in out_copies(i - 1, 1 - p):
            c.wait()

    @pl.when(i + 1 < n_bands)
    def _():
        for c in in_copies(i + 1, 1 - p):
            c.start()

    start, own_w = geom(i)
    shape = (ext, ny)
    ops = _shift_ops(shape, pltpu.roll, row_offset=off_ref[0] + start,
                     nx_global=nx)
    scal0 = scal_ref[0]
    project = partial(_cheby_project, degree=degree, ops=ops)
    w = ws2[p] if dataterm == "wsquare" else None
    zh0, zp0, zd0 = zhs2[p], zps2[p], zds2[p]
    xh, xp, xd, zh, zp, zd, u = _admm_iter(
        xhs2[p], xps2[p], xds2[p], (zh0[0], zh0[1]), (zp0[0], zp0[1]),
        (zd0[0], zd0[1]), warms2[p], fs2[p], w, project, scal0,
        scal_ref[1], scal_ref[2], alpha, ops, dataterm)

    if with_norms:
        lri = lax.broadcasted_iota(jnp.int32, shape, 0)
        owned = (lri >= own_w) & (lri < own_w + rows)

        def nsum(v):
            return jnp.sum(jnp.where(owned, v, 0.0))

        norms = _admm_norms(xh, xp, xd, zh, zp, zd, scal0, ops, nsum)
        for j in range(4):
            norms_ref[j, i] = norms[j]
    else:
        for j in range(4):
            norms_ref[j, i] = jnp.asarray(0.0, xh.dtype)

    xhs2[p] = xh
    xps2[p] = xp
    xds2[p] = xd
    zhs2[p, 0], zhs2[p, 1] = zh
    zps2[p, 0], zps2[p, 1] = zp
    zds2[p, 0], zds2[p, 1] = zd
    warms2[p] = u
    for c in out_copies(i, p):
        c.start()

    @pl.when(i == n_bands - 1)
    def _():
        for c in out_copies(i, p):
            c.wait()


def admm_banded_iter(xh, xp, xd, zh, zp, zd, warm, f, w, rho, lmb, radius,
                     n_bands: int, degree: int, alpha: float,
                     dataterm: str = "square", interpret: bool = False,
                     with_norms: bool = True, own_lo: int = 0,
                     out_rows: int | None = None, nx_global=None,
                     row_offset0=None, double_buffer: bool = False):
    """One banded Chebyshev-ADMM outer iteration (single kernel launch,
    grid over ``n_bands`` row bands).  Returns the 7 updated state arrays
    + the 4-vector of SQUARED residual norms of the new iterate (zeros
    when ``with_norms=False`` — the cheaper kernel for non-residual
    iterations).  (own_lo, out_rows, nx_global, row_offset0) band a
    halo-extended shard block instead (cf.
    fused_rof.rof_fused_chunk_banded)."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    nin, ny = xh.shape
    out_rows = nin if out_rows is None else out_rows
    nx_global = nin if nx_global is None else nx_global
    halo = admm_cheby_halo_rows(degree)
    rows = out_rows // n_bands
    assert rows * n_bands == out_rows and rows % 8 == 0, (out_rows, n_bands)
    assert own_lo % 8 == 0, own_lo
    ext = min(rows + 2 * halo, nin)

    scal = jnp.stack([
        rho, jnp.asarray(lmb, xh.dtype), jnp.asarray(radius, xh.dtype),
    ])
    off = jnp.asarray(
        [0 if row_offset0 is None else row_offset0], jnp.int32)
    smem = pl.BlockSpec(memory_space=pltpu.SMEM)
    hbm = pl.BlockSpec(memory_space=pl.ANY)

    def oshape(a):
        return jax.ShapeDtypeStruct(
            a.shape[:-2] + (out_rows, ny), a.dtype)

    out_shape = [oshape(a) for a in (xh, xp, xd, zh, zp, zd, warm)]
    out_shape.append(jax.ShapeDtypeStruct((4, n_bands), xh.dtype))
    dt = xh.dtype
    if double_buffer:
        pl1 = pltpu.VMEM((2, ext, ny), dt)
        pl2 = pltpu.VMEM((2, 2, ext, ny), dt)
        kernel = partial(_admm_banded_db_kernel, nx=int(nx_global), ny=ny,
                         rows=rows, halo=halo, degree=int(degree),
                         alpha=float(alpha), dataterm=dataterm,
                         with_norms=with_norms, own_lo=int(own_lo),
                         n_bands=n_bands)
        scratch = [pl1, pl1, pl1, pl2, pl2, pl2, pl1, pl1, pl1,
                   pltpu.SemaphoreType.DMA((2,)),
                   pltpu.SemaphoreType.DMA((2,))]
    else:
        pl1 = pltpu.VMEM((ext, ny), dt)
        pl2 = pltpu.VMEM((2, ext, ny), dt)
        kernel = partial(_admm_banded_kernel, nx=int(nx_global), ny=ny,
                         rows=rows, halo=halo, degree=int(degree),
                         alpha=float(alpha), dataterm=dataterm,
                         with_norms=with_norms, own_lo=int(own_lo))
        scratch = [pl1, pl1, pl1, pl2, pl2, pl2, pl1, pl1, pl1,
                   pltpu.SemaphoreType.DMA]
    outs = pl.pallas_call(
        kernel,
        grid=(n_bands,),
        out_shape=out_shape,
        in_specs=[smem, smem] + [hbm] * 9,
        out_specs=[hbm] * 7 + [smem],
        scratch_shapes=scratch,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=_VMEM_LIMIT),
        interpret=interpret,
    )(scal, off, xh, xp, xd, zh, zp, zd, warm, f, w)
    return outs[:7] + (jnp.sum(outs[7], axis=1),)


def _admm_banded_chunk_kernel(scal_ref, base_ref, f_hbm, w_hbm,
                              xh2, xp2, xd2, zh2, zd2, warm2,
                              xho, xpo, xdo, zho, zdo, warmo, norms_ref,
                              xhs, xps, xds, zhs, zds, warms, fs, ws,
                              in_sem, out_sem, *,
                              count: int, nx: int, ny: int, rows: int,
                              halo: int, degree: int, alpha: float,
                              dataterm: str, n_bands: int,
                              double_buffer: bool):
    """A whole residual_iter-sized chunk of banded Chebyshev-ADMM in ONE
    launch: grid = (count, n_bands), iterations OUTER, bands INNER.  The
    state lives in length-2 ping-pong HBM arrays updated IN PLACE
    (input_output_aliases): iteration t reads slot (base+t)%2 — fully
    written by iteration t-1's bands before any band of t starts (the
    TPU grid is sequential) — and writes slot (base+t+1)%2.  Each
    (t, i) step DMAs band i's halo-extended window of the 8 state planes
    (z_proj is NOT part of the state: z_proj == grad(x_proj) invariantly,
    so it is recomputed in-kernel and refreshed once per run() in an XLA
    epilogue), runs ONE `_admm_iter` with the dot-product-free Chebyshev
    projection, and writes its owned rows back.  Compared with the
    launch-per-iteration design this amortizes dispatch over the chunk
    and lets the window DMA pipeline run across the whole (count *
    n_bands)-step grid without draining at iteration boundaries; the
    halo stays the per-iteration reach (no k-fold recompute growth).

    scal_ref (SMEM f32, 4): [rho, lmb, radius, fac] — ``fac`` is the
    PENDING dual-rescale factor of the previous chunk's rho adaptation,
    applied to the fetched x_dual/z_dual windows at t == 0 (the caller
    keeps HBM state un-rescaled and folds the factor into the next
    chunk, exactly reproducing admm_residual_adapt's rescale).
    base_ref (SMEM int32, 1): the ping-pong slot holding the current
    state.  norms_ref (SMEM out, (4, n_bands)): the LAST iteration's
    per-band squared residual norms (owned rows).

    Safety: prefetching the next iteration's first window while the last
    band writes back is only legal when the window cannot overlap the
    last band's owned rows ((n_bands - 2) * rows >= ext - rows); when it
    can, the pipeline DRAINS at iteration boundaries instead (wait the
    last writeback, then fetch).  Offsets are 8-aligned by construction
    (same discipline as `_admm_banded_kernel`; interpret mode clamps bad
    offsets, so hardware verification via tools/tpu_verify.py is
    mandatory after changes here)."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    t = pl.program_id(0)
    i = pl.program_id(1)
    step = t * n_bands + i
    base = base_ref[0]
    ext = xhs.shape[-2]
    r8, h8, e8, n8 = rows // 8, halo // 8, ext // 8, nx // 8

    def geom(j):
        start8 = jnp.clip(j * r8 - h8, 0, n8 - e8)
        return 8 * start8, 8 * (j * r8 - start8)

    # scratch views: single-buffer mode uses slot 0 only
    def sv(ref, buf):
        return ref.at[buf] if double_buffer else ref

    x_pairs = ((xho, xhs), (xpo, xps), (xdo, xds), (warmo, warms))
    z_pairs = ((zho, zhs), (zdo, zds))

    def in_copies(tt, j, buf):
        # fetch band j's window of iteration tt's state (slot base+tt)
        slot = lax.rem(base + tt, 2)
        start, _ = geom(j)
        sem = in_sem.at[buf] if double_buffer else in_sem
        cs = [pltpu.make_async_copy(
            h.at[slot, pl.ds(start, ext)], sv(s, buf), sem)
            for h, s in x_pairs]
        cs += [pltpu.make_async_copy(
            h.at[slot, :, pl.ds(start, ext)], sv(s, buf), sem)
            for h, s in z_pairs]
        cs.append(pltpu.make_async_copy(
            f_hbm.at[pl.ds(start, ext)], sv(fs, buf), sem))
        if dataterm == "wsquare":
            cs.append(pltpu.make_async_copy(
                w_hbm.at[pl.ds(start, ext)], sv(ws, buf), sem))
        return cs

    def out_copies(tt, j, buf):
        # write band j's owned rows into iteration tt+1's slot
        slot = lax.rem(base + tt + 1, 2)
        _, own_w = geom(j)
        lo = 8 * (j * r8)
        sem = out_sem.at[buf] if double_buffer else out_sem
        cs = [pltpu.make_async_copy(
            sv(s, buf).at[pl.ds(own_w, rows)],
            h.at[slot, pl.ds(lo, rows)], sem) for h, s in x_pairs]
        cs += [pltpu.make_async_copy(
            sv(s, buf).at[:, pl.ds(own_w, rows)],
            h.at[slot, :, pl.ds(lo, rows)], sem) for h, s in z_pairs]
        return cs

    def nxt(tt, j):
        # the grid successor of (tt, j), clamped at the end
        last = j == n_bands - 1
        return jnp.where(last, tt + 1, tt), jnp.where(last, 0, j + 1)

    # cross-iteration prefetch is only safe when iteration t+1's first
    # window cannot overlap band n_bands-1's not-yet-written owned rows
    safe_cross = (n_bands - 2) * rows >= ext - rows

    if double_buffer:
        p = lax.rem(step, 2)

        @pl.when(step == 0)
        def _():
            for c in in_copies(0, 0, p):
                c.start()

        if safe_cross:
            for c in in_copies(t, i, p):
                c.wait()

            # free the other buffer (previous step's writeback), then
            # prefetch the successor step's window
            @pl.when(step >= 1)
            def _():
                pt_, pj = jnp.where(i == 0, t - 1, t), \
                    jnp.where(i == 0, n_bands - 1, i - 1)
                for c in out_copies(pt_, pj, 1 - p):
                    c.wait()

            @pl.when(step + 1 < count * n_bands)
            def _():
                nt, nj = nxt(t, i)
                for c in in_copies(nt, nj, 1 - p):
                    c.start()
        else:
            # drain at iteration boundaries: wait the previous
            # iteration's last writeback BEFORE fetching our window
            @pl.when((i == 0) & (t >= 1))
            def _():
                for c in out_copies(t - 1, n_bands - 1, 1 - p):
                    c.wait()
                for c in in_copies(t, 0, p):
                    c.start()

            for c in in_copies(t, i, p):
                c.wait()

            @pl.when(i >= 1)
            def _():
                for c in out_copies(t, i - 1, 1 - p):
                    c.wait()

            @pl.when(i + 1 < n_bands)
            def _():
                for c in in_copies(t, i + 1, 1 - p):
                    c.start()
    else:
        p = 0
        cs = in_copies(t, i, p)
        for c in cs:
            c.start()
        for c in cs:
            c.wait()

    start, own_w = geom(i)

    # pending dual rescale from the previous chunk's rho adaptation
    @pl.when(t == 0)
    def _():
        fac = scal_ref[3]
        sv(xds, p)[...] = sv(xds, p)[...] * fac
        sv(zds, p)[...] = sv(zds, p)[...] * fac

    shape = (ext, ny)
    ops = _shift_ops(shape, pltpu.roll, row_offset=start, nx_global=nx)
    rho = scal_ref[0]
    project = partial(_cheby_project, degree=degree, ops=ops)
    w = sv(ws, p)[...] if dataterm == "wsquare" else None
    zh0 = sv(zhs, p)[...]
    zd0 = sv(zds, p)[...]
    xp0 = sv(xps, p)[...]
    # z_proj is not stored: recompute grad(x_proj) (the _admm_iter body
    # never reads it; only the norms do, via the NEW iterate's zp)
    xh, xp, xd, zh, zp, zd, u = _admm_iter(
        sv(xhs, p)[...], xp0, sv(xds, p)[...], (zh0[0], zh0[1]),
        (None, None), (zd0[0], zd0[1]), sv(warms, p)[...],
        sv(fs, p)[...], w, project, rho, scal_ref[1], scal_ref[2],
        alpha, ops, dataterm)

    @pl.when(t == count - 1)
    def _():
        lri = lax.broadcasted_iota(jnp.int32, shape, 0)
        owned = (lri >= own_w) & (lri < own_w + rows)

        def nsum(v):
            return jnp.sum(jnp.where(owned, v, 0.0))

        norms = _admm_norms(xh, xp, xd, zh, zp, zd, rho, ops, nsum)
        for j in range(4):
            norms_ref[j, i] = norms[j]

    sv(xhs, p)[...] = xh
    sv(xps, p)[...] = xp
    sv(xds, p)[...] = xd
    sv(zhs, p)[0] = zh[0]
    sv(zhs, p)[1] = zh[1]
    sv(zds, p)[0] = zd[0]
    sv(zds, p)[1] = zd[1]
    sv(warms, p)[...] = u

    if double_buffer:
        for c in out_copies(t, i, p):
            c.start()

        @pl.when(step == count * n_bands - 1)
        def _():
            for c in out_copies(t, i, p):
                c.wait()
    else:
        cs = out_copies(t, i, p)
        for c in cs:
            c.start()
        for c in cs:
            c.wait()


def admm_banded_chunk(xh2, xp2, xd2, zh2, zd2, warm2, f, w, base, rho,
                      fac, lmb, radius, count: int, n_bands: int,
                      degree: int, alpha: float, dataterm: str = "square",
                      interpret: bool = False, double_buffer: bool = True):
    """``count`` banded Chebyshev-ADMM iterations in ONE launch on the
    ping-pong state arrays (leading dim 2; ``base`` int32 scalar = slot
    holding the current state; after the call slot (base+count)%2 holds
    the new state).  The six state arrays are updated IN PLACE
    (input_output_aliases) and returned; also returns the 4-vector of
    SQUARED residual norms of the final iterate.  ``fac`` is the pending
    dual-rescale factor (see kernel docstring)."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    nx, ny = xh2.shape[-2:]
    halo = admm_cheby_halo_rows(degree)
    rows = nx // n_bands
    assert rows * n_bands == nx and rows % 8 == 0, (nx, n_bands)
    ext = min(rows + 2 * halo, nx)

    dt = xh2.dtype
    scal = jnp.stack([rho, jnp.asarray(lmb, dt), jnp.asarray(radius, dt),
                      fac.astype(dt)])
    base_v = jnp.asarray(base, jnp.int32).reshape(1)
    smem = pl.BlockSpec(memory_space=pltpu.SMEM)
    hbm = pl.BlockSpec(memory_space=pl.ANY)

    out_shape = [jax.ShapeDtypeStruct(a.shape, a.dtype)
                 for a in (xh2, xp2, xd2, zh2, zd2, warm2)]
    out_shape.append(jax.ShapeDtypeStruct((4, n_bands), dt))

    if double_buffer:
        pl1 = pltpu.VMEM((2, ext, ny), dt)
        pl2 = pltpu.VMEM((2, 2, ext, ny), dt)
        sems = [pltpu.SemaphoreType.DMA((2,)), pltpu.SemaphoreType.DMA((2,))]
    else:
        pl1 = pltpu.VMEM((ext, ny), dt)
        pl2 = pltpu.VMEM((2, ext, ny), dt)
        sems = [pltpu.SemaphoreType.DMA, pltpu.SemaphoreType.DMA]
    scratch = [pl1, pl1, pl1, pl2, pl2, pl1, pl1, pl1] + sems

    outs = pl.pallas_call(
        partial(_admm_banded_chunk_kernel, count=int(count), nx=nx, ny=ny,
                rows=rows, halo=halo, degree=int(degree),
                alpha=float(alpha), dataterm=dataterm, n_bands=n_bands,
                double_buffer=double_buffer),
        grid=(int(count), int(n_bands)),
        out_shape=out_shape,
        in_specs=[smem, smem, hbm, hbm] + [hbm] * 6,
        out_specs=[hbm] * 6 + [smem],
        scratch_shapes=scratch,
        input_output_aliases={4: 0, 5: 1, 6: 2, 7: 3, 8: 4, 9: 5},
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=_VMEM_LIMIT),
        interpret=interpret,
    )(scal, base_v, f, w, xh2, xp2, xd2, zh2, zd2, warm2)
    return outs[:6] + (jnp.sum(outs[6], axis=1),)


def admm_chunk_band_plan(nx: int, ny: int, degree: int,
                         itemsize: int = 4):
    """Band tiling for `admm_banded_chunk`: smallest divisor ``n_bands``
    of nx (rows an 8-multiple, >= the halo) whose windows fit the VMEM
    budget, PREFERRING the double-buffered footprint (~18 window planes
    + temporaries ~= 36) even when it forces a wider tiling than the
    single-buffer footprint (~22) — the opposite of the ROF guard,
    because this kernel refetches its windows every ITERATION, so hiding
    the DMA dominates the halo-recompute cost.  MEASURED at ROF ADMM
    2048^2 e2e (tools/admm_tile_probe session, 2026-08-21): nb=16 db
    1635 it/s > nb=8 db 1554 > nb=16 single 1346 > nb=8 single 1188.
    Returns (n_bands, double_buffer) or None."""
    budget = int(0.75 * _VMEM_LIMIT)
    halo = admm_cheby_halo_rows(degree)

    def fits(n_bands, n_planes):
        rows = nx // n_bands
        ext = min(rows + 2 * halo, nx)
        return (rows % 8 == 0 and rows >= halo
                and ext * ny * itemsize * n_planes <= budget)

    for n_bands in range(2, nx + 1):
        if nx % n_bands:
            continue
        if fits(n_bands, 36):
            return n_bands, True
    for n_bands in range(2, nx + 1):
        if nx % n_bands:
            continue
        if fits(n_bands, 22):
            return n_bands, False
    return None


def admm_band_count(nx: int, ny: int, degree: int, n_planes: int = 24,
                    itemsize: int = 4) -> int | None:
    """Row-band tiling factor for the banded Chebyshev-ADMM kernel:
    smallest divisor ``n_bands`` of nx (rows an 8-multiple, >= the halo)
    whose halo-extended bands keep ~n_planes live planes (10 state + f +
    Chebyshev temporaries) within 75% of the VMEM limit.  Returns None
    when no such tiling exists (caller falls back to the generic path)."""
    budget = int(0.75 * _VMEM_LIMIT)
    halo = admm_cheby_halo_rows(degree)
    for n_bands in range(2, nx + 1):
        if nx % n_bands:
            continue
        rows = nx // n_bands
        if rows % 8:
            continue
        if rows < halo:
            return None
        if (rows + 2 * halo) * ny * itemsize * n_planes <= budget:
            return n_bands
    return None


class FusedROFADMM(BackendADMM):
    """BackendADMM that runs ROF-structured problems through fused Pallas
    iterations, falling back to the generic path when the structure does
    not match.  Inner-projection routing by ``opts.projection``:

    * "auto" (default): Chebyshev projection at any size — whole-plane
      chunk kernel under VMEM, chunked banded kernel beyond; no size
      cliff.  MEASURED 2.5x faster than the CGLS chunk at 512^2
      (218 vs 541 us per 10-iteration chunk on the v5e, serial-chain
      method, tools/banded_db_probe.py — despite its name that script
      bundles the whole-plane CGLS-vs-Chebyshev A/B alongside the ROF
      banded probes; the 2048^2 banded db-vs-single numbers are from
      tools/admm_db_probe.py): the fixed-coefficient solve has
      no in-kernel reductions or masked predication, and both solvers
      contract at the same 0.172/step rate on this kappa<=2 system, so
      the trajectories agree to f32 (tests/test_fused_admm.py).
    * "cgls": the reference's exact inner algebra
      (backend_admm.cu:408-441) whole-plane; larger-than-VMEM problems
      run generic.
    * "cheby": explicit Chebyshev (same as auto resolves to).
    * "dct": exact-projection generic path (admm.py), never fused.
    """

    def __init__(self, problem, opts, solver_opts, interpret: bool = False):
        super().__init__(problem, opts, solver_opts)
        self.interpret = interpret
        # chunks per multi-chunk launch (phase B0); 0 disables for A/B
        self.k_chunks = _K_CHUNKS
        usable = (jax.default_backend() != "cpu") or interpret
        usable = usable and opts.projection in ("auto", "cgls", "cheby")
        self.rof = match_rof_structure(problem) if usable else None
        self.mode = None
        self.run_plan = None
        if self.rof is not None:
            whole = fits_vmem(self.rof["nx"], self.rof["ny"])
            proj = opts.projection
            if whole:
                self.mode = "cgls" if proj == "cgls" else "cheby"
            elif proj in ("auto", "cheby"):
                # chunked banded kernel: grid (ri, n_bands), window DMAs
                # pipelined across the whole chunk (admm_banded_chunk);
                # the planner prefers the double-buffered footprint even
                # when it forces a wider tiling — the OPPOSITE of the
                # ROF guard, because this kernel refetches its windows
                # every iteration, so hiding the DMA beats minimizing
                # halo recompute (measurements in admm_chunk_band_plan)
                plan_b = admm_chunk_band_plan(self.rof["nx"],
                                              self.rof["ny"],
                                              opts.cheby_degree)
                if plan_b is not None:
                    self.mode = "banded"
                    self.rof["n_bands"], self.rof["double_buffer"] = plan_b
        if self.mode in ("cheby", "banded"):
            # generic align/tail phases run the SAME Chebyshev projection
            # (plan-based, admm.py) so the whole run follows one solver
            from ..backend.admm import dct_projection_plan

            self.run_opts = dataclasses.replace(self.opts,
                                                projection="cheby")
            self.run_plan = dct_projection_plan(problem)
        else:
            self.run_opts = self.opts
        if self.mode is None:
            self.rof = None
        elif self.solver_opts.verbose:
            print(f"FusedROFADMM: using fused Pallas iteration "
                  f"({self.mode}).")

    def run(self, state: ADMMState, until_iter: int) -> ADMMState:
        if self.rof is None:
            return super().run(state, until_iter)
        sopts = self.solver_opts
        tols = (sopts.tol_rel_primal, sopts.tol_rel_dual,
                sopts.tol_abs_primal, sopts.tol_abs_dual)
        r = self.rof
        try:
            if self.mode == "banded":
                return _fused_admm_banded_run(
                    self.problem, self.prox_g, self.prox_f, self.run_opts,
                    self.run_plan, r["nx"], r["ny"], r["lmb"],
                    r["dataterm"], r["n_bands"],
                    r.get("double_buffer", False), self.interpret,
                    tols, r["f"], r["w"],
                    jnp.asarray(r["radius"], jnp.float32),
                    state, jnp.asarray(until_iter, jnp.int32),
                )
            return _fused_admm_run(
                self.problem, self.prox_g, self.prox_f, self.run_opts,
                self.run_plan, r["nx"], r["ny"], r["lmb"], r["dataterm"],
                self.mode == "cheby", self.k_chunks, self.interpret,
                tols, r["f"], r["w"], jnp.asarray(r["radius"], jnp.float32),
                state, jnp.asarray(until_iter, jnp.int32),
            )
        except jax.errors.JaxRuntimeError as e:
            # fits_vmem is an estimate; on a Mosaic capacity rejection
            # fall back to the generic path permanently (the compile
            # fails before any donated buffer is consumed)
            self.rof = None
            if self.solver_opts.verbose:
                print(f"FusedROFADMM: kernel compile failed ({e});"
                      " falling back to the generic path.")
            return super().run(state, until_iter)


@partial(jax.jit, static_argnums=(3, 4, 5, 6, 7, 8, 9, 10, 11),
         donate_argnums=(16,))
def _fused_admm_run(problem, prox_g, prox_f, opts, plan, nx, ny, lmb,
                    dataterm, cheby, k_chunks, interpret, tols, f_plane,
                    w_plane, radius, state, until):
    """Chunked ADMM run.  The generic path computes residuals when the
    post-increment counter hits a multiple of residual_iter
    (backend/admm.py admm_step), so chunks start at iteration % ri == 0 —
    which the initial state already satisfies; a generic phase A handles
    arbitrary warm-start offsets, phase C the tail.  ``cheby`` selects
    the Chebyshev projection in-kernel (``plan`` carries the matching
    generic-phase projection plan)."""
    ri = max(int(opts.residual_iter), 1)
    eps = jnp.finfo(f_plane.dtype).eps

    def generic(s: ADMMState) -> ADMMState:
        return admm_step(problem, prox_g, prox_f, opts, tols, s,
                         proj_plan=plan)

    def fused_chunk(s: ADMMState) -> ADMMState:
        xh = s.x_half.reshape(nx, ny)
        xp = s.x_proj.reshape(nx, ny)
        xd = s.x_dual.reshape(nx, ny)
        zh = s.z_half.reshape(2, nx, ny)
        zp = s.z_proj.reshape(2, nx, ny)
        zd = s.z_dual.reshape(2, nx, ny)
        warm = s.cg_warm.reshape(nx, ny)

        # CG tolerance schedule for the chunk's iterations
        # (backend_admm.cu:408-410 + the cgls_solve 10*eps clamp)
        it_f = (s.iteration + 1 + jnp.arange(ri)).astype(f_plane.dtype)
        cg_tols = jnp.maximum(
            opts.cg_tol_min / jnp.power(it_f, opts.cg_tol_pow),
            opts.cg_tol_max)
        cg_tols = jnp.maximum(cg_tols, 10.0 * eps)

        xh, xp, xd, zh, zp, zd, warm, norms2 = admm_fused_chunk(
            xh, xp, xd, zh, zp, zd, warm, f_plane, w_plane,
            s.rho, lmb, radius, cg_tols, ri, opts.cg_max_iter,
            opts.alpha, dataterm=dataterm, interpret=interpret,
            cheby_degree=opts.cheby_degree if cheby else None)
        norms = jnp.sqrt(norms2)
        s = dataclasses.replace(
            s,
            x_half=xh.reshape(-1), x_proj=xp.reshape(-1),
            x_dual=xd.reshape(-1),
            z_half=zh.reshape(-1), z_proj=zp.reshape(-1),
            z_dual=zd.reshape(-1), cg_warm=warm.reshape(-1),
            iteration=s.iteration + ri,
        )
        # adaptation sees the post-increment counter of the chunk's last
        # iteration — which is s.iteration after the += ri above
        return admm_residual_adapt(
            problem, opts, tols, s, norms[0], norms[1], norms[2], norms[3])

    def multi_chunk(s: ADMMState) -> ADMMState:
        dt = f_plane.dtype
        scal11 = jnp.stack([
            s.rho, jnp.asarray(lmb, dt), radius.astype(dt),
            s.delta, s.arb_l, s.arb_u, s.iteration.astype(dt),
            jnp.asarray(tols[0], dt), jnp.asarray(tols[1], dt),
            jnp.asarray(tols[2], dt), jnp.asarray(tols[3], dt),
        ])
        xh, xp, xd, zh, zp, zd, warm, norms, sc = admm_fused_multichunk(
            s.x_half.reshape(nx, ny), s.x_proj.reshape(nx, ny),
            s.x_dual.reshape(nx, ny), s.z_half.reshape(2, nx, ny),
            s.z_proj.reshape(2, nx, ny), s.z_dual.reshape(2, nx, ny),
            s.cg_warm.reshape(nx, ny), f_plane, w_plane, scal11,
            ri, k_chunks, opts.alpha, opts.cheby_degree,
            admm_adapt_consts(problem, opts), dataterm=dataterm,
            interpret=interpret)
        done = sc[5].astype(jnp.int32)
        return dataclasses.replace(
            s,
            x_half=xh.reshape(-1), x_proj=xp.reshape(-1),
            x_dual=xd.reshape(-1),
            z_half=zh.reshape(-1), z_proj=zp.reshape(-1),
            z_dual=zd.reshape(-1), cg_warm=warm.reshape(-1),
            rho=sc[0], delta=sc[1], arb_l=sc[2], arb_u=sc[3],
            converged=sc[4] > 0.5,
            primal_residual=norms[0], primal_var_norm=norms[1],
            dual_residual=norms[2], dual_var_norm=norms[3],
            iteration=s.iteration + done * ri,
        )

    # phase A: align to the residual grid (iteration % ri == 0)
    def cond_a(s):
        return (s.iteration % ri != 0) & (s.iteration < until) & ~s.converged

    state = lax.while_loop(cond_a, generic, state)

    # canonicalize the z warm start once per run (cf. fused_rof
    # _fused_rof_run): the z-plane pairs' dead coordinates are zeroed so
    # the maskless in-kernel adjoints are exact and every route
    # (whole-plane, multichunk, banded) follows one trajectory
    def proj_z(zf):
        z = zf.reshape(2, nx, ny)
        zx, zy = _project_dead_dual(z[0], z[1])
        return jnp.stack([zx, zy]).reshape(-1)

    state = dataclasses.replace(
        state, z_half=proj_z(state.z_half), z_proj=proj_z(state.z_proj),
        z_dual=proj_z(state.z_dual))

    # phase B0 (Chebyshev projection only — no per-iteration CG tolerance
    # schedule in-kernel): multi-chunk launches with in-kernel
    # rho-adaptation, k_chunks * ri iterations per kernel call
    # (k_chunks=0 disables the phase for A/B probes)
    if cheby and k_chunks > 0:
        def cond_b0(s):
            return (s.iteration + k_chunks * ri <= until) & ~s.converged

        state = lax.while_loop(cond_b0, multi_chunk, state)

    # phase B: fused chunks of exactly ri iterations
    def cond_b(s):
        return (s.iteration + ri <= until) & ~s.converged

    state = lax.while_loop(cond_b, fused_chunk, state)

    # phase C: generic tail
    def cond_c(s):
        return (s.iteration < until) & ~s.converged

    return lax.while_loop(cond_c, generic, state)


@partial(jax.jit, static_argnums=(3, 4, 5, 6, 7, 8, 9, 10, 11),
         donate_argnums=(16,))
def _fused_admm_banded_run(problem, prox_g, prox_f, opts, plan, nx, ny, lmb,
                           dataterm, n_bands, double_buffer, interpret,
                           tols, f_plane, w_plane, radius, state, until):
    """Banded Chebyshev-ADMM run for planes too large for VMEM: ONE
    launch per residual_iter-sized chunk (`admm_banded_chunk`, grid =
    (ri, n_bands), in-place ping-pong state).  The state lives in the
    doubled plane arrays for the whole phase-B loop — flat-vector
    packing happens once per run() — and the Boyd rho-adaptation runs on
    the returned norms through `admm_adapt_scalars` (the same scalar
    math as admm_residual_adapt), with the dual-variable rescale carried
    as a PENDING factor folded into the next chunk's kernel (or into
    the unpack epilogue).  Phase A/C generic steps use the plan-based
    generic Chebyshev projection so the whole run follows one inner
    solver."""
    ri = max(int(opts.residual_iter), 1)
    degree = int(opts.cheby_degree)
    consts = admm_adapt_consts(problem, opts)
    dt = f_plane.dtype

    def generic(s: ADMMState) -> ADMMState:
        return admm_step(problem, prox_g, prox_f, opts, tols, s,
                         proj_plan=plan)

    # phase A: align to the residual grid (iteration % ri == 0)
    def cond_a(s):
        return (s.iteration % ri != 0) & (s.iteration < until) & ~s.converged

    state = lax.while_loop(cond_a, generic, state)

    # canonicalize the z warm start once per run (cf. _fused_admm_run):
    # keeps this route on the same trajectory as the whole-plane
    # maskless-adjoint kernels for any warm start
    def proj_z(zf):
        z = zf.reshape(2, nx, ny)
        zx, zy = _project_dead_dual(z[0], z[1])
        return jnp.stack([zx, zy]).reshape(-1)

    state = dataclasses.replace(
        state, z_half=proj_z(state.z_half), z_proj=proj_z(state.z_proj),
        z_dual=proj_z(state.z_dual))

    # pack the state into the ping-pong plane arrays (slot 0)
    def dbl(a, shape):
        return jnp.zeros((2,) + shape, a.dtype).at[0].set(a.reshape(shape))

    planes = (dbl(state.x_half, (nx, ny)), dbl(state.x_proj, (nx, ny)),
              dbl(state.x_dual, (nx, ny)), dbl(state.z_half, (2, nx, ny)),
              dbl(state.z_dual, (2, nx, ny)), dbl(state.cg_warm, (nx, ny)))
    scal = (state.rho, state.delta, state.arb_l, state.arb_u,
            jnp.asarray(1.0, dt),                    # pending dual rescale
            jnp.asarray(0, jnp.int32),               # ping-pong base slot
            state.iteration, state.converged,
            state.primal_residual, state.primal_var_norm,
            state.dual_residual, state.dual_var_norm)
    tols4 = (jnp.asarray(tols[0], dt), jnp.asarray(tols[1], dt),
             jnp.asarray(tols[2], dt), jnp.asarray(tols[3], dt))

    def cond_b(c):
        _, sc = c
        return (sc[6] + ri <= until) & ~sc[7]

    def fused_chunk(c):
        pl_, sc = c
        (rho, delta, arb_l, arb_u, fac, base, it, conv,
         _, _, _, _) = sc
        xh2, xp2, xd2, zh2, zd2, warm2, norms2 = admm_banded_chunk(
            *pl_, f_plane, w_plane, base, rho, fac, lmb, radius, ri,
            n_bands, degree, opts.alpha, dataterm=dataterm,
            interpret=interpret, double_buffer=double_buffer)
        norms = jnp.sqrt(norms2)
        it = it + ri
        # adaptation sees the post-increment counter of the chunk's last
        # iteration (cf. _fused_admm_run); the dual rescale becomes the
        # next chunk's pending factor
        rho2, delta2, al2, au2, fac2, cv = admm_adapt_scalars(
            consts, tols4, it.astype(dt), rho, delta, arb_l, arb_u,
            norms[0], norms[1], norms[2], norms[3])
        base = lax.rem(base + ri, 2)
        return ((xh2, xp2, xd2, zh2, zd2, warm2),
                (rho2, delta2, al2, au2, fac2, base, it, cv,
                 norms[0], norms[1], norms[2], norms[3]))

    planes, scal = lax.while_loop(cond_b, fused_chunk, (planes, scal))

    # unpack: dynamic slot select, apply the pending dual rescale, and
    # refresh z_proj (== K x_proj invariantly; not stored by the kernel)
    (rho, delta, arb_l, arb_u, fac, base, it, conv,
     pr, pn, dr, dn) = scal

    def pick(a2):
        return lax.dynamic_index_in_dim(a2, base, 0, keepdims=False)

    x_proj = pick(planes[1]).reshape(-1)
    state = dataclasses.replace(
        state,
        x_half=pick(planes[0]).reshape(-1), x_proj=x_proj,
        x_dual=(pick(planes[2]) * fac).reshape(-1),
        z_half=pick(planes[3]).reshape(-1),
        z_proj=problem.linop.apply(x_proj),
        z_dual=(pick(planes[4]) * fac).reshape(-1),
        cg_warm=pick(planes[5]).reshape(-1),
        rho=rho, delta=delta, arb_l=arb_l, arb_u=arb_u,
        iteration=it, converged=conv,
        primal_residual=pr, primal_var_norm=pn,
        dual_residual=dr, dual_var_norm=dn,
    )

    # phase C: generic tail
    def cond_c(s):
        return (s.iteration < until) & ~s.converged

    return lax.while_loop(cond_c, generic, state)
