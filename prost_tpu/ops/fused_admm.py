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
from .fused_rof import (_VMEM_LIMIT, _SQRT_S, _SQRT_T, _shift_ops,
                        fits_vmem, match_rof_structure)

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


def _admm_iter(xh, xp, xd, zh, zp, zd, warm, f, dt1_or_w, cg_tol, rho,
               lmb, radius, alpha, maxit, ops, dataterm: str):
    """One graph-projection ADMM iteration on VMEM-resident planes
    (admm_step in backend/admm.py, specialized to constant Sigma/Tau).

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
    u = _cgls_masked(d_x, d_y, warm, cg_tol, maxit, ops)

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
    else:  # abs
        dv = arg - f
        xh_n = f + jnp.sign(dv) * jnp.maximum(jnp.abs(dv) - te * lmb, 0.0)

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


def _admm_chunk_kernel(scal_ref, tols_ref, xh_ref, xp_ref, xd_ref,
                       zh_ref, zp_ref, zd_ref, warm_ref, f_ref, w_ref,
                       xho_ref, xpo_ref, xdo_ref, zho_ref, zpo_ref,
                       zdo_ref, warmo_ref, norms_ref, *,
                       count: int, maxit: int, alpha: float, dataterm: str):
    """A whole residual_iter-sized chunk of ADMM iterations in one kernel,
    residual norms (squared) of the final iteration reduced to SMEM.

    scal_ref (SMEM): [rho, lmb, radius]; tols_ref (SMEM, count): the CG
    tolerance schedule for the chunk's iterations.
    """
    from jax.experimental.pallas import tpu as pltpu

    rho = scal_ref[0]
    lmb = scal_ref[1]
    radius = scal_ref[2]
    f = f_ref[...]
    w = w_ref[...] if dataterm == "wsquare" else None
    ops = _shift_ops(f.shape, pltpu.roll)

    zh0 = zh_ref[...]
    zp0 = zp_ref[...]
    zd0 = zd_ref[...]

    def body(k, carry):
        xh, xp, xd, zh, zp, zd, warm = carry
        return _admm_iter(
            xh, xp, xd, zh, zp, zd, warm, f, w, tols_ref[k], rho,
            lmb, radius, alpha, maxit, ops, dataterm)

    xh, xp, xd, zh, zp, zd, warm = lax.fori_loop(
        0, count, body,
        (xh_ref[...], xp_ref[...], xd_ref[...],
         (zh0[0], zh0[1]), (zp0[0], zp0[1]), (zd0[0], zd0[1]),
         warm_ref[...]))

    # residuals of the final iterate (backend_admm.cu:535-630), with the
    # constant preconditioners: Sigma = 1/2, Tau = 1/4
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

    norms_ref[0] = jnp.sum(pr_x * pr_x) + jnp.sum(pr_y * pr_y)
    norms_ref[1] = jnp.sum(pn_x * pn_x) + jnp.sum(pn_y * pn_y)
    norms_ref[2] = jnp.sum(dr * dr)
    norms_ref[3] = jnp.sum(dn * dn)

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
                     dataterm: str = "square", interpret: bool = False):
    """``count`` fused ADMM iterations ending on a residual iteration, in
    one kernel.  x-like planes (nx, ny), z-like (2, nx, ny); cg_tols is
    the (count,) CG tolerance schedule.  Returns the updated 7 state
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
                alpha=float(alpha), dataterm=dataterm),
        out_shape=out_shape,
        in_specs=[smem, smem] + [plane] * 9,
        out_specs=[plane] * 7 + [smem],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=_VMEM_LIMIT),
        interpret=interpret,
    )(scal, cg_tols, xh, xp, xd, zh, zp, zd, warm, f, w)


class FusedROFADMM(BackendADMM):
    """BackendADMM that runs ROF-structured problems through the fused
    Pallas chunk kernel (CGLS inner loop included), falling back to the
    generic path when the structure does not match."""

    def __init__(self, problem, opts, solver_opts, interpret: bool = False):
        super().__init__(problem, opts, solver_opts)
        self.interpret = interpret
        usable = (jax.default_backend() != "cpu") or interpret
        # projection="dct" runs the exact-DCT generic path (admm.py), not
        # the in-kernel CGLS
        usable = usable and opts.projection == "cgls"
        self.rof = match_rof_structure(problem) if usable else None
        if self.rof is not None and not fits_vmem(self.rof["nx"],
                                                  self.rof["ny"]):
            # whole-plane kernel only (no tiled ADMM variant yet: the
            # in-kernel CGLS carries extra live planes)
            self.rof = None
        if self.rof is not None and self.solver_opts.verbose:
            print("FusedROFADMM: using fused Pallas iteration.")

    def run(self, state: ADMMState, until_iter: int) -> ADMMState:
        if self.rof is None:
            return super().run(state, until_iter)
        sopts = self.solver_opts
        tols = (sopts.tol_rel_primal, sopts.tol_rel_dual,
                sopts.tol_abs_primal, sopts.tol_abs_dual)
        r = self.rof
        try:
            return _fused_admm_run(
                self.problem, self.prox_g, self.prox_f, self.opts,
                r["nx"], r["ny"], r["lmb"], r["dataterm"], self.interpret,
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


@partial(jax.jit, static_argnums=(3, 4, 5, 6, 7, 8), donate_argnums=(13,))
def _fused_admm_run(problem, prox_g, prox_f, opts, nx, ny, lmb, dataterm,
                    interpret, tols, f_plane, w_plane, radius, state, until):
    """Chunked ADMM run.  The generic path computes residuals when the
    post-increment counter hits a multiple of residual_iter
    (backend/admm.py admm_step), so chunks start at iteration % ri == 0 —
    which the initial state already satisfies; a generic phase A handles
    arbitrary warm-start offsets, phase C the tail."""
    ri = max(int(opts.residual_iter), 1)
    eps = jnp.finfo(f_plane.dtype).eps

    def generic(s: ADMMState) -> ADMMState:
        return admm_step(problem, prox_g, prox_f, opts, tols, s)

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
            opts.alpha, dataterm=dataterm, interpret=interpret)
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

    # phase A: align to the residual grid (iteration % ri == 0)
    def cond_a(s):
        return (s.iteration % ri != 0) & (s.iteration < until) & ~s.converged

    state = lax.while_loop(cond_a, generic, state)

    # phase B: fused chunks of exactly ri iterations
    def cond_b(s):
        return (s.iteration + ri <= until) & ~s.converged

    state = lax.while_loop(cond_b, fused_chunk, state)

    # phase C: generic tail
    def cond_c(s):
        return (s.iteration < until) & ~s.converged

    return lax.while_loop(cond_c, generic, state)
