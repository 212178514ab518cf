"""Fused Pallas PDHG iteration for ROF-structured problems.

Workload: min_u c/2 ||u - f||^2 + ||grad u||_{2,1} with the Pock-Chambolle
alpha preconditioner — the canonical prost benchmark (ROF 256/512, and the
inner structure of TV-L1-like problems).  For a pure gradient2d operator
the preconditioner diagonals are the constants Sigma = 1/2, Tau = 1/4
(hardcoded row_sum=2 / col_sum=4, block_gradient2d.cu:150-160), so the
whole PDHG iteration is pointwise + two stencils.

Design (TPU-first):

* The generic path carries 8 full-size vectors (x, y, kx, kty + prevs) and
  streams ~25 MB of HBM per iteration through several fused kernels.
  Here the *mathematical* state is only (x, qx, qy): kx = grad(x) and
  kty = grad^T(q) are recomputed inside the kernel from VMEM-resident
  planes — stencils are VPU-cheap, HBM is the scarce resource.
* One `pallas_call` per iteration: 4 input planes (x, qx, qy, f), 3 output
  planes, everything else lives in VMEM/registers.  ~7 plane-traffics per
  iteration instead of ~25.
* Adaptive step sizes (tau, sigma, theta) enter as SMEM scalars, so the
  kernel is compiled once and reused as steps adapt.
* Residuals stay on the generic path: the fused loop runs the
  (residual_iter - 1) cheap iterations, then one generic `pdhg_step`
  computes residuals/adaptation exactly like the reference.

Whole planes are kept in VMEM (no grid): state+intermediates fit
comfortably up to 512x512 f32; larger problems fall back to the generic
path (`fits_vmem`).  Layout contract matches BlockGradient2D with
label_first=False and L=1: x viewed (nx, ny), y = [gx; gy] stacked planes.
"""

from __future__ import annotations

import dataclasses
from functools import partial

import jax
import jax.numpy as jnp
from jax import lax

from ..backend.pdhg import BackendPDHG, PDHGState, pdhg_step
from ..linop.base import LinearOperator
from ..linop.gradient import BlockGradient2D
from ..prox.combinators import ProxMoreau
from ..prox.elemop import ProxElem1D, ProxElemNorm2


def _shift_ops(shape, roll):
    """Forward-difference / adjoint stencils via native roll + iota masks
    (cheaper for Mosaic than concatenate-built shifts).  ``roll(a, shift,
    axis)`` is pltpu.roll inside the kernel, jnp.roll in plain-XLA use."""
    ri = lax.broadcasted_iota(jnp.int32, shape, 0)
    ci = lax.broadcasted_iota(jnp.int32, shape, 1)
    not_last_r = ri < (shape[0] - 1)
    not_first_r = ri > 0
    not_last_c = ci < (shape[1] - 1)
    not_first_c = ci > 0

    # pltpu.roll requires non-negative shifts: -1 == size-1 (circular)
    def dx(u):
        return jnp.where(not_last_r, roll(u, shape[0] - 1, 0) - u, 0.0)

    def dy(u):
        return jnp.where(not_last_c, roll(u, shape[1] - 1, 1) - u, 0.0)

    def dxt(p):
        lead = jnp.where(not_first_r, roll(p, 1, 0), 0.0)
        return lead - jnp.where(not_last_r, p, 0.0)

    def dyt(p):
        lead = jnp.where(not_first_c, roll(p, 1, 1), 0.0)
        return lead - jnp.where(not_last_c, p, 0.0)

    return dx, dy, dxt, dyt


def _rof_update(x, qx, qy, f, w, tau, sigma, theta, lmb, radius, ops,
                dataterm: str):
    """One preconditioned PDHG update on VMEM-resident planes.

    tau/sigma arrive pre-multiplied by the constant preconditioners
    (Tau = 1/4, Sigma = 1/2).  kx/kty are recomputed from (x, q) — the
    mathematical state fully determines them, stencils are VPU-cheap, and
    not carrying them removes over half the HBM traffic.

    dataterm (static):
      'square'   prox of lmb/2 (u - f)^2          (ROF)
      'wsquare'  prox of lmb/2 w (u - f)^2, plane w (TV inpainting)
      'abs'      prox of lmb |u - f|               (TV-L1)
    The dual prox is projection onto the radius-r 2-ball per pixel.
    """
    _dx, _dy, _dxt, _dyt = ops
    kty = _dxt(qx) + _dyt(qy)
    kxx = _dx(x)
    kxy = _dy(x)

    arg = x - tau * kty
    if dataterm == "square":
        # scalar reciprocal hoisted off the plane
        x_new = (arg + (tau * lmb) * f) * (1.0 / (1.0 + tau * lmb))
    elif dataterm == "wsquare":
        tw = (tau * lmb) * w
        x_new = (arg + tw * f) / (1.0 + tw)
    else:  # abs
        d = arg - f
        x_new = f + jnp.sign(d) * jnp.maximum(jnp.abs(d) - tau * lmb, 0.0)

    # dual step: extrapolated gradient + r-ball projection;
    # a * min(1, r/|a|) == a * min(1, r * rsqrt(|a|^2)) — one rsqrt
    # instead of sqrt + divide (rsqrt(0) = inf clamps to 1, exactly right)
    gx_new = _dx(x_new)
    gy_new = _dy(x_new)
    ax = qx + sigma * ((1.0 + theta) * gx_new - theta * kxx)
    ay = qy + sigma * ((1.0 + theta) * gy_new - theta * kxy)
    scale = jnp.minimum(1.0, radius * lax.rsqrt(ax * ax + ay * ay))
    return x_new, ax * scale, ay * scale


def _rof_burst_kernel(scal_ref, x_ref, qx_ref, qy_ref, f_ref, w_ref,
                      xo_ref, qxo_ref, qyo_ref, *, count: int,
                      dataterm: str):
    """``count`` (static) PDHG iterations with the state planes
    VMEM-resident for the whole burst: HBM traffic is one load + one store
    of 3 planes per *burst*, not per iteration.

    scal_ref (SMEM): [tau, sigma, theta, lmb, radius].
    """
    tau = scal_ref[0] * 0.25      # tau * Tau
    sigma = scal_ref[1] * 0.5     # sigma * Sigma
    theta = scal_ref[2]
    lmb = scal_ref[3]
    radius = scal_ref[4]

    f = f_ref[...]
    w = w_ref[...] if dataterm == "wsquare" else None

    from jax.experimental.pallas import tpu as pltpu

    ops = _shift_ops(f.shape, pltpu.roll)

    def body(_, carry):
        x, qx, qy = carry
        return _rof_update(x, qx, qy, f, w, tau, sigma, theta, lmb, radius,
                           ops, dataterm)

    x, qx, qy = lax.fori_loop(
        0, count, body, (x_ref[...], qx_ref[...], qy_ref[...]))
    xo_ref[...] = x
    qxo_ref[...] = qx
    qyo_ref[...] = qy


def rof_fused_burst(x, qx, qy, f, w, tau, sigma, theta, lmb, radius, count,
                    dataterm: str = "square", interpret: bool = False):
    """``count`` fused iterations in one kernel; all planes (nx, ny) f32.
    ``w`` is the weight plane for dataterm='wsquare' (pass f otherwise —
    it is ignored but keeps the input arity static)."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    scal = jnp.stack([
        tau, sigma, theta,
        jnp.asarray(lmb, x.dtype), jnp.asarray(radius, x.dtype),
    ])
    out_shape = [jax.ShapeDtypeStruct(x.shape, x.dtype)] * 3
    xo, qxo, qyo = pl.pallas_call(
        partial(_rof_burst_kernel, count=int(count), dataterm=dataterm),
        out_shape=out_shape,
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 3,
        interpret=interpret,
    )(scal, x, qx, qy, f, w)
    return xo, qxo, qyo


def fits_vmem(nx: int, ny: int, itemsize: int = 4) -> bool:
    """Whole-plane kernel budget: ~8 live planes must fit in ~14 MB VMEM."""
    return nx * ny * itemsize * 8 <= 14 * 1024 * 1024


def match_rof_structure(problem):
    """Detect the fusable ROF structure; returns dict(nx, ny, f, lmb) or
    None.  Conditions: single gradient2d block (L=1, label_first=False),
    prox_g = single 1D square with coeffs (1, f, lmb, 0, 0), prox_fstar =
    single Moreau(norm2 abs, dim=2 planar, coeffs (1,0,1,0,0)), alpha
    preconditioner (constant Sigma=1/2, Tau=1/4)."""
    import numpy as np

    linop = problem.linop
    if not isinstance(linop, LinearOperator) or len(linop.blocks) != 1:
        return None
    blk = linop.blocks[0]
    if not isinstance(blk, BlockGradient2D) or blk.L != 1 or blk.label_first:
        return None
    if len(problem.prox_g) != 1 or len(problem.prox_fstar) != 1:
        return None
    # --- data term ---------------------------------------------------------
    pg = problem.prox_g[0]
    if not isinstance(pg, ProxElem1D) or pg.fun not in ("square", "abs"):
        return None
    a, b, c, d, e, _, _ = pg.coeffs
    if not (np.isscalar(c) and np.isscalar(d) and d == 0.0
            and np.isscalar(e) and e == 0.0):
        return None
    nxy = blk.nx * blk.ny
    if np.isscalar(a) and a == 1.0:
        dataterm = "square" if pg.fun == "square" else "abs"
        f = jnp.asarray(b, jnp.float32).reshape(blk.nx, blk.ny)
        w = f  # ignored placeholder (keeps kernel arity static)
    elif pg.fun == "square" and np.asarray(a).size == nxy:
        # weighted quadratic lmb/2 (a u - b)^2 == lmb/2 a^2 (u - b/a)^2:
        # the masked data term of TV inpainting (example_tv_inpaint.m:22)
        dataterm = "wsquare"
        a_arr = np.asarray(a, np.float64)
        b_arr = np.broadcast_to(np.asarray(b, np.float64), a_arr.shape)
        safe = np.where(a_arr != 0, a_arr, 1.0)
        f = jnp.asarray(
            np.where(a_arr != 0, b_arr / safe, 0.0), jnp.float32
        ).reshape(blk.nx, blk.ny)
        w = jnp.asarray(a_arr**2, jnp.float32).reshape(blk.nx, blk.ny)
    else:
        return None

    # --- regularizer: per-pixel r-ball projection of the dual --------------
    pf = problem.prox_fstar[0]
    if isinstance(pf, ProxMoreau):
        inner = pf.child
        if not isinstance(inner, ProxElemNorm2) or inner.fun != "abs":
            return None
        if inner.dim != 2 or inner.interleaved:
            return None
        ia, ib, ic, idd, ie, _, _ = inner.coeffs
        for v, want in ((ia, 1.0), (ib, 0.0), (idd, 0.0), (ie, 0.0)):
            if not (np.isscalar(v) and v == want):
                return None
        if not np.isscalar(ic):
            return None
        radius = float(ic)  # conjugate of c|x| -> radius-c ball
    elif isinstance(pf, ProxElemNorm2) and pf.fun == "ind_leq0":
        if pf.dim != 2 or pf.interleaved:
            return None
        ia, ib, ic, idd, ie, _, _ = pf.coeffs
        for v in (ia, ib, ic):
            if not np.isscalar(v):
                return None
        if idd != 0.0 or ie != 0.0 or ia <= 0:
            return None
        radius = float(ib) / float(ia)  # I(a|x| - b <= 0) -> b/a ball
    else:
        return None

    # constant alpha preconditioner for a lone gradient2d block
    sl = np.asarray(problem.scaling_left)
    sr = np.asarray(problem.scaling_right)
    if not (np.allclose(sl, 0.5) and np.allclose(sr, 0.25)):
        return None
    if not fits_vmem(blk.nx, blk.ny):
        return None
    return {
        "nx": blk.nx, "ny": blk.ny, "f": f, "w": w,
        "lmb": float(c), "radius": radius, "dataterm": dataterm,
    }


class FusedROFPDHG(BackendPDHG):
    """BackendPDHG that runs ROF-structured problems through the fused
    Pallas iteration, falling back to the generic path when the structure
    does not match.  Residual iterations (and with them the adaptive
    step-size schemes) go through the generic ``pdhg_step``, preserving
    exact reference semantics for stopping/adaptation."""

    def __init__(self, problem, opts, solver_opts, interpret: bool = False):
        super().__init__(problem, opts, solver_opts)
        self.interpret = interpret
        # alg2 mutates (tau, sigma, theta) every iteration; the fused burst
        # holds them fixed, so it only serves the constant/residual-adaptive
        # schemes (alg1, boyd, goldstein).  The Mosaic kernel needs a real
        # TPU (or explicit interpreter mode for testing).
        import jax

        usable = (jax.default_backend() != "cpu") or interpret
        self.rof = (
            None if (opts.stepsize == "alg2" or not usable)
            else match_rof_structure(problem)
        )
        if self.rof is not None and self.solver_opts.verbose:
            print("FusedROFPDHG: using fused Pallas iteration.")

    def run(self, state: PDHGState, until_iter: int) -> PDHGState:
        if self.rof is None:
            return super().run(state, until_iter)
        sopts = self.solver_opts
        tols = (sopts.tol_rel_primal, sopts.tol_rel_dual,
                sopts.tol_abs_primal, sopts.tol_abs_dual)
        r = self.rof
        return _fused_rof_run(
            self.problem, self.prox_g, self.prox_fstar, self.opts,
            r["nx"], r["ny"], r["lmb"], r["dataterm"], self.interpret,
            tols, r["f"], r["w"], jnp.asarray(r["radius"], jnp.float32),
            state, jnp.asarray(until_iter, jnp.int32),
        )


@partial(jax.jit, static_argnums=(3, 4, 5, 6, 7, 8), donate_argnums=(13,))
def _fused_rof_run(problem, prox_g, prox_fstar, opts, nx, ny, lmb, dataterm,
                   interpret, tols, f_plane, w_plane, radius, state, until):
    """Three phases around a static-length fused burst (the in-kernel loop
    bound must be static for Mosaic):

      A. generic steps until iteration % ri == 0 (alignment, <= ri-1 steps)
      B. while room: burst of (ri - 1) fused iterations in ONE kernel
         + one generic step (residuals, adaptation, convergence test)
      C. generic steps for the tail until ``until``
    """
    ri = max(int(opts.residual_iter), 1)
    n = nx * ny

    def generic(s: PDHGState) -> PDHGState:
        return pdhg_step(problem, prox_g, prox_fstar, opts, tols, s)

    def fused_chunk(s: PDHGState) -> PDHGState:
        x = s.x.reshape(nx, ny)
        qx = s.y[:n].reshape(nx, ny)
        qy = s.y[n:].reshape(nx, ny)
        x, qx, qy = rof_fused_burst(
            x, qx, qy, f_plane, w_plane, s.tau, s.sigma, s.theta, lmb,
            radius, ri - 1, dataterm=dataterm, interpret=interpret)
        y = jnp.concatenate([qx.reshape(-1), qy.reshape(-1)])
        xf = x.reshape(-1)
        # refresh the derived operator applies for the generic step
        kx = problem.linop.apply(xf)
        kty = problem.linop.apply_adjoint(y)
        return dataclasses.replace(
            s, x=xf, y=y, kx=kx, kty=kty,
            iteration=s.iteration + (ri - 1),
        )

    # phase A: align to the residual grid with generic steps
    def cond_a(s):
        return (s.iteration % ri != 0) & (s.iteration < until) & ~s.converged

    state = lax.while_loop(cond_a, generic, state)

    if ri > 1:
        # phase B: aligned chunks = one generic step (residuals computed at
        # iteration % ri == 0, exactly like the plain loop) followed by a
        # (ri - 1)-iteration fused burst; only while the whole chunk fits
        def cond_b(s):
            return (s.iteration + ri <= until) & ~s.converged

        def body_b(s):
            return fused_chunk(generic(s))

        state = lax.while_loop(cond_b, body_b, state)

    # phase C: generic tail
    def cond_c(s):
        return (s.iteration < until) & ~s.converged

    return lax.while_loop(cond_c, generic, state)
