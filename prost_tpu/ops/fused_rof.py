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
  Here the *mathematical* state is only (x, q): kx = grad(x) and
  kty = grad^T(q) are recomputed inside the kernel from VMEM-resident
  planes — stencils are VPU-cheap, HBM is the scarce resource.
* ONE kernel per residual_iter-sized chunk (`_rof_chunk_kernel`), holding
  all state in VMEM for its whole run: (residual_iter - 1) plain
  iterations, then the aligned iteration PLUS the four preconditioned
  residual norms (backend_pdhg.cu:73-120) reduced in-kernel to SMEM
  scalars.  The gradient planes (gx, gy) are loop-carried — the dual step
  of iteration k computes grad(x^{k+1}), which is exactly what the primal
  extrapolation of iteration k+1 needs, saving 2 of the 6 stencils per
  iteration and making the residual's K x_prev free.  This removes the
  generic residual step (the former per-chunk bottleneck: a full
  multi-pass XLA program over 8 flat vectors) from the hot loop entirely;
  the solver-state operator products (kx, kty, kx_prev, kty_prev) are
  refreshed once per run() in an XLA epilogue.
* Step-size adaptation (boyd/goldstein) and the convergence test run on
  the returned scalars via the exact generic code path
  (``residual_and_adapt``), preserving reference semantics.
* Adaptive step sizes (tau, sigma, theta) enter as SMEM scalars, so the
  kernels are compiled once and reused as steps adapt.
* The dual planes travel as one (2, nx, ny) ref, so state.y <-> kernel
  views are pure reshapes (no concatenates in the chunk loop).

Whole planes are kept in VMEM (no grid) while state+intermediates fit
under the raised ``vmem_limit_bytes`` (~1024x1024 f32); larger problems
run the SAME math through ``rof_fused_chunk_tiled`` — row bands with a
(2*ri + 2)-row halo through the halo-extended kernel (the sharded path's
kernel), bit-identical on owned rows — so the fused path never falls off
a VMEM cliff (``band_count`` picks the tiling; only pathological
geometries where bands would be thinner than their halo fall back to the
generic path).  Layout contract matches BlockGradient2D with
label_first=False and L=1: x viewed (nx, ny), y = [gx; gy] stacked
planes.
"""

from __future__ import annotations

import dataclasses
from functools import partial

import jax
import jax.numpy as jnp
from jax import lax

from ..backend.pdhg import (BackendPDHG, PDHGState, pdhg_step,
                            residual_and_adapt)
from ..linop.base import LinearOperator
from ..linop.gradient import BlockGradient2D
from ..prox.combinators import ProxMoreau
from ..prox.elemop import ProxElem1D, ProxElemNorm2

# Scoped-VMEM budget for the whole-plane kernels.  The Mosaic default
# (16 MB) is exactly at the edge for 512x512 f32; raising it is safe — the
# compiler still errors out (and we fall back) if the hardware can't fit.
_VMEM_LIMIT = 96 * 1024 * 1024

_SQRT_S = 0.7071067811865476  # sqrt(Sigma) = sqrt(1/2)
_SQRT_T = 0.5                 # sqrt(Tau)   = sqrt(1/4)

# chunks per multi-chunk launch (in-kernel adaptation between chunks):
# amortizes per-launch dispatch + whole-state HBM in/out by this factor;
# convergence granularity stays one chunk (post-convergence chunks are
# branched around in-kernel)
_K_CHUNKS = 8


def _shift_ops(shape, roll, row_offset=None, nx_global=None,
               maskless_adjoint=False):
    """Forward-difference / adjoint stencils via native roll + iota masks
    (cheaper for Mosaic than concatenate-built shifts).  ``roll(a, shift,
    axis)`` is pltpu.roll inside the kernel, jnp.roll in plain-XLA use.

    With (row_offset, nx_global) the row masks use GLOBAL row indices
    (local iota + row_offset): this makes the stencils correct on a
    halo-extended shard of a row-partitioned plane — the Neumann boundary
    applies at global rows 0 / nx_global-1, not at the shard edges
    (parallel/spatial_fused.py).  Rolls stay local; the wrap rows they
    bring in only touch halo rows, never owned rows.

    ``maskless_adjoint`` (whole-plane kernels only) drops BOTH selects
    from dxt/dyt: the adjoint is EXACT whenever its operand has a zero
    last row (dxt) / last column (dyt), because the circular roll then
    wraps a ZERO into the lead term at row 0 and the trailing ``-p``
    vanishes at the last row.  That zero-boundary property is an
    invariant of the dual planes (the masked forward gradient's last
    row/col is structurally zero, and the ball projection preserves
    zeros), enforced once per chunk by ``_project_dead_dual`` — turning
    6 boundary selects per iteration into 2 per CHUNK (round-4 verdict
    task #2; measured +17% kernel-only in tools/stencil_probe.py, bit
    equal on hardware).  Not valid under sharding (the boundary rows of
    a shard's window are live halo data, not structural zeros).
    """
    ri = lax.broadcasted_iota(jnp.int32, shape, 0)
    ci = lax.broadcasted_iota(jnp.int32, shape, 1)
    if row_offset is not None:
        gri = ri + row_offset
        not_last_r = gri < (nx_global - 1)
        not_first_r = gri > 0
    else:
        not_last_r = ri < (shape[0] - 1)
        not_first_r = ri > 0
    not_last_c = ci < (shape[1] - 1)
    not_first_c = ci > 0

    # pltpu.roll requires non-negative shifts: -1 == size-1 (circular)
    def dx(u):
        return jnp.where(not_last_r, roll(u, shape[0] - 1, 0) - u, 0.0)

    def dy(u):
        return jnp.where(not_last_c, roll(u, shape[1] - 1, 1) - u, 0.0)

    if maskless_adjoint and row_offset is None:
        def dxt(p):  # exact given p[-1, :] == 0
            return roll(p, 1, 0) - p

        def dyt(p):  # exact given p[:, -1] == 0
            return roll(p, 1, 1) - p
    else:
        def dxt(p):
            lead = jnp.where(not_first_r, roll(p, 1, 0), 0.0)
            return lead - jnp.where(not_last_r, p, 0.0)

        def dyt(p):
            lead = jnp.where(not_first_c, roll(p, 1, 1), 0.0)
            return lead - jnp.where(not_last_c, p, 0.0)

    return dx, dy, dxt, dyt


def _project_dead_dual(qx, qy):
    """Zero the DEAD dual coordinates: q_x's last row / q_y's last column
    multiply structurally-zero rows of K (the masked forward difference
    never writes them), so they never enter K^T y; the algorithm maps
    zeros to zeros there (the ball projection scales them).  Zeroing once
    at chunk entry (a) makes the maskless adjoint stencils exact and
    (b) is a no-op on every state the solver itself produces from the
    default y0 = 0.  A user warm start carrying mass on the dead
    coordinates is projected off it — the generic path would instead let
    it decay multiplicatively (it only affects those coordinates and
    their contribution to the boundary ball projection / residual
    norms); tests/test_fused_rof.py pins this documented deviation."""
    ri = lax.broadcasted_iota(jnp.int32, qx.shape, 0)
    ci = lax.broadcasted_iota(jnp.int32, qy.shape, 1)
    qx = jnp.where(ri < (qx.shape[0] - 1), qx, 0.0)
    qy = jnp.where(ci < (qy.shape[1] - 1), qy, 0.0)
    return qx, qy


def _hoist_dataterm(f, w, tau, lmb, dataterm: str):
    """Pre-compute the per-burst constant planes/scalars of the primal prox.

    square / wsquare share the affine form  x_new = (arg + dt0) * dt1;
    abs keeps (f, shrink-amount).  tau is constant within a burst, so this
    hoists a plane's worth of multiplies out of every iteration.
    """
    if dataterm == "square":
        return (tau * lmb) * f, 1.0 / (1.0 + tau * lmb)
    if dataterm == "wsquare":
        tw = (tau * lmb) * w
        return tw * f, 1.0 / (1.0 + tw)
    return f, tau * lmb  # abs


def _rof_update(x, qx, qy, gx, gy, dt0, dt1, tau, sig_p, sig_t, radius, ops,
                dataterm: str):
    """One preconditioned PDHG update on VMEM-resident planes.

    tau arrives pre-multiplied by the constant preconditioner (Tau = 1/4);
    sig_p = sigma*Sigma*(1+theta), sig_t = sigma*Sigma*theta.  (gx, gy) is
    grad(x) carried from the previous iteration.  Returns the new state,
    the new gradient planes, and kty (= K^T of the *old* dual) for the
    residual kernel.
    """
    _dx, _dy, _dxt, _dyt = ops
    kty = _dxt(qx) + _dyt(qy)

    arg = x - tau * kty
    if dataterm in ("square", "wsquare"):
        x_new = (arg + dt0) * dt1
    else:  # abs — soft shrink as arg - clamp(d): mathematically
        # equivalent to f + sign(d)*max(|d|-t, 0) with 2 fewer VPU ops
        # (in f32 the two forms can differ in rounding order; verified
        # bit-exact on the test fixtures, and the fused-vs-generic
        # equivalence tests pin the trajectory)
        d = arg - dt0
        x_new = arg - jnp.clip(d, -dt1, dt1)

    # dual step: extrapolated gradient + r-ball projection;
    # a * min(1, r/|a|) == a * min(1, r * rsqrt(|a|^2)) — one rsqrt
    # instead of sqrt + divide (rsqrt(0) = inf clamps to 1, exactly right)
    gx_new = _dx(x_new)
    gy_new = _dy(x_new)
    ax = qx + sig_p * gx_new - sig_t * gx
    ay = qy + sig_p * gy_new - sig_t * gy
    scale = jnp.minimum(1.0, radius * lax.rsqrt(ax * ax + ay * ay))
    return x_new, ax * scale, ay * scale, gx_new, gy_new, kty



def _chunk_core(tau_raw, sigma_raw, theta, lmb, radius, x0, qx0, qy0, f, w,
                count: int, dataterm: str, halo_ctx=None, g0=None,
                return_g=False):
    """The math of one residual_iter-sized chunk on VMEM-resident planes:
    ``count - 1`` plain iterations, then the aligned iteration with its
    four preconditioned residual norms (squared).  Shared by the
    single-instance, batched (gridded), and halo-sharded kernels.

    halo_ctx = (row_offset, nx_global, own_lo, own_hi) runs the chunk on a
    halo-extended shard: stencil masks use global rows, and the norms are
    restricted to the shard's owned local rows [own_lo, own_hi) so a
    cross-shard psum reproduces the global norms exactly.

    ``g0`` optionally seeds the carried gradient planes with grad(x0)
    computed by a previous chunk (the aligned iteration's grad(x2) IS the
    next chunk's seed), saving the 2 seed stencils; ``return_g=True``
    appends grad(x2) to the returns for that carry.

    Returns (x2, qx2, qy2, x_prev, qx_prev, qy_prev, (n0, n1, n2, n3)
    [, (gx2, gy2)]).
    """
    from jax.experimental.pallas import tpu as pltpu

    tau = tau_raw * 0.25       # tau * Tau
    sigma_p = sigma_raw * 0.5  # sigma * Sigma
    sig_p = sigma_p * (1.0 + theta)
    sig_t = sigma_p * theta
    w = w if dataterm == "wsquare" else None
    dt0, dt1 = _hoist_dataterm(f, w, tau, lmb, dataterm)
    if halo_ctx is not None:
        row_offset, nx_global, own_lo, own_hi = halo_ctx
        ops = _shift_ops(f.shape, pltpu.roll, row_offset, nx_global)
        lri = lax.broadcasted_iota(jnp.int32, f.shape, 0)
        owned = (lri >= own_lo) & (lri < own_hi)

        def nsum(v):
            return jnp.sum(jnp.where(owned, v, 0.0))
    else:
        ops = _shift_ops(f.shape, pltpu.roll, maskless_adjoint=True)
        nsum = jnp.sum
        qx0, qy0 = _project_dead_dual(qx0, qy0)
    _dx, _dy = ops[0], ops[1]

    def body(_, carry):
        x, qx, qy, gx, gy = carry
        x, qx, qy, gx, gy, _ = _rof_update(
            x, qx, qy, gx, gy, dt0, dt1, tau, sig_p, sig_t, radius, ops,
            dataterm)
        return x, qx, qy, gx, gy

    gx0, gy0 = (_dx(x0), _dy(x0)) if g0 is None else g0
    x, qx, qy, gxp, gyp = lax.fori_loop(
        0, count - 1, body, (x0, qx0, qy0, gx0, gy0))

    # aligned iteration; (gxp, gyp) is grad(x_prev) carried for free
    x2, qx2, qy2, gx2, gy2, ktyp = _rof_update(
        x, qx, qy, gxp, gyp, dt0, dt1, tau, sig_p, sig_t, radius, ops,
        dataterm)
    kty2 = ops[2](qx2) + ops[3](qy2)

    inv_s = 1.0 / (sigma_raw * _SQRT_S)
    zh_x = (qx - qx2) * inv_s + _SQRT_S * ((1.0 + theta) * gx2 - theta * gxp)
    zh_y = (qy - qy2) * inv_s + _SQRT_S * ((1.0 + theta) * gy2 - theta * gyp)
    pd_x = zh_x - _SQRT_S * gx2
    pd_y = zh_y - _SQRT_S * gy2
    wh = (x - x2) * (1.0 / (tau_raw * _SQRT_T)) - _SQRT_T * ktyp
    dd = wh + _SQRT_T * kty2

    norms = (
        nsum(pd_x * pd_x) + nsum(pd_y * pd_y),
        nsum(zh_x * zh_x) + nsum(zh_y * zh_y),
        nsum(dd * dd),
        nsum(wh * wh),
    )
    if return_g:
        return x2, qx2, qy2, x, qx, qy, norms, (gx2, gy2)
    return x2, qx2, qy2, x, qx, qy, norms


def adapt_scalars(stepsize: str, consts, tols4, it, tau, sigma, arg_alpha,
                  arb_l, arb_u, pr, pn, dr, dn):
    """In-kernel mirror of ``backend.pdhg.residual_and_adapt``'s scalar
    math (backend_pdhg.cu:443-476): same operations in the same order on
    f32 scalars, so a multi-chunk kernel that adapts in SMEM follows the
    exact trajectory of the launch-per-chunk path.  ``consts`` =
    (sqrt_nrows, sqrt_ncols, arg_delta, arg_nu, arb_delta, arb_tau) are
    compile-time floats; ``tols4`` and ``it`` (the pre-increment counter
    of the residual iteration, as f32) are traced.

    Returns (tau, sigma, arg_alpha, arb_l, arb_u, converged)."""
    trp, trd, tap, tad = tols4
    sqrt_nrows, sqrt_ncols, arg_delta, arg_nu, arb_delta, arb_tau = consts
    eps_pri = sqrt_nrows * tap + trp * pn
    eps_dua = sqrt_ncols * tad + trd * dn
    conv = (pr < eps_pri) & (dr < eps_dua)
    if stepsize == "goldstein":
        scale = eps_dua / eps_pri
        up = dr > scale * pr * arg_delta
        dn_ = dr < scale * pr / arg_delta
        fac = 1.0 - arg_alpha
        tau = jnp.where(up, tau / fac, jnp.where(dn_, tau * fac, tau))
        sigma = jnp.where(up, sigma * fac,
                          jnp.where(dn_, sigma / fac, sigma))
        arg_alpha = jnp.where(up | dn_, arg_alpha * arg_nu, arg_alpha)
    elif stepsize == "boyd":
        c1 = (dr < eps_dua) & (arb_tau * it > arb_l)
        c2 = (pr < eps_pri) & (arb_tau * it > arb_u) & ~c1
        tau = jnp.where(c1, tau / arb_delta,
                        jnp.where(c2, tau * arb_delta, tau))
        sigma = jnp.where(c1, sigma * arb_delta,
                          jnp.where(c2, sigma / arb_delta, sigma))
        arb_u = jnp.where(c1, it, arb_u)
        arb_l = jnp.where(c2, it, arb_l)
    return tau, sigma, arg_alpha, arb_l, arb_u, conv


def pdhg_adapt_consts(problem, opts) -> tuple:
    """The compile-time constant tuple for ``adapt_scalars``."""
    import math

    return (math.sqrt(float(problem.nrows)), math.sqrt(float(problem.ncols)),
            float(opts.arg_delta), float(opts.arg_nu),
            float(opts.arb_delta), float(opts.arb_tau))


def _rof_multichunk_kernel(scal_ref, x_ref, q_ref, f_ref, w_ref,
                           xo_ref, qo_ref, xpo_ref, qpo_ref, norms_ref,
                           sout_ref, *, count: int, k_chunks: int,
                           dataterm: str, stepsize: str, consts):
    """``k_chunks`` whole residual_iter-sized chunks in ONE kernel, with
    the boyd/goldstein step-size adaptation and the convergence test run
    IN-KERNEL between chunks (``adapt_scalars``): one launch advances up
    to k_chunks * count iterations while the state stays VMEM-resident
    the whole time — amortizing both the per-launch dispatch and the
    whole-state HBM in/out that capped the launch-per-chunk path at ~65%
    of the kernel-only rate (PERFORMANCE.md round 3).

    Chunks after the convergence point are skipped via lax.cond (their
    compute is branched around, not masked).  The gradient planes carry
    ACROSS chunks (the aligned iteration's grad(x2) seeds the next
    chunk), saving the 2 per-chunk seed stencils of the single-chunk
    kernel.

    scal_ref (SMEM, 13): [tau, sigma, theta, lmb, radius, arg_alpha,
    arb_l, arb_u, it0, tol_rel_p, tol_rel_d, tol_abs_p, tol_abs_d].
    norms_ref (SMEM out, 4): the LAST EXECUTED chunk's four
    preconditioned residual norms (sqrt'd, unlike the single-chunk
    kernel's squared norms).  sout_ref (SMEM out, 7): [tau, sigma,
    arg_alpha, arb_l, arb_u, converged, chunks_done].
    """
    theta = scal_ref[2]
    lmb = scal_ref[3]
    radius = scal_ref[4]
    it0 = scal_ref[8]
    tols4 = (scal_ref[9], scal_ref[10], scal_ref[11], scal_ref[12])
    f = f_ref[...]
    w = w_ref[...]
    q = q_ref[...]
    x0 = x_ref[...]
    zero = jnp.zeros((), x0.dtype)

    def chunk(c, carry):
        planes, scal, norms = carry
        tau, sigma, arg_alpha, arb_l, arb_u, conv, done = scal

        def run(t):
            planes_t, scal_t, _ = t
            x, qx, qy, _, _, _, gx, gy = planes_t
            tau_t, sigma_t, aa_t, al_t, au_t, _, done_t = scal_t
            x2, qx2, qy2, xpn, qxpn, qypn, nrm, g2 = _chunk_core(
                tau_t, sigma_t, theta, lmb, radius, x, qx, qy, f, w,
                count, dataterm, g0=(gx, gy), return_g=True)
            pr = jnp.sqrt(nrm[0])
            pn_ = jnp.sqrt(nrm[1])
            dr = jnp.sqrt(nrm[2])
            dn_ = jnp.sqrt(nrm[3])
            it = it0 + ((c + 1) * count - 1).astype(x0.dtype)
            tau2, sigma2, aa2, al2, au2, cv = adapt_scalars(
                stepsize, consts, tols4, it, tau_t, sigma_t, aa_t,
                al_t, au_t, pr, pn_, dr, dn_)
            return ((x2, qx2, qy2, xpn, qxpn, qypn, g2[0], g2[1]),
                    (tau2, sigma2, aa2, al2, au2, cv, done_t + 1.0),
                    (pr, pn_, dr, dn_))

        return lax.cond(conv, lambda t: t, run, carry)

    from jax.experimental.pallas import tpu as pltpu

    ops = _shift_ops(f.shape, pltpu.roll)
    gx0, gy0 = ops[0](x0), ops[1](x0)
    init = (
        (x0, q[0], q[1], x0, q[0], q[1], gx0, gy0),
        (scal_ref[0], scal_ref[1], scal_ref[5], scal_ref[6], scal_ref[7],
         jnp.asarray(False), zero),
        (zero, zero, zero, zero),
    )
    planes, scal, norms = lax.fori_loop(0, k_chunks, chunk, init)
    x2, qx2, qy2, xp, qxp, qyp, _, _ = planes
    tau, sigma, arg_alpha, arb_l, arb_u, conv, done = scal
    for i in range(4):
        norms_ref[i] = norms[i]
    for i, v in enumerate((tau, sigma, arg_alpha, arb_l, arb_u,
                           conv.astype(x0.dtype), done)):
        sout_ref[i] = v
    xo_ref[...] = x2
    qo_ref[0] = qx2
    qo_ref[1] = qy2
    xpo_ref[...] = xp
    qpo_ref[0] = qxp
    qpo_ref[1] = qyp


def rof_fused_multichunk(x, q, f, w, scal13, count, k_chunks,
                         dataterm: str, stepsize: str, consts,
                         interpret: bool = False):
    """Up to ``k_chunks * count`` fused iterations in ONE kernel with
    in-kernel adaptation/convergence.  ``scal13`` is the length-13 SMEM
    vector documented on ``_rof_multichunk_kernel``.  Returns
    (x2, q2, x_prev, q_prev, norms, sout) — norms are the last executed
    chunk's (sqrt'd) residual norms, sout the 7 updated scalars."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    out_shape = [
        jax.ShapeDtypeStruct(x.shape, x.dtype),   # x2
        jax.ShapeDtypeStruct(q.shape, q.dtype),   # q2
        jax.ShapeDtypeStruct(x.shape, x.dtype),   # x_prev
        jax.ShapeDtypeStruct(q.shape, q.dtype),   # q_prev
        jax.ShapeDtypeStruct((4,), x.dtype),      # norms (last chunk)
        jax.ShapeDtypeStruct((7,), x.dtype),      # scalars out
    ]
    smem = pl.BlockSpec(memory_space=pltpu.SMEM)
    out_specs = _plane_specs(4) + [smem, smem]
    return pl.pallas_call(
        partial(_rof_multichunk_kernel, count=int(count),
                k_chunks=int(k_chunks), dataterm=dataterm,
                stepsize=stepsize, consts=consts),
        out_shape=out_shape,
        in_specs=[smem] + _plane_specs(4),
        out_specs=out_specs,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=_VMEM_LIMIT),
        interpret=interpret,
    )(scal13, x, q, f, w)


def _rof_chunk_kernel(scal_ref, x_ref, q_ref, f_ref, w_ref,
                      xo_ref, qo_ref, xpo_ref, qpo_ref, norms_ref, *,
                      count: int, dataterm: str):
    """One whole residual_iter-sized chunk in ONE kernel, residual norms
    reduced to SMEM.

    Outputs the new iterate (x2, q2) and the pre-aligned-step iterate
    (x_prev, q_prev) — the carried gradient planes make K x_prev free, and
    the K / K^T products the *solver state* needs (kx, kty, kx_prev,
    kty_prev) are recomputed once per run() in an XLA epilogue instead of
    per chunk, saving 6 plane writes and a second kernel launch here.
    """
    q = q_ref[...]
    x2, qx2, qy2, xp, qxp, qyp, norms = _chunk_core(
        scal_ref[0], scal_ref[1], scal_ref[2], scal_ref[3], scal_ref[4],
        x_ref[...], q[0], q[1], f_ref[...], w_ref[...], count, dataterm)
    for i in range(4):
        norms_ref[i] = norms[i]
    xo_ref[...] = x2
    qo_ref[0] = qx2
    qo_ref[1] = qy2
    xpo_ref[...] = xp
    qpo_ref[0] = qxp
    qpo_ref[1] = qyp


def _rof_chunk_kernel_batched(scal_ref, x_ref, q_ref, f_ref, w_ref,
                              xo_ref, qo_ref, xpo_ref, qpo_ref, norms_ref, *,
                              count: int, dataterm: str):
    """Gridded batch variant: grid = (B,), one instance per grid step.
    Plane refs carry a leading length-1 instance axis; scal_ref/norms_ref
    are the WHOLE (5, B)/(4, B) SMEM arrays, indexed by program_id (a
    blocked SMEM spec would violate Mosaic's (8, 128)-divisibility rule,
    and the scalars-last layout would be lane-padded B x 128)."""
    from jax.experimental import pallas as pl

    b = pl.program_id(0)
    q = q_ref[0]
    x2, qx2, qy2, xp, qxp, qyp, norms = _chunk_core(
        scal_ref[0, b], scal_ref[1, b], scal_ref[2, b], scal_ref[3, b],
        scal_ref[4, b],
        x_ref[0], q[0], q[1], f_ref[0], w_ref[0], count, dataterm)
    for i in range(4):
        norms_ref[i, b] = norms[i]
    xo_ref[0] = x2
    qo_ref[0, 0] = qx2
    qo_ref[0, 1] = qy2
    xpo_ref[0] = xp
    qpo_ref[0, 0] = qxp
    qpo_ref[0, 1] = qyp



def _rof_chunk_kernel_halo(scal_ref, x_ref, q_ref, f_ref, w_ref,
                           xo_ref, qo_ref, xpo_ref, qpo_ref, norms_ref, *,
                           count: int, nx_global: int, dataterm: str):
    """Halo-sharded chunk: the refs are one shard's halo-EXTENDED planes;
    stencil masks use global rows and the SMEM norms cover only the owned
    rows (summed across shards by the caller's psum).

    scal_ref (SMEM): [tau, sigma, theta, lmb, radius, row_offset, own_lo,
    own_hi] — the last three are per-shard integers (as floats).
    """
    q = q_ref[...]
    halo_ctx = (scal_ref[5].astype(jnp.int32), nx_global,
                scal_ref[6].astype(jnp.int32), scal_ref[7].astype(jnp.int32))
    x2, qx2, qy2, xp, qxp, qyp, norms = _chunk_core(
        scal_ref[0], scal_ref[1], scal_ref[2], scal_ref[3], scal_ref[4],
        x_ref[...], q[0], q[1], f_ref[...], w_ref[...], count, dataterm,
        halo_ctx=halo_ctx)
    for i in range(4):
        norms_ref[i] = norms[i]
    xo_ref[...] = x2
    qo_ref[0] = qx2
    qo_ref[1] = qy2
    xpo_ref[...] = xp
    qpo_ref[0] = qxp
    qpo_ref[1] = qyp


def rof_fused_chunk_halo(x, q, f, w, scal, count, nx_global,
                         dataterm: str = "square", interpret: bool = False):
    """``count`` fused iterations on one halo-extended shard.  x/f/w are
    (nxb, ny) local blocks, q is (2, nxb, ny); scal is the length-8 vector
    [tau, sigma, theta, lmb, radius, row_offset, own_lo, own_hi].  Returns
    (x2, q2, x_prev, q_prev, norms2) with norms2 covering owned rows only."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    out_shape = [
        jax.ShapeDtypeStruct(x.shape, x.dtype),   # x2
        jax.ShapeDtypeStruct(q.shape, q.dtype),   # q2
        jax.ShapeDtypeStruct(x.shape, x.dtype),   # x_prev
        jax.ShapeDtypeStruct(q.shape, q.dtype),   # q_prev
        jax.ShapeDtypeStruct((4,), x.dtype),      # norms^2 (owned rows)
    ]
    out_specs = _plane_specs(4) + [pl.BlockSpec(memory_space=pltpu.SMEM)]
    return pl.pallas_call(
        partial(_rof_chunk_kernel_halo, count=int(count),
                nx_global=int(nx_global), dataterm=dataterm),
        out_shape=out_shape,
        in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM)] + _plane_specs(4),
        out_specs=out_specs,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=_VMEM_LIMIT),
        interpret=interpret,
    )(scal, x, q, f, w)


def _plane_specs(n):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    return [pl.BlockSpec(memory_space=pltpu.VMEM)] * n


def _scal_vec(x, tau, sigma, theta, lmb, radius):
    return jnp.stack([
        jnp.asarray(tau, x.dtype), jnp.asarray(sigma, x.dtype),
        jnp.asarray(theta, x.dtype),
        jnp.asarray(lmb, x.dtype), jnp.asarray(radius, x.dtype),
    ])



def rof_fused_chunk(x, q, f, w, tau, sigma, theta, lmb, radius, count,
                    dataterm: str = "square", interpret: bool = False):
    """``count`` fused iterations ending on a residual iteration, in one
    kernel.  Returns (x2, q2, x_prev, q_prev, norms2) where norms2 is the
    length-4 vector of SQUARED preconditioned residual norms at the final
    iteration."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    scal = _scal_vec(x, tau, sigma, theta, lmb, radius)
    out_shape = [
        jax.ShapeDtypeStruct(x.shape, x.dtype),   # x2
        jax.ShapeDtypeStruct(q.shape, q.dtype),   # q2
        jax.ShapeDtypeStruct(x.shape, x.dtype),   # x_prev
        jax.ShapeDtypeStruct(q.shape, q.dtype),   # q_prev
        jax.ShapeDtypeStruct((4,), x.dtype),      # norms^2
    ]
    out_specs = _plane_specs(4) + [pl.BlockSpec(memory_space=pltpu.SMEM)]
    return pl.pallas_call(
        partial(_rof_chunk_kernel, count=int(count), dataterm=dataterm),
        out_shape=out_shape,
        in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM)] + _plane_specs(4),
        out_specs=out_specs,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=_VMEM_LIMIT),
        interpret=interpret,
    )(scal, x, q, f, w)



def rof_fused_chunk_batched(x, q, f, w, scal, count,
                            dataterm: str = "square",
                            interpret: bool = False):
    """Batched chunk: grid over the instance axis, one chunk per instance
    per kernel call.  x/f/w are (B, nx, ny), q is (B, 2, nx, ny), scal is
    (B, 5) rows of [tau, sigma, theta, lmb, radius] (per-instance adaptive
    step sizes).  Returns (x2, q2, x_prev, q_prev, norms2) with norms2 of
    shape (B, 4)."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    B, nx, ny = x.shape
    smem = pl.BlockSpec(memory_space=pltpu.SMEM)  # whole-array
    xspec = pl.BlockSpec((1, nx, ny), lambda b: (b, 0, 0),
                         memory_space=pltpu.VMEM)
    qspec = pl.BlockSpec((1, 2, nx, ny), lambda b: (b, 0, 0, 0),
                         memory_space=pltpu.VMEM)
    out_shape = [
        jax.ShapeDtypeStruct(x.shape, x.dtype),   # x2
        jax.ShapeDtypeStruct(q.shape, q.dtype),   # q2
        jax.ShapeDtypeStruct(x.shape, x.dtype),   # x_prev
        jax.ShapeDtypeStruct(q.shape, q.dtype),   # q_prev
        jax.ShapeDtypeStruct((4, B), x.dtype),    # norms^2
    ]
    return pl.pallas_call(
        partial(_rof_chunk_kernel_batched, count=int(count),
                dataterm=dataterm),
        grid=(B,),
        out_shape=out_shape,
        in_specs=[smem, xspec, qspec, xspec, xspec],
        out_specs=[xspec, qspec, xspec, qspec, smem],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=_VMEM_LIMIT),
        interpret=interpret,
    )(scal, x, q, f, w)


def fits_vmem(nx: int, ny: int, itemsize: int = 4) -> bool:
    """Whole-plane kernel budget: ~20 live planes must fit in the raised
    VMEM limit (96 MB requested; 512x512 f32 = 20 MB, comfortable)."""
    return nx * ny * itemsize * 20 <= _VMEM_LIMIT


def band_count(nx: int, ny: int, residual_iter: int, n_planes: int = 20,
               itemsize: int = 4) -> int | None:
    """Row-band tiling factor for problems too big for the whole-plane
    kernel: the smallest divisor ``n_bands`` of nx such that one
    halo-extended (nx/n_bands + 2*(2*ri + 2), ny) band keeps ~n_planes
    live planes within 75% of the VMEM limit (the n_planes estimate
    undercounts Mosaic temporaries — a band sized right at the limit was
    measured to be REJECTED at 2048x2048, silently falling back to the
    generic path).  Returns 1 when the whole plane fits, None when no
    efficient tiling exists (bands would be thinner than their halos, or
    nx has no suitable divisor) — the caller then falls back to the
    generic path, as block_gradient2d.cu-style kernels never need to
    (the reference streams HBM per op and works at any size; here tiling
    is what removes the VMEM residency cap)."""
    # whole-plane keeps the full limit (80 MB live planes measured fine
    # at ROF 1024x1024); the stricter budget applies to bands only
    if nx * ny * itemsize * n_planes <= _VMEM_LIMIT:
        return 1
    budget = int(0.75 * _VMEM_LIMIT)
    # the banded kernel's DMA slices must be 8-aligned along the sublane
    # dim: halo rounds up to a multiple of 8 and band rows must be too
    halo = -(-(2 * max(int(residual_iter), 1) + 2) // 8) * 8
    for n_bands in range(2, nx + 1):
        if nx % n_bands:
            continue
        rows = nx // n_bands
        if rows % 8:
            continue
        if rows < halo:  # halo recompute would dominate
            return None
        if (rows + 2 * halo) * ny * itemsize * n_planes <= budget:
            return n_bands
    return None


def shard_band_count(own_rows: int, ny: int, residual_iter: int,
                     n_planes: int = 20, itemsize: int = 4,
                     halo_rows: int | None = None) -> int | None:
    """Band count for banding WITHIN one halo-extended shard block (or one
    batched ensemble instance): smallest divisor of ``own_rows`` (rows an
    8-multiple, >= the 8-rounded halo) whose halo-extended band windows
    keep ~n_planes live planes within 75% of the VMEM limit.  n_bands=1
    is allowed (the block already in HBM, one window) — unlike
    ``band_count`` there is no whole-plane shortcut, because the caller
    already knows the full block does NOT fit VMEM.  ``halo_rows``
    overrides the stencil halo for wider-reach operators (deblur's conv
    taps); it must already be 8-rounded."""
    budget = int(0.75 * _VMEM_LIMIT)
    if halo_rows is None:
        halo = -(-(2 * max(int(residual_iter), 1) + 2) // 8) * 8
    else:
        halo = int(halo_rows)
    for n_bands in range(1, own_rows + 1):
        if own_rows % n_bands:
            continue
        rows = own_rows // n_bands
        if rows % 8:
            continue
        if rows < halo:
            return None
        if (rows + 2 * halo) * ny * itemsize * n_planes <= budget:
            return n_bands
    return None


def _rof_banded_kernel(scal_ref, off_ref, x_hbm, q_hbm, f_hbm, w_hbm,
                       xo_hbm, qo_hbm, xpo_hbm, qpo_hbm, norms_ref,
                       xs, qs, fs, ws, qps, sem, *,
                       count: int, nx: int, ny: int, rows: int, halo: int,
                       own_lo: int, dataterm: str, batched: bool):
    """Grid-banded chunk: ONE kernel launch per chunk, grid over row
    bands.  Inputs AND outputs stay in HBM (memory_space=ANY): each grid
    step DMAs its clamped halo-extended window into VMEM scratch,
    computes, and DMAs only its owned rows back — the true minimum HBM
    traffic, no XLA-level slice/crop copies (Mosaic cannot lower
    value-level dynamic_slice, so owned rows leave via ref-level
    ``.at[pl.ds(...)]`` copies).  norms_ref is the whole (4[, B],
    n_bands) SMEM array (summed by the caller).

    Three orthogonal generalizations let this one kernel serve plain
    banding, banding WITHIN a halo-extended shard block, and banding the
    batched ensemble:
    * ``off_ref`` (SMEM, int32) holds the GLOBAL row of input row 0 (a
      shard's ``axis_index * rows - halo`` — traced, so it rides SMEM);
      the stencil masks and Neumann boundary use global rows.
    * static ``own_lo`` offsets the owned region inside the input block
      (a shard's received-halo height); the bands partition the
      ``rows * n_bands`` owned rows and the OUTPUTS carry only those.
    * ``batched`` adds a leading instance grid axis; plane refs gain a
      leading batch dim and scalars live in (5, B) / (4, B, n_bands)
      SMEM arrays.
    """
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    if batched:
        b = pl.program_id(0)
        i = pl.program_id(1)

        def xat(ref, ds):
            return ref.at[b, ds]

        def qat(ref, ds):
            return ref.at[b, :, ds]

        def sc(k):
            return scal_ref[k, b]

        def put_norm(j, v):
            norms_ref[j, b, i] = v
    else:
        i = pl.program_id(0)

        def xat(ref, ds):
            return ref.at[ds]

        def qat(ref, ds):
            return ref.at[:, ds]

        def sc(k):
            return scal_ref[k]

        def put_norm(j, v):
            norms_ref[j, i] = v

    ext = xs.shape[0]
    nin = x_hbm.shape[-2]  # input block height (== nx unless sharded)
    # offsets constructed as 8 * (...) so Mosaic can PROVE the DMA slice
    # indices are sublane-tile (8) aligned
    r8, h8, e8, n8 = rows // 8, halo // 8, ext // 8, nin // 8
    o8 = own_lo // 8
    start8 = jnp.clip(o8 + i * r8 - h8, 0, n8 - e8)
    start = 8 * start8
    own_w = 8 * (o8 + i * r8 - start8)  # owned-lo within the window

    def copies(pairs):
        # issue every transfer, then drain (overlap DMA setup/latency)
        cs = [pltpu.make_async_copy(src, dst, sem) for src, dst in pairs]
        for c in cs:
            c.start()
        for c in cs:
            c.wait()

    fetches = [
        (xat(x_hbm, pl.ds(start, ext)), xs),
        (qat(q_hbm, pl.ds(start, ext)), qs),
        (xat(f_hbm, pl.ds(start, ext)), fs),
    ]
    if dataterm == "wsquare":
        fetches.append((xat(w_hbm, pl.ds(start, ext)), ws))
    copies(fetches)

    halo_ctx = (off_ref[0] + start, nx, own_w, own_w + rows)
    q = qs[...]
    x2, qx2, qy2, xp, qxp, qyp, norms = _chunk_core(
        sc(0), sc(1), sc(2), sc(3), sc(4),
        xs[...], q[0], q[1], fs[...], ws[...], count, dataterm,
        halo_ctx=halo_ctx)
    for j in range(4):
        put_norm(j, norms[j])

    # stage results in the (now free) input scratch, DMA owned rows out
    xs[...] = x2
    qs[0] = qx2
    qs[1] = qy2
    ws[...] = xp
    qps[0] = qxp
    qps[1] = qyp
    lo = 8 * (i * r8)
    copies([
        (xs.at[pl.ds(own_w, rows)], xat(xo_hbm, pl.ds(lo, rows))),
        (qs.at[:, pl.ds(own_w, rows)], qat(qo_hbm, pl.ds(lo, rows))),
        (ws.at[pl.ds(own_w, rows)], xat(xpo_hbm, pl.ds(lo, rows))),
        (qps.at[:, pl.ds(own_w, rows)], qat(qpo_hbm, pl.ds(lo, rows))),
    ])


def run_banded_db(i, n_bands: int, in_copies, out_copies, compute):
    """The shared DOUBLE-BUFFERED cross-grid-step band pipeline: band
    i+1's halo-window fetch and band i-1's owned-row writeback overlap
    band i's compute.  ``in_copies(j, buf)`` / ``out_copies(j, buf)``
    build the copy descriptor lists for band j into/out of ping-pong
    buffer ``buf``; copies started at grid step i are waited at step i+1
    by RECONSTRUCTING the same descriptors (the standard Mosaic
    pattern — descriptors don't persist across grid steps, semaphore
    state does).  ``compute(p)`` runs the band's math on buffer p and
    stages its results there.  Used by the multilabel/tight/deblur/vol
    double-buffered banded kernels (the ROF/ADMM ones predate this
    helper and inline the same sequence)."""
    from jax.experimental import pallas as pl

    p = lax.rem(i, 2)

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

    compute(p)

    for c in out_copies(i, p):
        c.start()

    @pl.when(i == n_bands - 1)
    def _():
        for c in out_copies(i, p):
            c.wait()


def _rof_banded_db_kernel(scal_ref, off_ref, x_hbm, q_hbm, f_hbm, w_hbm,
                          xo_hbm, qo_hbm, xpo_hbm, qpo_hbm, norms_ref,
                          xs2, qs2, fs2, ws2, qps2, in_sem, out_sem, *,
                          count: int, nx: int, ny: int, rows: int,
                          halo: int, own_lo: int, n_bands: int,
                          dataterm: str):
    """DOUBLE-BUFFERED grid-banded chunk: band i+1's halo-window fetch and
    band i-1's owned-row writeback overlap band i's compute.  Two window
    buffers (leading dim 2 on every scratch) with per-buffer DMA
    semaphores; copies started at grid step i are waited at step i+1 by
    RECONSTRUCTING the same copy descriptor (the standard Mosaic
    cross-grid-step pipelining pattern — descriptors don't persist across
    steps, semaphore state does).  ~1.35x the single-buffer VMEM
    footprint; hides the ~12%-of-chunk serialized band DMA measured at
    ROF 2048^2 (PERFORMANCE.md)."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    i = pl.program_id(0)
    p = lax.rem(i, 2)
    ext = xs2.shape[1]
    nin = x_hbm.shape[-2]
    r8, h8, e8, n8 = rows // 8, halo // 8, ext // 8, nin // 8
    o8 = own_lo // 8

    def geom(j):
        start8 = jnp.clip(o8 + j * r8 - h8, 0, n8 - e8)
        return 8 * start8, 8 * (o8 + j * r8 - start8)

    def in_copies(j, buf):
        start, _ = geom(j)
        sem = in_sem.at[buf]
        cs = [
            pltpu.make_async_copy(
                x_hbm.at[pl.ds(start, ext)], xs2.at[buf], sem),
            pltpu.make_async_copy(
                q_hbm.at[:, pl.ds(start, ext)], qs2.at[buf], sem),
            pltpu.make_async_copy(
                f_hbm.at[pl.ds(start, ext)], fs2.at[buf], sem),
        ]
        if dataterm == "wsquare":
            cs.append(pltpu.make_async_copy(
                w_hbm.at[pl.ds(start, ext)], ws2.at[buf], sem))
        return cs

    def out_copies(j, buf):
        _, own_w = geom(j)
        lo = 8 * (j * r8)
        sem = out_sem.at[buf]
        return [
            pltpu.make_async_copy(
                xs2.at[buf, pl.ds(own_w, rows)],
                xo_hbm.at[pl.ds(lo, rows)], sem),
            pltpu.make_async_copy(
                qs2.at[buf, :, pl.ds(own_w, rows)],
                qo_hbm.at[:, pl.ds(lo, rows)], sem),
            pltpu.make_async_copy(
                ws2.at[buf, pl.ds(own_w, rows)],
                xpo_hbm.at[pl.ds(lo, rows)], sem),
            pltpu.make_async_copy(
                qps2.at[buf, :, pl.ds(own_w, rows)],
                qpo_hbm.at[:, pl.ds(lo, rows)], sem),
        ]

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
    halo_ctx = (off_ref[0] + start, nx, own_w, own_w + rows)
    q = qs2[p]
    x2, qx2, qy2, xp, qxp, qyp, norms = _chunk_core(
        scal_ref[0], scal_ref[1], scal_ref[2], scal_ref[3], scal_ref[4],
        xs2[p], q[0], q[1], fs2[p], ws2[p], count, dataterm,
        halo_ctx=halo_ctx)
    for j in range(4):
        norms_ref[j, i] = norms[j]

    xs2[p] = x2
    qs2[p, 0] = qx2
    qs2[p, 1] = qy2
    ws2[p] = xp
    qps2[p, 0] = qxp
    qps2[p, 1] = qyp
    for c in out_copies(i, p):
        c.start()

    @pl.when(i == n_bands - 1)
    def _():
        for c in out_copies(i, p):
            c.wait()


def _rof_banded_mc_kernel(scal_ref, x2_hbm, q2_hbm, f_hbm, w_hbm,
                          xo2, qo2, xpo, qpo, norms_ref, sout_ref,
                          xs2, qs2, fs2, ws2, qps2, sstate, nacc,
                          in_sem, out_sem, *,
                          count: int, k_chunks: int, nx: int, ny: int,
                          rows: int, halo: int, n_bands: int,
                          dataterm: str, stepsize: str, consts):
    """MULTI-CHUNK banded ROF/TV kernel: grid = (k_chunks, n_bands)
    (chunks outer, bands inner) over length-2 in-place ping-pong state
    arrays (cf. `fused_admm._admm_banded_chunk_kernel`), with the
    boyd/goldstein adaptation and convergence test run IN-KERNEL between
    chunks on SMEM scratch scalars — one launch advances up to
    k_chunks * count iterations, amortizing the per-chunk dispatch that
    capped the banded end-to-end path at ~78% of kernel-only.

    Per chunk c: bands fetch their halo-extended windows from slot c%2
    (fully written by chunk c-1 — the TPU grid is sequential), run the
    ordinary banded chunk core with the CURRENT scalars from ``sstate``
    (SMEM scratch persists across grid steps), write owned rows to slot
    (c+1)%2 plus the chunk's pre-aligned-step iterate into xpo/qpo, and
    store their owned-row norms into ``nacc``.  At (c, n_bands-1), after
    compute, the band sums ``nacc``, runs `adapt_scalars`, and updates
    ``sstate`` — chunks after the convergence point are skipped via the
    SMEM flag.  Window DMA is double-buffered WITHIN each chunk and
    drains at chunk boundaries (no prefetch is ever issued into a chunk
    that convergence may skip — an orphaned in-flight DMA at kernel end
    would corrupt the semaphore state).

    scal_ref (SMEM, 13): as `_rof_multichunk_kernel`.  sout_ref (SMEM
    out, 8): [tau, sigma, arg_alpha, arb_l, arb_u, converged,
    chunks_done, final_slot].  norms_ref (4): last executed chunk's
    sqrt'd norms.  sstate layout: [tau, sigma, arg_alpha, arb_l, arb_u,
    conv, done]."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    c = pl.program_id(0)
    i = pl.program_id(1)
    step = c * n_bands + i
    ext = xs2.shape[1]
    r8, h8, e8, n8 = rows // 8, halo // 8, ext // 8, nx // 8
    theta = scal_ref[2]
    lmb = scal_ref[3]
    radius = scal_ref[4]
    it0 = scal_ref[8]
    tols4 = (scal_ref[9], scal_ref[10], scal_ref[11], scal_ref[12])

    @pl.when(step == 0)
    def _():
        sstate[0] = scal_ref[0]
        sstate[1] = scal_ref[1]
        sstate[2] = scal_ref[5]
        sstate[3] = scal_ref[6]
        sstate[4] = scal_ref[7]
        sstate[5] = 0.0  # converged
        sstate[6] = 0.0  # chunks done

    active = sstate[5] < 0.5

    def geom(j):
        start8 = jnp.clip(j * r8 - h8, 0, n8 - e8)
        return 8 * start8, 8 * (j * r8 - start8)

    def in_copies(cc, j, buf):
        # reads go through the ALIASED output refs (xo2/qo2 share the
        # input buffers via input_output_aliases): chunk c reads the
        # slot chunk c-1 wrote
        slot = lax.rem(cc, 2)
        start, _ = geom(j)
        sem = in_sem.at[buf]
        cs = [
            pltpu.make_async_copy(
                xo2.at[slot, pl.ds(start, ext)], xs2.at[buf], sem),
            pltpu.make_async_copy(
                qo2.at[slot, :, pl.ds(start, ext)], qs2.at[buf], sem),
            pltpu.make_async_copy(
                f_hbm.at[pl.ds(start, ext)], fs2.at[buf], sem),
        ]
        if dataterm == "wsquare":
            cs.append(pltpu.make_async_copy(
                w_hbm.at[pl.ds(start, ext)], ws2.at[buf], sem))
        return cs

    def out_copies(cc, j, buf):
        slot = lax.rem(cc + 1, 2)
        _, own_w = geom(j)
        lo = 8 * (j * r8)
        sem = out_sem.at[buf]
        return [
            pltpu.make_async_copy(
                xs2.at[buf, pl.ds(own_w, rows)],
                xo2.at[slot, pl.ds(lo, rows)], sem),
            pltpu.make_async_copy(
                qs2.at[buf, :, pl.ds(own_w, rows)],
                qo2.at[slot, :, pl.ds(lo, rows)], sem),
            pltpu.make_async_copy(
                ws2.at[buf, pl.ds(own_w, rows)],
                xpo.at[pl.ds(lo, rows)], sem),
            pltpu.make_async_copy(
                qps2.at[buf, :, pl.ds(own_w, rows)],
                qpo.at[:, pl.ds(lo, rows)], sem),
        ]

    # The DMA pipeline DRAINS at chunk boundaries: every chunk's last
    # band waits its own writeback inside the adapt block, so chunk c+1
    # can fetch slot (c+1)%2 immediately, and — crucially — no prefetch
    # is ever issued into a chunk that convergence may skip (an orphaned
    # in-flight DMA at kernel end would corrupt the semaphore state).
    # Within a chunk, band i+1's fetch and band i-1's writeback overlap
    # band i's compute as usual.
    p = lax.rem(step, 2)

    @pl.when(active)
    def _():
        @pl.when(i == 0)
        def _():
            for cp in in_copies(c, 0, p):
                cp.start()

        for cp in in_copies(c, i, p):
            cp.wait()

        @pl.when(i >= 1)
        def _():
            for cp in out_copies(c, i - 1, 1 - p):
                cp.wait()

        @pl.when(i + 1 < n_bands)
        def _():
            for cp in in_copies(c, i + 1, 1 - p):
                cp.start()

        start, own_w = geom(i)
        halo_ctx = (start, nx, own_w, own_w + rows)
        q = qs2[p]
        x2, qx2, qy2, xp, qxp, qyp, norms = _chunk_core(
            sstate[0], sstate[1], theta, lmb, radius,
            xs2[p], q[0], q[1], fs2[p], ws2[p], count, dataterm,
            halo_ctx=halo_ctx)
        for j in range(4):
            nacc[j, i] = norms[j]

        xs2[p] = x2
        qs2[p, 0] = qx2
        qs2[p, 1] = qy2
        ws2[p] = xp
        qps2[p, 0] = qxp
        qps2[p, 1] = qyp
        for cp in out_copies(c, i, p):
            cp.start()

        # chunk's last band: drain its own writeback, then adapt
        @pl.when(i == n_bands - 1)
        def _():
            for cp in out_copies(c, i, p):
                cp.wait()
            n0 = n1 = n2 = n3 = jnp.zeros((), x2.dtype)
            for j in range(n_bands):
                n0 += nacc[0, j]
                n1 += nacc[1, j]
                n2 += nacc[2, j]
                n3 += nacc[3, j]
            pr = jnp.sqrt(n0)
            pn_ = jnp.sqrt(n1)
            dr = jnp.sqrt(n2)
            dn_ = jnp.sqrt(n3)
            it = it0 + ((c + 1) * count - 1).astype(x2.dtype)
            tau2, sigma2, aa2, al2, au2, cv = adapt_scalars(
                stepsize, consts, tols4, it, sstate[0], sstate[1],
                sstate[2], sstate[3], sstate[4], pr, pn_, dr, dn_)
            sstate[0] = tau2
            sstate[1] = sigma2
            sstate[2] = aa2
            sstate[3] = al2
            sstate[4] = au2
            sstate[5] = cv.astype(x2.dtype)
            sstate[6] = sstate[6] + 1.0
            norms_ref[0] = pr
            norms_ref[1] = pn_
            norms_ref[2] = dr
            norms_ref[3] = dn_

    @pl.when(step == k_chunks * n_bands - 1)
    def _():
        for j in range(7):
            sout_ref[j] = sstate[j]
        sout_ref[7] = lax.rem(sstate[6], 2.0)  # final ping-pong slot


def rof_fused_multichunk_banded(x, q, f, w, scal13, count, k_chunks,
                                n_bands: int, dataterm: str,
                                stepsize: str, consts,
                                interpret: bool = False):
    """Up to ``k_chunks * count`` banded fused iterations in ONE kernel
    with in-kernel adaptation/convergence (see `_rof_banded_mc_kernel`).
    Returns (x2, q2, x_prev, q_prev, norms, sout) where x2/q2 are
    selected from the final ping-pong slot (sout[7])."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    nx, ny = x.shape
    halo = -(-(2 * int(count) + 2) // 8) * 8
    rows = nx // n_bands
    assert rows * n_bands == nx and rows % 8 == 0, (nx, n_bands)
    ext = min(rows + 2 * halo, nx)

    def dbl(a):
        return jnp.zeros((2,) + a.shape, a.dtype).at[0].set(a)

    x2_in, q2_in = dbl(x), dbl(q)
    smem = pl.BlockSpec(memory_space=pltpu.SMEM)
    hbm = pl.BlockSpec(memory_space=pl.ANY)
    out_shape = [
        jax.ShapeDtypeStruct(x2_in.shape, x.dtype),
        jax.ShapeDtypeStruct(q2_in.shape, q.dtype),
        jax.ShapeDtypeStruct(x.shape, x.dtype),
        jax.ShapeDtypeStruct(q.shape, q.dtype),
        jax.ShapeDtypeStruct((4,), x.dtype),
        jax.ShapeDtypeStruct((8,), x.dtype),
    ]
    dt = x.dtype
    scratch = [
        pltpu.VMEM((2, ext, ny), dt), pltpu.VMEM((2, 2, ext, ny), dt),
        pltpu.VMEM((2, ext, ny), dt), pltpu.VMEM((2, ext, ny), dt),
        pltpu.VMEM((2, 2, ext, ny), dt),
        pltpu.SMEM((7,), dt), pltpu.SMEM((4, n_bands), dt),
        pltpu.SemaphoreType.DMA((2,)), pltpu.SemaphoreType.DMA((2,)),
    ]
    outs = pl.pallas_call(
        partial(_rof_banded_mc_kernel, count=int(count),
                k_chunks=int(k_chunks), nx=nx, ny=ny, rows=rows,
                halo=halo, n_bands=n_bands, dataterm=dataterm,
                stepsize=stepsize, consts=consts),
        grid=(int(k_chunks), int(n_bands)),
        out_shape=out_shape,
        in_specs=[smem] + [hbm] * 4,
        out_specs=[hbm, hbm, hbm, hbm, smem, smem],
        scratch_shapes=scratch,
        input_output_aliases={1: 0, 2: 1},
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=_VMEM_LIMIT),
        interpret=interpret,
    )(scal13, x2_in, q2_in, f, w)
    x2_2, q2_2, xp, qp, norms, sout = outs
    slot = sout[7].astype(jnp.int32)
    x2 = lax.dynamic_index_in_dim(x2_2, slot, 0, keepdims=False)
    q2 = lax.dynamic_index_in_dim(q2_2, slot, 0, keepdims=False)
    return x2, q2, xp, qp, norms, sout


def rof_fused_chunk_banded(x, q, f, w, tau, sigma, theta, lmb, radius,
                           count, n_bands: int, dataterm: str = "square",
                           interpret: bool = False, own_lo: int = 0,
                           out_rows: int | None = None, nx_global=None,
                           row_offset0=None, double_buffer: bool = False):
    """``count`` fused iterations with the plane split into ``n_bands``
    row bands inside ONE kernel (grid over bands, manual halo-window DMAs
    from HBM).  Same returns as ``rof_fused_chunk``.

    With (own_lo, out_rows, nx_global, row_offset0) the inputs are one
    HALO-EXTENDED shard block of a row-partitioned (nx_global, ny) plane
    whose row 0 sits at global row ``row_offset0`` (traced): the bands
    partition the ``out_rows`` owned rows starting at block row
    ``own_lo``, and the outputs carry only those owned rows."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    nin, ny = x.shape
    out_rows = nin if out_rows is None else out_rows
    nx_global = nin if nx_global is None else nx_global
    # halo rounded up to the sublane tile (8): Mosaic requires DMA slice
    # shapes/offsets 8-aligned along dim 0 (extra halo rows are merely
    # redundant compute)
    halo = -(-(2 * int(count) + 2) // 8) * 8
    rows = out_rows // n_bands
    assert rows * n_bands == out_rows and rows % 8 == 0, (out_rows, n_bands)
    assert own_lo % 8 == 0, own_lo
    ext = min(rows + 2 * halo, nin)

    scal = _scal_vec(x, tau, sigma, theta, lmb, radius)
    off = jnp.asarray(
        [0 if row_offset0 is None else row_offset0], jnp.int32)
    smem = pl.BlockSpec(memory_space=pltpu.SMEM)
    hbm = pl.BlockSpec(memory_space=pl.ANY)
    out_shape = [
        jax.ShapeDtypeStruct((out_rows, ny), x.dtype),
        jax.ShapeDtypeStruct((2, out_rows, ny), q.dtype),
        jax.ShapeDtypeStruct((out_rows, ny), x.dtype),
        jax.ShapeDtypeStruct((2, out_rows, ny), q.dtype),
        jax.ShapeDtypeStruct((4, n_bands), x.dtype),
    ]
    dt = x.dtype
    if double_buffer:
        kern = partial(_rof_banded_db_kernel, count=int(count),
                       nx=int(nx_global), ny=ny, rows=rows, halo=halo,
                       own_lo=int(own_lo), n_bands=n_bands,
                       dataterm=dataterm)
        scratch = [
            pltpu.VMEM((2, ext, ny), dt), pltpu.VMEM((2, 2, ext, ny), dt),
            pltpu.VMEM((2, ext, ny), dt), pltpu.VMEM((2, ext, ny), dt),
            pltpu.VMEM((2, 2, ext, ny), dt),
            pltpu.SemaphoreType.DMA((2,)), pltpu.SemaphoreType.DMA((2,)),
        ]
    else:
        kern = partial(_rof_banded_kernel, count=int(count),
                       nx=int(nx_global), ny=ny, rows=rows, halo=halo,
                       own_lo=int(own_lo), dataterm=dataterm,
                       batched=False)
        scratch = [
            pltpu.VMEM((ext, ny), dt), pltpu.VMEM((2, ext, ny), dt),
            pltpu.VMEM((ext, ny), dt), pltpu.VMEM((ext, ny), dt),
            pltpu.VMEM((2, ext, ny), dt),
            pltpu.SemaphoreType.DMA,
        ]
    outs = pl.pallas_call(
        kern,
        grid=(n_bands,),
        out_shape=out_shape,
        in_specs=[smem, smem, hbm, hbm, hbm, hbm],
        out_specs=[hbm, hbm, hbm, hbm, smem],
        scratch_shapes=scratch,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=_VMEM_LIMIT),
        interpret=interpret,
    )(scal, off, x, q, f, w)
    return outs[0], outs[1], outs[2], outs[3], jnp.sum(outs[4], axis=1)


def rof_fused_chunk_banded_batched(x, q, f, w, scal, count, n_bands: int,
                                   dataterm: str = "square",
                                   interpret: bool = False):
    """Banded + batched chunk: grid = (B, n_bands) — the fused ensemble
    path for instances too large for the whole-instance batched kernel.
    x/f/w are (B, nx, ny), q is (B, 2, nx, ny), scal is (5, B)
    instances-minor.  Same returns as ``rof_fused_chunk_batched``."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    B, nx, ny = x.shape
    halo = -(-(2 * int(count) + 2) // 8) * 8
    rows = nx // n_bands
    assert rows * n_bands == nx and rows % 8 == 0, (nx, n_bands)
    ext = min(rows + 2 * halo, nx)

    off = jnp.zeros((1,), jnp.int32)
    smem = pl.BlockSpec(memory_space=pltpu.SMEM)
    hbm = pl.BlockSpec(memory_space=pl.ANY)
    out_shape = [
        jax.ShapeDtypeStruct(x.shape, x.dtype),
        jax.ShapeDtypeStruct(q.shape, q.dtype),
        jax.ShapeDtypeStruct(x.shape, x.dtype),
        jax.ShapeDtypeStruct(q.shape, q.dtype),
        jax.ShapeDtypeStruct((4, B, n_bands), x.dtype),
    ]
    dt = x.dtype
    outs = pl.pallas_call(
        partial(_rof_banded_kernel, count=int(count), nx=nx, ny=ny,
                rows=rows, halo=halo, own_lo=0, dataterm=dataterm,
                batched=True),
        grid=(B, n_bands),
        out_shape=out_shape,
        in_specs=[smem, smem, hbm, hbm, hbm, hbm],
        out_specs=[hbm, hbm, hbm, hbm, smem],
        scratch_shapes=[
            pltpu.VMEM((ext, ny), dt), pltpu.VMEM((2, ext, ny), dt),
            pltpu.VMEM((ext, ny), dt), pltpu.VMEM((ext, ny), dt),
            pltpu.VMEM((2, ext, ny), dt),
            pltpu.SemaphoreType.DMA,
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=_VMEM_LIMIT),
        interpret=interpret,
    )(scal, off, x, q, f, w)
    return outs[0], outs[1], outs[2], outs[3], jnp.sum(outs[4], axis=2)


def rof_fused_chunk_tiled(x, q, f, w, tau, sigma, theta, lmb, radius, count,
                          n_bands: int, dataterm: str = "square",
                          interpret: bool = False):
    """``count`` fused iterations on a plane too large for VMEM: the plane
    is split into ``n_bands`` row bands, each run through the SAME
    halo-extended chunk kernel as the sharded path (rof_fused_chunk_halo)
    with a (2*count + 2)-row halo of its neighbors' rows — recomputed
    redundantly, exactly like a shard recomputes its ppermute'd halo.
    Domain edges see zero halos (jnp.pad), matching ppermute's edge
    semantics; the kernels' global-row masks keep them inert.  Owned rows
    are bit-identical to the whole-plane kernel (information propagates
    <= 2 rows/iteration), and the owned-row norms sum to the global norms.

    The band loop is a ``lax.fori_loop`` whose body traces the kernel
    ONCE (compile time independent of n_bands — matters on the
    remote-compile tunnel) and writes each band's owned rows straight
    into the output planes with dynamic_update_slice (no stack/transpose
    copies).  Bands are CLAMPED dynamic slices of the unpadded planes:
    at the domain edges the halo rows contain interior rows instead of
    zeros, which is just different halo garbage — the kernel's
    global-row masks already guarantee that nothing beyond the Neumann
    boundary influences owned rows (same argument as the sharded path's
    zero halos), so no per-chunk jnp.pad copies are needed.

    Same signature/returns as ``rof_fused_chunk``.
    """
    nx, ny = x.shape
    halo = 2 * int(count) + 2
    rows = nx // n_bands
    assert rows * n_bands == nx
    ext = min(rows + 2 * halo, nx)
    base = _scal_vec(x, tau, sigma, theta, lmb, radius)

    def band(i, carry):
        lo = i * rows
        start = jnp.clip(lo - halo, 0, nx - ext)
        own_lo = lo - start

        def sl(a):
            return lax.dynamic_slice_in_dim(a, start, ext, axis=a.ndim - 2)

        scal = jnp.concatenate([
            base,
            jnp.stack([start.astype(x.dtype), own_lo.astype(x.dtype),
                       (own_lo + rows).astype(x.dtype)]),
        ])
        x2, q2, xpv, qpv, n2 = rof_fused_chunk_halo(
            sl(x), sl(q), sl(f), sl(w), scal, count, nx,
            dataterm=dataterm, interpret=interpret)
        ax2, aq2, axp, aqp, an2 = carry

        def upd(acc, val):
            ax = acc.ndim - 2
            crop = lax.dynamic_slice_in_dim(val, own_lo, rows, axis=ax)
            return lax.dynamic_update_slice_in_dim(acc, crop, lo, axis=ax)

        return (upd(ax2, x2), upd(aq2, q2),
                upd(axp, xpv), upd(aqp, qpv), an2 + n2)

    init = (jnp.zeros_like(x), jnp.zeros_like(q), jnp.zeros_like(x),
            jnp.zeros_like(q), jnp.zeros((4,), x.dtype))
    return lax.fori_loop(0, n_bands, band, init)


def match_rof_structure(problem):
    """Detect the fusable ROF structure; returns dict(nx, ny, f, lmb) or
    None.  Conditions: single gradient2d block (L=1, label_first=False),
    prox_g = single 1D square with coeffs (1, f, lmb, 0, 0), prox_fstar =
    single Moreau(norm2 abs, dim=2 planar, coeffs (1,0,1,0,0)), alpha
    preconditioner (constant Sigma=1/2, Tau=1/4)."""
    import numpy as np

    from ..config import dtype

    if dtype() != jnp.float32:
        return None
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
    # NOTE: no VMEM-size gate here — structure matching only.  Callers
    # pick the whole-plane kernel, the row-band tiled kernel (band_count),
    # or the halo-sharded kernel according to their memory geometry.
    return {
        "nx": blk.nx, "ny": blk.ny, "f": f, "w": w,
        "lmb": float(c), "radius": radius, "dataterm": dataterm,
    }


class FusedROFPDHG(BackendPDHG):
    """BackendPDHG that runs structurally-matched problems through fused
    Pallas iterations, falling back to the generic path otherwise.
    Matched structures: ROF/TV-L1/inpainting (this module) and the fast
    multilabel relaxation (ops/fused_multilabel.py).  Residual iterations
    run through the fused chunk kernel whose norms feed the exact generic
    adaptation/stopping code (``residual_and_adapt``), preserving
    reference semantics."""

    def __init__(self, problem, opts, solver_opts, interpret: bool = False):
        super().__init__(problem, opts, solver_opts)
        self.interpret = interpret
        # chunks per multi-chunk launch (phase B0); 0 disables the phase
        # for launch-per-chunk A/B probes (tools/multichunk_probe.py)
        self.k_chunks = _K_CHUNKS
        # alg2 mutates (tau, sigma, theta) every iteration; the fused burst
        # holds them fixed, so it only serves the constant/residual-adaptive
        # schemes (alg1, boyd, goldstein).  The Mosaic kernel needs a real
        # TPU (or explicit interpreter mode for testing).
        import jax

        usable = (jax.default_backend() != "cpu") or interpret
        usable = usable and opts.stepsize != "alg2"
        # the fused kernels compute consistent-mode residual norms; the
        # reference-exact sequence runs through the generic path
        usable = usable and not opts.reference_residuals
        self.rof = match_rof_structure(problem) if usable else None
        if self.rof is not None:
            nb = band_count(self.rof["nx"], self.rof["ny"],
                            opts.residual_iter)
            if nb is None:
                self.rof = None  # no efficient tiling -> generic path
            else:
                self.rof["n_bands"] = nb
                # double-buffered window DMA (overlaps band i+1's fetch
                # with band i's compute) needs ~27 live planes vs 20 —
                # use it only when that footprint does NOT force a wider
                # tiling (measured: 2048^2 nb=8 single 1178 us vs double
                # 1077 us/chunk; 4096^2 single nb=32 5476 us beats
                # double nb=64 5974 us — halo recompute outweighs the
                # DMA overlap)
                self.rof["double_buffer"] = nb > 1 and nb == band_count(
                    self.rof["nx"], self.rof["ny"], opts.residual_iter,
                    n_planes=27)
        self.ml = self.deblur = None
        if usable and self.rof is None:
            from .fused_multilabel import (match_multilabel_structure,
                                           ml_band_count)

            self.ml = match_multilabel_structure(problem)
            if self.ml is not None:
                nb = ml_band_count(self.ml["nx"], self.ml["ny"],
                                   self.ml["L"], opts.residual_iter)
                if nb is None:
                    self.ml = None
                else:
                    self.ml["n_bands"] = nb
                    # double-buffered window DMA only when its bigger
                    # footprint keeps the same band count (ROF guard)
                    self.ml["double_buffer"] = nb > 1 and nb == \
                        ml_band_count(self.ml["nx"], self.ml["ny"],
                                      self.ml["L"], opts.residual_iter,
                                      double_buffer=True)
        if usable and self.rof is None and self.ml is None:
            from .fused_deblur import (deblur_band_count,
                                       match_deblur_structure)

            self.deblur = match_deblur_structure(
                problem, self.prox_g, self.prox_fstar)
            if self.deblur is not None:
                nb = deblur_band_count(
                    self.deblur["nx2"], self.deblur["ny2"],
                    opts.residual_iter, self.deblur["taps"])
                if nb is None:
                    self.deblur = None
                else:
                    self.deblur["n_bands"] = nb
                    self.deblur["double_buffer"] = nb > 1 and nb == \
                        deblur_band_count(
                            self.deblur["nx2"], self.deblur["ny2"],
                            opts.residual_iter, self.deblur["taps"],
                            double_buffer=True)
        self.tight = None
        if usable and not (self.rof or self.ml or self.deblur):
            from .fused_tight import match_tight_structure, tight_band_count

            self.tight = match_tight_structure(problem)
            if self.tight is not None:
                nb = tight_band_count(
                    self.tight["nx"], self.tight["ny"], self.tight["L"],
                    self.tight["k"], opts.residual_iter)
                if nb is None:
                    self.tight = None
                else:
                    self.tight["n_bands"] = nb
                    self.tight["double_buffer"] = nb > 1 and nb == \
                        tight_band_count(
                            self.tight["nx"], self.tight["ny"],
                            self.tight["L"], self.tight["k"],
                            opts.residual_iter, double_buffer=True)
        self.vol = None
        if usable and not (self.rof or self.ml or self.deblur
                           or self.tight):
            from .fused_vol import match_vol_structure, vol_band_count

            self.vol = match_vol_structure(problem)
            if self.vol is not None:
                nb = vol_band_count(
                    self.vol["L"], self.vol["nx"], self.vol["ny"],
                    opts.residual_iter)
                if nb is None:
                    self.vol = None
                else:
                    self.vol["n_bands"] = nb
                    self.vol["double_buffer"] = nb > 1 and nb == \
                        vol_band_count(
                            self.vol["L"], self.vol["nx"], self.vol["ny"],
                            opts.residual_iter, double_buffer=True)
        if ((self.rof or self.ml or self.deblur or self.tight or self.vol)
                and self.solver_opts.verbose):
            kind = ("ROF" if self.rof
                    else "multilabel" if self.ml
                    else "deblur" if self.deblur
                    else "tight-multilabel" if self.tight
                    else "volumetric-TV")
            print(f"FusedROFPDHG: using fused Pallas iteration ({kind}).")

    def run(self, state: PDHGState, until_iter: int) -> PDHGState:
        sopts = self.solver_opts
        tols = (sopts.tol_rel_primal, sopts.tol_rel_dual,
                sopts.tol_abs_primal, sopts.tol_abs_dual)
        try:
            if self.rof is not None:
                r = self.rof
                return _fused_rof_run(
                    self.problem, self.prox_g, self.prox_fstar, self.opts,
                    r["nx"], r["ny"], r["lmb"], r["dataterm"],
                    r["n_bands"], r.get("double_buffer", False),
                    self.k_chunks, self.interpret,
                    tols, r["f"], r["w"],
                    jnp.asarray(r["radius"], jnp.float32),
                    state, jnp.asarray(until_iter, jnp.int32),
                )
            if self.ml is not None:
                from .fused_multilabel import _fused_ml_run

                m = self.ml
                return _fused_ml_run(
                    self.problem, self.prox_g, self.prox_fstar, self.opts,
                    m["nx"], m["ny"], m["L"], m["n_bands"],
                    m.get("double_buffer", False), self.k_chunks,
                    self.interpret,
                    tols, m["f"], jnp.asarray(m["radius"], jnp.float32),
                    jnp.asarray(m["d_s"], jnp.float32),
                    state, jnp.asarray(until_iter, jnp.int32),
                )
            if self.deblur is not None:
                from .fused_deblur import _fused_deblur_run

                d = self.deblur
                return _fused_deblur_run(
                    self.problem, self.prox_g, self.prox_fstar, self.opts,
                    d["nx"], d["ny"], d["nx2"], d["ny2"], d["taps"],
                    d["sig_q"], d["tau_t"], d["lmb"], d["n_bands"],
                    d.get("double_buffer", False), self.interpret,
                    tols, d["fb"], d["sv"],
                    jnp.asarray(d["radius"], jnp.float32),
                    state, jnp.asarray(until_iter, jnp.int32),
                )
            if self.tight is not None:
                from .fused_tight import _fused_tight_run

                t = self.tight
                return _fused_tight_run(
                    self.problem, self.prox_g, self.prox_fstar, self.opts,
                    t["nx"], t["ny"], t["L"], t["k"],
                    (t["taps"], t["consts"]), t["n_bands"],
                    t.get("double_buffer", False), self.interpret,
                    tols, t["f"],
                    (jnp.asarray(t["radius"], jnp.float32),
                     jnp.asarray(t["d_s"], jnp.float32)),
                    state, jnp.asarray(until_iter, jnp.int32),
                )
            if self.vol is not None:
                from .fused_vol import _fused_vol_run

                v = self.vol
                return _fused_vol_run(
                    self.problem, self.prox_g, self.prox_fstar, self.opts,
                    v["L"], v["nx"], v["ny"], v["lmb"], v["dataterm"],
                    v["n_bands"], v.get("double_buffer", False),
                    self.k_chunks, self.interpret,
                    tols, v["f"], v["w"],
                    jnp.asarray(v["radius"], jnp.float32),
                    state, jnp.asarray(until_iter, jnp.int32),
                )
        except jax.errors.JaxRuntimeError as e:
            # fits_vmem is an estimate; if the Mosaic compile rejects the
            # whole-plane kernel (VMEM/SMEM capacity) fall back to the
            # generic path permanently.  The compile fails before any
            # donated buffer is consumed, so re-running is safe.
            self.rof = self.ml = self.deblur = self.tight = self.vol = None
            if self.solver_opts.verbose:
                print(f"FusedROFPDHG: kernel compile failed ({e});"
                      " falling back to the generic path.")
        return super().run(state, until_iter)


@partial(jax.jit, static_argnums=(3, 4, 5, 6, 7, 8, 9, 10, 11),
         donate_argnums=(16,))
def _fused_rof_run(problem, prox_g, prox_fstar, opts, nx, ny, lmb, dataterm,
                   n_bands, double_buffer, k_chunks, interpret, tols,
                   f_plane, w_plane, radius, state, until):
    """Three phases around the single-kernel fused chunks (the in-kernel
    loop bound must be static for Mosaic):

      A. generic steps until iteration % ri == 1 (so each chunk *ends* on
         a residual iteration; <= ri-1 steps — normally just iteration 0)
      B. while a whole chunk fits: ``rof_fused_chunk`` = ri iterations +
         in-kernel residual norms in ONE kernel, then scalar
         adaptation/convergence via the generic ``residual_and_adapt``
      C. an epilogue refreshing the operator products (kx, kty, kx_prev,
         kty_prev) once — the chunks don't carry them — then generic
         steps for the tail until ``until``

    The iteration/residual/adaptation schedule is identical to the plain
    ``lax.while_loop`` over ``pdhg_step``: residuals at iterations
    0, ri, 2ri, ... computed from the same finite-difference formulas.

    Whole-plane problems get an extra phase B0 first: MULTI-CHUNK
    launches (``rof_fused_multichunk``) advancing ``_K_CHUNKS`` chunks
    per kernel call with the adaptation/convergence scalar math run
    in-kernel — same trajectory, 1/_K_CHUNKS the dispatch and HBM
    state-in/out cost.
    """
    ri = max(int(opts.residual_iter), 1)

    def generic(s: PDHGState) -> PDHGState:
        return pdhg_step(problem, prox_g, prox_fstar, opts, tols, s)

    def fused_chunk(s: PDHGState) -> PDHGState:
        x = s.x.reshape(nx, ny)
        q = s.y.reshape(2, nx, ny)
        if n_bands == 1:
            x2, q2, xp, qp, norms2 = rof_fused_chunk(
                x, q, f_plane, w_plane, s.tau, s.sigma, s.theta, lmb,
                radius, ri, dataterm=dataterm, interpret=interpret)
        else:
            x2, q2, xp, qp, norms2 = rof_fused_chunk_banded(
                x, q, f_plane, w_plane, s.tau, s.sigma, s.theta, lmb,
                radius, ri, n_bands, dataterm=dataterm, interpret=interpret,
                double_buffer=double_buffer)
        norms = jnp.sqrt(norms2)
        s = dataclasses.replace(
            s,
            x=x2.reshape(-1), y=q2.reshape(-1),
            x_prev=xp.reshape(-1), y_prev=qp.reshape(-1),
        )
        # the residual iteration's pre-increment counter is
        # s.iteration + ri - 1 (the chunk covers iterations
        # s.iteration .. s.iteration + ri - 1)
        s = residual_and_adapt(
            problem, opts, tols, s,
            norms[0], norms[1], norms[2], norms[3],
            s.iteration + ri - 1,
        )
        return dataclasses.replace(s, iteration=s.iteration + ri)

    def multi_chunk(s: PDHGState) -> PDHGState:
        x = s.x.reshape(nx, ny)
        q = s.y.reshape(2, nx, ny)
        dt = x.dtype
        scal13 = jnp.stack([
            s.tau, s.sigma, s.theta,
            jnp.asarray(lmb, dt), jnp.asarray(radius, dt),
            s.arg_alpha, s.arb_l, s.arb_u,
            s.iteration.astype(dt),
            jnp.asarray(tols[0], dt), jnp.asarray(tols[1], dt),
            jnp.asarray(tols[2], dt), jnp.asarray(tols[3], dt),
        ])
        x2, q2, xp, qp, norms, sc = rof_fused_multichunk(
            x, q, f_plane, w_plane, scal13, ri, k_chunks, dataterm,
            opts.stepsize, pdhg_adapt_consts(problem, opts),
            interpret=interpret)
        done = sc[6].astype(jnp.int32)
        return dataclasses.replace(
            s,
            x=x2.reshape(-1), y=q2.reshape(-1),
            x_prev=xp.reshape(-1), y_prev=qp.reshape(-1),
            tau=sc[0], sigma=sc[1], arg_alpha=sc[2],
            arb_l=sc[3], arb_u=sc[4], converged=sc[5] > 0.5,
            primal_residual=norms[0], primal_var_norm=norms[1],
            dual_residual=norms[2], dual_var_norm=norms[3],
            iteration=s.iteration + done * ri,
        )

    # phase A: align so chunks END on the residual grid (iteration % ri==0);
    # a no-op for ri == 1, where every iteration is a residual iteration
    align = 1 % ri

    def cond_a(s):
        return (s.iteration % ri != align) & (s.iteration < until) & ~s.converged

    state = lax.while_loop(cond_a, generic, state)

    # canonicalize the dual warm start ONCE per run: zero the dead
    # coordinates (q_x last row / q_y last col — they multiply
    # structurally-zero rows of K, so kx/kty and the solution are
    # unaffected; see _project_dead_dual).  Every fused route
    # (whole-plane maskless-adjoint, banded, multichunk) then follows
    # the same trajectory bit-exactly regardless of the warm start.
    def proj_y(yf):
        q = yf.reshape(2, nx, ny)
        qx, qy = _project_dead_dual(q[0], q[1])
        return jnp.stack([qx, qy]).reshape(-1)

    state = dataclasses.replace(
        state, y=proj_y(state.y), y_prev=proj_y(state.y_prev))

    def multi_chunk_banded(s: PDHGState) -> PDHGState:
        x = s.x.reshape(nx, ny)
        q = s.y.reshape(2, nx, ny)
        dt = x.dtype
        scal13 = jnp.stack([
            s.tau, s.sigma, s.theta,
            jnp.asarray(lmb, dt), jnp.asarray(radius, dt),
            s.arg_alpha, s.arb_l, s.arb_u,
            s.iteration.astype(dt),
            jnp.asarray(tols[0], dt), jnp.asarray(tols[1], dt),
            jnp.asarray(tols[2], dt), jnp.asarray(tols[3], dt),
        ])
        x2, q2, xp, qp, norms, sc = rof_fused_multichunk_banded(
            x, q, f_plane, w_plane, scal13, ri, k_chunks, n_bands,
            dataterm, opts.stepsize, pdhg_adapt_consts(problem, opts),
            interpret=interpret)
        done = sc[6].astype(jnp.int32)
        return dataclasses.replace(
            s,
            x=x2.reshape(-1), y=q2.reshape(-1),
            x_prev=xp.reshape(-1), y_prev=qp.reshape(-1),
            tau=sc[0], sigma=sc[1], arg_alpha=sc[2],
            arb_l=sc[3], arb_u=sc[4], converged=sc[5] > 0.5,
            primal_residual=norms[0], primal_var_norm=norms[1],
            dual_residual=norms[2], dual_var_norm=norms[3],
            iteration=s.iteration + done * ri,
        )

    # phase B0: multi-chunk launches with in-kernel adaptation —
    # k_chunks * ri iterations per kernel call (k_chunks=0 disables the
    # phase, the launch-per-chunk A/B configuration).  The banded
    # variant needs the double-buffer window footprint, so it is gated
    # on the same routing flag.
    if n_bands == 1 and k_chunks > 0:
        def cond_b0(s):
            return (s.iteration + k_chunks * ri <= until) & ~s.converged

        state = lax.while_loop(cond_b0, multi_chunk, state)
    elif n_bands > 1 and k_chunks > 0 and double_buffer:
        def cond_b0(s):
            return (s.iteration + k_chunks * ri <= until) & ~s.converged

        state = lax.while_loop(cond_b0, multi_chunk_banded, state)

    # phase B: fused chunks of exactly ri iterations
    def cond_b(s):
        return (s.iteration + ri <= until) & ~s.converged

    state = lax.while_loop(cond_b, fused_chunk, state)

    # epilogue: the chunks update only (x, y, x_prev, y_prev); refresh the
    # derived operator products once for the generic tail /
    # current_solution (identical values if no chunk ran)
    state = dataclasses.replace(
        state,
        kx=problem.linop.apply(state.x),
        kty=problem.linop.apply_adjoint(state.y),
        kx_prev=problem.linop.apply(state.x_prev),
        kty_prev=problem.linop.apply_adjoint(state.y_prev),
    )

    # phase C: generic tail
    def cond_c(s):
        return (s.iteration < until) & ~s.converged

    return lax.while_loop(cond_c, generic, state)
