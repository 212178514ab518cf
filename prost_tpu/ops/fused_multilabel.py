"""Fused Pallas PDHG iteration for the "fast" multilabel TV relaxation.

Workload (example_multilabel_fast.m / examples/example_multilabel_fast.py):

    min_{u >= 0} <u, f> + lmb TV(u)   s.t.  sum_l u_l = 1 per pixel

in the Lagrange-multiplier saddle form with primal u (L label planes),
duals q (2L gradient planes, coupled by one per-pixel radius-lmb ball over
all 2L components) and s (the sum-to-one multiplier plane):

    K = [ grad2d (2nL x nL) ; kron(ones(1,L), I_n) (n x nL) ]

With the Pock-Chambolle alpha preconditioner the diagonals are constant
per segment: Tau = 1/5 (col sums 4 + 1), Sigma_q = 1/2 (gradient rows),
Sigma_s = 1/L (the ones-row) — so, exactly like the ROF kernel
(ops/fused_rof.py), the whole iteration is stencils + pointwise +
label-axis reductions on VMEM-resident planes, and a residual_iter-sized
chunk runs as ONE kernel with the four preconditioned residual norms
reduced in-kernel.  Step adaptation/convergence run on the returned
scalars through the generic ``residual_and_adapt``.

Layout contract (BlockGradient2D label_first=False, L labels):
u viewed (L, nx, ny); y = [gx(L,nx,ny); gy(L,nx,ny); s(nx,ny)].
The label axis is a major (tile) axis — label reductions/broadcasts are
cheap elementwise tile ops; the stencils act on the (sublane, lane) axes.
"""

from __future__ import annotations

import dataclasses
from functools import partial

import jax
import jax.numpy as jnp
from jax import lax

from ..backend.pdhg import PDHGState, pdhg_step, residual_and_adapt
from ..linop.base import LinearOperator
from ..linop.blocks import BlockKronId
from ..linop.gradient import BlockGradient2D
from ..prox.elemop import ProxElem1D, ProxElemNorm2

_VMEM_LIMIT = 96 * 1024 * 1024
_SQRT_T = 0.4472135954999579  # sqrt(Tau) = sqrt(1/5)
_SQRT_S_Q = 0.7071067811865476  # sqrt(Sigma_q) = sqrt(1/2)


def _shift_ops_3d(shape, roll, row_offset=None, nx_global=None,
                  maskless_adjoint=False):
    """Forward-difference / adjoint stencils on the trailing two axes of a
    (L, nx, ny) value (cf. fused_rof._shift_ops for the 2D case).

    With (row_offset, nx_global) the row masks use GLOBAL row indices, so
    the stencils are correct on a halo-extended band/shard of a
    row-partitioned plane (see fused_rof._shift_ops).

    ``maskless_adjoint`` (whole-plane only): dxt/dyt as bare roll-subtract,
    exact when the operand's last row/column is zero — the dual-plane
    invariant the fast-multilabel structure shares with ROF (the masked
    forward gradient's boundary is structurally zero and the joint ball
    projection preserves zeros; see fused_rof._shift_ops).  NOT valid for
    the tight-relaxation kernel, whose q planes stay live at the boundary
    through the kron coupling (fused_tight passes the default)."""
    ri = lax.broadcasted_iota(jnp.int32, shape, 1)
    ci = lax.broadcasted_iota(jnp.int32, shape, 2)
    if row_offset is not None:
        gri = ri + row_offset
        not_last_r = gri < (nx_global - 1)
        not_first_r = gri > 0
    else:
        not_last_r = ri < (shape[1] - 1)
        not_first_r = ri > 0
    not_last_c = ci < (shape[2] - 1)
    not_first_c = ci > 0

    def dx(u):
        return jnp.where(not_last_r, roll(u, shape[1] - 1, 1) - u, 0.0)

    def dy(u):
        return jnp.where(not_last_c, roll(u, shape[2] - 1, 2) - u, 0.0)

    if maskless_adjoint and row_offset is None:
        def dxt(p):  # exact given p[:, -1, :] == 0
            return roll(p, 1, 1) - p

        def dyt(p):  # exact given p[:, :, -1] == 0
            return roll(p, 1, 2) - p
    else:
        def dxt(p):
            lead = jnp.where(not_first_r, roll(p, 1, 1), 0.0)
            return lead - jnp.where(not_last_r, p, 0.0)

        def dyt(p):
            lead = jnp.where(not_first_c, roll(p, 1, 2), 0.0)
            return lead - jnp.where(not_last_c, p, 0.0)

    return dx, dy, dxt, dyt


def _project_dead_dual_3d(qx, qy):
    """Zero the dead dual coordinates (qx's last row / qy's last column
    across all L planes) once per chunk — see
    fused_rof._project_dead_dual for the full rationale."""
    ri = lax.broadcasted_iota(jnp.int32, qx.shape, 1)
    ci = lax.broadcasted_iota(jnp.int32, qy.shape, 2)
    qx = jnp.where(ri < (qx.shape[1] - 1), qx, 0.0)
    qy = jnp.where(ci < (qy.shape[2] - 1), qy, 0.0)
    return qx, qy


def _ml_update(u, qx, qy, s, gx, gy, su, tf, tau, sig_q, sig_s, theta,
               radius, d_s, ops):
    """One preconditioned PDHG update on VMEM-resident planes.

    tau/sig_q/sig_s arrive pre-multiplied by the constant per-segment
    preconditioners (Tau = 1/5, Sigma_q = 1/2, Sigma_s = 1/L); tf is the
    hoisted tau * f plane.  (gx, gy, su) = (dx(u), dy(u), sum_l u) carried
    from the previous iteration.  Returns the new state, the new derived
    planes, and kty (= K^T of the *old* dual) for the residual step.
    """
    _dx, _dy, _dxt, _dyt = ops
    kty = _dxt(qx) + _dyt(qy) + s[None]

    # prox of ind_geq0(u) + <f, u>
    u2 = jnp.maximum(u - tau * kty - tf, 0.0)

    gx2, gy2 = _dx(u2), _dy(u2)
    su2 = jnp.sum(u2, axis=0)

    # per-pixel radius-lmb ball over all 2L gradient components
    axq = qx + sig_q * ((1.0 + theta) * gx2 - theta * gx)
    ayq = qy + sig_q * ((1.0 + theta) * gy2 - theta * gy)
    nrm2 = jnp.sum(axq * axq + ayq * ayq, axis=0)
    scale = jnp.minimum(1.0, radius * lax.rsqrt(nrm2))
    qx2 = axq * scale[None]
    qy2 = ayq * scale[None]

    # prox of <s, d_s> (linear: shift)
    s2 = s + sig_s * ((1.0 + theta) * su2 - theta * su) - sig_s * d_s
    return u2, qx2, qy2, s2, gx2, gy2, su2, kty


def _ml_chunk_core(tau_raw, sigma_raw, theta, radius, d_s, u0, q0, s0, f,
                   count: int, L: int, halo_ctx=None, g0=None,
                   return_g=False):
    """The math of one residual_iter-sized chunk: ``count - 1`` plain
    iterations, then the aligned iteration with its four preconditioned
    residual norms (squared).  Shared by the whole-plane, halo-sharded,
    and row-band tiled kernels (cf. fused_rof._chunk_core).

    halo_ctx = (row_offset, nx_global, own_lo, own_hi) runs the chunk on a
    halo-extended band/shard: stencil masks use global rows, and the norms
    cover only the owned local rows so a cross-band sum reproduces the
    global norms exactly.

    ``g0`` optionally seeds the carried derived planes
    (dx(u0), dy(u0), sum_l u0) computed by a previous chunk;
    ``return_g=True`` appends the aligned iteration's derived planes to
    the returns for that carry (cf. fused_rof._chunk_core).

    Returns ((u2, q2, s2), (u_prev, q_prev, s_prev), norms
    [, (gx2, gy2, su2)]) with q as (2L, ...) stacked [gx; gy]; ``q0``
    may be passed pre-split as a (qx0, qy0) tuple (the multichunk
    kernel carries the halves separately to avoid per-chunk
    concatenate/slice copies).
    """
    from jax.experimental.pallas import tpu as pltpu

    tau = tau_raw * 0.2          # tau * Tau
    sig_q = sigma_raw * 0.5      # sigma * Sigma_q
    sig_s = sigma_raw * (1.0 / L)  # sigma * Sigma_s
    tf = tau * f

    if halo_ctx is not None:
        row_offset, nx_global, own_lo, own_hi = halo_ctx
        ops = _shift_ops_3d(f.shape, pltpu.roll, row_offset, nx_global)
        lri = lax.broadcasted_iota(jnp.int32, f.shape[1:], 0)
        owned2 = (lri >= own_lo) & (lri < own_hi)

        def nsum(v):
            return jnp.sum(jnp.where(owned2, v, 0.0))
    else:
        ops = _shift_ops_3d(f.shape, pltpu.roll, maskless_adjoint=True)
        nsum = jnp.sum
    _dx, _dy = ops[0], ops[1]

    def body(_, carry):
        u, qx, qy, s, gx, gy, su = carry
        u, qx, qy, s, gx, gy, su, _ = _ml_update(
            u, qx, qy, s, gx, gy, su, tf, tau, sig_q, sig_s, theta,
            radius, d_s, ops)
        return u, qx, qy, s, gx, gy, su

    qx0, qy0 = q0 if isinstance(q0, tuple) else (q0[:L], q0[L:])
    if halo_ctx is None:
        # dead-coordinate projection, once per chunk (cf. fused_rof
        # _chunk_core): makes the maskless adjoints above exact
        qx0, qy0 = _project_dead_dual_3d(qx0, qy0)
    if g0 is None:
        g0 = (_dx(u0), _dy(u0), jnp.sum(u0, axis=0))
    u, qx, qy, s, gxp, gyp, sup = lax.fori_loop(
        0, count - 1, body, (u0, qx0, qy0, s0) + tuple(g0))

    # aligned iteration; (gxp, gyp, sup) = K x_prev carried for free
    u2, qx2, qy2, s2, gx2, gy2, su2, ktyp = _ml_update(
        u, qx, qy, s, gxp, gyp, sup, tf, tau, sig_q, sig_s, theta,
        radius, d_s, ops)
    kty2 = ops[2](qx2) + ops[3](qy2) + s2[None]

    # preconditioned residuals, segment-wise sqrt(Sigma)
    # (see backend/pdhg.py::compute_residuals)
    sqrt_s_s = (1.0 / L) ** 0.5
    inv_q = 1.0 / (sigma_raw * _SQRT_S_Q)
    inv_s = 1.0 / (sigma_raw * sqrt_s_s)
    zh_x = (qx - qx2) * inv_q + _SQRT_S_Q * ((1.0 + theta) * gx2 - theta * gxp)
    zh_y = (qy - qy2) * inv_q + _SQRT_S_Q * ((1.0 + theta) * gy2 - theta * gyp)
    zh_s = (s - s2) * inv_s + sqrt_s_s * ((1.0 + theta) * su2 - theta * sup)
    pd_x = zh_x - _SQRT_S_Q * gx2
    pd_y = zh_y - _SQRT_S_Q * gy2
    pd_s = zh_s - sqrt_s_s * su2
    wh = (u - u2) * (1.0 / (tau_raw * _SQRT_T)) - _SQRT_T * ktyp
    dd = wh + _SQRT_T * kty2

    norms = (
        nsum(pd_x * pd_x) + nsum(pd_y * pd_y) + nsum(pd_s * pd_s),
        nsum(zh_x * zh_x) + nsum(zh_y * zh_y) + nsum(zh_s * zh_s),
        nsum(dd * dd),
        nsum(wh * wh),
    )
    if return_g:
        return ((u2, qx2, qy2, s2), (u, qx, qy, s), norms,
                (gx2, gy2, su2))
    return (u2, qx2, qy2, s2), (u, qx, qy, s), norms


def _ml_chunk_kernel(scal_ref, u_ref, q_ref, s_ref, f_ref,
                     uo_ref, qo_ref, so_ref,
                     upo_ref, qpo_ref, spo_ref, norms_ref, *,
                     count: int, L: int, halo: bool = False,
                     nx_global: int = 0):
    """One residual_iter-sized chunk in ONE kernel, residual norms reduced
    to SMEM (cf. fused_rof._rof_chunk_kernel).

    scal_ref (SMEM): [tau, sigma, theta, radius, d_s] — with ``halo``,
    three more entries [row_offset, own_lo, own_hi] (per-band integers as
    floats) and the refs are one band's halo-EXTENDED planes.
    """
    halo_ctx = None
    if halo:
        halo_ctx = (scal_ref[5].astype(jnp.int32), nx_global,
                    scal_ref[6].astype(jnp.int32),
                    scal_ref[7].astype(jnp.int32))
    new, prev, norms = _ml_chunk_core(
        scal_ref[0], scal_ref[1], scal_ref[2], scal_ref[3], scal_ref[4],
        u_ref[...], q_ref[...], s_ref[...], f_ref[...], count, L,
        halo_ctx=halo_ctx)
    u2, qx2, qy2, s2 = new
    u, qx, qy, s = prev
    for i in range(4):
        norms_ref[i] = norms[i]
    uo_ref[...] = u2
    qo_ref[0:L] = qx2
    qo_ref[L:] = qy2
    so_ref[...] = s2
    upo_ref[...] = u
    qpo_ref[0:L] = qx
    qpo_ref[L:] = qy
    spo_ref[...] = s


def _ml_pallas_call(scal, u, q, s, f, count, L, halo, nx_global, interpret):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    plane = pl.BlockSpec(memory_space=pltpu.VMEM)
    out_shape = [jax.ShapeDtypeStruct(a.shape, a.dtype)
                 for a in (u, q, s, u, q, s)]
    out_shape.append(jax.ShapeDtypeStruct((4,), u.dtype))
    return pl.pallas_call(
        partial(_ml_chunk_kernel, count=int(count), L=L, halo=halo,
                nx_global=int(nx_global)),
        out_shape=out_shape,
        in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM)] + [plane] * 4,
        out_specs=[plane] * 6 + [pl.BlockSpec(memory_space=pltpu.SMEM)],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=_VMEM_LIMIT),
        interpret=interpret,
    )(scal, u, q, s, f)


def _ml_scal(u, tau, sigma, theta, radius, d_s):
    return jnp.stack([
        jnp.asarray(tau, u.dtype), jnp.asarray(sigma, u.dtype),
        jnp.asarray(theta, u.dtype),
        jnp.asarray(radius, u.dtype), jnp.asarray(d_s, u.dtype),
    ])


def ml_fused_chunk(u, q, s, f, tau, sigma, theta, radius, d_s, count,
                   interpret: bool = False):
    """``count`` fused iterations ending on a residual iteration, in one
    kernel.  u/f are (L, nx, ny), q is (2L, nx, ny) = [gx; gy] stacked,
    s is (nx, ny).  Returns the new iterate, the pre-aligned-step iterate,
    and the length-4 vector of SQUARED preconditioned residual norms."""
    L = u.shape[0]
    scal = _ml_scal(u, tau, sigma, theta, radius, d_s)
    return _ml_pallas_call(scal, u, q, s, f, count, L, False, 0, interpret)


def ml_fused_chunk_halo(u, q, s, f, scal, count, nx_global,
                        interpret: bool = False):
    """``count`` fused iterations on one halo-extended band/shard.  The
    plane arguments carry (nxb, ny) local row blocks; scal is the length-8
    vector [tau, sigma, theta, radius, d_s, row_offset, own_lo, own_hi].
    Returns the same tuple as ml_fused_chunk with norms covering owned
    rows only."""
    L = u.shape[0]
    return _ml_pallas_call(scal, u, q, s, f, count, L, True, nx_global,
                           interpret)


def _ml_multichunk_kernel(scal_ref, u_ref, q_ref, s_ref, f_ref,
                          uo_ref, qo_ref, so_ref, upo_ref, qpo_ref,
                          spo_ref, norms_ref, sout_ref, *,
                          count: int, k_chunks: int, L: int,
                          stepsize: str, consts):
    """``k_chunks`` residual_iter-sized multilabel chunks in ONE kernel
    with the boyd/goldstein adaptation and convergence test run
    IN-KERNEL between chunks — the multilabel analog of
    fused_rof._rof_multichunk_kernel (same scal/sout layout, with
    [radius, d_s] in place of [lmb, radius]).

    scal_ref (SMEM, 13): [tau, sigma, theta, radius, d_s, arg_alpha,
    arb_l, arb_u, it0, tol_rel_p, tol_rel_d, tol_abs_p, tol_abs_d].
    norms_ref (4): last executed chunk's norms (sqrt'd).  sout_ref (7):
    [tau, sigma, arg_alpha, arb_l, arb_u, converged, chunks_done]."""
    from .fused_rof import adapt_scalars

    theta = scal_ref[2]
    radius = scal_ref[3]
    d_s = scal_ref[4]
    it0 = scal_ref[8]
    tols4 = (scal_ref[9], scal_ref[10], scal_ref[11], scal_ref[12])
    u0 = u_ref[...]
    q0 = q_ref[...]
    s0 = s_ref[...]
    f = f_ref[...]
    zero = jnp.zeros((), u0.dtype)

    from jax.experimental.pallas import tpu as pltpu

    ops0 = _shift_ops_3d(f.shape, pltpu.roll)
    gx0, gy0, su0 = ops0[0](u0), ops0[1](u0), jnp.sum(u0, axis=0)

    def chunk(c, carry):
        planes, scal, _ = carry
        conv = scal[5]

        def run(t):
            planes_t, scal_t, _ = t
            # q carried as SPLIT (qx, qy) planes, the derived planes
            # (gx, gy, su) carried across chunks, and the PREV iterate
            # written straight to the output refs here instead of riding
            # the carry — both shrink the cond-boundary carry footprint
            # (a 14-22% multichunk-vs-single-chunk kernel gap was
            # measured on carry-heavy versions of this kernel)
            (u, qx, qy, sm, gx, gy, su) = planes_t
            tau_t, sigma_t, aa_t, al_t, au_t, _, done_t = scal_t
            new, prev, nrm, g2 = _ml_chunk_core(
                tau_t, sigma_t, theta, radius, d_s, u, (qx, qy), sm, f,
                count, L, g0=(gx, gy, su), return_g=True)
            u2, qx2, qy2, s2 = new
            up, qxp, qyp, sp = prev
            upo_ref[...] = up
            qpo_ref[0:L] = qxp
            qpo_ref[L:] = qyp
            spo_ref[...] = sp
            pr = jnp.sqrt(nrm[0])
            pn_ = jnp.sqrt(nrm[1])
            dr = jnp.sqrt(nrm[2])
            dn_ = jnp.sqrt(nrm[3])
            it = it0 + ((c + 1) * count - 1).astype(u0.dtype)
            tau2, sigma2, aa2, al2, au2, cv = adapt_scalars(
                stepsize, consts, tols4, it, tau_t, sigma_t, aa_t,
                al_t, au_t, pr, pn_, dr, dn_)
            return ((u2, qx2, qy2, s2, g2[0], g2[1], g2[2]),
                    (tau2, sigma2, aa2, al2, au2, cv, done_t + 1.0),
                    (pr, pn_, dr, dn_))

        return lax.cond(conv, lambda t: t, run, carry)

    init = (
        (u0, q0[0:L], q0[L:], s0, gx0, gy0, su0),
        (scal_ref[0], scal_ref[1], scal_ref[5], scal_ref[6], scal_ref[7],
         jnp.asarray(False), zero),
        (zero, zero, zero, zero),
    )
    planes, scal, norms = lax.fori_loop(0, k_chunks, chunk, init)
    u2, qx2, qy2, s2, _, _, _ = planes
    tau, sigma, arg_alpha, arb_l, arb_u, conv, done = scal
    for i in range(4):
        norms_ref[i] = norms[i]
    for i, v in enumerate((tau, sigma, arg_alpha, arb_l, arb_u,
                           conv.astype(u0.dtype), done)):
        sout_ref[i] = v
    uo_ref[...] = u2
    qo_ref[0:L] = qx2
    qo_ref[L:] = qy2
    so_ref[...] = s2


def ml_fused_multichunk(u, q, s, f, scal13, count, k_chunks,
                        stepsize: str, consts, interpret: bool = False):
    """Up to ``k_chunks * count`` fused multilabel iterations in ONE
    kernel with in-kernel adaptation/convergence (see
    `_ml_multichunk_kernel`).  Returns (u2, q2, s2, u_prev, q_prev,
    s_prev, norms, sout)."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    L = u.shape[0]
    plane = pl.BlockSpec(memory_space=pltpu.VMEM)
    smem = pl.BlockSpec(memory_space=pltpu.SMEM)
    out_shape = [jax.ShapeDtypeStruct(a.shape, a.dtype)
                 for a in (u, q, s, u, q, s)]
    out_shape.append(jax.ShapeDtypeStruct((4,), u.dtype))
    out_shape.append(jax.ShapeDtypeStruct((7,), u.dtype))
    return pl.pallas_call(
        partial(_ml_multichunk_kernel, count=int(count),
                k_chunks=int(k_chunks), L=L, stepsize=stepsize,
                consts=consts),
        out_shape=out_shape,
        in_specs=[smem] + [plane] * 4,
        out_specs=[plane] * 6 + [smem, smem],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=_VMEM_LIMIT),
        interpret=interpret,
    )(scal13, u, q, s, f)


def _ml_banded_mc_kernel(scal_ref, u2_hbm, q2_hbm, s2_hbm, f_hbm,
                         uo2, qo2, so2, upo, qpo, spo,
                         norms_ref, sout_ref,
                         us2, qs2, ss2, fs2, qps2, sps2, sstate, nacc,
                         in_sem, out_sem, *,
                         count: int, k_chunks: int, L: int, nx: int,
                         ny: int, rows: int, halo: int, n_bands: int,
                         stepsize: str, consts):
    """MULTI-CHUNK banded multilabel kernel — the ml analog of
    `fused_rof._rof_banded_mc_kernel`: grid = (k_chunks, n_bands) over
    in-place ping-pong state slots, in-kernel adaptation on persistent
    SMEM scratch, DMA pipeline draining at chunk boundaries (no
    prefetch is ever orphaned by convergence).  Reads go through the
    ALIASED output refs.  scal13/sout layouts as
    `_ml_multichunk_kernel` (+ sout[7] = final slot)."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    from .fused_rof import adapt_scalars

    c = pl.program_id(0)
    i = pl.program_id(1)
    step = c * n_bands + i
    ext = us2.shape[2]
    r8, h8, e8, n8 = rows // 8, halo // 8, ext // 8, nx // 8
    theta = scal_ref[2]
    radius = scal_ref[3]
    d_s = scal_ref[4]
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
        slot = lax.rem(cc, 2)
        start, _ = geom(j)
        sem = in_sem.at[buf]
        return [
            pltpu.make_async_copy(
                uo2.at[slot, :, pl.ds(start, ext)], us2.at[buf], sem),
            pltpu.make_async_copy(
                qo2.at[slot, :, pl.ds(start, ext)], qs2.at[buf], sem),
            pltpu.make_async_copy(
                so2.at[slot, pl.ds(start, ext)], ss2.at[buf], sem),
            pltpu.make_async_copy(
                f_hbm.at[:, pl.ds(start, ext)], fs2.at[buf], sem),
        ]

    def out_copies(cc, j, buf):
        slot = lax.rem(cc + 1, 2)
        _, own_w = geom(j)
        lo = 8 * (j * r8)
        sem = out_sem.at[buf]
        return [
            pltpu.make_async_copy(
                us2.at[buf, :, pl.ds(own_w, rows)],
                uo2.at[slot, :, pl.ds(lo, rows)], sem),
            pltpu.make_async_copy(
                qs2.at[buf, :, pl.ds(own_w, rows)],
                qo2.at[slot, :, pl.ds(lo, rows)], sem),
            pltpu.make_async_copy(
                ss2.at[buf, pl.ds(own_w, rows)],
                so2.at[slot, pl.ds(lo, rows)], sem),
            pltpu.make_async_copy(
                fs2.at[buf, :, pl.ds(own_w, rows)],
                upo.at[:, pl.ds(lo, rows)], sem),
            pltpu.make_async_copy(
                qps2.at[buf, :, pl.ds(own_w, rows)],
                qpo.at[:, pl.ds(lo, rows)], sem),
            pltpu.make_async_copy(
                sps2.at[buf, pl.ds(own_w, rows)],
                spo.at[pl.ds(lo, rows)], sem),
        ]

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
        new, prev, norms = _ml_chunk_core(
            sstate[0], sstate[1], theta, radius, d_s,
            us2[p], qs2[p], ss2[p], fs2[p], count, L,
            halo_ctx=halo_ctx)
        u2, qx2, qy2, s2 = new
        up, qxp, qyp, sp = prev
        for j in range(4):
            nacc[j, i] = norms[j]

        us2[p] = u2
        qs2[p, 0:L] = qx2
        qs2[p, L:] = qy2
        ss2[p] = s2
        fs2[p] = up
        qps2[p, 0:L] = qxp
        qps2[p, L:] = qyp
        sps2[p] = sp
        for cp in out_copies(c, i, p):
            cp.start()

        @pl.when(i == n_bands - 1)
        def _():
            for cp in out_copies(c, i, p):
                cp.wait()
            n0 = n1 = n2 = n3 = jnp.zeros((), u2.dtype)
            for j in range(n_bands):
                n0 += nacc[0, j]
                n1 += nacc[1, j]
                n2 += nacc[2, j]
                n3 += nacc[3, j]
            pr = jnp.sqrt(n0)
            pn_ = jnp.sqrt(n1)
            dr = jnp.sqrt(n2)
            dn_ = jnp.sqrt(n3)
            it = it0 + ((c + 1) * count - 1).astype(u2.dtype)
            tau2, sigma2, aa2, al2, au2, cv = adapt_scalars(
                stepsize, consts, tols4, it, sstate[0], sstate[1],
                sstate[2], sstate[3], sstate[4], pr, pn_, dr, dn_)
            sstate[0] = tau2
            sstate[1] = sigma2
            sstate[2] = aa2
            sstate[3] = al2
            sstate[4] = au2
            sstate[5] = cv.astype(u2.dtype)
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


def ml_fused_multichunk_banded(u, q, s, f, scal13, count, k_chunks,
                               n_bands: int, stepsize: str, consts,
                               interpret: bool = False):
    """Up to ``k_chunks * count`` banded fused multilabel iterations in
    ONE kernel with in-kernel adaptation/convergence (see
    `_ml_banded_mc_kernel`).  Returns (u2, q2, s2, u_prev, q_prev,
    s_prev, norms, sout) with the final state selected from the
    ping-pong slot sout[7]."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    L, nx, ny = u.shape
    halo = -(-(2 * int(count) + 2) // 8) * 8
    rows = nx // n_bands
    assert rows * n_bands == nx and rows % 8 == 0, (nx, n_bands)
    ext = min(rows + 2 * halo, nx)

    def dbl(a):
        return jnp.zeros((2,) + a.shape, a.dtype).at[0].set(a)

    u2_in, q2_in, s2_in = dbl(u), dbl(q), dbl(s)
    smem = pl.BlockSpec(memory_space=pltpu.SMEM)
    hbm = pl.BlockSpec(memory_space=pl.ANY)
    out_shape = [
        jax.ShapeDtypeStruct(u2_in.shape, u.dtype),
        jax.ShapeDtypeStruct(q2_in.shape, q.dtype),
        jax.ShapeDtypeStruct(s2_in.shape, s.dtype),
        jax.ShapeDtypeStruct(u.shape, u.dtype),
        jax.ShapeDtypeStruct(q.shape, q.dtype),
        jax.ShapeDtypeStruct(s.shape, s.dtype),
        jax.ShapeDtypeStruct((4,), u.dtype),
        jax.ShapeDtypeStruct((8,), u.dtype),
    ]
    dt = u.dtype
    vm = pltpu.VMEM
    scratch = [
        vm((2, L, ext, ny), dt), vm((2, 2 * L, ext, ny), dt),
        vm((2, ext, ny), dt), vm((2, L, ext, ny), dt),
        vm((2, 2 * L, ext, ny), dt), vm((2, ext, ny), dt),
        pltpu.SMEM((7,), dt), pltpu.SMEM((4, n_bands), dt),
        pltpu.SemaphoreType.DMA((2,)), pltpu.SemaphoreType.DMA((2,)),
    ]
    outs = pl.pallas_call(
        partial(_ml_banded_mc_kernel, count=int(count),
                k_chunks=int(k_chunks), L=L, nx=nx, ny=ny, rows=rows,
                halo=halo, n_bands=n_bands, stepsize=stepsize,
                consts=consts),
        grid=(int(k_chunks), int(n_bands)),
        out_shape=out_shape,
        in_specs=[smem] + [hbm] * 4,
        out_specs=[hbm, hbm, hbm, hbm, hbm, hbm, smem, smem],
        scratch_shapes=scratch,
        input_output_aliases={1: 0, 2: 1, 3: 2},
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=_VMEM_LIMIT),
        interpret=interpret,
    )(scal13, u2_in, q2_in, s2_in, f)
    u2_2, q2_2, s2_2, up, qp, sp, norms, sout = outs
    slot = sout[7].astype(jnp.int32)
    u2 = lax.dynamic_index_in_dim(u2_2, slot, 0, keepdims=False)
    q2 = lax.dynamic_index_in_dim(q2_2, slot, 0, keepdims=False)
    s2 = lax.dynamic_index_in_dim(s2_2, slot, 0, keepdims=False)
    return u2, q2, s2, up, qp, sp, norms, sout


def _ml_chunk_kernel_batched(scal_ref, u_ref, q_ref, s_ref, f_ref,
                             uo_ref, qo_ref, so_ref,
                             upo_ref, qpo_ref, spo_ref, norms_ref, *,
                             count: int, L: int):
    """Gridded batch variant (cf. fused_rof._rof_chunk_kernel_batched):
    grid = (B,), one instance per grid step.  Plane refs carry a leading
    length-1 instance axis; scal_ref/norms_ref are the WHOLE (5, B) /
    (4, B) SMEM arrays indexed by program_id (instances-minor layout —
    a blocked SMEM spec would violate Mosaic's divisibility rule)."""
    from jax.experimental import pallas as pl

    b = pl.program_id(0)
    new, prev, norms = _ml_chunk_core(
        scal_ref[0, b], scal_ref[1, b], scal_ref[2, b], scal_ref[3, b],
        scal_ref[4, b], u_ref[0], q_ref[0], s_ref[0], f_ref[0], count, L)
    u2, qx2, qy2, s2 = new
    u, qx, qy, s = prev
    for i in range(4):
        norms_ref[i, b] = norms[i]
    uo_ref[0] = u2
    qo_ref[0, 0:L] = qx2
    qo_ref[0, L:] = qy2
    so_ref[0] = s2
    upo_ref[0] = u
    qpo_ref[0, 0:L] = qx
    qpo_ref[0, L:] = qy
    spo_ref[0] = s


def ml_fused_chunk_batched(u, q, s, f, scal, count,
                           interpret: bool = False):
    """Batched multilabel chunk: grid over the instance axis, one chunk
    per instance per kernel call.  u/f are (B, L, nx, ny), q is
    (B, 2L, nx, ny), s is (B, nx, ny); scal is (5, B) instances-minor
    rows of [tau, sigma, theta, radius, d_s].  Returns the same tuple as
    ``ml_fused_chunk`` with a leading batch axis and norms2 (4, B)."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    B, L, nx, ny = u.shape
    smem = pl.BlockSpec(memory_space=pltpu.SMEM)
    uspec = pl.BlockSpec((1, L, nx, ny), lambda b: (b, 0, 0, 0),
                         memory_space=pltpu.VMEM)
    qspec = pl.BlockSpec((1, 2 * L, nx, ny), lambda b: (b, 0, 0, 0),
                         memory_space=pltpu.VMEM)
    sspec = pl.BlockSpec((1, nx, ny), lambda b: (b, 0, 0),
                         memory_space=pltpu.VMEM)
    out_shape = [
        jax.ShapeDtypeStruct(u.shape, u.dtype),
        jax.ShapeDtypeStruct(q.shape, q.dtype),
        jax.ShapeDtypeStruct(s.shape, s.dtype),
        jax.ShapeDtypeStruct(u.shape, u.dtype),
        jax.ShapeDtypeStruct(q.shape, q.dtype),
        jax.ShapeDtypeStruct(s.shape, s.dtype),
        jax.ShapeDtypeStruct((4, B), u.dtype),
    ]
    return pl.pallas_call(
        partial(_ml_chunk_kernel_batched, count=int(count), L=L),
        grid=(B,),
        out_shape=out_shape,
        in_specs=[smem, uspec, qspec, sspec, uspec],
        out_specs=[uspec, qspec, sspec, uspec, qspec, sspec, smem],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=_VMEM_LIMIT),
        interpret=interpret,
    )(scal, u, q, s, f)


def _ml_banded_kernel(scal_ref, off_ref, u_hbm, q_hbm, s_hbm, f_hbm,
                      uo_hbm, qo_hbm, so_hbm, upo_hbm, qpo_hbm, spo_hbm,
                      norms_ref, us, qs, ss, fs, qps, sps, sem, *,
                      count: int, L: int, nx: int, rows: int, halo: int,
                      own_lo: int):
    """Grid-banded multilabel chunk (cf. fused_rof._rof_banded_kernel):
    one launch per chunk, manual halo-window DMAs from HBM in, owned-row
    DMAs out (staged through the freed input scratch — Mosaic cannot
    lower value-level dynamic_slice).  Inputs AND outputs live in HBM
    (memory_space=ANY) and the owned-row DMAs use GLOBAL row offsets —
    per-band VMEM output blocks must NOT be mixed with global offsets:
    interpret mode clamps the out-of-range starts (hiding the mismatch)
    but on hardware the writes land wrong.  norms_ref is the whole
    (4, n_bands) SMEM array."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    i = pl.program_id(0)
    ext = us.shape[1]
    nin = u_hbm.shape[-2]  # input block height (== nx unless sharded)
    # 8 * (...) construction: provable sublane-tile alignment (fused_rof)
    r8, h8, e8, n8 = rows // 8, halo // 8, ext // 8, nin // 8
    o8 = own_lo // 8
    start8 = jnp.clip(o8 + i * r8 - h8, 0, n8 - e8)
    start = 8 * start8
    own_w = 8 * (o8 + i * r8 - start8)  # owned-lo within the window

    def copies(pairs):
        # issue every transfer, then drain: overlaps the DMA setup/latency
        # of the many per-label-plane strided subcopies
        cs = [pltpu.make_async_copy(src, dst, sem) for src, dst in pairs]
        for c in cs:
            c.start()
        for c in cs:
            c.wait()

    copies([
        (u_hbm.at[:, pl.ds(start, ext)], us),
        (q_hbm.at[:, pl.ds(start, ext)], qs),
        (s_hbm.at[pl.ds(start, ext)], ss),
        (f_hbm.at[:, pl.ds(start, ext)], fs),
    ])

    halo_ctx = (off_ref[0] + start, nx, own_w, own_w + rows)
    new, prev, norms = _ml_chunk_core(
        scal_ref[0], scal_ref[1], scal_ref[2], scal_ref[3], scal_ref[4],
        us[...], qs[...], ss[...], fs[...], count, L, halo_ctx=halo_ctx)
    u2, qx2, qy2, s2 = new
    up, qxp, qyp, sp = prev
    for j in range(4):
        norms_ref[j, i] = norms[j]

    # stage results in the freed scratch, DMA owned rows out
    us[...] = u2
    qs[0:L] = qx2
    qs[L:] = qy2
    ss[...] = s2
    fs[...] = up
    qps[0:L] = qxp
    qps[L:] = qyp
    sps[...] = sp
    lo = 8 * (i * r8)
    copies([
        (us.at[:, pl.ds(own_w, rows)], uo_hbm.at[:, pl.ds(lo, rows)]),
        (qs.at[:, pl.ds(own_w, rows)], qo_hbm.at[:, pl.ds(lo, rows)]),
        (ss.at[pl.ds(own_w, rows)], so_hbm.at[pl.ds(lo, rows)]),
        (fs.at[:, pl.ds(own_w, rows)], upo_hbm.at[:, pl.ds(lo, rows)]),
        (qps.at[:, pl.ds(own_w, rows)], qpo_hbm.at[:, pl.ds(lo, rows)]),
        (sps.at[pl.ds(own_w, rows)], spo_hbm.at[pl.ds(lo, rows)]),
    ])


def _ml_banded_db_kernel(scal_ref, off_ref, u_hbm, q_hbm, s_hbm, f_hbm,
                         uo_hbm, qo_hbm, so_hbm, upo_hbm, qpo_hbm, spo_hbm,
                         norms_ref, us2, qs2, ss2, fs2, qps2, sps2,
                         in_sem, out_sem, *,
                         count: int, L: int, nx: int, rows: int, halo: int,
                         own_lo: int, n_bands: int):
    """DOUBLE-BUFFERED grid-banded multilabel chunk: the shared
    `fused_rof.run_banded_db` pipeline around `_ml_chunk_core` (band
    i+1's window fetch and band i-1's writeback overlap band i's
    compute; ~2x the window scratch)."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    from .fused_rof import run_banded_db

    i = pl.program_id(0)
    ext = us2.shape[2]
    nin = u_hbm.shape[-2]
    r8, h8, e8, n8 = rows // 8, halo // 8, ext // 8, nin // 8
    o8 = own_lo // 8

    def geom(j):
        start8 = jnp.clip(o8 + j * r8 - h8, 0, n8 - e8)
        return 8 * start8, 8 * (o8 + j * r8 - start8)

    def in_copies(j, buf):
        start, _ = geom(j)
        sem = in_sem.at[buf]
        return [
            pltpu.make_async_copy(
                u_hbm.at[:, pl.ds(start, ext)], us2.at[buf], sem),
            pltpu.make_async_copy(
                q_hbm.at[:, pl.ds(start, ext)], qs2.at[buf], sem),
            pltpu.make_async_copy(
                s_hbm.at[pl.ds(start, ext)], ss2.at[buf], sem),
            pltpu.make_async_copy(
                f_hbm.at[:, pl.ds(start, ext)], fs2.at[buf], sem),
        ]

    def out_copies(j, buf):
        _, own_w = geom(j)
        lo = 8 * (j * r8)
        sem = out_sem.at[buf]
        return [
            pltpu.make_async_copy(
                us2.at[buf, :, pl.ds(own_w, rows)],
                uo_hbm.at[:, pl.ds(lo, rows)], sem),
            pltpu.make_async_copy(
                qs2.at[buf, :, pl.ds(own_w, rows)],
                qo_hbm.at[:, pl.ds(lo, rows)], sem),
            pltpu.make_async_copy(
                ss2.at[buf, pl.ds(own_w, rows)],
                so_hbm.at[pl.ds(lo, rows)], sem),
            pltpu.make_async_copy(
                fs2.at[buf, :, pl.ds(own_w, rows)],
                upo_hbm.at[:, pl.ds(lo, rows)], sem),
            pltpu.make_async_copy(
                qps2.at[buf, :, pl.ds(own_w, rows)],
                qpo_hbm.at[:, pl.ds(lo, rows)], sem),
            pltpu.make_async_copy(
                sps2.at[buf, pl.ds(own_w, rows)],
                spo_hbm.at[pl.ds(lo, rows)], sem),
        ]

    def compute(p):
        start, own_w = geom(i)
        halo_ctx = (off_ref[0] + start, nx, own_w, own_w + rows)
        new, prev, norms = _ml_chunk_core(
            scal_ref[0], scal_ref[1], scal_ref[2], scal_ref[3],
            scal_ref[4], us2[p], qs2[p], ss2[p], fs2[p], count, L,
            halo_ctx=halo_ctx)
        u2, qx2, qy2, s2 = new
        up, qxp, qyp, sp = prev
        for j in range(4):
            norms_ref[j, i] = norms[j]
        us2[p] = u2
        qs2[p, 0:L] = qx2
        qs2[p, L:] = qy2
        ss2[p] = s2
        fs2[p] = up
        qps2[p, 0:L] = qxp
        qps2[p, L:] = qyp
        sps2[p] = sp

    run_banded_db(i, n_bands, in_copies, out_copies, compute)


def ml_fused_chunk_banded(u, q, s, f, tau, sigma, theta, radius, d_s,
                          count, n_bands: int, interpret: bool = False,
                          own_lo: int = 0, out_rows: int | None = None,
                          nx_global=None, row_offset0=None,
                          double_buffer: bool = False):
    """``count`` fused iterations with the planes split into ``n_bands``
    row bands inside ONE kernel.  Same returns as ``ml_fused_chunk``.
    (own_lo, out_rows, nx_global, row_offset0) band a halo-extended
    shard block instead (see fused_rof.rof_fused_chunk_banded);
    ``double_buffer`` overlaps window DMA with compute at ~2x the
    window scratch."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    L, nin, ny = u.shape
    out_rows = nin if out_rows is None else out_rows
    nx_global = nin if nx_global is None else nx_global
    # 8-aligned halo/rows: Mosaic DMA slice alignment (see fused_rof)
    halo = -(-(2 * int(count) + 2) // 8) * 8
    rows = out_rows // n_bands
    assert rows * n_bands == out_rows and rows % 8 == 0, (out_rows, n_bands)
    assert own_lo % 8 == 0, own_lo
    ext = min(rows + 2 * halo, nin)

    scal = _ml_scal(u, tau, sigma, theta, radius, d_s)
    off = jnp.asarray(
        [0 if row_offset0 is None else row_offset0], jnp.int32)
    smem = pl.BlockSpec(memory_space=pltpu.SMEM)
    hbm = pl.BlockSpec(memory_space=pl.ANY)
    out_shape = [
        jax.ShapeDtypeStruct((L, out_rows, ny), u.dtype),
        jax.ShapeDtypeStruct((2 * L, out_rows, ny), q.dtype),
        jax.ShapeDtypeStruct((out_rows, ny), s.dtype),
        jax.ShapeDtypeStruct((L, out_rows, ny), u.dtype),
        jax.ShapeDtypeStruct((2 * L, out_rows, ny), q.dtype),
        jax.ShapeDtypeStruct((out_rows, ny), s.dtype),
        jax.ShapeDtypeStruct((4, n_bands), u.dtype),
    ]
    dt = u.dtype
    if double_buffer:
        kern = partial(_ml_banded_db_kernel, count=int(count), L=L,
                       nx=int(nx_global), rows=rows, halo=halo,
                       own_lo=int(own_lo), n_bands=n_bands)
        scratch = [
            pltpu.VMEM((2, L, ext, ny), dt),
            pltpu.VMEM((2, 2 * L, ext, ny), dt),
            pltpu.VMEM((2, ext, ny), dt),
            pltpu.VMEM((2, L, ext, ny), dt),
            pltpu.VMEM((2, 2 * L, ext, ny), dt),
            pltpu.VMEM((2, ext, ny), dt),
            pltpu.SemaphoreType.DMA((2,)), pltpu.SemaphoreType.DMA((2,)),
        ]
    else:
        kern = partial(_ml_banded_kernel, count=int(count), L=L,
                       nx=int(nx_global), rows=rows, halo=halo,
                       own_lo=int(own_lo))
        scratch = [
            pltpu.VMEM((L, ext, ny), dt), pltpu.VMEM((2 * L, ext, ny), dt),
            pltpu.VMEM((ext, ny), dt), pltpu.VMEM((L, ext, ny), dt),
            pltpu.VMEM((2 * L, ext, ny), dt), pltpu.VMEM((ext, ny), dt),
            pltpu.SemaphoreType.DMA,
        ]
    outs = pl.pallas_call(
        kern,
        grid=(n_bands,),
        out_shape=out_shape,
        in_specs=[smem, smem, hbm, hbm, hbm, hbm],
        out_specs=[hbm] * 6 + [smem],
        scratch_shapes=scratch,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=_VMEM_LIMIT),
        interpret=interpret,
    )(scal, off, u, q, s, f)
    return (outs[0], outs[1], outs[2], outs[3], outs[4], outs[5],
            jnp.sum(outs[6], axis=1))


def ml_fused_chunk_tiled(u, q, s, f, tau, sigma, theta, radius, d_s, count,
                         n_bands: int, interpret: bool = False):
    """``count`` fused iterations on planes too large for VMEM: row bands
    through the halo-extended kernel, exactly like
    fused_rof.rof_fused_chunk_tiled (owned rows bit-identical to the
    whole-plane kernel; owned-row norms sum to the global norms; the
    band loop is a fori_loop with CLAMPED dynamic slices of the unpadded
    planes — kernel compiles once, no pad/stack/transpose copies)."""
    L, nx, ny = u.shape
    halo = 2 * int(count) + 2
    rows = nx // n_bands
    assert rows * n_bands == nx
    ext = min(rows + 2 * halo, nx)
    base = _ml_scal(u, tau, sigma, theta, radius, d_s)

    def band(i, carry):
        lo = i * rows
        start = jnp.clip(lo - halo, 0, nx - ext)
        own_lo = lo - start

        def sl(a):
            return lax.dynamic_slice_in_dim(a, start, ext, axis=a.ndim - 2)

        scal = jnp.concatenate([
            base,
            jnp.stack([start.astype(u.dtype), own_lo.astype(u.dtype),
                       (own_lo + rows).astype(u.dtype)]),
        ])
        outs = ml_fused_chunk_halo(
            sl(u), sl(q), sl(s), sl(f), scal, count, nx,
            interpret=interpret)

        def upd(acc, val):
            ax = acc.ndim - 2
            crop = lax.dynamic_slice_in_dim(val, own_lo, rows, axis=ax)
            return lax.dynamic_update_slice_in_dim(acc, crop, lo, axis=ax)

        return tuple(upd(a, o) for a, o in zip(carry[:6], outs[:6])) + (
            carry[6] + outs[6],)

    init = (jnp.zeros_like(u), jnp.zeros_like(q), jnp.zeros_like(s),
            jnp.zeros_like(u), jnp.zeros_like(q), jnp.zeros_like(s),
            jnp.zeros((4,), u.dtype))
    return lax.fori_loop(0, n_bands, band, init)


def ml_fits_vmem(nx: int, ny: int, L: int, itemsize: int = 4) -> bool:
    """~15 live (L, nx, ny) buffers must fit in the raised VMEM limit."""
    return (15 * L + 5) * nx * ny * itemsize <= _VMEM_LIMIT


def ml_band_count(nx: int, ny: int, L: int, residual_iter: int,
                  itemsize: int = 4, double_buffer: bool = False):
    """Row-band tiling factor (cf. fused_rof.band_count): smallest divisor
    of nx whose halo-extended band keeps the ~(15L + 5) live label-planes
    under the VMEM limit; 1 = whole plane, None = no efficient tiling.
    ``double_buffer`` sizes for the DB kernel's doubled window scratch
    (~+8L + 2 planes).

    Don't be tempted to prefer wider bands for less halo recompute: at
    512x512x8/ri=10, nb=2 measured SLOWER than this function's nb=4
    (668 vs 630 us/chunk) — VMEM pressure beats the halo saving."""
    from .fused_rof import band_count

    n_planes = (23 * L + 7) if double_buffer else (15 * L + 5)
    return band_count(nx, ny, residual_iter, n_planes=n_planes,
                      itemsize=itemsize)


def match_multilabel_structure(problem):
    """Detect the fusable fast-multilabel structure; returns a dict or
    None.  Conditions (built by examples/example_multilabel_fast.py):

    * linop = [BlockGradient2D(L, label_first=False) at (0, 0);
               kron(ones(1, L), I_n) at (2nL, 0)]
    * prox_g = one ProxElem1D ind_geq0 with a=1, b=0, c scalar > 0,
      d = the unary cost vector (or scalar), e=0 — projection onto u >= 0
      with a linear term
    * prox_fstar = ProxElemNorm2(dim=2L, planar, ind_leq0, scalar a,b;
      d=e=0) over the gradient rows (per-pixel radius-(b/a) ball) + one
      ProxElem1D zero (linear shift d_s) over the multiplier rows
    * alpha preconditioner: Sigma = [1/2; 1/L], Tau = 1/5
    """
    import numpy as np

    from ..config import dtype

    if dtype() != jnp.float32:
        return None
    linop = problem.linop
    if not isinstance(linop, LinearOperator) or len(linop.blocks) != 2:
        return None
    grad = next((b for b in linop.blocks
                 if isinstance(b, BlockGradient2D)), None)
    kron = next((b for b in linop.blocks if isinstance(b, BlockKronId)), None)
    if grad is None or kron is None or grad.label_first or grad.L < 1:
        return None
    L, nx, ny = grad.L, grad.nx, grad.ny
    n = nx * ny
    if grad.row != 0 or grad.col != 0:
        return None
    if kron.row != 2 * n * L or kron.col != 0 or kron.diaglength != n:
        return None
    m = np.asarray(kron.data)
    if m.shape != (1, L) or not np.all(m == 1.0):
        return None

    # --- primal prox: positivity + linear unaries ---------------------------
    if len(problem.prox_g) != 1 or len(problem.prox_fstar) != 2:
        return None
    pg = problem.prox_g[0]
    if not isinstance(pg, ProxElem1D) or pg.fun != "ind_geq0":
        return None
    if pg.index != 0 or pg.size != n * L:
        return None
    a, b, c, d, e, _, _ = pg.coeffs
    if not (np.isscalar(a) and a == 1.0 and np.isscalar(b) and b == 0.0):
        return None
    if not (np.isscalar(c) and c > 0.0) or not (np.isscalar(e) and e == 0.0):
        return None
    f = jnp.asarray(
        np.broadcast_to(np.asarray(d, np.float32), (n * L,))
    ).reshape(L, nx, ny)

    # --- dual proxes: 2L-ball over gradient rows + linear shift on s --------
    ball = shift = None
    for p in problem.prox_fstar:
        if isinstance(p, ProxElemNorm2) and p.index == 0:
            ball = p
        elif isinstance(p, ProxElem1D) and p.index == 2 * n * L:
            shift = p
    if ball is None or shift is None:
        return None
    if (ball.fun != "ind_leq0" or ball.size != 2 * n * L
            or ball.dim != 2 * L or ball.interleaved):
        return None
    ia, ib, ic, idd, ie, _, _ = ball.coeffs
    for v in (ia, ib, ic):
        if not np.isscalar(v):
            return None
    if idd != 0.0 or ie != 0.0 or ia <= 0:
        return None
    radius = float(ib) / float(ia)
    if shift.fun != "zero" or shift.size != n:
        return None
    sa, sb, sc, sd, se, _, _ = shift.coeffs
    if not (np.isscalar(sd) and np.isscalar(se) and se == 0.0):
        return None
    d_s = float(sd)

    # constant per-segment alpha preconditioner
    sl = np.asarray(problem.scaling_left)
    sr = np.asarray(problem.scaling_right)
    if not (np.allclose(sl[: 2 * n * L], 0.5)
            and np.allclose(sl[2 * n * L:], 1.0 / L)
            and np.allclose(sr, 0.2)):
        return None
    # no VMEM gate here (structure matching only) — callers pick the
    # whole-plane, tiled (ml_band_count), or halo-sharded kernel
    return {
        "nx": nx, "ny": ny, "L": L, "f": f,
        "radius": radius, "d_s": d_s,
    }


@partial(jax.jit, static_argnums=(3, 4, 5, 6, 7, 8, 9, 10, 11),
         donate_argnums=(15,))
def _fused_ml_run(problem, prox_g, prox_fstar, opts, nx, ny, L, n_bands,
                  double_buffer, k_chunks, interpret, tols, f_planes,
                  radius, d_s, state, until):
    """Phase structure identical to fused_rof._fused_rof_run: align ->
    single-kernel chunks (+ scalar adaptation) -> K-product epilogue ->
    generic tail."""
    ri = max(int(opts.residual_iter), 1)
    n = nx * ny
    nL = n * L

    def generic(s: PDHGState) -> PDHGState:
        return pdhg_step(problem, prox_g, prox_fstar, opts, tols, s)

    def pack(xf, yf):
        return (xf.reshape(L, nx, ny),
                yf[:2 * nL].reshape(2 * L, nx, ny),
                yf[2 * nL:].reshape(nx, ny))

    def fused_chunk(carry):
        # the chunk loop carries PLANES (packed once, below) — the
        # per-chunk y slice/concat glue costs real HBM copies (round 3,
        # cf. fused_deblur's measured ~40%).  Footprint note: the stale
        # flat vectors (s.x, s.y, prevs) stay live alongside the carried
        # plane copies for the whole phase; roughly doubled solver-state
        # HBM residency, accepted — HBM is ~16 GB against <=1 GB of
        # state at the largest benched sizes (ADVICE r3)
        s, (u, q, sm, _up, _qp, _sp) = carry
        chunk = (ml_fused_chunk if n_bands == 1
                 else partial(ml_fused_chunk_banded, n_bands=n_bands,
                              double_buffer=double_buffer))
        u2, q2, s2, up, qp, sp, norms2 = chunk(
            u, q, sm, f_planes, s.tau, s.sigma, s.theta, radius, d_s,
            ri, interpret=interpret)
        norms = jnp.sqrt(norms2)
        s = residual_and_adapt(
            problem, opts, tols, s,
            norms[0], norms[1], norms[2], norms[3],
            s.iteration + ri - 1,
        )
        s = dataclasses.replace(s, iteration=s.iteration + ri)
        return (s, (u2, q2, s2, up, qp, sp))

    def multi_chunk(carry):
        from .fused_rof import pdhg_adapt_consts

        s, (u, q, sm, _up, _qp, _sp) = carry
        dt = u.dtype
        scal13 = jnp.stack([
            s.tau, s.sigma, s.theta,
            radius.astype(dt), d_s.astype(dt),
            s.arg_alpha, s.arb_l, s.arb_u, s.iteration.astype(dt),
            jnp.asarray(tols[0], dt), jnp.asarray(tols[1], dt),
            jnp.asarray(tols[2], dt), jnp.asarray(tols[3], dt),
        ])
        u2, q2, s2, up, qp, sp, norms, sc = ml_fused_multichunk(
            u, q, sm, f_planes, scal13, ri, k_chunks, opts.stepsize,
            pdhg_adapt_consts(problem, opts), interpret=interpret)
        done = sc[6].astype(jnp.int32)
        s = dataclasses.replace(
            s,
            tau=sc[0], sigma=sc[1], arg_alpha=sc[2],
            arb_l=sc[3], arb_u=sc[4], converged=sc[5] > 0.5,
            primal_residual=norms[0], primal_var_norm=norms[1],
            dual_residual=norms[2], dual_var_norm=norms[3],
            iteration=s.iteration + done * ri,
        )
        return (s, (u2, q2, s2, up, qp, sp))

    align = 1 % ri

    def cond_a(s):
        return (s.iteration % ri != align) & (s.iteration < until) & ~s.converged

    state = lax.while_loop(cond_a, generic, state)

    # canonicalize the dual warm start once per run (cf. fused_rof
    # _fused_rof_run): all fused routes then agree bit-exactly
    def proj_y(yf):
        q = yf[: 2 * nL].reshape(2 * L, nx, ny)
        qx, qy = _project_dead_dual_3d(q[:L], q[L:])
        return jnp.concatenate(
            [qx.reshape(-1), qy.reshape(-1), yf[2 * nL:]])

    state = dataclasses.replace(
        state, y=proj_y(state.y), y_prev=proj_y(state.y_prev))

    def multi_chunk_banded(carry):
        from .fused_rof import pdhg_adapt_consts

        s, (u, q, sm, _up, _qp, _sp) = carry
        dt = u.dtype
        scal13 = jnp.stack([
            s.tau, s.sigma, s.theta,
            radius.astype(dt), d_s.astype(dt),
            s.arg_alpha, s.arb_l, s.arb_u, s.iteration.astype(dt),
            jnp.asarray(tols[0], dt), jnp.asarray(tols[1], dt),
            jnp.asarray(tols[2], dt), jnp.asarray(tols[3], dt),
        ])
        u2, q2, s2, up, qp, sp, norms, sc = ml_fused_multichunk_banded(
            u, q, sm, f_planes, scal13, ri, k_chunks, n_bands,
            opts.stepsize, pdhg_adapt_consts(problem, opts),
            interpret=interpret)
        done = sc[6].astype(jnp.int32)
        s = dataclasses.replace(
            s,
            tau=sc[0], sigma=sc[1], arg_alpha=sc[2],
            arb_l=sc[3], arb_u=sc[4], converged=sc[5] > 0.5,
            primal_residual=norms[0], primal_var_norm=norms[1],
            dual_residual=norms[2], dual_var_norm=norms[3],
            iteration=s.iteration + done * ri,
        )
        return (s, (u2, q2, s2, up, qp, sp))

    planes0 = pack(state.x, state.y) + pack(state.x_prev, state.y_prev)

    # phase B0: multi-chunk launches with in-kernel adaptation (cf.
    # fused_rof phase B0); k_chunks=0 disables; the banded variant is
    # gated on the double-buffer window footprint
    if n_bands == 1 and k_chunks > 0:
        def cond_b0(carry):
            s = carry[0]
            return (s.iteration + k_chunks * ri <= until) & ~s.converged

        state, planes0 = lax.while_loop(cond_b0, multi_chunk,
                                        (state, planes0))
    elif n_bands > 1 and k_chunks > 0 and double_buffer:
        def cond_b0(carry):
            s = carry[0]
            return (s.iteration + k_chunks * ri <= until) & ~s.converged

        state, planes0 = lax.while_loop(cond_b0, multi_chunk_banded,
                                        (state, planes0))

    def cond_b(carry):
        s = carry[0]
        return (s.iteration + ri <= until) & ~s.converged

    state, planes = lax.while_loop(cond_b, fused_chunk, (state, planes0))

    def unpack(ue, qe, se):
        return (ue.reshape(-1),
                jnp.concatenate([qe.reshape(-1), se.reshape(-1)]))

    x_new, y_new = unpack(*planes[:3])
    xp_new, yp_new = unpack(*planes[3:])
    state = dataclasses.replace(
        state, x=x_new, y=y_new, x_prev=xp_new, y_prev=yp_new)

    state = dataclasses.replace(
        state,
        kx=problem.linop.apply(state.x),
        kty=problem.linop.apply_adjoint(state.y),
        kx_prev=problem.linop.apply(state.x_prev),
        kty_prev=problem.linop.apply_adjoint(state.y_prev),
    )

    def cond_c(s):
        return (s.iteration < until) & ~s.converged

    return lax.while_loop(cond_c, generic, state)
