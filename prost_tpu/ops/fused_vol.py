"""Fused Pallas PDHG for volumetric-TV problems (BlockGradient3D).

Workload: min_u c/2 ||u - f||^2 (or c |u - f|) + ||grad3 u||_{2,1} on an
(L, nx, ny) volume, where grad3 = BlockGradient3D (x/y forward differences
with Neumann boundary + a z/"label" difference with DIRICHLET far
boundary, block_gradient3d.cu:153-174; linop/gradient.py).  The reference
treats this operator as first-class but ships no fused path anywhere —
here the whole residual_iter chunk runs in one Pallas kernel exactly like
ops/fused_rof.py, with a THIRD stencil pair and the gradient3d alpha
preconditioner constants Sigma = 1/row_sum = 1/2, Tau = 1/col_sum = 1/6
(block_gradient3d.cu:165-174).

Volumes too large for VMEM run a grid-banded kernel over the nx axis
(rows of every z-plane), same DMA discipline as fused_rof
(memory_space=ANY in/out, 8-aligned window offsets, owned rows
bit-identical to the whole-volume kernel).

Layout contract: u viewed (L, nx, ny) (label_first=False), y = [gx; gy;
gl] stacked (3, L, nx, ny) -> flat (3*L*nx*ny,) in BlockGradient3D's
segment order.
"""

from __future__ import annotations

import dataclasses
from functools import partial

import jax
import jax.numpy as jnp
from jax import lax

from ..backend.pdhg import PDHGState, pdhg_step, residual_and_adapt
from ..linop.base import LinearOperator
from ..linop.gradient import BlockGradient3D
from ..prox.combinators import ProxMoreau
from ..prox.elemop import ProxElem1D, ProxElemNorm2

_VMEM_LIMIT = 96 * 1024 * 1024
_SQRT_S = 0.7071067811865476      # sqrt(1/2)
_SQRT_T = 0.4082482904638631      # sqrt(1/6)


def _vol_ops(shape, roll, row_offset=None, nx_global=None,
             maskless_adjoint=False):
    """The six gradient3d stencils on an (L, nxb, ny) block via roll +
    iota masks: x/y forward differences with Neumann boundary (zero at
    the far edge), z/label difference with Dirichlet far boundary
    (last = -u_last), plus the three adjoints.  With (row_offset,
    nx_global) the x-row masks use GLOBAL rows (halo-extended bands).

    ``maskless_adjoint`` (whole-volume only) drops the selects from
    dxt/dyt, exact under the dead-dual invariant qx[:, -1, :] ==
    qy[:, :, -1] == 0 (see fused_rof._shift_ops).  dlt KEEPS its mask:
    the label axis is Dirichlet — ql's last plane is live (it couples to
    -u_last), so there is no zero invariant to exploit there."""
    L = shape[0]
    ri = lax.broadcasted_iota(jnp.int32, shape, 1)
    ci = lax.broadcasted_iota(jnp.int32, shape, 2)
    li = lax.broadcasted_iota(jnp.int32, shape, 0)
    if row_offset is not None:
        gri = ri + row_offset
        not_last_r = gri < (nx_global - 1)
        not_first_r = gri > 0
    else:
        not_last_r = ri < (shape[1] - 1)
        not_first_r = ri > 0
    not_last_c = ci < (shape[2] - 1)
    not_first_c = ci > 0
    not_last_l = li < (L - 1)
    not_first_l = li > 0

    def dx(u):
        return jnp.where(not_last_r, roll(u, shape[1] - 1, 1) - u, 0.0)

    def dy(u):
        return jnp.where(not_last_c, roll(u, shape[2] - 1, 2) - u, 0.0)

    def dl(u):
        # Dirichlet at the far z boundary: gl_last = 0 - u_last
        return jnp.where(not_last_l, roll(u, L - 1, 0), 0.0) - u

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

    def dlt(p):
        return jnp.where(not_first_l, roll(p, 1, 0), 0.0) - p

    return dx, dy, dl, dxt, dyt, dlt


def _project_dead_dual_vol(qx, qy):
    """Zero qx's last x-row / qy's last y-column (dead coordinates of the
    Neumann axes; the Dirichlet label axis has none) — see
    fused_rof._project_dead_dual."""
    ri = lax.broadcasted_iota(jnp.int32, qx.shape, 1)
    ci = lax.broadcasted_iota(jnp.int32, qy.shape, 2)
    qx = jnp.where(ri < (qx.shape[1] - 1), qx, 0.0)
    qy = jnp.where(ci < (qy.shape[2] - 1), qy, 0.0)
    return qx, qy


def _vol_update(u, qx, qy, ql, gx, gy, gl, dt0, dt1, tau, sig_p, sig_t,
                radius, ops, dataterm: str):
    """One preconditioned PDHG update on VMEM-resident volumes (cf.
    fused_rof._rof_update, with the third stencil).  (gx, gy, gl) is
    grad3(u) carried from the previous iteration."""
    _dx, _dy, _dl, _dxt, _dyt, _dlt = ops
    kty = _dxt(qx) + _dyt(qy) + _dlt(ql)

    arg = u - tau * kty
    if dataterm in ("square", "wsquare"):
        u_new = (arg + dt0) * dt1
    else:  # abs — soft shrink via clamp (cf. fused_rof._rof_update)
        d = arg - dt0
        u_new = arg - jnp.clip(d, -dt1, dt1)

    gx_n, gy_n, gl_n = _dx(u_new), _dy(u_new), _dl(u_new)
    ax = qx + sig_p * gx_n - sig_t * gx
    ay = qy + sig_p * gy_n - sig_t * gy
    al = ql + sig_p * gl_n - sig_t * gl
    scale = jnp.minimum(
        1.0, radius * lax.rsqrt(ax * ax + ay * ay + al * al))
    return (u_new, ax * scale, ay * scale, al * scale,
            gx_n, gy_n, gl_n, kty)


def _vol_chunk_core(tau_raw, sigma_raw, theta, lmb, radius, u0, q0, f, w,
                    count: int, dataterm: str, halo_ctx=None):
    """``count - 1`` plain iterations then the aligned iteration with its
    four preconditioned residual norms (squared); cf. fused_rof._chunk_core.
    q0 is (3, L, nxb, ny) stacked [gx; gy; gl]."""
    from jax.experimental.pallas import tpu as pltpu

    tau = tau_raw * (1.0 / 6.0)   # tau * Tau
    sigma_p = sigma_raw * 0.5     # sigma * Sigma
    sig_p = sigma_p * (1.0 + theta)
    sig_t = sigma_p * theta
    w = w if dataterm == "wsquare" else None
    if dataterm == "square":
        dt0, dt1 = (tau * lmb) * f, 1.0 / (1.0 + tau * lmb)
    elif dataterm == "wsquare":
        tw = (tau * lmb) * w
        dt0, dt1 = tw * f, 1.0 / (1.0 + tw)
    else:
        dt0, dt1 = f, tau * lmb

    if halo_ctx is not None:
        row_offset, nx_global, own_lo, own_hi = halo_ctx
        ops = _vol_ops(f.shape, pltpu.roll, row_offset, nx_global)
        lri = lax.broadcasted_iota(jnp.int32, f.shape, 1)
        owned = (lri >= own_lo) & (lri < own_hi)

        def nsum(v):
            return jnp.sum(jnp.where(owned, v, 0.0))
    else:
        ops = _vol_ops(f.shape, pltpu.roll, maskless_adjoint=True)
        nsum = jnp.sum
    qx0, qy0, ql0 = q0[0], q0[1], q0[2]
    if halo_ctx is None:
        # dead-coordinate projection, once per chunk (cf. fused_rof
        # _chunk_core): makes the maskless x/y adjoints exact
        qx0, qy0 = _project_dead_dual_vol(qx0, qy0)
    _dx, _dy, _dl = ops[0], ops[1], ops[2]

    def body(_, carry):
        u, qx, qy, ql, gx, gy, gl = carry
        u, qx, qy, ql, gx, gy, gl, _ = _vol_update(
            u, qx, qy, ql, gx, gy, gl, dt0, dt1, tau, sig_p, sig_t,
            radius, ops, dataterm)
        return u, qx, qy, ql, gx, gy, gl

    u, qx, qy, ql, gxp, gyp, glp = lax.fori_loop(
        0, count - 1, body,
        (u0, qx0, qy0, ql0, _dx(u0), _dy(u0), _dl(u0)))

    u2, qx2, qy2, ql2, gx2, gy2, gl2, ktyp = _vol_update(
        u, qx, qy, ql, gxp, gyp, glp, dt0, dt1, tau, sig_p, sig_t,
        radius, ops, dataterm)
    kty2 = ops[3](qx2) + ops[4](qy2) + ops[5](ql2)

    inv_s = 1.0 / (sigma_raw * _SQRT_S)
    zh_x = (qx - qx2) * inv_s + _SQRT_S * ((1.0 + theta) * gx2 - theta * gxp)
    zh_y = (qy - qy2) * inv_s + _SQRT_S * ((1.0 + theta) * gy2 - theta * gyp)
    zh_l = (ql - ql2) * inv_s + _SQRT_S * ((1.0 + theta) * gl2 - theta * glp)
    pd_x = zh_x - _SQRT_S * gx2
    pd_y = zh_y - _SQRT_S * gy2
    pd_l = zh_l - _SQRT_S * gl2
    wh = (u - u2) * (1.0 / (tau_raw * _SQRT_T)) - _SQRT_T * ktyp
    dd = wh + _SQRT_T * kty2

    norms = (
        nsum(pd_x * pd_x) + nsum(pd_y * pd_y) + nsum(pd_l * pd_l),
        nsum(zh_x * zh_x) + nsum(zh_y * zh_y) + nsum(zh_l * zh_l),
        nsum(dd * dd),
        nsum(wh * wh),
    )
    return (u2, jnp.stack([qx2, qy2, ql2]),
            u, jnp.stack([qx, qy, ql]), norms)


def _vol_chunk_kernel(scal_ref, u_ref, q_ref, f_ref, w_ref,
                      uo_ref, qo_ref, upo_ref, qpo_ref, norms_ref, *,
                      count: int, dataterm: str, halo: bool = False,
                      nx_global: int = 0):
    """Whole-block chunk kernel; with ``halo`` the refs are one shard's
    halo-EXTENDED volume block, scal_ref carries three extra entries
    [row_offset, own_lo, own_hi] (per-shard integers as floats), and the
    SMEM norms cover only the owned rows (cf. fused_rof's halo kernel)."""
    halo_ctx = None
    if halo:
        halo_ctx = (scal_ref[5].astype(jnp.int32), nx_global,
                    scal_ref[6].astype(jnp.int32),
                    scal_ref[7].astype(jnp.int32))
    q = q_ref[...]
    u2, q2, up, qp, norms = _vol_chunk_core(
        scal_ref[0], scal_ref[1], scal_ref[2], scal_ref[3], scal_ref[4],
        u_ref[...], q, f_ref[...], w_ref[...], count, dataterm,
        halo_ctx=halo_ctx)
    for i in range(4):
        norms_ref[i] = norms[i]
    uo_ref[...] = u2
    qo_ref[...] = q2
    upo_ref[...] = up
    qpo_ref[...] = qp


def vol_fused_chunk(u, q, f, w, tau, sigma, theta, lmb, radius, count,
                    dataterm: str = "square", interpret: bool = False):
    """``count`` fused iterations on a VMEM-resident (L, nx, ny) volume.
    q is (3, L, nx, ny).  Returns (u2, q2, u_prev, q_prev, norms2)."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    scal = jnp.stack([jnp.asarray(v, u.dtype)
                      for v in (tau, sigma, theta, lmb, radius)])
    plane = pl.BlockSpec(memory_space=pltpu.VMEM)
    smem = pl.BlockSpec(memory_space=pltpu.SMEM)
    out_shape = [
        jax.ShapeDtypeStruct(u.shape, u.dtype),
        jax.ShapeDtypeStruct(q.shape, q.dtype),
        jax.ShapeDtypeStruct(u.shape, u.dtype),
        jax.ShapeDtypeStruct(q.shape, q.dtype),
        jax.ShapeDtypeStruct((4,), u.dtype),
    ]
    return pl.pallas_call(
        partial(_vol_chunk_kernel, count=int(count), dataterm=dataterm),
        out_shape=out_shape,
        in_specs=[smem] + [plane] * 4,
        out_specs=[plane] * 4 + [smem],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=_VMEM_LIMIT),
        interpret=interpret,
    )(scal, u, q, f, w)


def vol_fused_chunk_halo(u, q, f, w, scal8, count, nx_global,
                         dataterm: str = "square",
                         interpret: bool = False):
    """``count`` fused iterations on one halo-extended shard block of a
    row-partitioned volume.  u/f/w are (L, nxb, ny), q (3, L, nxb, ny);
    scal8 = [tau, sigma, theta, lmb, radius, row_offset, own_lo, own_hi].
    Returns (u2, q2, u_prev, q_prev, norms2) with norms2 covering owned
    rows only."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    plane = pl.BlockSpec(memory_space=pltpu.VMEM)
    smem = pl.BlockSpec(memory_space=pltpu.SMEM)
    out_shape = [
        jax.ShapeDtypeStruct(u.shape, u.dtype),
        jax.ShapeDtypeStruct(q.shape, q.dtype),
        jax.ShapeDtypeStruct(u.shape, u.dtype),
        jax.ShapeDtypeStruct(q.shape, q.dtype),
        jax.ShapeDtypeStruct((4,), u.dtype),
    ]
    return pl.pallas_call(
        partial(_vol_chunk_kernel, count=int(count), dataterm=dataterm,
                halo=True, nx_global=int(nx_global)),
        out_shape=out_shape,
        in_specs=[smem] + [plane] * 4,
        out_specs=[plane] * 4 + [smem],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=_VMEM_LIMIT),
        interpret=interpret,
    )(scal8, u, q, f, w)


def _vol_chunk_kernel_batched(scal_ref, u_ref, q_ref, f_ref, w_ref,
                              uo_ref, qo_ref, upo_ref, qpo_ref,
                              norms_ref, *, count: int, dataterm: str):
    """Gridded batch variant (cf. fused_multilabel
    ._ml_chunk_kernel_batched): grid = (B,), one instance per grid step.
    Volume refs carry a leading length-1 instance axis; scal_ref /
    norms_ref are the WHOLE (5, B) / (4, B) SMEM arrays indexed by
    program_id (instances-minor layout)."""
    from jax.experimental import pallas as pl

    b = pl.program_id(0)
    u2, q2, up, qp, norms = _vol_chunk_core(
        scal_ref[0, b], scal_ref[1, b], scal_ref[2, b], scal_ref[3, b],
        scal_ref[4, b], u_ref[0], q_ref[0], f_ref[0], w_ref[0], count,
        dataterm)
    for i in range(4):
        norms_ref[i, b] = norms[i]
    uo_ref[0] = u2
    qo_ref[0] = q2
    upo_ref[0] = up
    qpo_ref[0] = qp


def vol_fused_chunk_batched(u, q, f, w, scal, count,
                            dataterm: str = "square",
                            interpret: bool = False):
    """Batched volumetric-TV chunk: grid over the instance axis, one
    chunk per instance per kernel call (the batched analog of
    ``vol_fused_chunk`` — B volumes advance one residual chunk in ONE
    launch).  u/f/w are (B, L, nx, ny), q is (B, 3, L, nx, ny); scal is
    (5, B) instances-minor rows of [tau, sigma, theta, lmb, radius].
    Returns (u2, q2, u_prev, q_prev, norms2) with a leading batch axis
    and norms2 (4, B)."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    B, L, nx, ny = u.shape
    smem = pl.BlockSpec(memory_space=pltpu.SMEM)
    uspec = pl.BlockSpec((1, L, nx, ny), lambda b: (b, 0, 0, 0),
                         memory_space=pltpu.VMEM)
    qspec = pl.BlockSpec((1, 3, L, nx, ny), lambda b: (b, 0, 0, 0, 0),
                         memory_space=pltpu.VMEM)
    out_shape = [
        jax.ShapeDtypeStruct(u.shape, u.dtype),
        jax.ShapeDtypeStruct(q.shape, q.dtype),
        jax.ShapeDtypeStruct(u.shape, u.dtype),
        jax.ShapeDtypeStruct(q.shape, q.dtype),
        jax.ShapeDtypeStruct((4, B), u.dtype),
    ]
    return pl.pallas_call(
        partial(_vol_chunk_kernel_batched, count=int(count),
                dataterm=dataterm),
        grid=(B,),
        out_shape=out_shape,
        in_specs=[smem, uspec, qspec, uspec, uspec],
        out_specs=[uspec, qspec, uspec, qspec, smem],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=_VMEM_LIMIT),
        interpret=interpret,
    )(scal, u, q, f, w)


def _vol_multichunk_kernel(scal_ref, u_ref, q_ref, f_ref, w_ref,
                           uo_ref, qo_ref, upo_ref, qpo_ref,
                           norms_ref, sout_ref, *,
                           count: int, k_chunks: int, dataterm: str,
                           stepsize: str, consts):
    """``k_chunks`` residual_iter-sized volumetric chunks in ONE kernel
    with IN-KERNEL boyd/goldstein adaptation and convergence test — the
    vol analog of fused_rof._rof_multichunk_kernel.  Same scal/sout
    layout as the ROF kernel ([lmb, radius] slots)."""
    from .fused_rof import adapt_scalars

    theta = scal_ref[2]
    lmb = scal_ref[3]
    radius = scal_ref[4]
    it0 = scal_ref[8]
    tols4 = (scal_ref[9], scal_ref[10], scal_ref[11], scal_ref[12])
    u0 = u_ref[...]
    q0 = q_ref[...]
    f = f_ref[...]
    w = w_ref[...]
    zero = jnp.zeros((), u0.dtype)

    def chunk(c, carry):
        planes, scal, _ = carry
        conv = scal[5]

        def run(t):
            planes_t, scal_t, _ = t
            u, q, _, _ = planes_t
            tau_t, sigma_t, aa_t, al_t, au_t, _, done_t = scal_t
            u2, q2, up, qp, nrm = _vol_chunk_core(
                tau_t, sigma_t, theta, lmb, radius, u, q, f, w,
                count, dataterm)
            pr = jnp.sqrt(nrm[0])
            pn_ = jnp.sqrt(nrm[1])
            dr = jnp.sqrt(nrm[2])
            dn_ = jnp.sqrt(nrm[3])
            it = it0 + ((c + 1) * count - 1).astype(u0.dtype)
            tau2, sigma2, aa2, al2, au2, cv = adapt_scalars(
                stepsize, consts, tols4, it, tau_t, sigma_t, aa_t,
                al_t, au_t, pr, pn_, dr, dn_)
            return ((u2, q2, up, qp),
                    (tau2, sigma2, aa2, al2, au2, cv, done_t + 1.0),
                    (pr, pn_, dr, dn_))

        return lax.cond(conv, lambda t: t, run, carry)

    init = (
        (u0, q0, u0, q0),
        (scal_ref[0], scal_ref[1], scal_ref[5], scal_ref[6], scal_ref[7],
         jnp.asarray(False), zero),
        (zero, zero, zero, zero),
    )
    planes, scal, norms = lax.fori_loop(0, k_chunks, chunk, init)
    u2, q2, up, qp = planes
    tau, sigma, arg_alpha, arb_l, arb_u, conv, done = scal
    for i in range(4):
        norms_ref[i] = norms[i]
    for i, v in enumerate((tau, sigma, arg_alpha, arb_l, arb_u,
                           conv.astype(u0.dtype), done)):
        sout_ref[i] = v
    uo_ref[...] = u2
    qo_ref[...] = q2
    upo_ref[...] = up
    qpo_ref[...] = qp


def vol_fused_multichunk(u, q, f, w, scal13, count, k_chunks,
                         dataterm: str, stepsize: str, consts,
                         interpret: bool = False):
    """Up to ``k_chunks * count`` fused volumetric iterations in ONE
    kernel with in-kernel adaptation/convergence.  Returns
    (u2, q2, u_prev, q_prev, norms, sout)."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    plane = pl.BlockSpec(memory_space=pltpu.VMEM)
    smem = pl.BlockSpec(memory_space=pltpu.SMEM)
    out_shape = [
        jax.ShapeDtypeStruct(u.shape, u.dtype),
        jax.ShapeDtypeStruct(q.shape, q.dtype),
        jax.ShapeDtypeStruct(u.shape, u.dtype),
        jax.ShapeDtypeStruct(q.shape, q.dtype),
        jax.ShapeDtypeStruct((4,), u.dtype),
        jax.ShapeDtypeStruct((7,), u.dtype),
    ]
    return pl.pallas_call(
        partial(_vol_multichunk_kernel, count=int(count),
                k_chunks=int(k_chunks), dataterm=dataterm,
                stepsize=stepsize, consts=consts),
        out_shape=out_shape,
        in_specs=[smem] + [plane] * 4,
        out_specs=[plane] * 4 + [smem, smem],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=_VMEM_LIMIT),
        interpret=interpret,
    )(scal13, u, q, f, w)


def _vol_banded_kernel(scal_ref, off_ref, u_hbm, q_hbm, f_hbm, w_hbm,
                       uo, qo, upo, qpo, norms_ref,
                       us, qs, fs, ws, qps, sem, *,
                       count: int, nx: int, rows: int, halo: int,
                       dataterm: str, own_lo0: int):
    """Grid-banded volumetric chunk: bands over the nx axis (dim 1 of the
    (L, nx, ny) volume), clamped halo-extended window DMAs, owned rows out
    at global offsets — same discipline as fused_rof._rof_banded_kernel
    (memory_space=ANY in AND out; 8*(...)-constructed offsets; hardware
    verification mandatory after changes, tools/tpu_verify.py).
    ``off_ref`` (SMEM int32) holds the GLOBAL row of input row 0 and
    static ``own_lo0`` the owned region's offset inside the input block —
    both zero for plain banding, nonzero when banding WITHIN a
    halo-extended shard block (cf. fused_rof._rof_banded_kernel)."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    i = pl.program_id(0)
    ext = us.shape[1]
    nin = u_hbm.shape[-2]  # input block height (== nx unless sharded)
    r8, h8, e8, n8 = rows // 8, halo // 8, ext // 8, nin // 8
    o8 = own_lo0 // 8
    start8 = jnp.clip(o8 + i * r8 - h8, 0, n8 - e8)
    start = 8 * start8
    own_lo = 8 * (o8 + i * r8 - start8)

    def copies(pairs):
        cs = [pltpu.make_async_copy(src, dst, sem) for src, dst in pairs]
        for c in cs:
            c.start()
        for c in cs:
            c.wait()

    fetches = [
        (u_hbm.at[:, pl.ds(start, ext)], us),
        (q_hbm.at[:, :, pl.ds(start, ext)], qs),
        (f_hbm.at[:, pl.ds(start, ext)], fs),
    ]
    if dataterm == "wsquare":
        fetches.append((w_hbm.at[:, pl.ds(start, ext)], ws))
    copies(fetches)

    halo_ctx = (off_ref[0] + start, nx, own_lo, own_lo + rows)
    u2, q2, up, qp, norms = _vol_chunk_core(
        scal_ref[0], scal_ref[1], scal_ref[2], scal_ref[3], scal_ref[4],
        us[...], qs[...], fs[...], ws[...], count, dataterm,
        halo_ctx=halo_ctx)
    for j in range(4):
        norms_ref[j, i] = norms[j]

    us[...] = u2
    qs[...] = q2
    ws[...] = up
    qps[...] = qp
    lo = 8 * (i * r8)
    copies([
        (us.at[:, pl.ds(own_lo, rows)], uo.at[:, pl.ds(lo, rows)]),
        (qs.at[:, :, pl.ds(own_lo, rows)], qo.at[:, :, pl.ds(lo, rows)]),
        (ws.at[:, pl.ds(own_lo, rows)], upo.at[:, pl.ds(lo, rows)]),
        (qps.at[:, :, pl.ds(own_lo, rows)],
         qpo.at[:, :, pl.ds(lo, rows)]),
    ])


def _vol_banded_mc_kernel(scal_ref, u2_hbm, q2_hbm, f_hbm, w_hbm,
                          uo2, qo2, upo, qpo, norms_ref, sout_ref,
                          us2, qs2, fs2, ws2, qps2, sstate, nacc,
                          in_sem, out_sem, *,
                          count: int, k_chunks: int, nx: int, ny: int,
                          rows: int, halo: int, n_bands: int,
                          dataterm: str, stepsize: str, consts):
    """MULTI-CHUNK banded volumetric kernel — the vol analog of
    `fused_rof._rof_banded_mc_kernel`: grid = (k_chunks, n_bands) over
    in-place ping-pong state slots, in-kernel adaptation on persistent
    SMEM scratch, DMA pipeline draining at chunk boundaries.  Reads go
    through the ALIASED output refs."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    from .fused_rof import adapt_scalars

    c = pl.program_id(0)
    i = pl.program_id(1)
    step = c * n_bands + i
    ext = us2.shape[2]
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
        slot = lax.rem(cc, 2)
        start, _ = geom(j)
        sem = in_sem.at[buf]
        cs = [
            pltpu.make_async_copy(
                uo2.at[slot, :, pl.ds(start, ext)], us2.at[buf], sem),
            pltpu.make_async_copy(
                qo2.at[slot, :, :, pl.ds(start, ext)], qs2.at[buf], sem),
            pltpu.make_async_copy(
                f_hbm.at[:, pl.ds(start, ext)], fs2.at[buf], sem),
        ]
        if dataterm == "wsquare":
            cs.append(pltpu.make_async_copy(
                w_hbm.at[:, pl.ds(start, ext)], ws2.at[buf], sem))
        return cs

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
                qs2.at[buf, :, :, pl.ds(own_w, rows)],
                qo2.at[slot, :, :, pl.ds(lo, rows)], sem),
            pltpu.make_async_copy(
                ws2.at[buf, :, pl.ds(own_w, rows)],
                upo.at[:, pl.ds(lo, rows)], sem),
            pltpu.make_async_copy(
                qps2.at[buf, :, :, pl.ds(own_w, rows)],
                qpo.at[:, :, pl.ds(lo, rows)], sem),
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
        u2, q2, up, qp, norms = _vol_chunk_core(
            sstate[0], sstate[1], theta, lmb, radius,
            us2[p], qs2[p], fs2[p], ws2[p], count, dataterm,
            halo_ctx=halo_ctx)
        for j in range(4):
            nacc[j, i] = norms[j]

        us2[p] = u2
        qs2[p] = q2
        ws2[p] = up
        qps2[p] = qp
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


def vol_fused_multichunk_banded(u, q, f, w, scal13, count, k_chunks,
                                n_bands: int, dataterm: str,
                                stepsize: str, consts,
                                interpret: bool = False):
    """Up to ``k_chunks * count`` banded fused volumetric iterations in
    ONE kernel with in-kernel adaptation/convergence.  Returns
    (u2, q2, u_prev, q_prev, norms, sout)."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    L, nx, ny = u.shape
    halo = -(-(2 * int(count) + 2) // 8) * 8
    rows = nx // n_bands
    assert rows * n_bands == nx and rows % 8 == 0, (nx, n_bands)
    ext = min(rows + 2 * halo, nx)

    def dbl(a):
        return jnp.zeros((2,) + a.shape, a.dtype).at[0].set(a)

    u2_in, q2_in = dbl(u), dbl(q)
    smem = pl.BlockSpec(memory_space=pltpu.SMEM)
    hbm = pl.BlockSpec(memory_space=pl.ANY)
    out_shape = [
        jax.ShapeDtypeStruct(u2_in.shape, u.dtype),
        jax.ShapeDtypeStruct(q2_in.shape, q.dtype),
        jax.ShapeDtypeStruct(u.shape, u.dtype),
        jax.ShapeDtypeStruct(q.shape, q.dtype),
        jax.ShapeDtypeStruct((4,), u.dtype),
        jax.ShapeDtypeStruct((8,), u.dtype),
    ]
    dt = u.dtype
    vm = pltpu.VMEM
    scratch = [
        vm((2, L, ext, ny), dt), vm((2, 3, L, ext, ny), dt),
        vm((2, L, ext, ny), dt), vm((2, L, ext, ny), dt),
        vm((2, 3, L, ext, ny), dt),
        pltpu.SMEM((7,), dt), pltpu.SMEM((4, n_bands), dt),
        pltpu.SemaphoreType.DMA((2,)), pltpu.SemaphoreType.DMA((2,)),
    ]
    outs = pl.pallas_call(
        partial(_vol_banded_mc_kernel, count=int(count),
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
    )(scal13, u2_in, q2_in, f, w)
    u2_2, q2_2, up, qp, norms, sout = outs
    slot = sout[7].astype(jnp.int32)
    u2 = lax.dynamic_index_in_dim(u2_2, slot, 0, keepdims=False)
    q2 = lax.dynamic_index_in_dim(q2_2, slot, 0, keepdims=False)
    return u2, q2, up, qp, norms, sout


def _vol_banded_db_kernel(scal_ref, off_ref, u_hbm, q_hbm, f_hbm, w_hbm,
                          uo, qo, upo, qpo, norms_ref,
                          us2, qs2, fs2, ws2, qps2, in_sem, out_sem, *,
                          count: int, nx: int, rows: int, halo: int,
                          dataterm: str, own_lo0: int, n_bands: int):
    """DOUBLE-BUFFERED grid-banded volumetric chunk: the shared
    `fused_rof.run_banded_db` pipeline around `_vol_chunk_core`."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    from .fused_rof import run_banded_db

    i = pl.program_id(0)
    ext = us2.shape[2]
    nin = u_hbm.shape[-2]
    r8, h8, e8, n8 = rows // 8, halo // 8, ext // 8, nin // 8
    o8 = own_lo0 // 8

    def geom(j):
        start8 = jnp.clip(o8 + j * r8 - h8, 0, n8 - e8)
        return 8 * start8, 8 * (o8 + j * r8 - start8)

    def in_copies(j, buf):
        start, _ = geom(j)
        sem = in_sem.at[buf]
        cs = [
            pltpu.make_async_copy(
                u_hbm.at[:, pl.ds(start, ext)], us2.at[buf], sem),
            pltpu.make_async_copy(
                q_hbm.at[:, :, pl.ds(start, ext)], qs2.at[buf], sem),
            pltpu.make_async_copy(
                f_hbm.at[:, pl.ds(start, ext)], fs2.at[buf], sem),
        ]
        if dataterm == "wsquare":
            cs.append(pltpu.make_async_copy(
                w_hbm.at[:, pl.ds(start, ext)], ws2.at[buf], sem))
        return cs

    def out_copies(j, buf):
        _, own_w = geom(j)
        lo = 8 * (j * r8)
        sem = out_sem.at[buf]
        return [
            pltpu.make_async_copy(
                us2.at[buf, :, pl.ds(own_w, rows)],
                uo.at[:, pl.ds(lo, rows)], sem),
            pltpu.make_async_copy(
                qs2.at[buf, :, :, pl.ds(own_w, rows)],
                qo.at[:, :, pl.ds(lo, rows)], sem),
            pltpu.make_async_copy(
                ws2.at[buf, :, pl.ds(own_w, rows)],
                upo.at[:, pl.ds(lo, rows)], sem),
            pltpu.make_async_copy(
                qps2.at[buf, :, :, pl.ds(own_w, rows)],
                qpo.at[:, :, pl.ds(lo, rows)], sem),
        ]

    def compute(p):
        start, own_w = geom(i)
        halo_ctx = (off_ref[0] + start, nx, own_w, own_w + rows)
        u2, q2, up, qp, norms = _vol_chunk_core(
            scal_ref[0], scal_ref[1], scal_ref[2], scal_ref[3],
            scal_ref[4], us2[p], qs2[p], fs2[p], ws2[p], count, dataterm,
            halo_ctx=halo_ctx)
        for j in range(4):
            norms_ref[j, i] = norms[j]
        us2[p] = u2
        qs2[p] = q2
        ws2[p] = up
        qps2[p] = qp

    run_banded_db(i, n_bands, in_copies, out_copies, compute)


def vol_fused_chunk_banded(u, q, f, w, tau, sigma, theta, lmb, radius,
                           count, n_bands: int, dataterm: str = "square",
                           interpret: bool = False, own_lo: int = 0,
                           out_rows: int | None = None, nx_global=None,
                           row_offset0=None, double_buffer: bool = False):
    """``count`` fused iterations with the volume split into ``n_bands``
    nx-row bands inside ONE kernel.  Same returns as ``vol_fused_chunk``.
    (own_lo, out_rows, nx_global, row_offset0) band a halo-extended shard
    block instead (cf. fused_rof.rof_fused_chunk_banded);
    ``double_buffer`` overlaps window DMA with compute at ~2x the window
    scratch."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    L, nin, ny = u.shape
    out_rows = nin if out_rows is None else out_rows
    nx_global = nin if nx_global is None else nx_global
    halo = -(-(2 * int(count) + 2) // 8) * 8
    rows = out_rows // n_bands
    assert rows * n_bands == out_rows and rows % 8 == 0, (out_rows, n_bands)
    assert own_lo % 8 == 0, own_lo
    ext = min(rows + 2 * halo, nin)

    scal = jnp.stack([jnp.asarray(v, u.dtype)
                      for v in (tau, sigma, theta, lmb, radius)])
    off = jnp.asarray(
        [0 if row_offset0 is None else row_offset0], jnp.int32)
    smem = pl.BlockSpec(memory_space=pltpu.SMEM)
    hbm = pl.BlockSpec(memory_space=pl.ANY)
    out_shape = [
        jax.ShapeDtypeStruct((L, out_rows, ny), u.dtype),
        jax.ShapeDtypeStruct((3, L, out_rows, ny), q.dtype),
        jax.ShapeDtypeStruct((L, out_rows, ny), u.dtype),
        jax.ShapeDtypeStruct((3, L, out_rows, ny), q.dtype),
        jax.ShapeDtypeStruct((4, n_bands), u.dtype),
    ]
    dt = u.dtype
    vm = pltpu.VMEM
    if double_buffer:
        kern = partial(_vol_banded_db_kernel, count=int(count),
                       nx=int(nx_global), rows=rows, halo=halo,
                       dataterm=dataterm, own_lo0=int(own_lo),
                       n_bands=n_bands)
        scratch = [
            vm((2, L, ext, ny), dt), vm((2, 3, L, ext, ny), dt),
            vm((2, L, ext, ny), dt), vm((2, L, ext, ny), dt),
            vm((2, 3, L, ext, ny), dt),
            pltpu.SemaphoreType.DMA((2,)), pltpu.SemaphoreType.DMA((2,)),
        ]
    else:
        kern = partial(_vol_banded_kernel, count=int(count),
                       nx=int(nx_global), rows=rows, halo=halo,
                       dataterm=dataterm, own_lo0=int(own_lo))
        scratch = [
            vm((L, ext, ny), dt), vm((3, L, ext, ny), dt),
            vm((L, ext, ny), dt), vm((L, ext, ny), dt),
            vm((3, L, ext, ny), dt),
            pltpu.SemaphoreType.DMA,
        ]
    outs = pl.pallas_call(
        kern,
        grid=(n_bands,),
        out_shape=out_shape,
        in_specs=[smem, smem, hbm, hbm, hbm, hbm],
        out_specs=[hbm] * 4 + [smem],
        scratch_shapes=scratch,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=_VMEM_LIMIT),
        interpret=interpret,
    )(scal, off, u, q, f, w)
    return outs[0], outs[1], outs[2], outs[3], jnp.sum(outs[4], axis=1)


def vol_fits_vmem(L: int, nx: int, ny: int, itemsize: int = 4) -> bool:
    """~(13 volumes + 8 q-triples)-ish of live state: use 22 L-volumes."""
    return 22 * L * nx * ny * itemsize <= _VMEM_LIMIT


def vol_band_count(L: int, nx: int, ny: int, residual_iter: int,
                   itemsize: int = 4,
                   double_buffer: bool = False) -> int | None:
    """nx-band tiling factor (cf. fused_rof.band_count); 1 = whole
    volume, None = no efficient tiling.  ``double_buffer`` sizes for the
    DB kernel's doubled window scratch (+9L window planes)."""
    from .fused_rof import band_count

    n_planes = 31 * L if double_buffer else 22 * L
    return band_count(nx, ny, residual_iter, n_planes=n_planes,
                      itemsize=itemsize)


def match_vol_structure(problem):
    """Detect the fusable volumetric-TV structure: lone BlockGradient3D
    (label_first=False), 1D square/abs data term, Moreau(norm2 abs dim=3
    planar) or norm2 ind_leq0 dual, alpha preconditioner constants
    (Sigma = 1/2, Tau = 1/6)."""
    import numpy as np

    from ..config import dtype

    if dtype() != jnp.float32:
        return None
    linop = problem.linop
    if not isinstance(linop, LinearOperator) or len(linop.blocks) != 1:
        return None
    blk = linop.blocks[0]
    if not isinstance(blk, BlockGradient3D) or blk.label_first:
        return None
    if len(problem.prox_g) != 1 or len(problem.prox_fstar) != 1:
        return None
    pg = problem.prox_g[0]
    if not isinstance(pg, ProxElem1D) or pg.fun not in ("square", "abs"):
        return None
    a, b, c, d, e, _, _ = pg.coeffs
    if not (np.isscalar(c) and np.isscalar(d) and d == 0.0
            and np.isscalar(e) and e == 0.0):
        return None
    nvox = blk.nx * blk.ny * blk.L
    if np.isscalar(a) and a == 1.0:
        dataterm = "square" if pg.fun == "square" else "abs"
        f = jnp.asarray(b, jnp.float32).reshape(blk.L, blk.nx, blk.ny)
        w = f
    elif pg.fun == "square" and np.asarray(a).size == nvox:
        dataterm = "wsquare"
        a_arr = np.asarray(a, np.float64)
        b_arr = np.broadcast_to(np.asarray(b, np.float64), a_arr.shape)
        safe = np.where(a_arr != 0, a_arr, 1.0)
        f = jnp.asarray(np.where(a_arr != 0, b_arr / safe, 0.0),
                        jnp.float32).reshape(blk.L, blk.nx, blk.ny)
        w = jnp.asarray(a_arr**2, jnp.float32).reshape(
            blk.L, blk.nx, blk.ny)
    else:
        return None

    pf = problem.prox_fstar[0]
    if isinstance(pf, ProxMoreau):
        inner = pf.child
        if not isinstance(inner, ProxElemNorm2) or inner.fun != "abs":
            return None
        if inner.dim != 3 or inner.interleaved:
            return None
        ia, ib, ic, idd, ie, _, _ = inner.coeffs
        for v, want in ((ia, 1.0), (ib, 0.0), (idd, 0.0), (ie, 0.0)):
            if not (np.isscalar(v) and v == want):
                return None
        if not np.isscalar(ic):
            return None
        radius = float(ic)
    elif isinstance(pf, ProxElemNorm2) and pf.fun == "ind_leq0":
        if pf.dim != 3 or pf.interleaved:
            return None
        ia, ib, ic, idd, ie, _, _ = pf.coeffs
        for v in (ia, ib, ic):
            if not np.isscalar(v):
                return None
        if idd != 0.0 or ie != 0.0 or ia <= 0:
            return None
        radius = float(ib) / float(ia)
    else:
        return None

    sl = np.asarray(problem.scaling_left)
    sr = np.asarray(problem.scaling_right)
    if not (np.allclose(sl, 0.5) and np.allclose(sr, 1.0 / 6.0)):
        return None
    return {
        "L": blk.L, "nx": blk.nx, "ny": blk.ny, "f": f, "w": w,
        "lmb": float(c), "radius": radius, "dataterm": dataterm,
    }


@partial(jax.jit, static_argnums=(3, 4, 5, 6, 7, 8, 9, 10, 11, 12),
         donate_argnums=(17,))
def _fused_vol_run(problem, prox_g, prox_fstar, opts, L, nx, ny, lmb,
                   dataterm, n_bands, double_buffer, k_chunks, interpret,
                   tols, f_vol, w_vol, radius, state, until):
    """Three-phase chunked run, identical structure to
    fused_rof._fused_rof_run."""
    ri = max(int(opts.residual_iter), 1)

    def generic(s: PDHGState) -> PDHGState:
        return pdhg_step(problem, prox_g, prox_fstar, opts, tols, s)

    def fused_chunk(s: PDHGState) -> PDHGState:
        u = s.x.reshape(L, nx, ny)
        q = s.y.reshape(3, L, nx, ny)
        if n_bands == 1:
            u2, q2, up, qp, norms2 = vol_fused_chunk(
                u, q, f_vol, w_vol, s.tau, s.sigma, s.theta, lmb,
                radius, ri, dataterm=dataterm, interpret=interpret)
        else:
            u2, q2, up, qp, norms2 = vol_fused_chunk_banded(
                u, q, f_vol, w_vol, s.tau, s.sigma, s.theta, lmb,
                radius, ri, n_bands, dataterm=dataterm,
                interpret=interpret, double_buffer=double_buffer)
        norms = jnp.sqrt(norms2)
        s = dataclasses.replace(
            s,
            x=u2.reshape(-1), y=q2.reshape(-1),
            x_prev=up.reshape(-1), y_prev=qp.reshape(-1),
        )
        s = residual_and_adapt(
            problem, opts, tols, s,
            norms[0], norms[1], norms[2], norms[3],
            s.iteration + ri - 1,
        )
        return dataclasses.replace(s, iteration=s.iteration + ri)

    def multi_chunk(s: PDHGState) -> PDHGState:
        from .fused_rof import pdhg_adapt_consts

        u = s.x.reshape(L, nx, ny)
        q = s.y.reshape(3, L, nx, ny)
        dt = u.dtype
        scal13 = jnp.stack([
            s.tau, s.sigma, s.theta,
            jnp.asarray(lmb, dt), radius.astype(dt),
            s.arg_alpha, s.arb_l, s.arb_u, s.iteration.astype(dt),
            jnp.asarray(tols[0], dt), jnp.asarray(tols[1], dt),
            jnp.asarray(tols[2], dt), jnp.asarray(tols[3], dt),
        ])
        u2, q2, up, qp, norms, sc = vol_fused_multichunk(
            u, q, f_vol, w_vol, scal13, ri, k_chunks, dataterm,
            opts.stepsize, pdhg_adapt_consts(problem, opts),
            interpret=interpret)
        done = sc[6].astype(jnp.int32)
        return dataclasses.replace(
            s,
            x=u2.reshape(-1), y=q2.reshape(-1),
            x_prev=up.reshape(-1), y_prev=qp.reshape(-1),
            tau=sc[0], sigma=sc[1], arg_alpha=sc[2],
            arb_l=sc[3], arb_u=sc[4], converged=sc[5] > 0.5,
            primal_residual=norms[0], primal_var_norm=norms[1],
            dual_residual=norms[2], dual_var_norm=norms[3],
            iteration=s.iteration + done * ri,
        )

    align = 1 % ri

    def cond_a(s):
        return (s.iteration % ri != align) & (s.iteration < until) & ~s.converged

    state = lax.while_loop(cond_a, generic, state)

    # canonicalize the dual warm start once per run (cf. fused_rof
    # _fused_rof_run): all fused routes then agree bit-exactly
    def proj_y(yf):
        q = yf.reshape(3, L, nx, ny)
        qx, qy = _project_dead_dual_vol(q[0], q[1])
        return jnp.stack([qx, qy, q[2]]).reshape(-1)

    state = dataclasses.replace(
        state, y=proj_y(state.y), y_prev=proj_y(state.y_prev))

    def multi_chunk_banded(s: PDHGState) -> PDHGState:
        from .fused_rof import pdhg_adapt_consts

        u = s.x.reshape(L, nx, ny)
        q = s.y.reshape(3, L, nx, ny)
        dt = u.dtype
        scal13 = jnp.stack([
            s.tau, s.sigma, s.theta,
            jnp.asarray(lmb, dt), radius.astype(dt),
            s.arg_alpha, s.arb_l, s.arb_u, s.iteration.astype(dt),
            jnp.asarray(tols[0], dt), jnp.asarray(tols[1], dt),
            jnp.asarray(tols[2], dt), jnp.asarray(tols[3], dt),
        ])
        u2, q2, up, qp, norms, sc = vol_fused_multichunk_banded(
            u, q, f_vol, w_vol, scal13, ri, k_chunks, n_bands, dataterm,
            opts.stepsize, pdhg_adapt_consts(problem, opts),
            interpret=interpret)
        done = sc[6].astype(jnp.int32)
        return dataclasses.replace(
            s,
            x=u2.reshape(-1), y=q2.reshape(-1),
            x_prev=up.reshape(-1), y_prev=qp.reshape(-1),
            tau=sc[0], sigma=sc[1], arg_alpha=sc[2],
            arb_l=sc[3], arb_u=sc[4], converged=sc[5] > 0.5,
            primal_residual=norms[0], primal_var_norm=norms[1],
            dual_residual=norms[2], dual_var_norm=norms[3],
            iteration=s.iteration + done * ri,
        )

    # phase B0: multi-chunk launches with in-kernel adaptation (cf.
    # fused_rof phase B0); k_chunks=0 disables; the banded variant is
    # gated on the double-buffer window footprint
    if n_bands == 1 and k_chunks > 0:
        def cond_b0(s):
            return (s.iteration + k_chunks * ri <= until) & ~s.converged

        state = lax.while_loop(cond_b0, multi_chunk, state)
    elif n_bands > 1 and k_chunks > 0 and double_buffer:
        def cond_b0(s):
            return (s.iteration + k_chunks * ri <= until) & ~s.converged

        state = lax.while_loop(cond_b0, multi_chunk_banded, state)

    def cond_b(s):
        return (s.iteration + ri <= until) & ~s.converged

    state = lax.while_loop(cond_b, fused_chunk, state)

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
