"""Fused Pallas PDHG iteration for the TIGHT multilabel TV relaxation.

Workload (example_multilabel_tight.m / examples/example_multilabel_tight.py):
on top of the fast relaxation, pairwise Lagrange multipliers v couple the
gradient dual q through per-pixel pairwise difference constraints:

    primal x = [u (L label planes) ; v (2k pairwise planes, k = L(L-1)/2)]
    dual   y = [q (2L gradient planes, FREE — no prox) ;
                p (2k planes, per-pixel dim-2 lmb-ball) ;
                s (sum-to-one multiplier plane)]

    K = [ grad2d (2nL x nL)        kron(P^T, I_n) (2nL x 2nk) ]
        [ 0                        I (2nk x 2nk)              ]
        [ kron(1_L^T, I_n) (n x nL)   0                       ]

P has +-1 entries (two per row), so kron(P^T, I_n) unrolls to signed
plane-adds over the label/pair axis — like the blur taps of
ops/fused_deblur.py, the coupling costs O(nnz(P)) VPU passes over
VMEM-resident planes and no matrix traffic.  All preconditioner segments
are constant (row sums: gradient 2 + pair-degree L-1; identity 1; label
sum L / col sums: 4+1 for u, 1+2 for v), read from the problem at match
time.  Everything else mirrors ops/fused_multilabel.py: ONE kernel per
residual_iter chunk, forward products (G u + Kp v, sum_l u) loop-carried,
residual norms reduced in-kernel, scalar adaptation via the generic
``residual_and_adapt``.

Layout contract: u (L, nx, ny); v and p (2k, nx, ny) with pair planes
[x-parts (k) ; y-parts (k)] (the dim-2 planar ball pairs plane m with
plane m+k); q (2L, nx, ny) = [gx; gy]; s (nx, ny).
"""

from __future__ import annotations

import dataclasses
from functools import partial

import jax
import jax.numpy as jnp
from jax import lax

from ..backend.pdhg import PDHGState, pdhg_step, residual_and_adapt
from ..linop.base import LinearOperator
from ..linop.blocks import BlockDiags, BlockKronId
from ..linop.gradient import BlockGradient2D
from ..prox.elemop import ProxElem1D, ProxElemNorm2
from ..prox.standalone import ProxZero
from .fused_multilabel import _shift_ops_3d

_VMEM_LIMIT = 96 * 1024 * 1024
_MAX_TAPS = 512  # statically unrolled +-1 adds per kron(P^T, I) apply


def _kron_ops(taps, nrows_out, ncols_out):
    """kron(P^T, I_n) as unrolled signed plane adds.  ``taps`` is the
    static tuple of (row, col, weight) nonzeros of the (2L, 2k) matrix
    P^T; fwd maps (2k, nx, ny) -> (2L, nx, ny), adj the reverse."""

    def fwd(v):
        acc = [None] * nrows_out
        for r, m, w in taps:
            term = w * v[m]
            acc[r] = term if acc[r] is None else acc[r] + term
        zero = jnp.zeros_like(v[0])
        return jnp.stack([a if a is not None else zero for a in acc])

    def adj(q):
        acc = [None] * ncols_out
        for r, m, w in taps:
            term = w * q[r]
            acc[m] = term if acc[m] is None else acc[m] + term
        zero = jnp.zeros_like(q[0])
        return jnp.stack([a if a is not None else zero for a in acc])

    return fwd, adj


def _chunk_core(tau_raw, sigma_raw, theta, radius, d_s, u0, v0, q0, p0, s0,
                f, count, L, k, taps, consts, roll, halo_ctx=None):
    """``count - 1`` plain iterations then the aligned iteration with its
    four preconditioned residual norms (squared).  ``consts`` =
    (sig_q, sig_p, sig_s, tau_u, tau_v) — the constant per-segment
    preconditioner diagonals.

    halo_ctx = (row_offset, nx_global, own_lo, own_hi): run on a
    halo-extended row band/shard — stencil masks use global rows, norms
    cover owned rows only (the kron taps and the per-pixel ball are
    pointwise, so like fused_multilabel the halo is 2*count + 2 rows)."""
    sig_q_c, sig_p_c, sig_s_c, tau_u_c, tau_v_c = consts
    if halo_ctx is not None:
        row_offset, nx_global, own_lo, own_hi = halo_ctx
        ops = _shift_ops_3d(f.shape, roll, row_offset, nx_global)
        lri = lax.broadcasted_iota(jnp.int32, f.shape[1:], 0)
        owned2 = (lri >= own_lo) & (lri < own_hi)

        def nsum(val):
            return jnp.sum(jnp.where(owned2, val, 0.0))
    else:
        ops = _shift_ops_3d(f.shape, roll)
        nsum = jnp.sum
    _dx, _dy, _dxt, _dyt = ops
    kp_fwd, kp_adj = _kron_ops(taps, 2 * L, 2 * k)

    tu = tau_raw * tau_u_c
    tv = tau_raw * tau_v_c
    sq = sigma_raw * sig_q_c
    sp = sigma_raw * sig_p_c
    ss = sigma_raw * sig_s_c
    tf = tu * f

    def update(u, v, q, p, s, kxq, su):
        """One iteration; (kxq, su) = (q-row, s-row) forward products of
        the current primal, carried between iterations."""
        ktyu = _dxt(q[:L]) + _dyt(q[L:]) + s[None]
        ktyv = kp_adj(q) + p
        u2 = jnp.maximum(u - tu * ktyu - tf, 0.0)
        v2 = v - tv * ktyv

        gu2 = jnp.concatenate([_dx(u2), _dy(u2)])
        su2 = jnp.sum(u2, axis=0)
        kxq2 = gu2 + kp_fwd(v2)

        q2 = q + sq * ((1.0 + theta) * kxq2 - theta * kxq)  # free dual
        ap = p + sp * ((1.0 + theta) * v2 - theta * v)
        nrm2 = ap[:k] ** 2 + ap[k:] ** 2
        scale = jnp.minimum(1.0, radius * lax.rsqrt(nrm2))
        p2 = jnp.concatenate([ap[:k] * scale, ap[k:] * scale])
        s2 = s + ss * ((1.0 + theta) * su2 - theta * su) - ss * d_s
        return u2, v2, q2, p2, s2, kxq2, su2, ktyu, ktyv

    def body(_, carry):
        u, v, q, p, s, kxq, su = carry
        u, v, q, p, s, kxq, su, _, _ = update(u, v, q, p, s, kxq, su)
        return u, v, q, p, s, kxq, su

    kxq0 = jnp.concatenate([_dx(u0), _dy(u0)]) + kp_fwd(v0)
    u, v, q, p, s, kxqp, sup = lax.fori_loop(
        0, count - 1, body,
        (u0, v0, q0, p0, s0, kxq0, jnp.sum(u0, axis=0)))

    # aligned iteration; (kxqp, sup) = K x_prev products carried for free
    u2, v2, q2, p2, s2, kxq2, su2, ktyu_p, ktyv_p = update(
        u, v, q, p, s, kxqp, sup)
    ktyu2 = _dxt(q2[:L]) + _dyt(q2[L:]) + s2[None]
    ktyv2 = kp_adj(q2) + p2

    # preconditioned residuals, segment-wise constants
    sqrt_sq, sqrt_sp, sqrt_ss = sig_q_c**0.5, sig_p_c**0.5, sig_s_c**0.5
    sqrt_tu, sqrt_tv = tau_u_c**0.5, tau_v_c**0.5
    zh_q = (q - q2) / (sigma_raw * sqrt_sq) + sqrt_sq * (
        (1.0 + theta) * kxq2 - theta * kxqp)
    zh_p = (p - p2) / (sigma_raw * sqrt_sp) + sqrt_sp * (
        (1.0 + theta) * v2 - theta * v)
    zh_s = (s - s2) / (sigma_raw * sqrt_ss) + sqrt_ss * (
        (1.0 + theta) * su2 - theta * sup)
    pd_q = zh_q - sqrt_sq * kxq2
    pd_p = zh_p - sqrt_sp * v2
    pd_s = zh_s - sqrt_ss * su2
    wh_u = (u - u2) / (tau_raw * sqrt_tu) - sqrt_tu * ktyu_p
    wh_v = (v - v2) / (tau_raw * sqrt_tv) - sqrt_tv * ktyv_p
    dd_u = wh_u + sqrt_tu * ktyu2
    dd_v = wh_v + sqrt_tv * ktyv2

    norms = (
        nsum(pd_q * pd_q) + nsum(pd_p * pd_p) + nsum(pd_s * pd_s),
        nsum(zh_q * zh_q) + nsum(zh_p * zh_p) + nsum(zh_s * zh_s),
        nsum(dd_u * dd_u) + nsum(dd_v * dd_v),
        nsum(wh_u * wh_u) + nsum(wh_v * wh_v),
    )
    return (u2, v2, q2, p2, s2), (u, v, q, p, s), norms


def _tight_chunk_kernel(scal_ref, u_ref, v_ref, q_ref, p_ref, s_ref, f_ref,
                        uo, vo, qo, po, so, upo, vpo, qpo, ppo, spo,
                        norms_ref, *, count, L, k, taps, consts,
                        halo: bool = False, nx_global: int = 0):
    """One residual_iter-sized chunk in ONE kernel, residual norms reduced
    to SMEM.  scal_ref (SMEM): [tau, sigma, theta, radius, d_s] — with
    ``halo``, three more entries [row_offset, own_lo, own_hi] and the refs
    are one band's halo-EXTENDED planes."""
    from jax.experimental.pallas import tpu as pltpu

    halo_ctx = None
    if halo:
        halo_ctx = (scal_ref[5].astype(jnp.int32), nx_global,
                    scal_ref[6].astype(jnp.int32),
                    scal_ref[7].astype(jnp.int32))
    new, prev, norms = _chunk_core(
        scal_ref[0], scal_ref[1], scal_ref[2], scal_ref[3], scal_ref[4],
        u_ref[...], v_ref[...], q_ref[...], p_ref[...], s_ref[...],
        f_ref[...], count, L, k, taps, consts, pltpu.roll,
        halo_ctx=halo_ctx)
    for i in range(4):
        norms_ref[i] = norms[i]
    for ref, val in zip((uo, vo, qo, po, so), new):
        ref[...] = val
    for ref, val in zip((upo, vpo, qpo, ppo, spo), prev):
        ref[...] = val


def _tight_scal(u, tau, sigma, theta, radius, d_s):
    return jnp.stack([
        jnp.asarray(tau, u.dtype), jnp.asarray(sigma, u.dtype),
        jnp.asarray(theta, u.dtype),
        jnp.asarray(radius, u.dtype), jnp.asarray(d_s, u.dtype),
    ])


def _tight_pallas_call(scal, state, f, count, L, k, taps, consts, halo,
                       nx_global, interpret):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    plane = pl.BlockSpec(memory_space=pltpu.VMEM)
    smem = pl.BlockSpec(memory_space=pltpu.SMEM)
    out_shape = [jax.ShapeDtypeStruct(a.shape, a.dtype)
                 for a in state + state]
    out_shape.append(jax.ShapeDtypeStruct((4,), state[0].dtype))
    outs = pl.pallas_call(
        partial(_tight_chunk_kernel, count=int(count), L=L, k=k,
                taps=taps, consts=consts, halo=halo,
                nx_global=int(nx_global)),
        out_shape=out_shape,
        in_specs=[smem] + [plane] * 6,
        out_specs=[plane] * 10 + [smem],
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=_VMEM_LIMIT),
        interpret=interpret,
    )(scal, *state, f)
    return outs[:5], outs[5:10], outs[10]


def tight_fused_chunk(u, v, q, p, s, f, tau, sigma, theta, radius, d_s,
                      count, taps, consts, interpret: bool = False):
    """``count`` fused iterations ending on a residual iteration.  Returns
    (new_state_tuple, prev_state_tuple, norms2)."""
    L = u.shape[0]
    k = v.shape[0] // 2
    scal = _tight_scal(u, tau, sigma, theta, radius, d_s)
    return _tight_pallas_call(scal, (u, v, q, p, s), f, count, L, k, taps,
                              consts, False, 0, interpret)


def tight_fused_chunk_halo(u, v, q, p, s, f, scal, count, nx_global, taps,
                           consts, interpret: bool = False):
    """``count`` fused iterations on one halo-extended band/shard; scal is
    the length-8 vector [tau, sigma, theta, radius, d_s, row_offset,
    own_lo, own_hi].  Norms cover owned rows only."""
    L = u.shape[0]
    k = v.shape[0] // 2
    return _tight_pallas_call(scal, (u, v, q, p, s), f, count, L, k, taps,
                              consts, True, nx_global, interpret)


def _tight_chunk_kernel_batched(scal_ref, u_ref, v_ref, q_ref, p_ref,
                                s_ref, f_ref, uo, vo, qo, po, so,
                                upo, vpo, qpo, ppo, spo, norms_ref, *,
                                count, L, k, taps, consts):
    """Gridded batch variant (cf. fused_multilabel
    ._ml_chunk_kernel_batched): grid = (B,), one instance per grid step.
    Plane refs carry a leading length-1 instance axis; scal_ref /
    norms_ref are the WHOLE (5, B) / (4, B) SMEM arrays indexed by
    program_id (instances-minor layout)."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    b = pl.program_id(0)
    new, prev, norms = _chunk_core(
        scal_ref[0, b], scal_ref[1, b], scal_ref[2, b], scal_ref[3, b],
        scal_ref[4, b], u_ref[0], v_ref[0], q_ref[0], p_ref[0], s_ref[0],
        f_ref[0], count, L, k, taps, consts, pltpu.roll)
    for i in range(4):
        norms_ref[i, b] = norms[i]
    for ref, val in zip((uo, vo, qo, po, so), new):
        ref[0] = val
    for ref, val in zip((upo, vpo, qpo, ppo, spo), prev):
        ref[0] = val


def tight_fused_chunk_batched(u, v, q, p, s, f, scal, count, taps, consts,
                              interpret: bool = False):
    """Batched tight-relaxation chunk: grid over the instance axis, one
    chunk per instance per kernel call (B tight-multilabel instances
    sharing (L, k, taps, consts) advance one residual chunk in ONE
    launch).  u/f are (B, L, nx, ny), v/p (B, 2k, nx, ny),
    q (B, 2L, nx, ny), s (B, nx, ny); scal is (5, B) instances-minor
    rows of [tau, sigma, theta, radius, d_s].  Returns
    (new_state_tuple, prev_state_tuple, norms2) with leading batch axes
    and norms2 (4, B)."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    B, L, nx, ny = u.shape
    k = v.shape[1] // 2
    smem = pl.BlockSpec(memory_space=pltpu.SMEM)

    def spec(a):
        shp = (1,) + a.shape[1:]
        nd = len(a.shape)
        return pl.BlockSpec(shp, lambda b, _n=nd: (b,) + (0,) * (_n - 1),
                            memory_space=pltpu.VMEM)

    state = (u, v, q, p, s)
    out_shape = [jax.ShapeDtypeStruct(a.shape, a.dtype)
                 for a in state + state]
    out_shape.append(jax.ShapeDtypeStruct((4, B), u.dtype))
    outs = pl.pallas_call(
        partial(_tight_chunk_kernel_batched, count=int(count), L=L, k=k,
                taps=taps, consts=consts),
        grid=(B,),
        out_shape=out_shape,
        in_specs=[smem] + [spec(a) for a in state] + [spec(f)],
        out_specs=[spec(a) for a in state + state] + [smem],
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=_VMEM_LIMIT),
        interpret=interpret,
    )(scal, *state, f)
    return outs[:5], outs[5:10], outs[10]


def _tight_banded_kernel(scal_ref, off_ref, u_hbm, v_hbm, q_hbm, p_hbm,
                         s_hbm, f_hbm,
                         uo, vo, qo, po, so, upo, vpo, qpo, ppo, spo,
                         norms_ref, us, vs, qs, ps, ss, fs,
                         vps, qps, pps, sps, sem, *,
                         count: int, L: int, k: int, taps, consts,
                         nx: int, rows: int, halo: int, own_lo: int):
    """Grid-banded tight chunk (cf. fused_rof._rof_banded_kernel): ONE
    launch per chunk, manual halo-window DMAs from HBM in, owned-row DMAs
    out at GLOBAL row offsets (inputs and outputs both memory_space=ANY;
    never mix per-band VMEM output blocks with global offsets — interpret
    mode clamps the bad starts, hardware does not).  Offsets are built as
    8*(...) so Mosaic can prove sublane-tile alignment.  norms_ref is the
    whole (4, n_bands) SMEM array, summed by the caller."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    i = pl.program_id(0)
    ext = us.shape[1]
    nin = u_hbm.shape[-2]  # input block height (== nx unless sharded)
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

    copies([
        (u_hbm.at[:, pl.ds(start, ext)], us),
        (v_hbm.at[:, pl.ds(start, ext)], vs),
        (q_hbm.at[:, pl.ds(start, ext)], qs),
        (p_hbm.at[:, pl.ds(start, ext)], ps),
        (s_hbm.at[pl.ds(start, ext)], ss),
        (f_hbm.at[:, pl.ds(start, ext)], fs),
    ])

    halo_ctx = (off_ref[0] + start, nx, own_w, own_w + rows)
    new, prev, norms = _chunk_core(
        scal_ref[0], scal_ref[1], scal_ref[2], scal_ref[3], scal_ref[4],
        us[...], vs[...], qs[...], ps[...], ss[...], fs[...],
        count, L, k, taps, consts, pltpu.roll, halo_ctx=halo_ctx)
    for j in range(4):
        norms_ref[j, i] = norms[j]

    # stage results in the freed input scratch (fs holds prev-u), DMA
    # owned rows out
    for ref, val in zip((us, vs, qs, ps, ss), new):
        ref[...] = val
    for ref, val in zip((fs, vps, qps, pps, sps), prev):
        ref[...] = val
    lo = 8 * (i * r8)
    copies([
        (us.at[:, pl.ds(own_w, rows)], uo.at[:, pl.ds(lo, rows)]),
        (vs.at[:, pl.ds(own_w, rows)], vo.at[:, pl.ds(lo, rows)]),
        (qs.at[:, pl.ds(own_w, rows)], qo.at[:, pl.ds(lo, rows)]),
        (ps.at[:, pl.ds(own_w, rows)], po.at[:, pl.ds(lo, rows)]),
        (ss.at[pl.ds(own_w, rows)], so.at[pl.ds(lo, rows)]),
        (fs.at[:, pl.ds(own_w, rows)], upo.at[:, pl.ds(lo, rows)]),
        (vps.at[:, pl.ds(own_w, rows)], vpo.at[:, pl.ds(lo, rows)]),
        (qps.at[:, pl.ds(own_w, rows)], qpo.at[:, pl.ds(lo, rows)]),
        (pps.at[:, pl.ds(own_w, rows)], ppo.at[:, pl.ds(lo, rows)]),
        (sps.at[pl.ds(own_w, rows)], spo.at[pl.ds(lo, rows)]),
    ])


def _tight_banded_db_kernel(scal_ref, off_ref, u_hbm, v_hbm, q_hbm, p_hbm,
                            s_hbm, f_hbm,
                            uo, vo, qo, po, so, upo, vpo, qpo, ppo, spo,
                            norms_ref, us2, vs2, qs2, ps2, ss2, fs2,
                            vps2, qps2, pps2, sps2, in_sem, out_sem, *,
                            count: int, L: int, k: int, taps, consts,
                            nx: int, rows: int, halo: int, own_lo: int,
                            n_bands: int):
    """DOUBLE-BUFFERED grid-banded tight chunk: the shared
    `fused_rof.run_banded_db` pipeline around `_chunk_core`."""
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

    in_pairs = ((u_hbm, us2), (v_hbm, vs2), (q_hbm, qs2), (p_hbm, ps2),
                (f_hbm, fs2))

    def in_copies(j, buf):
        start, _ = geom(j)
        sem = in_sem.at[buf]
        cs = [pltpu.make_async_copy(
            h.at[:, pl.ds(start, ext)], sc.at[buf], sem)
            for h, sc in in_pairs]
        cs.append(pltpu.make_async_copy(
            s_hbm.at[pl.ds(start, ext)], ss2.at[buf], sem))
        return cs

    def out_copies(j, buf):
        _, own_w = geom(j)
        lo = 8 * (j * r8)
        sem = out_sem.at[buf]
        pairs = ((us2, uo), (vs2, vo), (qs2, qo), (ps2, po),
                 (fs2, upo), (vps2, vpo), (qps2, qpo), (pps2, ppo))
        cs = [pltpu.make_async_copy(
            sc.at[buf, :, pl.ds(own_w, rows)],
            h.at[:, pl.ds(lo, rows)], sem) for sc, h in pairs]
        cs += [pltpu.make_async_copy(
            sc.at[buf, pl.ds(own_w, rows)],
            h.at[pl.ds(lo, rows)], sem)
            for sc, h in ((ss2, so), (sps2, spo))]
        return cs

    def compute(p_):
        start, own_w = geom(i)
        halo_ctx = (off_ref[0] + start, nx, own_w, own_w + rows)
        new, prev, norms = _chunk_core(
            scal_ref[0], scal_ref[1], scal_ref[2], scal_ref[3],
            scal_ref[4], us2[p_], vs2[p_], qs2[p_], ps2[p_], ss2[p_],
            fs2[p_], count, L, k, taps, consts, pltpu.roll,
            halo_ctx=halo_ctx)
        for j in range(4):
            norms_ref[j, i] = norms[j]
        for ref, val in zip((us2, vs2, qs2, ps2, ss2), new):
            ref[p_] = val
        for ref, val in zip((fs2, vps2, qps2, pps2, sps2), prev):
            ref[p_] = val

    run_banded_db(i, n_bands, in_copies, out_copies, compute)


def tight_fused_chunk_banded(u, v, q, p, s, f, tau, sigma, theta, radius,
                             d_s, count, taps, consts, n_bands: int,
                             interpret: bool = False, own_lo: int = 0,
                             out_rows: int | None = None, nx_global=None,
                             row_offset0=None, double_buffer: bool = False):
    """``count`` fused iterations with the planes split into ``n_bands``
    row bands inside ONE kernel.  Same returns as ``tight_fused_chunk``.
    (own_lo, out_rows, nx_global, row_offset0) band a halo-extended
    shard block instead (see fused_rof.rof_fused_chunk_banded);
    ``double_buffer`` overlaps window DMA with compute."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    L, nin, ny = u.shape
    k = v.shape[0] // 2
    out_rows = nin if out_rows is None else out_rows
    nx_global = nin if nx_global is None else nx_global
    # 8-aligned halo/rows: Mosaic DMA slice alignment (see fused_rof)
    halo = -(-(2 * int(count) + 2) // 8) * 8
    rows = out_rows // n_bands
    assert rows * n_bands == out_rows and rows % 8 == 0, (out_rows, n_bands)
    assert own_lo % 8 == 0, own_lo
    ext = min(rows + 2 * halo, nin)

    scal = _tight_scal(u, tau, sigma, theta, radius, d_s)
    off = jnp.asarray(
        [0 if row_offset0 is None else row_offset0], jnp.int32)
    smem = pl.BlockSpec(memory_space=pltpu.SMEM)
    hbm = pl.BlockSpec(memory_space=pl.ANY)

    def oshape(a):
        return jax.ShapeDtypeStruct(
            a.shape[:-2] + (out_rows, ny), a.dtype)

    state = (u, v, q, p, s)
    out_shape = [oshape(a) for a in state + state]
    out_shape.append(jax.ShapeDtypeStruct((4, n_bands), u.dtype))
    dt = u.dtype
    vm = pltpu.VMEM
    if double_buffer:
        kern = partial(_tight_banded_db_kernel, count=int(count), L=L,
                       k=k, taps=taps, consts=consts, nx=int(nx_global),
                       rows=rows, halo=halo, own_lo=int(own_lo),
                       n_bands=n_bands)
        scratch = [
            vm((2, L, ext, ny), dt), vm((2, 2 * k, ext, ny), dt),
            vm((2, 2 * L, ext, ny), dt), vm((2, 2 * k, ext, ny), dt),
            vm((2, ext, ny), dt), vm((2, L, ext, ny), dt),
            vm((2, 2 * k, ext, ny), dt), vm((2, 2 * L, ext, ny), dt),
            vm((2, 2 * k, ext, ny), dt), vm((2, ext, ny), dt),
            pltpu.SemaphoreType.DMA((2,)), pltpu.SemaphoreType.DMA((2,)),
        ]
    else:
        kern = partial(_tight_banded_kernel, count=int(count), L=L, k=k,
                       taps=taps, consts=consts, nx=int(nx_global),
                       rows=rows, halo=halo, own_lo=int(own_lo))
        scratch = [
            vm((L, ext, ny), dt), vm((2 * k, ext, ny), dt),
            vm((2 * L, ext, ny), dt), vm((2 * k, ext, ny), dt),
            vm((ext, ny), dt), vm((L, ext, ny), dt),
            vm((2 * k, ext, ny), dt), vm((2 * L, ext, ny), dt),
            vm((2 * k, ext, ny), dt), vm((ext, ny), dt),
            pltpu.SemaphoreType.DMA,
        ]
    outs = pl.pallas_call(
        kern,
        grid=(n_bands,),
        out_shape=out_shape,
        in_specs=[smem, smem] + [hbm] * 6,
        out_specs=[hbm] * 10 + [smem],
        scratch_shapes=scratch,
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=_VMEM_LIMIT),
        interpret=interpret,
    )(scal, off, u, v, q, p, s, f)
    return outs[:5], outs[5:10], jnp.sum(outs[10], axis=1)


def tight_fused_chunk_tiled(u, v, q, p, s, f, tau, sigma, theta, radius,
                            d_s, count, taps, consts, n_bands: int,
                            interpret: bool = False):
    """Row-band tiled chunk for planes too large for VMEM (cf.
    fused_rof.rof_fused_chunk_tiled): each band runs the halo kernel with
    a (2*count + 2)-row halo; owned rows are bit-identical to the
    whole-plane kernel and the owned-row norms sum to the global norms."""
    L, nx, ny = u.shape
    halo = 2 * int(count) + 2
    rows = nx // n_bands
    assert rows * n_bands == nx
    ext = min(rows + 2 * halo, nx)
    planes = (u, v, q, p, s, f)
    base = _tight_scal(u, tau, sigma, theta, radius, d_s)

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
        b = tuple(sl(a) for a in planes)
        new_, prev_, n2 = tight_fused_chunk_halo(
            *b[:5], b[5], scal, count, nx, taps, consts,
            interpret=interpret)

        def upd(acc, val):
            ax = acc.ndim - 2
            crop = lax.dynamic_slice_in_dim(val, own_lo, rows, axis=ax)
            return lax.dynamic_update_slice_in_dim(acc, crop, lo, axis=ax)

        cn, cp, an2 = carry
        return (tuple(upd(a, o) for a, o in zip(cn, new_)),
                tuple(upd(a, o) for a, o in zip(cp, prev_)),
                an2 + n2)

    zeros = tuple(jnp.zeros_like(a) for a in (u, v, q, p, s))
    init = (zeros, zeros, jnp.zeros((4,), u.dtype))
    return lax.fori_loop(0, n_bands, band, init)


def tight_fits_vmem(nx, ny, L, k, itemsize: int = 4) -> bool:
    """~(10L + 14k + 8) live planes must fit in the raised VMEM limit."""
    return (10 * L + 14 * k + 8) * nx * ny * itemsize <= _VMEM_LIMIT


def tight_band_count(nx, ny, L, k, residual_iter, itemsize: int = 4,
                     double_buffer: bool = False):
    """Row-band tiling factor (cf. fused_rof.band_count); 1 = whole
    plane, None = no efficient tiling.  ``double_buffer`` sizes for the
    DB kernel's doubled window scratch."""
    from .fused_rof import band_count

    n_planes = ((16 * L + 22 * k + 11) if double_buffer
                else (10 * L + 14 * k + 8))
    return band_count(nx, ny, residual_iter, n_planes=n_planes,
                      itemsize=itemsize)


def _segment_const(arr):
    """The constant value of a preconditioner segment, or None."""
    import numpy as np

    a = np.asarray(arr)
    return float(a[0]) if a.size and np.allclose(a, a[0]) else None


def match_tight_structure(problem):
    """Detect the fusable tight-multilabel structure; returns a dict or
    None.  Conditions (built by examples/example_multilabel_tight.py):

    * linop = [grad2d(L) at (0,0); kron(P^T, I_n) at (0, nL) with +-1
      entries; identity diags at (2nL, nL); kron(ones(1,L), I_n) at
      (2nL+2nk, 0)]
    * prox_g = ind_geq0 with linear unaries over u + zero over v
    * prox_fstar = zero over q + dim-2 planar ball over p + linear shift
      over s
    * all preconditioner segments constant
    """
    import numpy as np

    from ..config import dtype

    if dtype() != jnp.float32:
        return None
    linop = problem.linop
    if not isinstance(linop, LinearOperator) or len(linop.blocks) != 4:
        return None
    grad = next((b for b in linop.blocks
                 if isinstance(b, BlockGradient2D)), None)
    ident = next((b for b in linop.blocks if isinstance(b, BlockDiags)), None)
    krons = [b for b in linop.blocks if isinstance(b, BlockKronId)]
    if grad is None or ident is None or len(krons) != 2:
        return None
    if grad.label_first or grad.row != 0 or grad.col != 0 or grad.L < 2:
        return None
    L, nx, ny = grad.L, grad.nx, grad.ny
    n = nx * ny
    nL = n * L

    pair = next((b for b in krons if b.col == nL), None)
    lsum = next((b for b in krons if b.col == 0), None)
    if pair is None or lsum is None:
        return None
    pmat = np.asarray(pair.data)
    if pmat.shape[0] != 2 * L or pmat.shape[1] % 2 or pair.row != 0:
        return None
    k = pmat.shape[1] // 2
    if pair.diaglength != n:
        return None
    taps = tuple(
        (int(r), int(m), float(pmat[r, m]))
        for r in range(2 * L) for m in range(2 * k) if pmat[r, m] != 0.0
    )
    if not taps or len(taps) > _MAX_TAPS:
        return None
    m_sum = np.asarray(lsum.data)
    if (lsum.row != 2 * nL + 2 * n * k or lsum.diaglength != n
            or m_sum.shape != (1, L) or not np.all(m_sum == 1.0)):
        return None
    if (ident.row != 2 * nL or ident.col != nL
            or ident.nrows != 2 * n * k or ident.ncols != 2 * n * k):
        return None
    if (ident.offsets != (0,)
            or not np.allclose(np.asarray(ident.factors), 1.0)):
        return None

    # --- primal proxes: positivity+unaries over u, zero over v -------------
    if len(problem.prox_g) != 2 or len(problem.prox_fstar) != 3:
        return None
    pg_u = next((p for p in problem.prox_g if p.index == 0), None)
    pg_v = next((p for p in problem.prox_g if p.index == nL), None)
    if not isinstance(pg_u, ProxElem1D) or pg_u.fun != "ind_geq0":
        return None
    if pg_u.size != nL or not isinstance(pg_v, ProxZero):
        return None
    a, b, c, d, e, _, _ = pg_u.coeffs
    if not (np.isscalar(a) and a == 1.0 and np.isscalar(b) and b == 0.0):
        return None
    if not (np.isscalar(c) and c > 0.0) or not (np.isscalar(e) and e == 0.0):
        return None
    f = jnp.asarray(
        np.broadcast_to(np.asarray(d, np.float32), (nL,))
    ).reshape(L, nx, ny)

    # --- dual proxes: free q, dim-2 ball on p, linear shift on s -----------
    pf_q = next((p for p in problem.prox_fstar if p.index == 0), None)
    pf_p = next((p for p in problem.prox_fstar if p.index == 2 * nL), None)
    pf_s = next((p for p in problem.prox_fstar
                 if p.index == 2 * nL + 2 * n * k), None)
    if not isinstance(pf_q, ProxZero) or pf_q.size != 2 * nL:
        return None
    if (not isinstance(pf_p, ProxElemNorm2) or pf_p.fun != "ind_leq0"
            or pf_p.size != 2 * n * k or pf_p.dim != 2 or pf_p.interleaved):
        return None
    ia, ib, ic, idd, ie, _, _ = pf_p.coeffs
    for val in (ia, ib, ic):
        if not np.isscalar(val):
            return None
    if idd != 0.0 or ie != 0.0 or ia <= 0:
        return None
    radius = float(ib) / float(ia)
    if not isinstance(pf_s, ProxElem1D) or pf_s.fun != "zero":
        return None
    sa, sb, sc, sd, se, _, _ = pf_s.coeffs
    if not (np.isscalar(sd) and np.isscalar(se) and se == 0.0):
        return None
    d_s = float(sd)

    # --- constant per-segment preconditioner --------------------------------
    sl = np.asarray(problem.scaling_left)
    sr = np.asarray(problem.scaling_right)
    consts = (
        _segment_const(sl[: 2 * nL]),
        _segment_const(sl[2 * nL: 2 * nL + 2 * n * k]),
        _segment_const(sl[2 * nL + 2 * n * k:]),
        _segment_const(sr[:nL]),
        _segment_const(sr[nL:]),
    )
    if any(c is None for c in consts):
        return None
    # no VMEM gate here (structure matching only) — callers pick the
    # whole-plane, tiled (tight_band_count), or halo-sharded kernel
    return {
        "nx": nx, "ny": ny, "L": L, "k": k, "taps": taps, "f": f,
        "radius": radius, "d_s": d_s, "consts": consts,
    }


@partial(jax.jit, static_argnums=(3, 4, 5, 6, 7, 8, 9, 10, 11),
         donate_argnums=(15,))
def _fused_tight_run(problem, prox_g, prox_fstar, opts, nx, ny, L, k,
                     taps_consts, n_bands, double_buffer, interpret,
                     tols, f_planes, scal_extra, state, until):
    """Phase structure identical to fused_rof._fused_rof_run: align ->
    single-kernel chunks (+ scalar adaptation) -> K-product epilogue ->
    generic tail.  taps_consts = (taps, consts) static;
    scal_extra = (radius, d_s) traced."""
    taps, consts = taps_consts
    radius, d_s = scal_extra
    ri = max(int(opts.residual_iter), 1)
    n = nx * ny
    nL = n * L
    nk2 = 2 * n * k

    def generic(s: PDHGState) -> PDHGState:
        return pdhg_step(problem, prox_g, prox_fstar, opts, tols, s)

    def pack(xf, yf):
        return (xf[:nL].reshape(L, nx, ny),
                xf[nL:].reshape(2 * k, nx, ny),
                yf[: 2 * nL].reshape(2 * L, nx, ny),
                yf[2 * nL: 2 * nL + nk2].reshape(2 * k, nx, ny),
                yf[2 * nL + nk2:].reshape(nx, ny))

    def fused_chunk(carry):
        # the chunk loop carries PLANES (packed once, below) — the
        # per-chunk slice/concat glue costs real HBM copies (round 3,
        # cf. fused_deblur's measured ~40%)
        st, cur, _prev = carry
        u, v, q, p, sm = cur
        if n_bands == 1:
            new, prev, norms2 = tight_fused_chunk(
                u, v, q, p, sm, f_planes, st.tau, st.sigma, st.theta,
                radius, d_s, ri, taps, consts, interpret=interpret)
        else:
            new, prev, norms2 = tight_fused_chunk_banded(
                u, v, q, p, sm, f_planes, st.tau, st.sigma, st.theta,
                radius, d_s, ri, taps, consts, n_bands,
                interpret=interpret, double_buffer=double_buffer)
        norms = jnp.sqrt(norms2)
        st = residual_and_adapt(
            problem, opts, tols, st,
            norms[0], norms[1], norms[2], norms[3],
            st.iteration + ri - 1,
        )
        st = dataclasses.replace(st, iteration=st.iteration + ri)
        return (st, tuple(new), tuple(prev))

    align = 1 % ri

    def cond_a(s):
        return (s.iteration % ri != align) & (s.iteration < until) & ~s.converged

    state = lax.while_loop(cond_a, generic, state)

    def cond_b(carry):
        s = carry[0]
        return (s.iteration + ri <= until) & ~s.converged

    state, cur, prev = lax.while_loop(
        cond_b, fused_chunk,
        (state, pack(state.x, state.y),
         pack(state.x_prev, state.y_prev)))

    def unpack(t):
        uu, vv, qq, pp, ss = t
        return (
            jnp.concatenate([uu.reshape(-1), vv.reshape(-1)]),
            jnp.concatenate([qq.reshape(-1), pp.reshape(-1),
                             ss.reshape(-1)]),
        )

    x_new, y_new = unpack(cur)
    xp_new, yp_new = unpack(prev)
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
