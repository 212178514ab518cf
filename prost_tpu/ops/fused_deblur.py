"""Fused Pallas PDHG iteration for TV-deblurring problems (conv + gradient).

Workload (example_deblurring.m / examples/example_deblurring.py — BASELINE
config 2):

    min_u  lmb/2 ||B u - f||^2 + ||grad u||_{2,1}

in saddle form with primal u (one (nx, ny) plane), duals y_v (the blur
residual multiplier, one FULL-convolution-sized (nx2, ny2) plane) and
q = (qx, qy) (the TV dual):

    K = [ B (full 2D convolution, m2 x n) ; grad2d (2n x n) ]

Design (extends ops/fused_rof.py to a second, convolutional block):

* The convolution runs INSIDE the kernel as statically-unrolled
  shifted-adds over the nonzero kernel taps — a blur kernel has O(10)
  nonzeros, so B u costs ~taps VPU passes over a VMEM-resident plane and
  needs no im2col / index traffic.  Forward full conv and its adjoint
  (valid correlation) are exact roll+mask stencils, like the gradient.
* Every plane is held EMBEDDED in the (nx2, ny2) = (nx+kx-1, ny+ky-1)
  full-conv geometry with zero padding outside the (nx, ny) region; the
  padding is provably preserved at zero by every update, so the kernel
  is shape-uniform and residual norms over the padded planes equal the
  flat-vector norms of the generic path.
* Exactly like fused_rof: ONE kernel per residual_iter-sized chunk, the
  forward products (B u, grad u) loop-carried between iterations, the four
  preconditioned residual norms reduced in-kernel to SMEM, and scalar
  step adaptation / stopping running through the generic
  ``residual_and_adapt`` — zero semantic drift from the reference
  algorithm (backend_pdhg.cu:313-381).
* The alpha preconditioner is NOT constant here: Sigma over the conv rows
  is a boundary-varying plane (row sums of |B|), passed in as a VMEM
  plane; Sigma over gradient rows (1/2) and Tau (1/(sum|k| + 4)) are
  structural constants baked into the kernel.

Layout contract: u viewed (nx, ny) embedded at [0:nx, 0:ny] of (nx2, ny2);
y = [y_v (m2 = nx2*ny2) ; qx (n) ; qy (n)] flat, matching BlockConv2D at
row 0 + BlockGradient2D(label_first=False, L=1) at row m2.
"""

from __future__ import annotations

import dataclasses
from functools import partial

import jax
import jax.numpy as jnp
from jax import lax

from ..backend.pdhg import PDHGState, pdhg_step, residual_and_adapt
from ..linop.base import LinearOperator
from ..linop.conv import BlockConv2D
from ..linop.gradient import BlockGradient2D
from ..prox.combinators import ProxMoreau
from ..prox.elemop import ProxElem1D, ProxElemNorm2
from ..prox.standalone import ProxZero

_VMEM_LIMIT = 96 * 1024 * 1024
_MAX_TAPS = 96  # statically unrolled shifted-adds per conv apply
# pairwise-tree tap summation (False = the round-2 serialized left fold;
# kept as a switch so tools/deblur_probe.py can A/B the association on
# hardware — serial-chain measurement: tree 226 us vs fold 241 us per
# 512^2 ri=10 chunk, i.e. the kernel is issue-bound, not latency-bound)
_TAP_SUM_TREE = True
# hoist the adjoint's large negative rolls into one base roll per axis
# (small per-tap rolls from there; bit-identical).  MEASURED NO WIN
# (round-5 interleaved A/B, tools/deblur_probe.py: base-roll 273 us vs
# direct large rolls 264 us per 512^2 ri=10 chunk, bit-equal) — the
# synthetic roll-cost asymmetry (stencil_probe2) does not transfer to
# this kernel's schedule, so the direct form stays the default; the
# switch and the probe keep the negative result reproducible
_ADJ_BASE_ROLL = False


def _conv_ops(shape, nx, ny, taps, roll, row_offset=None):
    """Forward full convolution / adjoint (valid correlation) as unrolled
    roll stencils on (nx2, ny2) planes whose [nx:, :] / [:, ny:] padding is
    zero.

    Forward: out[i] = sum_d k[d] u[i-d] — the wrap rows a positive roll
    brings in are padding (nx2 - d >= nx), i.e. exactly zero, so no mask
    is needed and the result covers the full output plane.
    Adjoint: out[i] = sum_d k[d] v[i+d], valid only on the (nx, ny)
    region; the negative-roll wrap lands in rows/cols >= nx (resp. ny)
    and is removed by the region mask.

    With ``row_offset`` the row masks use GLOBAL row indices so the ops
    are correct on a halo-extended row band/shard of the (nx2, ny2)
    geometry (wrap/garbage effects stay confined to the halo rows, which
    the halo-width accounting covers — see deblur_halo_rows).
    """
    nx2, ny2 = shape
    ri = lax.broadcasted_iota(jnp.int32, shape, 0)
    ci = lax.broadcasted_iota(jnp.int32, shape, 1)
    if row_offset is not None:
        gri = ri + row_offset
        region = (gri >= 0) & (gri < nx) & (ci < ny)
    else:
        region = (ri < nx) & (ci < ny)

    def tree_sum(terms):
        # pairwise tree instead of a left fold: the rolls are mutually
        # independent, but f32 adds cannot be compiler-reassociated, so a
        # T-term fold serializes T dependent adds (each behind 2 dependent
        # rolls).  Measured effect (round 3, serial-chain method): 6%
        # (226 vs 241 us per 512^2 chunk) — the kernel is issue-bound on
        # the 2T rolls, so cutting the add critical path to ceil(log2 T)
        # helps only at the margin; kept because it is never worse.
        if not _TAP_SUM_TREE:
            acc = terms[0]
            for t in terms[1:]:
                acc = acc + t
            return acc
        while len(terms) > 1:
            nxt = [a + b for a, b in zip(terms[::2], terms[1::2])]
            if len(terms) % 2:
                nxt.append(terms[-1])
            terms = nxt
        return terms[0]

    def grouped_terms(u, shifts):
        """Taps sharing a row shift share ONE row-rolled plane (round-3
        verdict stretch #9): rolls drop from 2T to (#distinct dx + T).
        For a dense k x k kernel that halves the roll count (k + k^2 vs
        2 k^2); for the bench's diagonal motion kernel every tap has a
        distinct dx, so the count is unchanged there — the kernel stays
        issue-bound on its 2T rolls (see PERFORMANCE.md deblur
        analysis)."""
        groups = {}
        for dx, dy, w in shifts:
            groups.setdefault(dx, []).append((dy, w))
        terms = []
        for dx, g in groups.items():
            ux = roll(u, dx, 0) if dx else u
            terms += [w * (roll(ux, dy, 1) if dy else ux) for dy, w in g]
        return terms

    def fwd(u):
        return tree_sum(grouped_terms(u, [(dx, dy, w)
                                          for dx, dy, w in taps]))

    def adj(v):
        if not _ADJ_BASE_ROLL:
            acc = tree_sum(grouped_terms(
                v, [((nx2 - dx) % nx2, (ny2 - dy) % ny2, w)
                    for dx, dy, w in taps]))
            return jnp.where(region, acc, 0.0)
        # negative shifts as ONE large base roll per axis + small
        # per-tap rolls: roll(v, N - d) == roll(roll(v, N - dmax),
        # dmax - d) exactly (circular roll composition involves no
        # arithmetic, so this is bit-identical) — Mosaic lowers a
        # lane/sublane rotate by a LARGE static amount in multiple
        # stages (~2.2x a small shift, tools/stencil_probe.py), and the
        # taps' d are small (kernel extent), so this turns ~2T large
        # rotates into 2 large + 2T small ones.
        dmx = max(dx for dx, _, _ in taps)
        dmy = max(dy for _, dy, _ in taps)
        base = v
        if dmx:
            base = roll(base, nx2 - dmx, 0)
        if dmy:
            base = roll(base, ny2 - dmy, 1)
        acc = tree_sum(grouped_terms(
            base, [(dmx - dx, dmy - dy, w) for dx, dy, w in taps]))
        return jnp.where(region, acc, 0.0)

    return fwd, adj, region


def _grad_ops(shape, nx, ny, roll, row_offset=None):
    """Forward-difference / adjoint stencils restricted to the embedded
    (nx, ny) region of an (nx2, ny2) plane (cf. fused_rof._shift_ops, whose
    masks use the full plane extents).  With ``row_offset`` the row masks
    use GLOBAL row indices (halo-extended bands/shards)."""
    nx2, ny2 = shape
    ri = lax.broadcasted_iota(jnp.int32, shape, 0)
    ci = lax.broadcasted_iota(jnp.int32, shape, 1)
    gri = ri if row_offset is None else ri + row_offset
    in_r = gri < (nx - 1)
    in_c = ci < (ny - 1)
    region = (gri < nx) & (ci < ny)
    if row_offset is not None:
        in_r &= gri >= 0
        region &= gri >= 0

    def dx(u):
        return jnp.where(in_r, roll(u, shape[0] - 1, 0) - u, 0.0)

    def dy(u):
        return jnp.where(in_c, roll(u, ny2 - 1, 1) - u, 0.0)

    def dxt(p):
        lead = jnp.where(gri > 0, roll(p, 1, 0), 0.0)
        return jnp.where(region, lead - jnp.where(in_r, p, 0.0), 0.0)

    def dyt(p):
        lead = jnp.where(ci > 0, roll(p, 1, 1), 0.0)
        return jnp.where(region, lead - jnp.where(in_c, p, 0.0), 0.0)

    return dx, dy, dxt, dyt


def _chunk_core(tau_raw, sigma_raw, theta, lmb, radius, x0, yv0, qx0, qy0,
                fb, sv, count, nx, ny, taps, sig_q, tau_t, roll,
                halo_ctx=None):
    """``count - 1`` plain iterations then the aligned iteration with its
    four preconditioned residual norms (squared), all on VMEM-resident
    embedded planes.  Mirrors fused_rof._chunk_core.

    halo_ctx = (row_offset, own_lo, own_hi): run on a halo-extended row
    band/shard of the (nx2, ny2) geometry — all masks use global rows,
    norms cover owned local rows only.  The required halo width is
    (2*count + 2) * max(kx - 1, 1) rows (deblur_halo_rows): each operator
    application spreads garbage by the conv's row reach, not 1."""
    shape = fb.shape
    if halo_ctx is not None:
        row_offset, own_lo, own_hi = halo_ctx
        conv_fwd, conv_adj, _ = _conv_ops(shape, nx, ny, taps, roll,
                                          row_offset)
        gops = _grad_ops(shape, nx, ny, roll, row_offset)
        lri = lax.broadcasted_iota(jnp.int32, shape, 0)
        owned = (lri >= own_lo) & (lri < own_hi)

        def nsum(v):
            return jnp.sum(jnp.where(owned, v, 0.0))
    else:
        conv_fwd, conv_adj, _ = _conv_ops(shape, nx, ny, taps, roll)
        gops = _grad_ops(shape, nx, ny, roll)
        nsum = jnp.sum
    _dx, _dy, _dxt, _dyt = gops

    tau_s = tau_raw * tau_t            # tau * Tau
    tsv = sigma_raw * sv               # sigma * Sigma_v (plane)
    sq = sigma_raw * sig_q             # sigma * Sigma_q
    sig_p = sq * (1.0 + theta)
    sig_t = sq * theta
    inv_l = 1.0 / lmb
    dual_v_den = 1.0 / (1.0 + tsv * inv_l)
    dual_v_sh = tsv * fb               # hoisted t * fb plane

    def update(x, yv, qx, qy, bx, gx, gy):
        kty = conv_adj(yv) + _dxt(qx) + _dyt(qy)
        x2 = x - tau_s * kty
        bx2 = conv_fwd(x2)
        gx2 = _dx(x2)
        gy2 = _dy(x2)
        av = yv + tsv * ((1.0 + theta) * bx2 - theta * bx)
        yv2 = (av - dual_v_sh) * dual_v_den
        ax = qx + sig_p * gx2 - sig_t * gx
        ay = qy + sig_p * gy2 - sig_t * gy
        scale = jnp.minimum(1.0, radius * lax.rsqrt(ax * ax + ay * ay))
        return x2, yv2, ax * scale, ay * scale, bx2, gx2, gy2, kty

    def body(_, carry):
        x, yv, qx, qy, bx, gx, gy = carry
        x, yv, qx, qy, bx, gx, gy, _ = update(x, yv, qx, qy, bx, gx, gy)
        return x, yv, qx, qy, bx, gx, gy

    x, yv, qx, qy, bxp, gxp, gyp = lax.fori_loop(
        0, count - 1, body,
        (x0, yv0, qx0, qy0, conv_fwd(x0), _dx(x0), _dy(x0)))

    # aligned iteration; (bxp, gxp, gyp) = K x_prev carried for free
    x2, yv2, qx2, qy2, bx2, gx2, gy2, ktyp = update(
        x, yv, qx, qy, bxp, gxp, gyp)
    kty2 = conv_adj(yv2) + _dxt(qx2) + _dyt(qy2)

    # preconditioned residuals (backend/pdhg.py::compute_residuals),
    # segment-wise sqrt(Sigma): plane for v, constant for q
    sqrt_sv = jnp.sqrt(sv)
    sqrt_sq = sig_q ** 0.5
    sqrt_t = tau_t ** 0.5
    inv_v = 1.0 / (sigma_raw * sqrt_sv)
    inv_q = 1.0 / (sigma_raw * sqrt_sq)
    zh_v = (yv - yv2) * inv_v + sqrt_sv * ((1.0 + theta) * bx2 - theta * bxp)
    zh_x = (qx - qx2) * inv_q + sqrt_sq * ((1.0 + theta) * gx2 - theta * gxp)
    zh_y = (qy - qy2) * inv_q + sqrt_sq * ((1.0 + theta) * gy2 - theta * gyp)
    pd_v = zh_v - sqrt_sv * bx2
    pd_x = zh_x - sqrt_sq * gx2
    pd_y = zh_y - sqrt_sq * gy2
    wh = (x - x2) * (1.0 / (tau_raw * sqrt_t)) - sqrt_t * ktyp
    dd = wh + sqrt_t * kty2

    norms = (
        nsum(pd_v * pd_v) + nsum(pd_x * pd_x) + nsum(pd_y * pd_y),
        nsum(zh_v * zh_v) + nsum(zh_x * zh_x) + nsum(zh_y * zh_y),
        nsum(dd * dd),
        nsum(wh * wh),
    )
    return x2, yv2, qx2, qy2, x, yv, qx, qy, norms


def _deblur_chunk_kernel(scal_ref, x_ref, yv_ref, q_ref, f_ref, sv_ref,
                         xo_ref, yvo_ref, qo_ref,
                         xpo_ref, yvpo_ref, qpo_ref, norms_ref, *,
                         count: int, nx: int, ny: int, taps, sig_q: float,
                         tau_t: float, halo: bool = False):
    """One residual_iter-sized chunk in ONE kernel, residual norms reduced
    to SMEM.  scal_ref (SMEM): [tau, sigma, theta, lmb, radius] — with
    ``halo``, three more entries [row_offset, own_lo, own_hi] and the refs
    are one band's halo-EXTENDED planes."""
    from jax.experimental.pallas import tpu as pltpu

    halo_ctx = None
    if halo:
        halo_ctx = (scal_ref[5].astype(jnp.int32),
                    scal_ref[6].astype(jnp.int32),
                    scal_ref[7].astype(jnp.int32))
    q = q_ref[...]
    (x2, yv2, qx2, qy2, xp, yvp, qxp, qyp, norms) = _chunk_core(
        scal_ref[0], scal_ref[1], scal_ref[2], scal_ref[3], scal_ref[4],
        x_ref[...], yv_ref[...], q[0], q[1], f_ref[...], sv_ref[...],
        count, nx, ny, taps, sig_q, tau_t, pltpu.roll, halo_ctx=halo_ctx)
    for i in range(4):
        norms_ref[i] = norms[i]
    xo_ref[...] = x2
    yvo_ref[...] = yv2
    qo_ref[0] = qx2
    qo_ref[1] = qy2
    xpo_ref[...] = xp
    yvpo_ref[...] = yvp
    qpo_ref[0] = qxp
    qpo_ref[1] = qyp


def _deblur_chunk_kernel_batched(scal_ref, x_ref, yv_ref, q_ref, f_ref,
                                 sv_ref, xo_ref, yvo_ref, qo_ref,
                                 xpo_ref, yvpo_ref, qpo_ref, norms_ref, *,
                                 count: int, nx: int, ny: int, taps,
                                 sig_q: float, tau_t: float):
    """Gridded batch variant (cf. fused_rof._rof_chunk_kernel_batched):
    grid = (B,), one instance per grid step; plane refs carry a leading
    length-1 instance axis; scal_ref/norms_ref are the WHOLE (5, B) /
    (4, B) SMEM arrays (instances-minor)."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    b = pl.program_id(0)
    q = q_ref[0]
    (x2, yv2, qx2, qy2, xp, yvp, qxp, qyp, norms) = _chunk_core(
        scal_ref[0, b], scal_ref[1, b], scal_ref[2, b], scal_ref[3, b],
        scal_ref[4, b], x_ref[0], yv_ref[0], q[0], q[1], f_ref[0],
        sv_ref[0], count, nx, ny, taps, sig_q, tau_t, pltpu.roll)
    for i in range(4):
        norms_ref[i, b] = norms[i]
    xo_ref[0] = x2
    yvo_ref[0] = yv2
    qo_ref[0, 0] = qx2
    qo_ref[0, 1] = qy2
    xpo_ref[0] = xp
    yvpo_ref[0] = yvp
    qpo_ref[0, 0] = qxp
    qpo_ref[0, 1] = qyp


def deblur_fused_chunk_batched(x, yv, q, fb, sv, scal, count, nx, ny,
                               taps, sig_q, tau_t,
                               interpret: bool = False):
    """Batched deblur chunk: grid over the instance axis — deblurring B
    frames sharing one blur kernel (the natural video workload).
    x/yv/fb/sv are (B, nx2, ny2), q is (B, 2, nx2, ny2), scal is (5, B)
    instances-minor rows of [tau, sigma, theta, lmb, radius].  Returns
    the same tuple as ``deblur_fused_chunk`` with a leading batch axis
    and norms2 (4, B)."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    B, nx2, ny2 = x.shape
    smem = pl.BlockSpec(memory_space=pltpu.SMEM)
    pspec = pl.BlockSpec((1, nx2, ny2), lambda b: (b, 0, 0),
                         memory_space=pltpu.VMEM)
    qspec = pl.BlockSpec((1, 2, nx2, ny2), lambda b: (b, 0, 0, 0),
                         memory_space=pltpu.VMEM)
    out_shape = [
        jax.ShapeDtypeStruct(x.shape, x.dtype),
        jax.ShapeDtypeStruct(yv.shape, yv.dtype),
        jax.ShapeDtypeStruct(q.shape, q.dtype),
        jax.ShapeDtypeStruct(x.shape, x.dtype),
        jax.ShapeDtypeStruct(yv.shape, yv.dtype),
        jax.ShapeDtypeStruct(q.shape, q.dtype),
        jax.ShapeDtypeStruct((4, B), x.dtype),
    ]
    return pl.pallas_call(
        partial(_deblur_chunk_kernel_batched, count=int(count), nx=nx,
                ny=ny, taps=taps, sig_q=sig_q, tau_t=tau_t),
        grid=(B,),
        out_shape=out_shape,
        in_specs=[smem, pspec, pspec, qspec, pspec, pspec],
        out_specs=[pspec, pspec, qspec, pspec, pspec, qspec, smem],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=_VMEM_LIMIT),
        interpret=interpret,
    )(scal, x, yv, q, fb, sv)


def _deblur_scal(x, tau, sigma, theta, lmb, radius):
    return jnp.stack([
        jnp.asarray(tau, x.dtype), jnp.asarray(sigma, x.dtype),
        jnp.asarray(theta, x.dtype),
        jnp.asarray(lmb, x.dtype), jnp.asarray(radius, x.dtype),
    ])


def _deblur_pallas_call(scal, x, yv, q, fb, sv, count, nx, ny, taps, sig_q,
                        tau_t, halo, interpret):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    plane = pl.BlockSpec(memory_space=pltpu.VMEM)
    smem = pl.BlockSpec(memory_space=pltpu.SMEM)
    out_shape = [jax.ShapeDtypeStruct(a.shape, a.dtype)
                 for a in (x, yv, q, x, yv, q)]
    out_shape.append(jax.ShapeDtypeStruct((4,), x.dtype))
    return pl.pallas_call(
        partial(_deblur_chunk_kernel, count=int(count), nx=nx, ny=ny,
                taps=taps, sig_q=sig_q, tau_t=tau_t, halo=halo),
        out_shape=out_shape,
        in_specs=[smem] + [plane] * 5,
        out_specs=[plane] * 6 + [smem],
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=_VMEM_LIMIT),
        interpret=interpret,
    )(scal, x, yv, q, fb, sv)


def deblur_fused_chunk(x, yv, q, fb, sv, tau, sigma, theta, lmb, radius,
                       count, nx, ny, taps, sig_q, tau_t,
                       interpret: bool = False):
    """``count`` fused iterations ending on a residual iteration.  All
    plane arguments are (nx2, ny2)-embedded (q is (2, nx2, ny2)).  Returns
    (x2, yv2, q2, x_prev, yv_prev, q_prev, norms2)."""
    scal = _deblur_scal(x, tau, sigma, theta, lmb, radius)
    return _deblur_pallas_call(scal, x, yv, q, fb, sv, count, nx, ny, taps,
                               sig_q, tau_t, False, interpret)


def deblur_halo_rows(count: int, taps) -> int:
    """Halo width for banding/sharding the deblur chunk: each operator
    application spreads information by the conv's row reach (max tap row
    offset, >= the gradient's 1), and a count-iteration chunk applies
    2*count + 2 operators along the row axis."""
    reach = max(max(dx for dx, _, _ in taps), 1)
    return (2 * int(count) + 2) * reach


def deblur_fused_chunk_halo(x, yv, q, fb, sv, scal, count, nx, ny, taps,
                            sig_q, tau_t, interpret: bool = False):
    """``count`` fused iterations on one halo-extended row band/shard of
    the (nx2, ny2) geometry; scal = [tau, sigma, theta, lmb, radius,
    row_offset, own_lo, own_hi].  Norms cover owned rows only."""
    return _deblur_pallas_call(scal, x, yv, q, fb, sv, count, nx, ny, taps,
                               sig_q, tau_t, True, interpret)


def deblur_fused_chunk_tiled(x, yv, q, fb, sv, tau, sigma, theta, lmb,
                             radius, count, nx, ny, taps, sig_q, tau_t,
                             n_bands: int, interpret: bool = False):
    """Row-band tiled chunk over the (nx2, ny2) rows (cf.
    fused_rof.rof_fused_chunk_tiled) with the conv-width halo
    (deblur_halo_rows).  nx2 need not divide n_bands evenly: the rows are
    padded up to n_bands equal bands (so the fori_loop body traces the
    kernel once) and the last band's owned range is clamped to the real
    rows — padded rows never enter the norms and are cropped from the
    outputs."""
    nx2, ny2 = x.shape
    halo = deblur_halo_rows(count, taps)
    rows = -(-nx2 // n_bands)  # ceil
    nx2p = rows * n_bands

    def pad(a):
        cfg = ((0, 0),) * (a.ndim - 2) + ((halo, halo + nx2p - nx2), (0, 0))
        return jnp.pad(a, cfg)

    planes = tuple(pad(a) for a in (x, yv, q, fb, sv))
    base = _deblur_scal(x, tau, sigma, theta, lmb, radius)
    ext = rows + 2 * halo
    own = slice(halo, halo + rows)

    def band(i, carry):
        lo = i * rows

        def sl(a):
            return lax.dynamic_slice_in_dim(a, lo, ext, axis=a.ndim - 2)

        hi = jnp.minimum(jnp.asarray(rows, jnp.int32),
                         jnp.asarray(nx2, jnp.int32) - lo)
        scal = jnp.concatenate([
            base,
            jnp.stack([(lo - halo).astype(x.dtype),
                       jnp.asarray(halo, x.dtype),
                       (halo + hi).astype(x.dtype)]),
        ])
        b = tuple(sl(a) for a in planes)
        outs = deblur_fused_chunk_halo(
            b[0], b[1], b[2], b[3], b[4], scal, count, nx, ny, taps,
            sig_q, tau_t, interpret=interpret)

        def upd(acc, val):
            crop = val[:, own] if val.ndim == 3 else val[own]
            return lax.dynamic_update_slice_in_dim(
                acc, crop, lo, axis=acc.ndim - 2)

        return tuple(upd(a, o) for a, o in zip(carry[:6], outs[:6])) + (
            carry[6] + outs[6],)

    def zp(a):
        cfg = ((0, 0),) * (a.ndim - 2) + ((0, nx2p - nx2), (0, 0))
        return jnp.zeros_like(jnp.pad(a, cfg))

    init = (zp(x), zp(yv), zp(q), zp(x), zp(yv), zp(q),
            jnp.zeros((4,), x.dtype))
    res = lax.fori_loop(0, n_bands, band, init)

    def crop(a):
        return a[..., :nx2, :]

    return (crop(res[0]), crop(res[1]), crop(res[2]), crop(res[3]),
            crop(res[4]), crop(res[5]), res[6])


def _deblur_banded_kernel(scal_ref, off_ref, x_hbm, yv_hbm, q_hbm, fb_hbm,
                          sv_hbm,
                          xo, yvo, qo, xpo, yvpo, qpo, norms_ref,
                          xs, yvs, qs, fbs, svs, qps, sem, *,
                          count: int, nx: int, ny: int, taps,
                          sig_q: float, tau_t: float,
                          nx2: int, rows: int, halo: int, n_bands: int,
                          own_lo: int):
    """Grid-banded deblur chunk: ONE launch per chunk, manual DMAs, all
    inputs/outputs in HBM (memory_space=ANY) with GLOBAL row offsets (cf.
    fused_rof._rof_banded_kernel).  Unlike the ROF/ml banded kernels the
    windows are NOT clamped at the domain edges: the full-conv forward
    stencil has no row mask (it relies on roll-wrap rows being zero, see
    _conv_ops), so the first/last bands zero-fill their out-of-domain
    halo rows and DMA only the valid intersection — reproducing the
    zero-padded window semantics of deblur_fused_chunk_tiled exactly.
    norms_ref is the whole (4, n_bands) SMEM array."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    i = pl.program_id(0)
    ext = xs.shape[0]
    r8, h8 = rows // 8, halo // 8
    valid = ext - halo  # edge bands fetch this many real rows

    def copies(pairs):
        cs = [pltpu.make_async_copy(src, dst, sem) for src, dst in pairs]
        for c in cs:
            c.start()
        for c in cs:
            c.wait()

    ins = ((x_hbm, xs), (yv_hbm, yvs), (q_hbm, qs), (fb_hbm, fbs),
           (sv_hbm, svs))

    def fetch(src_lo, dst_lo, size):
        copies([(h.at[..., pl.ds(src_lo, size), :],
                 s.at[..., pl.ds(dst_lo, size), :]) for h, s in ins])

    if own_lo:
        # sharded block: every band window is interior to the block (the
        # exchanged shard halo >= the band halo, and ppermute's zero fill
        # at the domain edges already realizes the conv's zero padding) —
        # one uniform fetch, no clamping, no in-kernel zero rows
        start = 8 * (own_lo // 8 + i * r8 - h8)
        fetch(start, 0, ext)
        row_offset = off_ref[0] + start
    else:
        first = i == 0
        last = i == n_bands - 1

        def zero_rows(s, lo):
            s[..., pl.ds(lo, halo), :] = jnp.zeros(
                tuple(s.shape[:-2]) + (halo, s.shape[-1]), s.dtype)

        @pl.when(first)
        def _():
            for _, s in ins:
                zero_rows(s, 0)
            fetch(0, halo, valid)

        @pl.when(last & ~first)
        def _():
            for _, s in ins:
                zero_rows(s, valid)
            fetch(nx2 - valid, 0, valid)

        if n_bands > 2:  # middle bands exist; their full-ext window fits
            @pl.when(~first & ~last)
            def _():
                fetch(8 * (i * r8 - h8), 0, ext)

        row_offset = 8 * (i * r8 - h8)  # padded-window coord of row 0
    halo_ctx = (row_offset, halo, halo + rows)
    q = qs[...]
    (x2, yv2, qx2, qy2, xp, yvp, qxp, qyp, norms) = _chunk_core(
        scal_ref[0], scal_ref[1], scal_ref[2], scal_ref[3], scal_ref[4],
        xs[...], yvs[...], q[0], q[1], fbs[...], svs[...],
        count, nx, ny, taps, sig_q, tau_t, pltpu.roll, halo_ctx=halo_ctx)
    for j in range(4):
        norms_ref[j, i] = norms[j]

    # stage results in the freed input scratch, DMA owned rows out
    xs[...] = x2
    yvs[...] = yv2
    qs[0] = qx2
    qs[1] = qy2
    fbs[...] = xp
    svs[...] = yvp
    qps[0] = qxp
    qps[1] = qyp
    own_lo = halo  # local; band 0's top halo is zero padding, not rows
    lo = 8 * (i * r8)
    outs = ((xs, xo), (yvs, yvo), (qs, qo), (fbs, xpo), (svs, yvpo),
            (qps, qpo))
    copies([(s.at[..., pl.ds(own_lo, rows), :],
             h.at[..., pl.ds(lo, rows), :]) for s, h in outs])


def _deblur_banded_db_kernel(scal_ref, off_ref, x_hbm, yv_hbm, q_hbm,
                             fb_hbm, sv_hbm,
                             xo, yvo, qo, xpo, yvpo, qpo, norms_ref,
                             xs2, yvs2, qs2, fbs2, svs2, qps2,
                             in_sem, out_sem, *,
                             count: int, nx: int, ny: int, taps,
                             sig_q: float, tau_t: float, nx2: int,
                             rows: int, halo: int, n_bands: int,
                             own_lo: int):
    """DOUBLE-BUFFERED grid-banded deblur chunk.  The conv has no row
    masks (it relies on zero halo rows, see `_conv_ops`), so the edge
    bands' fetches are CONDITIONAL (zero-fill + valid-row fetch instead
    of a full window) — each band's copy set is rebuilt identically at
    start and wait time (the branch depends only on the band index), so
    the shared run_banded_db helper does not fit and the pipeline is
    inlined here with per-branch predication."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    i = pl.program_id(0)
    p = lax.rem(i, 2)
    ext = xs2.shape[1]
    r8, h8 = rows // 8, halo // 8
    valid = ext - halo

    ins = ((x_hbm, xs2), (yv_hbm, yvs2), (q_hbm, qs2), (fb_hbm, fbs2),
           (sv_hbm, svs2))

    def copies(src_lo, dst_lo, size, buf, sem):
        return [pltpu.make_async_copy(
            h.at[..., pl.ds(src_lo, size), :],
            s.at[buf, ..., pl.ds(dst_lo, size), :], sem)
            for h, s in ins]

    def for_in(j, buf, act):
        """Apply ``act`` ('start'/'wait') to band j's conditional fetch
        set on ping-pong buffer ``buf``."""
        sem = in_sem.at[buf]
        if own_lo:
            # sharded block: uniform interior windows, no edge branches
            start = 8 * (own_lo // 8 + j * r8 - h8)
            for c in copies(start, 0, ext, buf, sem):
                getattr(c, act)()
            return
        first = j == 0
        last = j == n_bands - 1

        @pl.when(first)
        def _():
            for c in copies(0, halo, valid, buf, sem):
                getattr(c, act)()

        @pl.when(last & jnp.logical_not(first))
        def _():
            for c in copies(nx2 - valid, 0, valid, buf, sem):
                getattr(c, act)()

        if n_bands > 2:
            @pl.when(jnp.logical_not(first) & jnp.logical_not(last))
            def _():
                # max() keeps the offset nonnegative when the descriptor
                # is built for a predicated-off edge band (j may be a
                # concrete 0 / n_bands-1 at the pipeline boundaries)
                src = 8 * jnp.maximum(j * r8 - h8, 0)
                for c in copies(src, 0, ext, buf, sem):
                    getattr(c, act)()

    def zero_fill(j, buf):
        """The edge bands' out-of-domain halo rows must be ZERO before
        compute (the conv's roll wrap relies on it)."""
        if own_lo:
            return

        def zero_rows(lo):
            for _, s in ins:
                s[buf, ..., pl.ds(lo, halo), :] = jnp.zeros(
                    tuple(s.shape[1:-2]) + (halo, s.shape[-1]), s.dtype)

        @pl.when(j == 0)
        def _():
            zero_rows(0)

        @pl.when((j == n_bands - 1) & (j != 0))
        def _():
            zero_rows(valid)

    def out_copies(j, buf):
        lo = 8 * (j * r8)
        sem = out_sem.at[buf]
        outs = ((xs2, xo), (yvs2, yvo), (qs2, qo), (fbs2, xpo),
                (svs2, yvpo), (qps2, qpo))
        return [pltpu.make_async_copy(
            s.at[buf, ..., pl.ds(halo, rows), :],
            h.at[..., pl.ds(lo, rows), :], sem) for s, h in outs]

    @pl.when(i == 0)
    def _():
        zero_fill(0, p)
        for_in(0, p, "start")

    for_in(i, p, "wait")

    @pl.when(i >= 1)
    def _():
        for c in out_copies(i - 1, 1 - p):
            c.wait()

    @pl.when(i + 1 < n_bands)
    def _():
        zero_fill(i + 1, 1 - p)
        for_in(i + 1, 1 - p, "start")

    if own_lo:
        start = 8 * (own_lo // 8 + i * r8 - h8)
        row_offset = off_ref[0] + start
    else:
        row_offset = 8 * (i * r8 - h8)
    halo_ctx = (row_offset, halo, halo + rows)
    q = qs2[p]
    (x2, yv2, qx2, qy2, xp, yvp, qxp, qyp, norms) = _chunk_core(
        scal_ref[0], scal_ref[1], scal_ref[2], scal_ref[3], scal_ref[4],
        xs2[p], yvs2[p], q[0], q[1], fbs2[p], svs2[p],
        count, nx, ny, taps, sig_q, tau_t, pltpu.roll, halo_ctx=halo_ctx)
    for j in range(4):
        norms_ref[j, i] = norms[j]

    xs2[p] = x2
    yvs2[p] = yv2
    qs2[p, 0] = qx2
    qs2[p, 1] = qy2
    fbs2[p] = xp
    svs2[p] = yvp
    qps2[p, 0] = qxp
    qps2[p, 1] = qyp
    for c in out_copies(i, p):
        c.start()

    @pl.when(i == n_bands - 1)
    def _():
        for c in out_copies(i, p):
            c.wait()


def deblur_fused_chunk_banded(x, yv, q, fb, sv, tau, sigma, theta, lmb,
                              radius, count, nx, ny, taps, sig_q, tau_t,
                              n_bands: int, interpret: bool = False,
                              own_lo: int = 0, out_rows: int | None = None,
                              row_offset0=None,
                              double_buffer: bool = False):
    """``count`` fused iterations with the (nx2, ny2) planes split into
    ``n_bands`` row bands inside ONE kernel.  Requires nx2 % n_bands == 0
    and rows % 8 == 0 (deblur_band_count only returns such tilings).
    Same returns as ``deblur_fused_chunk``.  (own_lo, out_rows,
    row_offset0) band a halo-extended shard block instead (see
    fused_rof.rof_fused_chunk_banded; the shard's exchanged halo must be
    >= the 8-rounded conv-reach halo)."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    nin, ny2 = x.shape
    out_rows = nin if out_rows is None else out_rows
    halo = -(-deblur_halo_rows(count, taps) // 8) * 8
    rows = out_rows // n_bands
    assert n_bands >= 2 or own_lo, n_bands
    assert rows * n_bands == out_rows and rows % 8 == 0, (out_rows, n_bands)
    assert halo <= rows, (halo, rows)
    assert own_lo % 8 == 0 and (own_lo == 0 or own_lo >= halo), own_lo
    ext = rows + 2 * halo

    scal = _deblur_scal(x, tau, sigma, theta, lmb, radius)
    off = jnp.asarray(
        [0 if row_offset0 is None else row_offset0], jnp.int32)
    smem = pl.BlockSpec(memory_space=pltpu.SMEM)
    hbm = pl.BlockSpec(memory_space=pl.ANY)

    def oshape(a):
        return jax.ShapeDtypeStruct(
            a.shape[:-2] + (out_rows, ny2), a.dtype)

    out_shape = [oshape(a) for a in (x, yv, q, x, yv, q)]
    out_shape.append(jax.ShapeDtypeStruct((4, n_bands), x.dtype))
    dt = x.dtype
    vm = pltpu.VMEM
    if double_buffer:
        kern = partial(_deblur_banded_db_kernel, count=int(count), nx=nx,
                       ny=ny, taps=taps, sig_q=sig_q, tau_t=tau_t,
                       nx2=nin, rows=rows, halo=halo, n_bands=n_bands,
                       own_lo=int(own_lo))
        scratch = [
            vm((2, ext, ny2), dt), vm((2, ext, ny2), dt),
            vm((2, 2, ext, ny2), dt), vm((2, ext, ny2), dt),
            vm((2, ext, ny2), dt), vm((2, 2, ext, ny2), dt),
            pltpu.SemaphoreType.DMA((2,)), pltpu.SemaphoreType.DMA((2,)),
        ]
    else:
        kern = partial(_deblur_banded_kernel, count=int(count), nx=nx,
                       ny=ny, taps=taps, sig_q=sig_q, tau_t=tau_t,
                       nx2=nin, rows=rows, halo=halo, n_bands=n_bands,
                       own_lo=int(own_lo))
        scratch = [
            vm((ext, ny2), dt), vm((ext, ny2), dt), vm((2, ext, ny2), dt),
            vm((ext, ny2), dt), vm((ext, ny2), dt), vm((2, ext, ny2), dt),
            pltpu.SemaphoreType.DMA,
        ]
    outs = pl.pallas_call(
        kern,
        grid=(n_bands,),
        out_shape=out_shape,
        in_specs=[smem, smem] + [hbm] * 5,
        out_specs=[hbm] * 6 + [smem],
        scratch_shapes=scratch,
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=_VMEM_LIMIT),
        interpret=interpret,
    )(scal, off, x, yv, q, fb, sv)
    return (outs[0], outs[1], outs[2], outs[3], outs[4], outs[5],
            jnp.sum(outs[6], axis=1))


def deblur_fits_vmem(nx2: int, ny2: int, itemsize: int = 4) -> bool:
    """~18 live (nx2, ny2) planes must fit the raised VMEM limit."""
    return 18 * nx2 * ny2 * itemsize <= _VMEM_LIMIT


def deblur_banded_ok(nx2: int, n_bands: int) -> bool:
    """True when the single-launch banded kernel can run this tiling:
    its manual DMAs need 8-aligned offsets/sizes, so the rows must split
    into n_bands equal 8-multiples."""
    rows = nx2 // n_bands
    return n_bands >= 2 and rows * n_bands == nx2 and rows % 8 == 0


def deblur_band_count(nx2: int, ny2: int, residual_iter: int, taps,
                      itemsize: int = 4, double_buffer: bool = False):
    """Row-band tiling factor over the full-conv rows: smallest band count
    whose halo-extended bands keep ~18 live planes under the VMEM limit;
    1 = whole plane, None = no efficient tiling (halo wider than bands —
    the conv reach multiplies the halo, so large kernels + large
    residual_iter tile poorly; lower residual_iter helps).  Exact-divisor
    8-multiple tilings are preferred (they run the single-launch banded
    kernel, deblur_banded_ok); ceil-based tilings (any nx2) fall back to
    the multi-launch tiled path."""
    if deblur_fits_vmem(nx2, ny2, itemsize):
        return 1
    halo = deblur_halo_rows(max(int(residual_iter), 1), taps)
    halo8 = -(-halo // 8) * 8  # the banded kernel rounds the halo up
    budget = int(0.75 * _VMEM_LIMIT)  # see fused_rof.band_count

    n_planes = 30 if double_buffer else 18  # DB doubles the 6 windows

    def fits(rows, h):
        return n_planes * (rows + 2 * h) * ny2 * itemsize <= budget

    for n_bands in range(2, nx2 + 1):
        if not deblur_banded_ok(nx2, n_bands):
            continue
        rows = nx2 // n_bands
        if rows < halo8:
            break  # halo recompute would dominate; try ceil tilings
        if fits(rows, halo8):
            return n_bands
    for n_bands in range(2, nx2 + 1):
        rows = -(-nx2 // n_bands)
        if rows < halo:
            return None
        if deblur_banded_ok(nx2, n_bands) and not fits(rows, halo8):
            # dispatch (_fused_deblur_run) routes exact 8-aligned divisors
            # to the single-launch banded kernel, whose windows use the
            # 8-ROUNDED halo — a tiling that only fits with the unrounded
            # halo would risk a Mosaic capacity rejection there
            continue
        if fits(rows, halo):
            return n_bands
    return None


def _kernel_taps(kernel):
    """Static (dx, dy, weight) list of the nonzero convolution taps; the
    kernel array is concrete at match time."""
    import numpy as np

    k = np.asarray(kernel)
    taps = [(int(dx), int(dy), float(k[dx, dy]))
            for dx in range(k.shape[0]) for dy in range(k.shape[1])
            if k[dx, dy] != 0.0]
    return tuple(taps)


def match_deblur_structure(problem, prox_g, prox_fstar):
    """Detect the fusable deblurring structure; returns a dict or None.
    ``prox_g``/``prox_fstar`` are the backend's (Moreau-synthesized) lists.

    Conditions (built by examples/example_deblurring.py via MinProblem):
    * linop = [BlockConv2D(L=1) at (0, 0); BlockGradient2D(L=1,
      label_first=False) at (m2, 0)], same (nx, ny)
    * prox_g = one ProxZero over the whole primal
    * prox_fstar = Moreau(1D square, coeffs (1, fb, lmb, 0, 0)) over the
      conv rows + Moreau(norm2 abs, dim-2 planar, coeffs (1, 0, r, 0, 0))
      or a direct norm2 ind_leq0 ball over the gradient rows
    * alpha preconditioner: Tau and the gradient-row Sigma constant (the
      conv-row Sigma plane may vary at the boundary)
    """
    import numpy as np

    from ..config import dtype

    if dtype() != jnp.float32:
        return None
    linop = problem.linop
    if not isinstance(linop, LinearOperator) or len(linop.blocks) != 2:
        return None
    conv = next((b for b in linop.blocks if isinstance(b, BlockConv2D)), None)
    grad = next((b for b in linop.blocks
                 if isinstance(b, BlockGradient2D)), None)
    if conv is None or grad is None:
        return None
    if conv.L != 1 or grad.L != 1 or grad.label_first:
        return None
    if conv.nx != grad.nx or conv.ny != grad.ny:
        return None
    nx, ny = conv.nx, conv.ny
    n = nx * ny
    m2 = conv.nx2 * conv.ny2
    if conv.row != 0 or conv.col != 0 or grad.row != m2 or grad.col != 0:
        return None
    taps = _kernel_taps(conv.kernel)
    if not taps or len(taps) > _MAX_TAPS:
        return None

    # --- primal prox: zero (the data term lives on the dual side) ----------
    if len(prox_g) != 1 or not isinstance(prox_g[0], ProxZero):
        return None

    # --- dual proxes by index ----------------------------------------------
    if len(prox_fstar) != 2:
        return None
    pv = next((p for p in prox_fstar if p.index == 0), None)
    pq = next((p for p in prox_fstar if p.index == m2), None)
    if pv is None or pq is None or pv.size != m2 or pq.size != 2 * n:
        return None

    if not isinstance(pv, ProxMoreau) or not isinstance(pv.child, ProxElem1D):
        return None
    sq = pv.child
    if sq.fun != "square":
        return None
    a, b, c, d, e, _, _ = sq.coeffs
    if not (np.isscalar(a) and a == 1.0 and np.isscalar(c) and c > 0.0):
        return None
    if not (np.isscalar(d) and d == 0.0 and np.isscalar(e) and e == 0.0):
        return None
    lmb = float(c)
    fb = jnp.asarray(
        np.broadcast_to(np.asarray(b, np.float32), (m2,))
    ).reshape(conv.nx2, conv.ny2)

    if isinstance(pq, ProxMoreau):
        inner = pq.child
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
        radius = float(ic)
    elif isinstance(pq, ProxElemNorm2) and pq.fun == "ind_leq0":
        if pq.dim != 2 or pq.interleaved:
            return None
        ia, ib, ic, idd, ie, _, _ = pq.coeffs
        for v in (ia, ib, ic):
            if not np.isscalar(v):
                return None
        if idd != 0.0 or ie != 0.0 or ia <= 0:
            return None
        radius = float(ib) / float(ia)
    else:
        return None

    # --- preconditioner: Tau and gradient-Sigma constant, conv-Sigma plane -
    sl = np.asarray(problem.scaling_left)
    sr = np.asarray(problem.scaling_right)
    if not np.allclose(sr, sr[0]):
        return None
    sg = sl[m2:]
    if not np.allclose(sg, sg[0]):
        return None
    # no VMEM gate here (structure matching only) — callers pick the
    # whole-plane, tiled (deblur_band_count), or halo-sharded kernel
    return {
        "nx": nx, "ny": ny, "nx2": conv.nx2, "ny2": conv.ny2,
        "taps": taps, "fb": fb,
        "sv": jnp.asarray(sl[:m2], jnp.float32).reshape(conv.nx2, conv.ny2),
        "lmb": lmb, "radius": radius,
        "sig_q": float(sg[0]), "tau_t": float(sr[0]),
    }


def _embed(plane, nx2, ny2):
    """Zero-pad an (a, b) or (2, a, b) array into the (nx2, ny2) geometry."""
    pad = [(0, nx2 - plane.shape[-2]), (0, ny2 - plane.shape[-1])]
    if plane.ndim == 3:
        pad = [(0, 0)] + pad
    return jnp.pad(plane, pad)


@partial(jax.jit,
         static_argnums=(3, 4, 5, 6, 7, 8, 9, 10, 11, 12, 13, 14),
         donate_argnums=(18,))
def _fused_deblur_run(problem, prox_g, prox_fstar, opts, nx, ny, nx2, ny2,
                      taps, sig_q, tau_t, lmb, n_bands, double_buffer,
                      interpret, tols, fb, sv, radius, state, until):
    """Phase structure identical to fused_rof._fused_rof_run: align ->
    single-kernel chunks (+ scalar adaptation via residual_and_adapt) ->
    K-product epilogue -> generic tail."""
    ri = max(int(opts.residual_iter), 1)
    n = nx * ny
    m2 = nx2 * ny2

    def generic(s: PDHGState) -> PDHGState:
        return pdhg_step(problem, prox_g, prox_fstar, opts, tols, s)

    def pack(xf, yf):
        return (_embed(xf.reshape(nx, ny), nx2, ny2),
                yf[:m2].reshape(nx2, ny2),
                _embed(yf[m2:].reshape(2, nx, ny), nx2, ny2))

    def fused_chunk(carry):
        # the chunk loop carries EMBEDDED planes (packed once, below) —
        # per-chunk pad/concat glue measured ~40% of the chunk time
        # (round 3, tools/deblur_e2e_probe.py); the kernel provably
        # preserves the padding at zero, so carrying planes is exact
        s, (x, yv, q, _xp, _yvp, _qp) = carry
        if n_bands == 1:
            x2, yv2, q2, xp, yvp, qp, norms2 = deblur_fused_chunk(
                x, yv, q, fb, sv, s.tau, s.sigma, s.theta, lmb, radius,
                ri, nx, ny, taps, sig_q, tau_t, interpret=interpret)
        elif deblur_banded_ok(nx2, n_bands):
            x2, yv2, q2, xp, yvp, qp, norms2 = deblur_fused_chunk_banded(
                x, yv, q, fb, sv, s.tau, s.sigma, s.theta, lmb, radius,
                ri, nx, ny, taps, sig_q, tau_t, n_bands,
                interpret=interpret, double_buffer=double_buffer)
        else:
            x2, yv2, q2, xp, yvp, qp, norms2 = deblur_fused_chunk_tiled(
                x, yv, q, fb, sv, s.tau, s.sigma, s.theta, lmb, radius,
                ri, nx, ny, taps, sig_q, tau_t, n_bands,
                interpret=interpret)
        norms = jnp.sqrt(norms2)
        s = residual_and_adapt(
            problem, opts, tols, s,
            norms[0], norms[1], norms[2], norms[3],
            s.iteration + ri - 1,
        )
        s = dataclasses.replace(s, iteration=s.iteration + ri)
        return (s, (x2, yv2, q2, xp, yvp, qp))

    align = 1 % ri

    def cond_a(s):
        return (s.iteration % ri != align) & (s.iteration < until) & ~s.converged

    state = lax.while_loop(cond_a, generic, state)

    def cond_b(carry):
        s = carry[0]
        return (s.iteration + ri <= until) & ~s.converged

    state, planes = lax.while_loop(
        cond_b, fused_chunk,
        (state, pack(state.x, state.y) + pack(state.x_prev, state.y_prev)))

    def unpack(xe, yve, qe):
        return (
            xe[:nx, :ny].reshape(-1),
            jnp.concatenate([yve.reshape(-1),
                             qe[:, :nx, :ny].reshape(-1)]),
        )

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
