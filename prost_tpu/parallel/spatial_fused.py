"""Halo-exchange sharded fused PDHG: the Pallas chunk kernel under shard_map.

``ShardedPDHG`` (spatial.py) shards the generic XLA path and lets the SPMD
partitioner insert one collective-permute per stencil per iteration —
correct, but the chunk then communicates every iteration.  This module is
the hand-scheduled alternative for matched ROF/TV structures, the classic
stencil-halo design on the ICI torus:

* the pixel rows are partitioned over the mesh axis; each shard holds
  (nx/S, ny) blocks of x and q,
* before each residual_iter-sized chunk, neighbors exchange H = 2*ri + 2
  boundary rows via two ``lax.ppermute``s (one hop each way on the ring),
* each shard runs the SAME fused Pallas chunk kernel (ops/fused_rof.py)
  on its halo-extended block, recomputing the halo region redundantly —
  information propagates <= 2 rows/iteration (one K and one K^T apply),
  so owned rows are bit-identical to the unsharded kernel,
* stencil boundary masks use GLOBAL row indices (the Neumann boundary
  lives at global rows 0 / nx-1, not at shard edges), and the in-kernel
  residual norms cover only owned rows, so one 4-scalar ``psum`` per
  chunk reproduces the global norms exactly.

Communication per chunk: 2 ppermutes of 3*H rows + one psum of 4 scalars
— vs 2 collective-permutes per *iteration* for the auto-sharded path.
Step adaptation and stopping run on the psum'd scalars through the
generic ``residual_and_adapt`` on every shard (replicated, so tau/sigma
stay identical everywhere).
"""

from __future__ import annotations

import dataclasses
from functools import partial

import jax
import jax.numpy as jnp
from jax import lax
from jax.sharding import NamedSharding, PartitionSpec as P

from ..backend.pdhg import (BackendPDHG, PDHGState, pdhg_step,
                            residual_and_adapt)
from ..config import ProstError
from ..ops.fused_rof import match_rof_structure, rof_fused_chunk_halo


class ShardedFusedROF(BackendPDHG):
    """BackendPDHG for matched ROF/TV structures whose fused Pallas chunks
    run under shard_map with explicit halo exchange over ``axis_name``.

    Exact same iterate trajectory as FusedROFPDHG / the generic path
    (equivalence-tested); requires nx % n_shards == 0 and
    nx / n_shards >= 2 * residual_iter + 2 (the halo width).
    """

    def __init__(self, problem, opts, solver_opts, mesh,
                 axis_name: str = "sp", interpret: bool = False):
        super().__init__(problem, opts, solver_opts)
        _reject_reference_residuals(opts, "ShardedFusedROF")
        self.mesh = mesh
        self.axis_name = axis_name
        self.interpret = interpret
        self.rof = match_rof_structure(problem)
        if self.rof is None:
            raise ProstError(
                "ShardedFusedROF: problem does not match the fused ROF/TV "
                "structure; use ShardedPDHG for the generic sharded path."
            )
        self.n_shards = mesh.shape[axis_name]
        nx = self.rof["nx"]
        ri = max(int(opts.residual_iter), 1)
        self.halo = 2 * ri + 2
        if nx % self.n_shards:
            raise ProstError(
                f"ShardedFusedROF: nx={nx} not divisible by "
                f"{self.n_shards} shards."
            )
        self.shard_rows = nx // self.n_shards
        if self.shard_rows < self.halo:
            raise ProstError(
                f"ShardedFusedROF: shard height {self.shard_rows} < halo "
                f"{self.halo} (= 2*residual_iter + 2); lower residual_iter "
                "or use fewer shards."
            )
        from ..ops.fused_rof import fits_vmem, shard_band_count
        self.band_nb = None
        if not fits_vmem(self.shard_rows + 2 * self.halo, self.rof["ny"]):
            # shard block exceeds VMEM: band WITHIN the shard (the banded
            # kernel with shard-global row offsets) — banding composes
            # with sharding instead of falling back to the generic path
            nb = shard_band_count(self.shard_rows, self.rof["ny"], ri)
            if nb is None:
                raise ProstError(
                    "ShardedFusedROF: one halo-extended shard block exceeds "
                    "the VMEM budget and the shard rows admit no 8-aligned "
                    "band tiling; use a different shard count."
                )
            # band windows DMA at 8-row granularity: the exchanged halo
            # (= own_lo of the owned region) must be 8-aligned
            self.halo = -(-self.halo // 8) * 8
            self.band_nb = nb

    def _shard(self, state):
        vec = NamedSharding(self.mesh, P(self.axis_name))
        rep = NamedSharding(self.mesh, P())
        return jax.tree.map(
            lambda leaf: jax.device_put(leaf, vec if leaf.ndim else rep),
            state,
        )

    def initial_state(self) -> PDHGState:
        return self._shard(super().initial_state())

    def run(self, state: PDHGState, until_iter: int) -> PDHGState:
        sopts = self.solver_opts
        tols = (sopts.tol_rel_primal, sopts.tol_rel_dual,
                sopts.tol_abs_primal, sopts.tol_abs_dual)
        r = self.rof
        return _sharded_fused_run(
            self.problem, self.prox_g, self.prox_fstar, self.opts,
            r["nx"], r["ny"], r["lmb"], r["dataterm"],
            self.mesh, self.axis_name, self.halo, self.band_nb,
            self.interpret,
            tols, r["f"], r["w"], jnp.asarray(r["radius"], jnp.float32),
            state, jnp.asarray(until_iter, jnp.int32),
        )


def _reject_reference_residuals(opts, name):
    if getattr(opts, "reference_residuals", False):
        raise ProstError(
            f"{name}: the fused chunk kernels compute consistent-mode "
            "residual norms; reference_residuals=True requires the "
            "generic path (BackendPDHG / ShardedPDHG)."
        )


class ShardedFusedMultilabel(BackendPDHG):
    """Halo-sharded fused backend for the fast-multilabel structure
    (ops/fused_multilabel.py), the multilabel analog of ShardedFusedROF:
    pixel rows partitioned over ``axis_name``, one 2-ppermute halo
    exchange of (L + 2L + 1 + L) planes' boundary rows plus one 4-scalar
    psum per residual_iter chunk.  Exact same iterate trajectory as
    FusedROFPDHG's multilabel path (equivalence-tested)."""

    def __init__(self, problem, opts, solver_opts, mesh,
                 axis_name: str = "sp", interpret: bool = False):
        super().__init__(problem, opts, solver_opts)
        _reject_reference_residuals(opts, "ShardedFusedMultilabel")
        from ..ops.fused_multilabel import (match_multilabel_structure,
                                            ml_fits_vmem)

        self.mesh = mesh
        self.axis_name = axis_name
        self.interpret = interpret
        self.ml = match_multilabel_structure(problem)
        if self.ml is None:
            raise ProstError(
                "ShardedFusedMultilabel: problem does not match the fused "
                "fast-multilabel structure; use ShardedPDHG instead."
            )
        self.n_shards = mesh.shape[axis_name]
        nx, ny, L = self.ml["nx"], self.ml["ny"], self.ml["L"]
        ri = max(int(opts.residual_iter), 1)
        self.halo = 2 * ri + 2
        if nx % self.n_shards:
            raise ProstError(
                f"ShardedFusedMultilabel: nx={nx} not divisible by "
                f"{self.n_shards} shards."
            )
        self.shard_rows = nx // self.n_shards
        if self.shard_rows < self.halo:
            raise ProstError(
                f"ShardedFusedMultilabel: shard height {self.shard_rows} < "
                f"halo {self.halo}; lower residual_iter or use fewer shards."
            )
        self.band_nb = None
        if not ml_fits_vmem(self.shard_rows + 2 * self.halo, ny, L):
            # band within the shard (cf. ShardedFusedROF)
            from ..ops.fused_rof import shard_band_count

            nb = shard_band_count(self.shard_rows, ny, ri,
                                  n_planes=15 * L + 5)
            if nb is None:
                raise ProstError(
                    "ShardedFusedMultilabel: one halo-extended shard block "
                    "exceeds the VMEM budget and the shard rows admit no "
                    "8-aligned band tiling; use a different shard count."
                )
            self.halo = -(-self.halo // 8) * 8
            self.band_nb = nb

    def _shard(self, state):
        vec = NamedSharding(self.mesh, P(self.axis_name))
        rep = NamedSharding(self.mesh, P())
        return jax.tree.map(
            lambda leaf: jax.device_put(leaf, vec if leaf.ndim else rep),
            state,
        )

    def initial_state(self) -> PDHGState:
        return self._shard(super().initial_state())

    def run(self, state: PDHGState, until_iter: int) -> PDHGState:
        sopts = self.solver_opts
        tols = (sopts.tol_rel_primal, sopts.tol_rel_dual,
                sopts.tol_abs_primal, sopts.tol_abs_dual)
        m = self.ml
        return _sharded_fused_ml_run(
            self.problem, self.prox_g, self.prox_fstar, self.opts,
            m["nx"], m["ny"], m["L"],
            self.mesh, self.axis_name, self.halo, self.band_nb,
            self.interpret,
            tols, m["f"],
            jnp.asarray(m["radius"], jnp.float32),
            jnp.asarray(m["d_s"], jnp.float32),
            state, jnp.asarray(until_iter, jnp.int32),
        )


def _halo_extend(a, axis, n_shards, halo):
    """Exchange ``halo`` boundary rows (axis -2) with ring neighbors; edge
    shards receive zeros (ppermute semantics) which the kernels' global-row
    masks keep out of owned rows."""
    fwd = [(j, j + 1) for j in range(n_shards - 1)]
    bwd = [(j + 1, j) for j in range(n_shards - 1)]
    from_prev = lax.ppermute(a[..., -halo:, :], axis, fwd)
    from_next = lax.ppermute(a[..., :halo, :], axis, bwd)
    return jnp.concatenate([from_prev, a, from_next], axis=-2)


def _halo_chunk_ml(u_loc, q_loc, s_loc, f_loc, scal5, *, axis, n_shards,
                   halo, nx, ri, band_nb, interpret):
    """Per-shard multilabel chunk body (inside shard_map)."""
    from ..ops.fused_multilabel import (ml_fused_chunk_banded,
                                        ml_fused_chunk_halo)

    rows = u_loc.shape[1]
    row_offset = lax.axis_index(axis) * rows - halo
    ext = partial(_halo_extend, axis=axis, n_shards=n_shards, halo=halo)
    if band_nb is not None:
        u2, q2, s2, up, qp, sp, norms2 = ml_fused_chunk_banded(
            ext(u_loc), ext(q_loc), ext(s_loc), ext(f_loc),
            scal5[0], scal5[1], scal5[2], scal5[3], scal5[4], ri, band_nb,
            interpret=interpret, own_lo=halo, out_rows=rows, nx_global=nx,
            row_offset0=row_offset.astype(jnp.int32))
        return u2, q2, s2, up, qp, sp, lax.psum(norms2, axis)
    scal8 = jnp.concatenate([
        scal5,
        jnp.stack([
            row_offset.astype(scal5.dtype),
            jnp.asarray(halo, scal5.dtype),
            jnp.asarray(halo + rows, scal5.dtype),
        ]),
    ])
    u2, q2, s2, up, qp, sp, norms2 = ml_fused_chunk_halo(
        ext(u_loc), ext(q_loc), ext(s_loc), ext(f_loc), scal8, ri, nx,
        interpret=interpret)
    own = slice(halo, halo + rows)
    return (u2[:, own], q2[:, own], s2[own],
            up[:, own], qp[:, own], sp[own],
            lax.psum(norms2, axis))


@partial(jax.jit, static_argnums=(3, 4, 5, 6, 7, 8, 9, 10, 11),
         donate_argnums=(16,))
def _sharded_fused_ml_run(problem, prox_g, prox_fstar, opts, nx, ny, L,
                          mesh, axis, halo, band_nb, interpret,
                          tols, f_planes, radius, d_s, state, until):
    """Same three-phase structure as fused_multilabel._fused_ml_run, with
    the chunk under shard_map (halo exchange + owned-row norms + psum)."""
    import dataclasses as _dc

    ri = max(int(opts.residual_iter), 1)
    n_shards = mesh.shape[axis]
    n = nx * ny
    nL = n * L

    lspec = P(None, axis, None)
    pspec = P(axis, None)
    body = partial(_halo_chunk_ml, axis=axis, n_shards=n_shards, halo=halo,
                   nx=nx, ri=ri, band_nb=band_nb, interpret=interpret)
    sharded_chunk = jax.shard_map(
        body, mesh=mesh,
        in_specs=(lspec, lspec, pspec, lspec, P()),
        out_specs=(lspec, lspec, pspec, lspec, lspec, pspec, P()),
        check_vma=False,
    )

    def generic(s: PDHGState) -> PDHGState:
        return pdhg_step(problem, prox_g, prox_fstar, opts, tols, s)

    def pack(xf, yf):
        return (xf.reshape(L, nx, ny),
                yf[:2 * nL].reshape(2 * L, nx, ny),
                yf[2 * nL:].reshape(nx, ny))

    def fused_chunk(carry):
        # planes carried across chunks (packed once, below) — cf.
        # fused_multilabel._fused_ml_run
        s, (u, q, sm, _up, _qp, _sp) = carry
        scal5 = jnp.stack([
            s.tau, s.sigma, s.theta,
            radius.astype(s.tau.dtype), d_s.astype(s.tau.dtype),
        ])
        u2, q2, s2, up, qp, sp, norms2 = sharded_chunk(
            u, q, sm, f_planes, scal5)
        norms = jnp.sqrt(norms2)
        s = residual_and_adapt(
            problem, opts, tols, s,
            norms[0], norms[1], norms[2], norms[3],
            s.iteration + ri - 1,
        )
        s = _dc.replace(s, iteration=s.iteration + ri)
        return (s, (u2, q2, s2, up, qp, sp))

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


class ShardedFusedTight(BackendPDHG):
    """Halo-sharded fused backend for the tight multilabel relaxation
    (ops/fused_tight.py): pixel rows partitioned over ``axis_name``, one
    2-ppermute halo exchange of the (L + 2k + 2L + 2k + 1 + L) planes'
    boundary rows plus one 4-scalar psum per residual_iter chunk."""

    def __init__(self, problem, opts, solver_opts, mesh,
                 axis_name: str = "sp", interpret: bool = False):
        super().__init__(problem, opts, solver_opts)
        _reject_reference_residuals(opts, "ShardedFusedTight")
        from ..ops.fused_tight import match_tight_structure, tight_fits_vmem

        self.mesh = mesh
        self.axis_name = axis_name
        self.interpret = interpret
        self.tight = match_tight_structure(problem)
        if self.tight is None:
            raise ProstError(
                "ShardedFusedTight: problem does not match the fused "
                "tight-multilabel structure; use ShardedPDHG instead."
            )
        self.n_shards = mesh.shape[axis_name]
        t = self.tight
        nx, ny, L, k = t["nx"], t["ny"], t["L"], t["k"]
        ri = max(int(opts.residual_iter), 1)
        self.halo = 2 * ri + 2
        if nx % self.n_shards:
            raise ProstError(
                f"ShardedFusedTight: nx={nx} not divisible by "
                f"{self.n_shards} shards."
            )
        self.shard_rows = nx // self.n_shards
        if self.shard_rows < self.halo:
            raise ProstError(
                f"ShardedFusedTight: shard height {self.shard_rows} < halo "
                f"{self.halo}; lower residual_iter or use fewer shards."
            )
        self.band_nb = None
        if not tight_fits_vmem(self.shard_rows + 2 * self.halo, ny, L, k):
            # band within the shard (cf. ShardedFusedROF)
            from ..ops.fused_rof import shard_band_count

            nb = shard_band_count(self.shard_rows, ny, ri,
                                  n_planes=10 * L + 14 * k + 8)
            if nb is None:
                raise ProstError(
                    "ShardedFusedTight: one halo-extended shard block "
                    "exceeds the VMEM budget and the shard rows admit no "
                    "8-aligned band tiling; use a different shard count."
                )
            self.halo = -(-self.halo // 8) * 8
            self.band_nb = nb

    def _shard(self, state):
        vec = NamedSharding(self.mesh, P(self.axis_name))
        rep = NamedSharding(self.mesh, P())
        return jax.tree.map(
            lambda leaf: jax.device_put(leaf, vec if leaf.ndim else rep),
            state,
        )

    def initial_state(self) -> PDHGState:
        return self._shard(super().initial_state())

    def run(self, state: PDHGState, until_iter: int) -> PDHGState:
        sopts = self.solver_opts
        tols = (sopts.tol_rel_primal, sopts.tol_rel_dual,
                sopts.tol_abs_primal, sopts.tol_abs_dual)
        t = self.tight
        return _sharded_fused_tight_run(
            self.problem, self.prox_g, self.prox_fstar, self.opts,
            t["nx"], t["ny"], t["L"], t["k"], (t["taps"], t["consts"]),
            self.mesh, self.axis_name, self.halo, self.band_nb,
            self.interpret,
            tols, t["f"],
            (jnp.asarray(t["radius"], jnp.float32),
             jnp.asarray(t["d_s"], jnp.float32)),
            state, jnp.asarray(until_iter, jnp.int32),
        )


def _halo_chunk_tight(u, v, q, p, s, f, scal5, *, axis, n_shards, halo, nx,
                      ri, taps, consts, band_nb, interpret):
    """Per-shard tight chunk body (inside shard_map)."""
    from ..ops.fused_tight import (tight_fused_chunk_banded,
                                   tight_fused_chunk_halo)

    rows = u.shape[1]
    row_offset = lax.axis_index(axis) * rows - halo
    ext = partial(_halo_extend, axis=axis, n_shards=n_shards, halo=halo)
    if band_nb is not None:
        new, prev, norms2 = tight_fused_chunk_banded(
            ext(u), ext(v), ext(q), ext(p), ext(s), ext(f),
            scal5[0], scal5[1], scal5[2], scal5[3], scal5[4], ri,
            taps, consts, band_nb, interpret=interpret, own_lo=halo,
            out_rows=rows, nx_global=nx,
            row_offset0=row_offset.astype(jnp.int32))
        return tuple(new), tuple(prev), lax.psum(norms2, axis)
    scal8 = jnp.concatenate([
        scal5,
        jnp.stack([
            row_offset.astype(scal5.dtype),
            jnp.asarray(halo, scal5.dtype),
            jnp.asarray(halo + rows, scal5.dtype),
        ]),
    ])
    new, prev, norms2 = tight_fused_chunk_halo(
        ext(u), ext(v), ext(q), ext(p), ext(s), ext(f), scal8, ri, nx,
        taps, consts, interpret=interpret)
    own = slice(halo, halo + rows)

    def crop(a):
        return a[:, own] if a.ndim == 3 else a[own]

    return (tuple(crop(a) for a in new), tuple(crop(a) for a in prev),
            lax.psum(norms2, axis))


@partial(jax.jit, static_argnums=(3, 4, 5, 6, 7, 8, 9, 10, 11, 12, 13),
         donate_argnums=(17,))
def _sharded_fused_tight_run(problem, prox_g, prox_fstar, opts, nx, ny, L,
                             k, taps_consts, mesh, axis, halo, band_nb,
                             interpret,
                             tols, f_planes, scal_extra, state, until):
    """Same three-phase structure as fused_tight._fused_tight_run, with
    the chunk under shard_map."""
    taps, consts = taps_consts
    radius, d_s = scal_extra
    ri = max(int(opts.residual_iter), 1)
    n_shards = mesh.shape[axis]
    n = nx * ny
    nL = n * L
    nk2 = 2 * n * k

    lspec = P(None, axis, None)
    pspec = P(axis, None)
    body = partial(_halo_chunk_tight, axis=axis, n_shards=n_shards,
                   halo=halo, nx=nx, ri=ri, taps=taps, consts=consts,
                   band_nb=band_nb, interpret=interpret)
    state5 = (lspec, lspec, lspec, lspec, pspec)
    sharded_chunk = jax.shard_map(
        body, mesh=mesh,
        in_specs=state5 + (lspec, P()),
        out_specs=(state5, state5, P()),
        check_vma=False,
    )

    def generic(s: PDHGState) -> PDHGState:
        return pdhg_step(problem, prox_g, prox_fstar, opts, tols, s)

    def pack(xf, yf):
        return (xf[:nL].reshape(L, nx, ny),
                xf[nL:].reshape(2 * k, nx, ny),
                yf[: 2 * nL].reshape(2 * L, nx, ny),
                yf[2 * nL: 2 * nL + nk2].reshape(2 * k, nx, ny),
                yf[2 * nL + nk2:].reshape(nx, ny))

    def fused_chunk(carry):
        # planes carried across chunks (packed once, below) — cf.
        # fused_tight._fused_tight_run
        st, cur, _prev = carry
        u, v, q, p, sm = cur
        scal5 = jnp.stack([
            st.tau, st.sigma, st.theta,
            radius.astype(st.tau.dtype), d_s.astype(st.tau.dtype),
        ])
        new, prev, norms2 = sharded_chunk(u, v, q, p, sm, f_planes, scal5)
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


class ShardedFusedDeblur(BackendPDHG):
    """Halo-sharded fused backend for the TV-deblurring structure
    (ops/fused_deblur.py): the (nx2, ny2) full-conv rows partitioned over
    ``axis_name``.  The conv taps widen the halo to
    (2*ri + 2) * max(kx - 1, 1) rows (deblur_halo_rows), so prefer a
    small residual_iter when sharding blurry kernels."""

    def __init__(self, problem, opts, solver_opts, mesh,
                 axis_name: str = "sp", interpret: bool = False):
        super().__init__(problem, opts, solver_opts)
        _reject_reference_residuals(opts, "ShardedFusedDeblur")
        from ..ops.fused_deblur import (deblur_fits_vmem, deblur_halo_rows,
                                        match_deblur_structure)

        self.mesh = mesh
        self.axis_name = axis_name
        self.interpret = interpret
        self.deblur = match_deblur_structure(problem, self.prox_g,
                                             self.prox_fstar)
        if self.deblur is None:
            raise ProstError(
                "ShardedFusedDeblur: problem does not match the fused "
                "deblurring structure; use ShardedPDHG instead."
            )
        self.n_shards = mesh.shape[axis_name]
        d = self.deblur
        ri = max(int(opts.residual_iter), 1)
        self.halo = deblur_halo_rows(ri, d["taps"])
        if d["nx2"] % self.n_shards:
            raise ProstError(
                f"ShardedFusedDeblur: nx2={d['nx2']} not divisible by "
                f"{self.n_shards} shards."
            )
        self.shard_rows = d["nx2"] // self.n_shards
        if self.shard_rows < self.halo:
            raise ProstError(
                f"ShardedFusedDeblur: shard height {self.shard_rows} < halo "
                f"{self.halo} (= (2*residual_iter + 2) * conv row reach); "
                "lower residual_iter or use fewer shards."
            )
        self.band_nb = None
        if not deblur_fits_vmem(self.shard_rows + 2 * self.halo, d["ny2"]):
            # band within the shard (cf. ShardedFusedROF); the band halo
            # carries the conv row reach, so shard_band_count gets the
            # 8-rounded deblur halo explicitly
            from ..ops.fused_rof import shard_band_count

            halo8 = -(-self.halo // 8) * 8
            nb = shard_band_count(self.shard_rows, d["ny2"], ri,
                                  n_planes=18, halo_rows=halo8)
            if nb is None:
                raise ProstError(
                    "ShardedFusedDeblur: one halo-extended shard block "
                    "exceeds the VMEM budget and the shard rows admit no "
                    "8-aligned band tiling; use a different shard count "
                    "or lower residual_iter."
                )
            self.halo = halo8
            self.band_nb = nb

    def _shard(self, state):
        vec = NamedSharding(self.mesh, P(self.axis_name))
        rep = NamedSharding(self.mesh, P())
        return jax.tree.map(
            lambda leaf: jax.device_put(leaf, vec if leaf.ndim else rep),
            state,
        )

    def initial_state(self) -> PDHGState:
        return self._shard(super().initial_state())

    def run(self, state: PDHGState, until_iter: int) -> PDHGState:
        sopts = self.solver_opts
        tols = (sopts.tol_rel_primal, sopts.tol_rel_dual,
                sopts.tol_abs_primal, sopts.tol_abs_dual)
        d = self.deblur
        return _sharded_fused_deblur_run(
            self.problem, self.prox_g, self.prox_fstar, self.opts,
            d["nx"], d["ny"], d["nx2"], d["ny2"], d["taps"],
            d["sig_q"], d["tau_t"], d["lmb"],
            self.mesh, self.axis_name, self.halo, self.band_nb,
            self.interpret,
            tols, d["fb"], d["sv"],
            jnp.asarray(d["radius"], jnp.float32),
            state, jnp.asarray(until_iter, jnp.int32),
        )


def _halo_chunk_deblur(x, yv, q, fb, sv, scal5, *, axis, n_shards, halo,
                       nx, ny, ri, taps, sig_q, tau_t, band_nb, interpret):
    """Per-shard deblur chunk body (inside shard_map)."""
    from ..ops.fused_deblur import (deblur_fused_chunk_banded,
                                    deblur_fused_chunk_halo)

    rows = x.shape[0]
    row_offset = lax.axis_index(axis) * rows - halo
    ext = partial(_halo_extend, axis=axis, n_shards=n_shards, halo=halo)
    if band_nb is not None:
        x2, yv2, q2, xp, yvp, qp, norms2 = deblur_fused_chunk_banded(
            ext(x), ext(yv), ext(q), ext(fb), ext(sv),
            scal5[0], scal5[1], scal5[2], scal5[3], scal5[4], ri, nx, ny,
            taps, sig_q, tau_t, band_nb, interpret=interpret, own_lo=halo,
            out_rows=rows, row_offset0=row_offset.astype(jnp.int32))
        return x2, yv2, q2, xp, yvp, qp, lax.psum(norms2, axis)
    scal8 = jnp.concatenate([
        scal5,
        jnp.stack([
            row_offset.astype(scal5.dtype),
            jnp.asarray(halo, scal5.dtype),
            jnp.asarray(halo + rows, scal5.dtype),
        ]),
    ])
    x2, yv2, q2, xp, yvp, qp, norms2 = deblur_fused_chunk_halo(
        ext(x), ext(yv), ext(q), ext(fb), ext(sv), scal8, ri, nx, ny,
        taps, sig_q, tau_t, interpret=interpret)
    own = slice(halo, halo + rows)
    return (x2[own], yv2[own], q2[:, own], xp[own], yvp[own], qp[:, own],
            lax.psum(norms2, axis))


@partial(jax.jit, static_argnums=(3, 4, 5, 6, 7, 8, 9, 10, 11, 12, 13, 14,
                                  15, 16),
         donate_argnums=(20,))
def _sharded_fused_deblur_run(problem, prox_g, prox_fstar, opts, nx, ny,
                              nx2, ny2, taps, sig_q, tau_t, lmb,
                              mesh, axis, halo, band_nb, interpret,
                              tols, fb, sv, radius, state, until):
    """Same three-phase structure as fused_deblur._fused_deblur_run, with
    the chunk under shard_map."""
    from ..ops.fused_deblur import _embed

    ri = max(int(opts.residual_iter), 1)
    n_shards = mesh.shape[axis]
    n = nx * ny
    m2 = nx2 * ny2

    pspec = P(axis, None)
    qspec = P(None, axis, None)
    body = partial(_halo_chunk_deblur, axis=axis, n_shards=n_shards,
                   halo=halo, nx=nx, ny=ny, ri=ri, taps=taps, sig_q=sig_q,
                   tau_t=tau_t, band_nb=band_nb, interpret=interpret)
    sharded_chunk = jax.shard_map(
        body, mesh=mesh,
        in_specs=(pspec, pspec, qspec, pspec, pspec, P()),
        out_specs=(pspec, pspec, qspec, pspec, pspec, qspec, P()),
        check_vma=False,
    )

    def generic(s: PDHGState) -> PDHGState:
        return pdhg_step(problem, prox_g, prox_fstar, opts, tols, s)

    def pack(xf, yf):
        return (_embed(xf.reshape(nx, ny), nx2, ny2),
                yf[:m2].reshape(nx2, ny2),
                _embed(yf[m2:].reshape(2, nx, ny), nx2, ny2))

    def fused_chunk(carry):
        # embedded planes carried across chunks (packed once, below) —
        # cf. fused_deblur._fused_deblur_run
        s, (x, yv, q, _xp, _yvp, _qp) = carry
        scal5 = jnp.stack([
            s.tau, s.sigma, s.theta,
            jnp.asarray(lmb, s.tau.dtype), radius.astype(s.tau.dtype),
        ])
        x2, yv2, q2, xp, yvp, qp, norms2 = sharded_chunk(
            x, yv, q, fb, sv, scal5)
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


def _halo_chunk(x_loc, q_loc, f_loc, w_loc, scal5, *, axis, n_shards, halo,
                nx, ri, band_nb, dataterm, interpret):
    """Per-shard chunk body (inside shard_map): halo exchange, fused kernel
    on the extended block, crop to owned rows, psum the norms.  When the
    extended block exceeds VMEM (``band_nb``), the shard runs the BANDED
    kernel with shard-global row offsets instead — outputs arrive already
    cropped to owned rows."""
    fwd = [(j, j + 1) for j in range(n_shards - 1)]
    bwd = [(j + 1, j) for j in range(n_shards - 1)]

    def extend(a):
        # previous shard's bottom rows -> my top halo; next's top -> bottom.
        # Edge shards receive zeros (ppermute semantics); the kernel's
        # global-row masks keep that garbage out of owned rows.
        from_prev = lax.ppermute(a[..., -halo:, :], axis, fwd)
        from_next = lax.ppermute(a[..., :halo, :], axis, bwd)
        return jnp.concatenate([from_prev, a, from_next], axis=-2)

    rows = x_loc.shape[0]
    row_offset = lax.axis_index(axis) * rows - halo
    if band_nb is not None:
        from ..ops.fused_rof import rof_fused_chunk_banded

        x2, q2, xp, qp, norms2 = rof_fused_chunk_banded(
            extend(x_loc), extend(q_loc), extend(f_loc), extend(w_loc),
            scal5[0], scal5[1], scal5[2], scal5[3], scal5[4], ri, band_nb,
            dataterm=dataterm, interpret=interpret, own_lo=halo,
            out_rows=rows, nx_global=nx,
            row_offset0=row_offset.astype(jnp.int32))
        return x2, q2, xp, qp, lax.psum(norms2, axis)
    scal8 = jnp.concatenate([
        scal5,
        jnp.stack([
            row_offset.astype(scal5.dtype),
            jnp.asarray(halo, scal5.dtype),
            jnp.asarray(halo + rows, scal5.dtype),
        ]),
    ])
    x2, q2, xp, qp, norms2 = rof_fused_chunk_halo(
        extend(x_loc), extend(q_loc), extend(f_loc), extend(w_loc),
        scal8, ri, nx, dataterm=dataterm, interpret=interpret)
    own = slice(halo, halo + rows)
    return (x2[own], q2[:, own], xp[own], qp[:, own],
            lax.psum(norms2, axis))


@partial(jax.jit, static_argnums=(3, 4, 5, 6, 7, 8, 9, 10, 11, 12),
         donate_argnums=(16,))
def _sharded_fused_run(problem, prox_g, prox_fstar, opts, nx, ny, lmb,
                       dataterm, mesh, axis, halo, band_nb, interpret,
                       tols, f_plane, w_plane, radius, state, until):
    """Same three-phase structure as fused_rof._fused_rof_run, with the
    chunk running under shard_map (halo exchange + owned-row norms +
    psum)."""
    ri = max(int(opts.residual_iter), 1)
    n_shards = mesh.shape[axis]

    plane = P(axis, None)
    qspec = P(None, axis, None)
    body = partial(_halo_chunk, axis=axis, n_shards=n_shards, halo=halo,
                   nx=nx, ri=ri, band_nb=band_nb, dataterm=dataterm,
                   interpret=interpret)
    # check_vma=False: pallas_call's out_shape carries no varying-mesh-axes
    # annotation, which the vma checker requires
    sharded_chunk = jax.shard_map(
        body, mesh=mesh,
        in_specs=(plane, qspec, plane, plane, P()),
        out_specs=(plane, qspec, plane, qspec, P()),
        check_vma=False,
    )

    def generic(s: PDHGState) -> PDHGState:
        return pdhg_step(problem, prox_g, prox_fstar, opts, tols, s)

    def fused_chunk(s: PDHGState) -> PDHGState:
        x = s.x.reshape(nx, ny)
        q = s.y.reshape(2, nx, ny)
        scal5 = jnp.stack([
            s.tau, s.sigma, s.theta,
            jnp.asarray(lmb, s.tau.dtype), radius.astype(s.tau.dtype),
        ])
        x2, q2, xp, qp, norms2 = sharded_chunk(x, q, f_plane, w_plane, scal5)
        norms = jnp.sqrt(norms2)
        s = dataclasses.replace(
            s,
            x=x2.reshape(-1), y=q2.reshape(-1),
            x_prev=xp.reshape(-1), y_prev=qp.reshape(-1),
        )
        s = residual_and_adapt(
            problem, opts, tols, s,
            norms[0], norms[1], norms[2], norms[3],
            s.iteration + ri - 1,
        )
        return dataclasses.replace(s, iteration=s.iteration + ri)

    align = 1 % ri

    def cond_a(s):
        return (s.iteration % ri != align) & (s.iteration < until) & ~s.converged

    state = lax.while_loop(cond_a, generic, state)

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


class ShardedFusedADMM:
    """Halo-exchange sharded fused ADMM for matched ROF/TV structures:
    pixel rows partitioned over ``axis_name``, ONE outer iteration per
    exchange (the Chebyshev projection's information reach is
    2*degree + 4 rows), each shard running the banded Chebyshev-ADMM
    kernel on its halo-extended block (ops/fused_admm.py) with
    shard-global row offsets.

    CGLS cannot be hand-sharded this way — every CG step takes two GLOBAL
    dot products (a psum per step; that is what the auto-sharded generic
    path would do).  The Chebyshev projection has no reductions, so the
    ONLY communication is the per-iteration 10-plane halo exchange plus a
    4-scalar psum at residual iterations.  Generic align/tail phases run
    the plan-based generic Chebyshev projection under XLA's auto-SPMD.
    """

    def __init__(self, problem, opts, solver_opts, mesh,
                 axis_name: str = "sp", interpret: bool = False):
        import dataclasses as _dc

        from ..backend.admm import BackendADMM, dct_projection_plan
        from ..ops.fused_admm import admm_cheby_halo_rows
        from ..ops.fused_rof import match_rof_structure, shard_band_count

        if opts.projection not in ("auto", "cheby"):
            raise ProstError(
                "ShardedFusedADMM: requires projection='auto' or 'cheby' "
                "(CGLS needs global reductions every CG step; use the "
                "generic BackendADMM under jit sharding for that)."
            )
        self._backend = BackendADMM(
            problem, _dc.replace(opts, projection="cheby"), solver_opts)
        self.problem = problem
        self.opts = self._backend.opts
        self.solver_opts = solver_opts
        self.run_plan = dct_projection_plan(problem)
        self.mesh = mesh
        self.axis_name = axis_name
        self.interpret = interpret
        self.rof = match_rof_structure(problem)
        if self.rof is None:
            raise ProstError(
                "ShardedFusedADMM: problem does not match the fused ROF/TV "
                "structure."
            )
        self.n_shards = mesh.shape[axis_name]
        nx, ny = self.rof["nx"], self.rof["ny"]
        self.halo = admm_cheby_halo_rows(self.opts.cheby_degree)
        if nx % self.n_shards:
            raise ProstError(
                f"ShardedFusedADMM: nx={nx} not divisible by "
                f"{self.n_shards} shards."
            )
        self.shard_rows = nx // self.n_shards
        if self.shard_rows % 8 or self.shard_rows < self.halo:
            raise ProstError(
                f"ShardedFusedADMM: shard height {self.shard_rows} must be "
                f"an 8-multiple >= the Chebyshev halo {self.halo}."
            )
        nb = shard_band_count(self.shard_rows, ny,
                              self.opts.residual_iter, n_planes=24,
                              halo_rows=self.halo)
        if nb is None:
            raise ProstError(
                "ShardedFusedADMM: shard rows admit no 8-aligned band "
                "tiling under the VMEM budget; change the shard count."
            )
        self.band_nb = nb

    def _shard(self, state):
        vec = NamedSharding(self.mesh, P(self.axis_name))
        rep = NamedSharding(self.mesh, P())
        return jax.tree.map(
            lambda leaf: jax.device_put(leaf, vec if leaf.ndim else rep),
            state,
        )

    def initial_state(self):
        return self._shard(self._backend.initial_state())

    def current_solution(self, state):
        return self._backend.current_solution(state)

    def run(self, state, until_iter: int):
        sopts = self.solver_opts
        tols = (sopts.tol_rel_primal, sopts.tol_rel_dual,
                sopts.tol_abs_primal, sopts.tol_abs_dual)
        r = self.rof
        return _sharded_admm_run(
            self.problem, self._backend.prox_g, self._backend.prox_f,
            self.opts, self.run_plan, r["nx"], r["ny"], r["lmb"],
            r["dataterm"], self.mesh, self.axis_name, self.halo,
            self.band_nb, self.interpret,
            tols, r["f"], r["w"], jnp.asarray(r["radius"], jnp.float32),
            state, jnp.asarray(until_iter, jnp.int32),
        )


def _admm_halo_iter(xh, xp, xd, zh, zp, zd, warm, f_ext, w_ext, rho, lmb,
                    radius, *, axis, n_shards, halo, nx, band_nb, degree,
                    alpha, dataterm, interpret, with_norms):
    """One sharded Chebyshev-ADMM outer iteration (inside shard_map):
    exchange state halos, run the banded kernel on the extended block
    with shard-global offsets, return owned rows (+ psum'd norms).

    z_proj is NOT exchanged (round 4): the kernel never reads its input
    z_proj (z_proj == grad(x_proj) invariantly; `_admm_iter` only emits
    the fresh value), so its halo rows are dead — zero-padding locally
    saves 2 of the 10 exchanged planes (20% of the per-iteration
    communication volume, pinned by
    tests/test_spatial_fused.py::test_sharded_admm_comm_volume_per_iteration)."""
    from ..ops.fused_admm import admm_banded_iter

    rows = xh.shape[0]
    row_offset = lax.axis_index(axis) * rows - halo
    ext = partial(_halo_extend, axis=axis, n_shards=n_shards, halo=halo)
    zp_ext = jnp.pad(zp, ((0, 0), (halo, halo), (0, 0)))
    outs = admm_banded_iter(
        ext(xh), ext(xp), ext(xd), ext(zh), zp_ext, ext(zd), ext(warm),
        f_ext, w_ext, rho, lmb, radius, band_nb, degree, alpha,
        dataterm=dataterm, interpret=interpret, with_norms=with_norms,
        own_lo=halo, out_rows=rows, nx_global=nx,
        row_offset0=row_offset.astype(jnp.int32))
    norms2 = lax.psum(outs[7], axis) if with_norms else outs[7]
    return outs[:7] + (norms2,)


@partial(jax.jit, static_argnums=(3, 4, 5, 6, 7, 8, 9, 10, 11, 12, 13),
         donate_argnums=(18,))
def _sharded_admm_run(problem, prox_g, prox_f, opts, plan, nx, ny, lmb,
                      dataterm, mesh, axis, halo, band_nb, interpret,
                      tols, f_plane, w_plane, radius, state, until):
    """Phase structure identical to fused_admm._fused_admm_banded_run,
    with each banded iteration under shard_map (per-iteration halo
    exchange; constant f/w halo-extended once outside the loop)."""
    import dataclasses as _dc

    from ..backend.admm import ADMMState, admm_residual_adapt, admm_step

    ri = max(int(opts.residual_iter), 1)
    degree = int(opts.cheby_degree)
    n_shards = mesh.shape[axis]

    pspec = P(axis, None)
    zspec = P(None, axis, None)
    espec = P(axis, None)  # pre-extended f/w: rows axis still sharded

    # constant data planes: exchange their halos ONCE
    ext_const = jax.shard_map(
        lambda a: _halo_extend(a, axis=axis, n_shards=n_shards, halo=halo),
        mesh=mesh, in_specs=(pspec,), out_specs=espec, check_vma=False)
    f_ext = ext_const(f_plane)
    w_ext = ext_const(w_plane) if dataterm == "wsquare" else f_ext

    def make_chunk(with_norms):
        body = partial(
            _admm_halo_iter, axis=axis, n_shards=n_shards, halo=halo,
            nx=nx, band_nb=band_nb, degree=degree, alpha=opts.alpha,
            dataterm=dataterm, interpret=interpret, with_norms=with_norms)
        return jax.shard_map(
            body, mesh=mesh,
            in_specs=(pspec, pspec, pspec, zspec, zspec, zspec, pspec,
                      espec, espec, P(), P(), P()),
            out_specs=(pspec, pspec, pspec, zspec, zspec, zspec, pspec,
                       P()),
            check_vma=False,
        )

    chunk_plain = make_chunk(False)
    chunk_norms = make_chunk(True)

    lmb_t = jnp.asarray(lmb, jnp.float32)

    def sharded_iter(s: ADMMState, with_norms: bool):
        call = chunk_norms if with_norms else chunk_plain
        outs = call(
            s.x_half.reshape(nx, ny), s.x_proj.reshape(nx, ny),
            s.x_dual.reshape(nx, ny), s.z_half.reshape(2, nx, ny),
            s.z_proj.reshape(2, nx, ny), s.z_dual.reshape(2, nx, ny),
            s.cg_warm.reshape(nx, ny), f_ext, w_ext,
            s.rho, lmb_t, radius)
        xh, xp, xd, zh, zp, zd, warm, norms2 = outs
        s = _dc.replace(
            s,
            x_half=xh.reshape(-1), x_proj=xp.reshape(-1),
            x_dual=xd.reshape(-1),
            z_half=zh.reshape(-1), z_proj=zp.reshape(-1),
            z_dual=zd.reshape(-1), cg_warm=warm.reshape(-1),
            iteration=s.iteration + 1,
        )
        return s, norms2

    def generic(s: ADMMState) -> ADMMState:
        return admm_step(problem, prox_g, prox_f, opts, tols, s,
                         proj_plan=plan)

    def fused_chunk(s: ADMMState) -> ADMMState:
        def body(_, q):
            return sharded_iter(q, False)[0]

        s = lax.fori_loop(0, ri - 1, body, s)
        s, norms2 = sharded_iter(s, True)
        norms = jnp.sqrt(norms2)
        return admm_residual_adapt(
            problem, opts, tols, s, norms[0], norms[1], norms[2], norms[3])

    def cond_a(s):
        return (s.iteration % ri != 0) & (s.iteration < until) & ~s.converged

    state = lax.while_loop(cond_a, generic, state)

    def cond_b(s):
        return (s.iteration + ri <= until) & ~s.converged

    state = lax.while_loop(cond_b, fused_chunk, state)

    def cond_c(s):
        return (s.iteration < until) & ~s.converged

    return lax.while_loop(cond_c, generic, state)


class ShardedFusedVol(BackendPDHG):
    """Halo-sharded fused backend for the volumetric-TV structure
    (ops/fused_vol.py), the gradient3d analog of ShardedFusedROF: the nx
    axis of the (L, nx, ny) volume partitioned over ``axis_name`` (the
    z/label axis L is small and stays VMEM-resident per shard), one
    2-ppermute halo exchange of (L + 3L + L [+L]) planes' boundary rows
    plus one 4-scalar psum per residual_iter chunk.  Exact same iterate
    trajectory as FusedROFPDHG's vol path (equivalence-tested).
    Reference bar: block_gradient3d.cu:153-174 treats the operator as
    first-class at any size."""

    def __init__(self, problem, opts, solver_opts, mesh,
                 axis_name: str = "sp", interpret: bool = False):
        super().__init__(problem, opts, solver_opts)
        _reject_reference_residuals(opts, "ShardedFusedVol")
        from ..ops.fused_vol import match_vol_structure, vol_fits_vmem

        self.mesh = mesh
        self.axis_name = axis_name
        self.interpret = interpret
        self.vol = match_vol_structure(problem)
        if self.vol is None:
            raise ProstError(
                "ShardedFusedVol: problem does not match the fused "
                "volumetric-TV structure; use ShardedPDHG instead."
            )
        self.n_shards = mesh.shape[axis_name]
        L, nx, ny = self.vol["L"], self.vol["nx"], self.vol["ny"]
        ri = max(int(opts.residual_iter), 1)
        self.halo = 2 * ri + 2
        if nx % self.n_shards:
            raise ProstError(
                f"ShardedFusedVol: nx={nx} not divisible by "
                f"{self.n_shards} shards."
            )
        self.shard_rows = nx // self.n_shards
        if self.shard_rows < self.halo:
            raise ProstError(
                f"ShardedFusedVol: shard height {self.shard_rows} < halo "
                f"{self.halo}; lower residual_iter or use fewer shards."
            )
        self.band_nb = None
        if not vol_fits_vmem(L, self.shard_rows + 2 * self.halo, ny):
            # band within the shard (cf. ShardedFusedROF)
            from ..ops.fused_rof import shard_band_count

            nb = shard_band_count(self.shard_rows, ny, ri,
                                  n_planes=22 * L)
            if nb is None:
                raise ProstError(
                    "ShardedFusedVol: one halo-extended shard block "
                    "exceeds the VMEM budget and the shard rows admit no "
                    "8-aligned band tiling; use a different shard count."
                )
            self.halo = -(-self.halo // 8) * 8
            self.band_nb = nb

    def _shard(self, state):
        vec = NamedSharding(self.mesh, P(self.axis_name))
        rep = NamedSharding(self.mesh, P())
        return jax.tree.map(
            lambda leaf: jax.device_put(leaf, vec if leaf.ndim else rep),
            state,
        )

    def initial_state(self) -> PDHGState:
        return self._shard(super().initial_state())

    def run(self, state: PDHGState, until_iter: int) -> PDHGState:
        sopts = self.solver_opts
        tols = (sopts.tol_rel_primal, sopts.tol_rel_dual,
                sopts.tol_abs_primal, sopts.tol_abs_dual)
        v = self.vol
        return _sharded_fused_vol_run(
            self.problem, self.prox_g, self.prox_fstar, self.opts,
            v["L"], v["nx"], v["ny"], v["lmb"], v["dataterm"],
            self.mesh, self.axis_name, self.halo, self.band_nb,
            self.interpret,
            tols, v["f"], v["w"], jnp.asarray(v["radius"], jnp.float32),
            state, jnp.asarray(until_iter, jnp.int32),
        )


def _halo_chunk_vol(u_loc, q_loc, f_loc, w_loc, scal5, *, axis, n_shards,
                    halo, nx, ri, band_nb, dataterm, interpret):
    """Per-shard volumetric chunk body (inside shard_map)."""
    from ..ops.fused_vol import vol_fused_chunk_banded, vol_fused_chunk_halo

    rows = u_loc.shape[1]
    row_offset = lax.axis_index(axis) * rows - halo
    ext = partial(_halo_extend, axis=axis, n_shards=n_shards, halo=halo)
    if band_nb is not None:
        u2, q2, up, qp, norms2 = vol_fused_chunk_banded(
            ext(u_loc), ext(q_loc), ext(f_loc), ext(w_loc),
            scal5[0], scal5[1], scal5[2], scal5[3], scal5[4], ri, band_nb,
            dataterm=dataterm, interpret=interpret, own_lo=halo,
            out_rows=rows, nx_global=nx,
            row_offset0=row_offset.astype(jnp.int32))
        return u2, q2, up, qp, lax.psum(norms2, axis)
    scal8 = jnp.concatenate([
        scal5,
        jnp.stack([
            row_offset.astype(scal5.dtype),
            jnp.asarray(halo, scal5.dtype),
            jnp.asarray(halo + rows, scal5.dtype),
        ]),
    ])
    u2, q2, up, qp, norms2 = vol_fused_chunk_halo(
        ext(u_loc), ext(q_loc), ext(f_loc), ext(w_loc), scal8, ri, nx,
        dataterm=dataterm, interpret=interpret)
    own = slice(halo, halo + rows)
    return (u2[:, own], q2[:, :, own], up[:, own], qp[:, :, own],
            lax.psum(norms2, axis))


@partial(jax.jit, static_argnums=(3, 4, 5, 6, 7, 8, 9, 10, 11, 12, 13),
         donate_argnums=(18,))
def _sharded_fused_vol_run(problem, prox_g, prox_fstar, opts, L, nx, ny,
                           lmb, dataterm, mesh, axis, halo, band_nb,
                           interpret, tols, f_vol, w_vol, radius, state,
                           until):
    """Same three-phase structure as fused_vol._fused_vol_run, with the
    chunk under shard_map (halo exchange + owned-row norms + psum)."""
    import dataclasses as _dc

    ri = max(int(opts.residual_iter), 1)
    n_shards = mesh.shape[axis]

    uspec = P(None, axis, None)
    qspec = P(None, None, axis, None)
    body = partial(_halo_chunk_vol, axis=axis, n_shards=n_shards,
                   halo=halo, nx=nx, ri=ri, band_nb=band_nb,
                   dataterm=dataterm, interpret=interpret)
    sharded_chunk = jax.shard_map(
        body, mesh=mesh,
        in_specs=(uspec, qspec, uspec, uspec, P()),
        out_specs=(uspec, qspec, uspec, qspec, P()),
        check_vma=False,
    )

    def generic(s: PDHGState) -> PDHGState:
        return pdhg_step(problem, prox_g, prox_fstar, opts, tols, s)

    def fused_chunk(carry):
        # planes carried across chunks (packed once, below)
        s, (u, q, _up, _qp) = carry
        scal5 = jnp.stack([
            s.tau, s.sigma, s.theta,
            jnp.asarray(lmb, s.tau.dtype), radius.astype(s.tau.dtype),
        ])
        u2, q2, up, qp, norms2 = sharded_chunk(u, q, f_vol, w_vol, scal5)
        norms = jnp.sqrt(norms2)
        s = residual_and_adapt(
            problem, opts, tols, s,
            norms[0], norms[1], norms[2], norms[3],
            s.iteration + ri - 1,
        )
        s = _dc.replace(s, iteration=s.iteration + ri)
        return (s, (u2, q2, up, qp))

    align = 1 % ri

    def cond_a(s):
        return (s.iteration % ri != align) & (s.iteration < until) & ~s.converged

    state = lax.while_loop(cond_a, generic, state)

    def cond_b(carry):
        s = carry[0]
        return (s.iteration + ri <= until) & ~s.converged

    state, planes = lax.while_loop(
        cond_b, fused_chunk,
        (state, (state.x.reshape(L, nx, ny),
                 state.y.reshape(3, L, nx, ny),
                 state.x_prev.reshape(L, nx, ny),
                 state.y_prev.reshape(3, L, nx, ny))))

    state = dataclasses.replace(
        state,
        x=planes[0].reshape(-1), y=planes[1].reshape(-1),
        x_prev=planes[2].reshape(-1), y_prev=planes[3].reshape(-1),
    )
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
