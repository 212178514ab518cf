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
        from ..ops.fused_rof import fits_vmem
        if not fits_vmem(self.shard_rows + 2 * self.halo, self.rof["ny"]):
            raise ProstError(
                "ShardedFusedROF: one halo-extended shard block exceeds the "
                "VMEM budget; use more shards (or FusedROFPDHG's row-band "
                "tiled kernel on one chip)."
            )

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
            self.mesh, self.axis_name, self.halo, self.interpret,
            tols, r["f"], r["w"], jnp.asarray(r["radius"], jnp.float32),
            state, jnp.asarray(until_iter, jnp.int32),
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
        if not ml_fits_vmem(self.shard_rows + 2 * self.halo, ny, L):
            raise ProstError(
                "ShardedFusedMultilabel: one halo-extended shard block "
                "exceeds the VMEM budget; use more shards."
            )

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
            self.mesh, self.axis_name, self.halo, self.interpret,
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
                   halo, nx, ri, interpret):
    """Per-shard multilabel chunk body (inside shard_map)."""
    from ..ops.fused_multilabel import ml_fused_chunk_halo

    rows = u_loc.shape[1]
    row_offset = lax.axis_index(axis) * rows - halo
    scal8 = jnp.concatenate([
        scal5,
        jnp.stack([
            row_offset.astype(scal5.dtype),
            jnp.asarray(halo, scal5.dtype),
            jnp.asarray(halo + rows, scal5.dtype),
        ]),
    ])
    ext = partial(_halo_extend, axis=axis, n_shards=n_shards, halo=halo)
    u2, q2, s2, up, qp, sp, norms2 = ml_fused_chunk_halo(
        ext(u_loc), ext(q_loc), ext(s_loc), ext(f_loc), scal8, ri, nx,
        interpret=interpret)
    own = slice(halo, halo + rows)
    return (u2[:, own], q2[:, own], s2[own],
            up[:, own], qp[:, own], sp[own],
            lax.psum(norms2, axis))


@partial(jax.jit, static_argnums=(3, 4, 5, 6, 7, 8, 9, 10),
         donate_argnums=(15,))
def _sharded_fused_ml_run(problem, prox_g, prox_fstar, opts, nx, ny, L,
                          mesh, axis, halo, interpret,
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
                   nx=nx, ri=ri, interpret=interpret)
    sharded_chunk = jax.shard_map(
        body, mesh=mesh,
        in_specs=(lspec, lspec, pspec, lspec, P()),
        out_specs=(lspec, lspec, pspec, lspec, lspec, pspec, P()),
        check_vma=False,
    )

    def generic(s: PDHGState) -> PDHGState:
        return pdhg_step(problem, prox_g, prox_fstar, opts, tols, s)

    def fused_chunk(s: PDHGState) -> PDHGState:
        u = s.x.reshape(L, nx, ny)
        q = s.y[:2 * nL].reshape(2 * L, nx, ny)
        sm = s.y[2 * nL:].reshape(nx, ny)
        scal5 = jnp.stack([
            s.tau, s.sigma, s.theta,
            radius.astype(s.tau.dtype), d_s.astype(s.tau.dtype),
        ])
        u2, q2, s2, up, qp, sp, norms2 = sharded_chunk(
            u, q, sm, f_planes, scal5)
        norms = jnp.sqrt(norms2)
        s = _dc.replace(
            s,
            x=u2.reshape(-1),
            y=jnp.concatenate([q2.reshape(-1), s2.reshape(-1)]),
            x_prev=up.reshape(-1),
            y_prev=jnp.concatenate([qp.reshape(-1), sp.reshape(-1)]),
        )
        s = residual_and_adapt(
            problem, opts, tols, s,
            norms[0], norms[1], norms[2], norms[3],
            s.iteration + ri - 1,
        )
        return _dc.replace(s, iteration=s.iteration + ri)

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


def _halo_chunk(x_loc, q_loc, f_loc, w_loc, scal5, *, axis, n_shards, halo,
                nx, ri, dataterm, interpret):
    """Per-shard chunk body (inside shard_map): halo exchange, fused kernel
    on the extended block, crop to owned rows, psum the norms."""
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


@partial(jax.jit, static_argnums=(3, 4, 5, 6, 7, 8, 9, 10, 11),
         donate_argnums=(15,))
def _sharded_fused_run(problem, prox_g, prox_fstar, opts, nx, ny, lmb,
                       dataterm, mesh, axis, halo, interpret,
                       tols, f_plane, w_plane, radius, state, until):
    """Same three-phase structure as fused_rof._fused_rof_run, with the
    chunk running under shard_map (halo exchange + owned-row norms +
    psum)."""
    ri = max(int(opts.residual_iter), 1)
    n_shards = mesh.shape[axis]

    plane = P(axis, None)
    qspec = P(None, axis, None)
    body = partial(_halo_chunk, axis=axis, n_shards=n_shards, halo=halo,
                   nx=nx, ri=ri, dataterm=dataterm, interpret=interpret)
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
