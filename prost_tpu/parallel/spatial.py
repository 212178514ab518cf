"""Spatially-sharded PDHG: one big problem, pixel axis split over the mesh.

The long dimension of a prost problem is the flattened pixel(-label) vector
(SURVEY.md section 5).  Here the primal/dual state vectors carry named
shardings over the mesh's 'sp' axis and the jitted iteration runs under
XLA's SPMD partitioner: gradient stencils (implemented as shifted
subtractions) get their one-pixel halo exchanges inserted as
collective-permutes, residual norms become psums, and everything
elementwise (prox, step updates) stays local.  This is the
"annotate shardings, let XLA place collectives" design from the scaling
playbook — no hand-written communication.
"""

from __future__ import annotations

import jax
from jax.sharding import NamedSharding, PartitionSpec as P

from ..backend.pdhg import BackendPDHG


class ShardedPDHG(BackendPDHG):
    """BackendPDHG whose state vectors are sharded along the pixel axis.

    Same API as BackendPDHG; pass a Mesh and the name of the axis to shard
    over.  Works for any problem built from the block library — sharding
    propagates through slices/reshapes/concats; blocks with genuinely
    global coupling (dense, ind_range) gather as needed.
    """

    def __init__(self, problem, opts, solver_opts, mesh, axis_name: str = "sp"):
        super().__init__(problem, opts, solver_opts)
        self.mesh = mesh
        self.axis_name = axis_name

    def _shard(self, state):
        vec = NamedSharding(self.mesh, P(self.axis_name))
        rep = NamedSharding(self.mesh, P())
        return jax.tree.map(
            lambda leaf: jax.device_put(leaf, vec if leaf.ndim else rep),
            state,
        )

    def initial_state(self):
        return self._shard(super().initial_state())
