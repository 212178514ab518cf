"""Higher-order prox combinators: Moreau conjugation, affine transform,
permutation.

These mirror prox_moreau.cu / prox_transform.cu / prox_permute.cu but are
plain function composition on pure prox callables — no scratch buffers, and
XLA fuses the pre/post scaling into the inner prox arithmetic.
"""

from __future__ import annotations

import jax.numpy as jnp

from ..common import pytree_dataclass, static_field
from ..config import ProstError
from .base import Prox


@pytree_dataclass
class ProxMoreau(Prox):
    """prox of f* via Moreau's identity:

        prox_{tau f*}(u) = u - tau . prox_{f / tau}(u / tau)

    with diagonal tau = tau_scal * tau_diag.  The inner prox is called with
    the *same* (tau_diag, tau_scal) but invert_tau flipped, on the prescaled
    argument (prox_moreau.cu:30-44, 118-133).
    """

    index: int = static_field()
    size: int = static_field()
    child: Prox = None

    @property
    def diagsteps(self) -> bool:
        return self.child.diagsteps

    def get_separable_structure(self):
        return self.child.get_separable_structure()

    def average_precond(self, seg):
        return self.child.average_precond(seg)

    def eval_local(self, arg, tau_diag, tau_scal, invert_tau):
        tau = tau_scal * tau_diag
        scaled_arg = arg * tau if invert_tau else arg / tau
        inner = self.child.eval_local(scaled_arg, tau_diag, tau_scal, not invert_tau)
        if invert_tau:
            return arg - inner / tau
        return arg - tau * inner


@pytree_dataclass
class ProxTransform(Prox):
    """prox of c*f(a*x - b) + d*x + (e/2)*x^2 around an arbitrary inner
    prox of f (prox_transform.cu): prescale the argument and the per-element
    step, call the inner prox with tau_scal=1 and the scaled per-element
    step as tau_diag (and invert_tau False — the inversion is folded into
    the scaled step), then postscale.

    Coefficients a, b, c, d, e are scalars or per-element arrays.
    """

    index: int = static_field()
    size: int = static_field()
    child: Prox = None
    a: jnp.ndarray = 1.0
    b: jnp.ndarray = 0.0
    c: jnp.ndarray = 1.0
    d: jnp.ndarray = 0.0
    e: jnp.ndarray = 0.0

    def __post_init__(self):
        import numpy as np

        if np.any(np.asarray(self.a) == 0):
            raise ProstError(
                "ProxTransform: coefficient 'a' must not contain zeros."
            )

    @property
    def diagsteps(self) -> bool:
        return self.child.diagsteps

    def get_separable_structure(self):
        return self.child.get_separable_structure()

    def average_precond(self, seg):
        return self.child.average_precond(seg)

    def eval_local(self, arg, tau_diag, tau_scal, invert_tau):
        a, b, c, d, e = (
            jnp.asarray(v) for v in (self.a, self.b, self.c, self.d, self.e)
        )
        tau = tau_scal * tau_diag
        if invert_tau:
            tau = 1.0 / tau
        denom = 1.0 + tau * e
        scaled_arg = (a * (arg - tau * d)) / denom - b
        scaled_tau = (a * a * c * tau) / denom
        inner = self.child.eval_local(
            scaled_arg, jnp.broadcast_to(scaled_tau, arg.shape), 1.0, False
        )
        return (inner + b) / a


@pytree_dataclass
class ProxPermute(Prox):
    """prox of f(Px) for a permutation P: gather, inner prox, scatter back
    (prox_permute.cu:31-48).  perm holds local indices (0-based)."""

    index: int = static_field()
    size: int = static_field()
    child: Prox = None
    perm: jnp.ndarray = None

    @property
    def diagsteps(self) -> bool:
        return self.child.diagsteps

    def average_precond(self, seg):
        inv = jnp.argsort(self.perm)
        return self.child.average_precond(seg[self.perm])[inv]

    def eval_local(self, arg, tau_diag, tau_scal, invert_tau):
        perm = self.perm
        inner = self.child.eval_local(
            arg[perm], tau_diag[perm], tau_scal, invert_tau
        )
        inv = jnp.argsort(perm)
        return inner[inv]
