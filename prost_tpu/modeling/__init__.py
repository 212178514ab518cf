"""Modeling layer: variables, problems, function/block factories, solve.

Python replacement for the reference's MATLAB API (matlab/+prost) and MEX
factory (matlab/+prost/private/factory.cpp): the closure-based wire format
(`func(idx, count) -> prox spec`, `block(row, col, nrows, ncols) -> block
spec`) is preserved, but factories construct the prox / block objects
directly — there is no serialization boundary to cross.
"""

from . import block, function, wire
from .problems import MinMaxProblem, MinProblem
from .solve import (
    Backend,
    backend_admm,
    backend_pdhg,
    eval_linop,
    eval_prox,
    get_all_variables,
    options,
    solve,
)
from .variable import SubVariable, Variable

__all__ = [
    "Variable",
    "SubVariable",
    "MinMaxProblem",
    "MinProblem",
    "function",
    "block",
    "solve",
    "options",
    "Backend",
    "backend_pdhg",
    "backend_admm",
    "eval_prox",
    "eval_linop",
    "get_all_variables",
    "wire",
]
