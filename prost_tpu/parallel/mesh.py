"""Device-mesh helpers."""

from __future__ import annotations

import numpy as np

import jax
from jax.sharding import Mesh


def make_mesh(shape=None, axis_names=("dp", "sp"), devices=None) -> Mesh:
    """Build a Mesh over the available devices.

    shape: tuple matching axis_names; None = all devices on the first axis
    (remaining axes sized 1).
    """
    devices = list(jax.devices()) if devices is None else list(devices)
    n = len(devices)
    if shape is None:
        shape = (n,) + (1,) * (len(axis_names) - 1)
    total = int(np.prod(shape))
    if total > n:
        raise ValueError(f"mesh shape {shape} needs {total} devices, have {n}")
    arr = np.asarray(devices[:total]).reshape(shape)
    return Mesh(arr, axis_names=axis_names)
