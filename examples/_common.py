"""Shared helpers for the example scripts.

The reference examples load images from its images/ directory; these
examples ship a committed procedural fixture (``data/cow.png``, generated
by data/make_fixtures.py — same role and geometry as the reference's
cow.png, the BASELINE config 3 subject) and also synthesize
piecewise-smooth test images (same role as lion.png / junction_gray.png
etc.).  Every script accepts --size / --cpu so the same code runs as a
quick CPU demo or a full-size TPU workload.
"""

from __future__ import annotations

import os

import numpy as np

_DATA_DIR = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                         "..", "data")


def load_fixture_image(name="cow", size=None, gray=True):
    """Load a committed fixture image (data/<name>.png) as float in
    [0, 1], shape (ny, nx) when gray else (ny, nx, 3).  ``size`` resizes
    to (size, size).  Matches the role of the reference's
    imread('images/cow.png') (example_multilabel_fast.m:7-12)."""
    from PIL import Image

    im = Image.open(os.path.join(_DATA_DIR, f"{name}.png"))
    if gray:
        im = im.convert("L")
    else:
        im = im.convert("RGB")
    if size is not None:
        im = im.resize((size, size), Image.BILINEAR)
    return np.asarray(im, np.float64) / 255.0


def synthetic_image(ny, nx, nc=1, seed=42):
    """Piecewise-smooth test image in [0, 1], shape (ny, nx, nc)."""
    x = np.linspace(0, 1, nx)
    y = np.linspace(0, 1, ny)
    yy, xx = np.meshgrid(y, x, indexing="ij")
    base = (
        0.4 * (((xx - 0.5) ** 2 + (yy - 0.5) ** 2) < 0.09)
        + 0.3 * (xx > 0.7)
        + 0.2 * np.sin(6 * np.pi * yy) * (xx < 0.25)
    )
    im = np.stack(
        [np.clip(base * (1 - 0.15 * c) + 0.05 * c, 0, 1) for c in range(nc)],
        axis=-1,
    )
    return im.astype(np.float64)


def flatten_image(im):
    """(ny, nx, nc) -> flat vector with MATLAB column-major layout
    (index = y + ny*x + nx*ny*c), matching the reference examples'
    `im(:)` and the gradient blocks' label_first=False contract."""
    return im.transpose(2, 1, 0).reshape(-1)


def unflatten_image(v, ny, nx, nc=1):
    return np.asarray(v).reshape(nc, nx, ny).transpose(2, 1, 0)


def force_cpu():
    import jax

    jax.config.update("jax_platforms", "cpu")


def add_std_args(ap, size=128):
    ap.add_argument("--size", type=int, default=size)
    ap.add_argument("--cpu", action="store_true")
    ap.add_argument("--max-iters", type=int, default=None)
    return ap


def tv_energy(grad_apply, u, n):
    """||grad u||_{2,1} for a 2-component gradient vector of length 2n."""
    import jax.numpy as jnp

    g = np.asarray(grad_apply(jnp.asarray(u)))
    return float(np.sum(np.sqrt(g[:n] ** 2 + g[n:] ** 2)))
