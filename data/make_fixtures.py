"""Procedurally generate the committed image fixtures.

The reference ships 8 test photos (``/root/reference/images/`` — cow.png
etc.) and its BASELINE config 3 is "8 labels on cow.png"
(example_multilabel_fast.m:7-12).  Those photos cannot be copied, so this
script draws a deterministic cartoon pasture scene with the same role and
geometry as cow.png (460x276, a multi-region segmentation subject: sky /
grass / cow body / patches / head / legs against textured background) and
commits it as ``data/cow.png``.

Run ``python data/make_fixtures.py`` to regenerate (bit-deterministic:
fixed seed, pure numpy).
"""

import os

import numpy as np


def _ellipse(xx, yy, cx, cy, rx, ry):
    return ((xx - cx) / rx) ** 2 + ((yy - cy) / ry) ** 2 <= 1.0


def make_cow(width=460, height=276, seed=7):
    """A cartoon cow on a pasture, (height, width, 3) float in [0, 1]."""
    rng = np.random.RandomState(seed)
    yy, xx = np.mgrid[0:height, 0:width].astype(np.float64)

    # sky gradient + grass
    img = np.zeros((height, width, 3))
    sky = 0.55 + 0.25 * (1.0 - yy / height)
    img[..., 0] = 0.45 * sky
    img[..., 1] = 0.65 * sky
    img[..., 2] = sky
    horizon = int(0.55 * height)
    grass = yy >= horizon
    img[grass, 0] = 0.18
    img[grass, 1] = 0.48 + 0.08 * np.sin(xx[grass] / 17.0)
    img[grass, 2] = 0.16

    # rolling hill
    hill = yy >= horizon - 14 + 10 * np.sin(xx / 60.0)
    img[hill & ~grass] = (0.22, 0.52, 0.20)

    # cow: body, head, legs, patches (white body with dark patches)
    cx, cy = width * 0.52, height * 0.62
    body = _ellipse(xx, yy, cx, cy, width * 0.18, height * 0.17)
    head = _ellipse(xx, yy, cx + width * 0.175, cy - height * 0.13,
                    width * 0.055, height * 0.095)
    legs = np.zeros_like(body)
    for dx in (-0.12, -0.05, 0.05, 0.12):
        legs |= ((np.abs(xx - (cx + dx * width)) < width * 0.012)
                 & (yy > cy) & (yy < cy + height * 0.28))
    cow = body | head | legs
    img[cow] = (0.92, 0.90, 0.88)

    patches = np.zeros_like(body)
    for px, py, rx, ry in ((-0.08, -0.05, 0.06, 0.09),
                           (0.05, 0.06, 0.07, 0.07),
                           (0.1, -0.08, 0.045, 0.06)):
        patches |= _ellipse(xx, yy, cx + px * width, cy + py * height,
                            rx * width, ry * height)
    img[patches & body] = (0.18, 0.14, 0.12)
    muzzle = _ellipse(xx, yy, cx + width * 0.195, cy - height * 0.085,
                      width * 0.03, height * 0.04)
    img[muzzle] = (0.85, 0.62, 0.58)

    # mild photographic noise/texture so unaries are not degenerate
    img += 0.015 * rng.randn(height, width, 3)
    return np.clip(img, 0.0, 1.0)


def make_junction(size=256, seed=11):
    """A texture-rich multi-region junction image, (size, size) gray float
    in [0, 1] — same role and geometry as the reference's
    ``images/junction_gray.png`` (256x256): several differently-shaded
    regions meeting at a central junction, with per-region texture so TV
    and deblurring workloads see statistics distinct from the cow
    fixture's large flat areas."""
    rng = np.random.RandomState(seed)
    yy, xx = np.mgrid[0:size, 0:size].astype(np.float64)
    cx, cy = size * 0.52, size * 0.47
    ang = np.arctan2(yy - cy, xx - cx)

    # four wedge sectors with a wavy boundary perturbation
    wob = 0.25 * np.sin(3.0 * ang + (np.hypot(xx - cx, yy - cy)) / 23.0)
    sector = np.floor((ang + wob + np.pi) / (2 * np.pi) * 4).astype(int) % 4
    levels = np.array([0.20, 0.45, 0.70, 0.90])
    img = levels[sector]

    # per-sector texture: oriented sinusoids with different frequencies
    tex = (
        0.06 * np.sin(xx / 5.0 + yy / 11.0) * (sector == 0)
        + 0.05 * np.sin(yy / 4.0) * (sector == 1)
        + 0.05 * np.sin((xx + yy) / 7.0) * (sector == 2)
        + 0.04 * np.sin(xx / 3.0 - yy / 9.0) * (sector == 3)
    )
    img = img + tex

    # a bright disk straddling two sectors (extra junction structure)
    img[_ellipse(xx, yy, cx + size * 0.22, cy - size * 0.18,
                 size * 0.09, size * 0.09)] = 0.98

    # mild photographic noise
    img += 0.02 * rng.randn(size, size)
    return np.clip(img, 0.0, 1.0)


def main():
    from PIL import Image

    here = os.path.dirname(os.path.abspath(__file__))
    img = make_cow()
    Image.fromarray((img * 255.0 + 0.5).astype(np.uint8)).save(
        os.path.join(here, "cow.png"))
    print("wrote", os.path.join(here, "cow.png"))
    jim = make_junction()
    Image.fromarray((jim * 255.0 + 0.5).astype(np.uint8)).save(
        os.path.join(here, "junction_gray.png"))
    print("wrote", os.path.join(here, "junction_gray.png"))


if __name__ == "__main__":
    main()
