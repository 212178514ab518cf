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


def make_lion(width=700, height=464, seed=21):
    """Savanna portrait, (height, width, 3) in [0, 1] — same role and
    geometry as the reference's ``images/lion.png`` (700x464, the ROF /
    inpainting subject: example_rof_primaldual.m:3, example_tv_inpaint.m:5).
    Statistics: a large textured subject (radial fur strokes, angular mane
    sinusoids) against a smooth out-of-focus backdrop — strong oriented
    high-frequency content, unlike the cow fixture's flat regions."""
    rng = np.random.RandomState(seed)
    yy, xx = np.mgrid[0:height, 0:width].astype(np.float64)

    # out-of-focus savanna: warm vertical gradient + soft horizontal bands
    img = np.zeros((height, width, 3))
    t = yy / height
    img[..., 0] = 0.75 - 0.25 * t + 0.05 * np.sin(yy / 37.0)
    img[..., 1] = 0.62 - 0.28 * t + 0.04 * np.sin(yy / 29.0 + 1.0)
    img[..., 2] = 0.45 - 0.25 * t

    cx, cy = width * 0.5, height * 0.52
    r = np.hypot(xx - cx, (yy - cy) * 1.15)
    ang = np.arctan2(yy - cy, xx - cx)

    # mane: annulus with angular sinusoid strokes at two frequencies
    mane = (r > height * 0.21) & (r < height * 0.45)
    stroke = 0.5 + 0.28 * np.sin(34.0 * ang) + 0.18 * np.sin(89.0 * ang + r / 7.0)
    for c, w in enumerate((0.55, 0.33, 0.12)):
        img[..., c][mane] = (w + 0.35 * stroke[mane])

    # face: disk with radial fur texture
    face = r <= height * 0.21
    fur = 0.62 + 0.10 * np.sin(r / 2.3) * np.cos(7.0 * ang)
    for c, w in enumerate((0.25, 0.16, 0.02)):
        img[..., c][face] = w + 0.6 * fur[face]

    # eyes, nose, muzzle shading
    for ex in (-0.085, 0.085):
        eye = _ellipse(xx, yy, cx + ex * width, cy - height * 0.045,
                       width * 0.016, height * 0.022)
        img[eye] = (0.08, 0.05, 0.03)
    nose = _ellipse(xx, yy, cx, cy + height * 0.05,
                    width * 0.028, height * 0.028)
    img[nose] = (0.30, 0.15, 0.10)

    img += 0.02 * rng.randn(height, width, 3)
    return np.clip(img, 0.0, 1.0)


def make_dog(width=640, height=427, seed=23):
    """Spotted dog in an interior, (height, width, 3) in [0, 1] — role of
    ``images/dog.png`` (640x427, the dual-ROF subject,
    example_rof_dual.m:3).  Statistics: mid-frequency blob texture
    (irregular coat spots) over a two-tone floor/wall split."""
    rng = np.random.RandomState(seed)
    yy, xx = np.mgrid[0:height, 0:width].astype(np.float64)

    img = np.zeros((height, width, 3))
    split = int(0.58 * height)
    wall = yy < split + 6.0 * np.sin(xx / 45.0)
    img[wall] = (0.62, 0.58, 0.52)
    img[~wall, 0] = 0.42 + 0.05 * np.sin(xx[~wall] / 9.0)  # floorboards
    img[~wall, 1] = 0.30 + 0.05 * np.sin(xx[~wall] / 9.0)
    img[~wall, 2] = 0.20

    # dog: body + head + ears + legs, cream coat
    cx, cy = width * 0.47, height * 0.60
    body = _ellipse(xx, yy, cx, cy, width * 0.21, height * 0.20)
    head = _ellipse(xx, yy, cx - width * 0.20, cy - height * 0.17,
                    width * 0.075, height * 0.13)
    ear = _ellipse(xx, yy, cx - width * 0.245, cy - height * 0.24,
                   width * 0.025, height * 0.075)
    legs = np.zeros_like(body)
    for dx in (-0.13, -0.06, 0.06, 0.13):
        legs |= ((np.abs(xx - (cx + dx * width)) < width * 0.014)
                 & (yy > cy) & (yy < cy + height * 0.30))
    dog = body | head | ear | legs
    img[dog] = (0.88, 0.82, 0.72)

    # irregular coat spots: ~40 random small ellipses clipped to the body
    spots = np.zeros_like(body)
    for _ in range(40):
        px = cx + width * rng.uniform(-0.20, 0.20)
        py = cy + height * rng.uniform(-0.18, 0.18)
        spots |= _ellipse(xx, yy, px, py, width * rng.uniform(0.008, 0.030),
                          height * rng.uniform(0.012, 0.045))
    img[spots & body] = (0.32, 0.22, 0.15)
    eye = _ellipse(xx, yy, cx - width * 0.215, cy - height * 0.19,
                   width * 0.009, height * 0.014)
    img[eye] = (0.05, 0.04, 0.03)

    img += 0.018 * rng.randn(height, width, 3)
    return np.clip(img, 0.0, 1.0)


def make_flowers(width=640, height=509, seed=29):
    """Flower field, (height, width, 3) in [0, 1] — role of
    ``images/flowers.png`` (640x509, the deblurring subject,
    example_deblurring.m:3).  Statistics: dozens of small high-contrast
    radial petal clusters at multiple scales — dense fine detail
    everywhere, the natural deconvolution test pattern."""
    rng = np.random.RandomState(seed)
    yy, xx = np.mgrid[0:height, 0:width].astype(np.float64)

    # green foliage base with leafy mid-frequency texture
    img = np.zeros((height, width, 3))
    img[..., 0] = 0.16 + 0.05 * np.sin(xx / 13.0 + yy / 7.0)
    img[..., 1] = 0.42 + 0.08 * np.sin(xx / 9.0 - yy / 11.0)
    img[..., 2] = 0.14 + 0.04 * np.sin((xx + yy) / 17.0)

    palette = [(0.95, 0.20, 0.25), (0.98, 0.85, 0.20), (0.92, 0.45, 0.75),
               (0.95, 0.55, 0.15), (0.85, 0.90, 0.95), (0.70, 0.30, 0.85)]
    for i in range(55):
        fx = rng.uniform(0.03, 0.97) * width
        fy = rng.uniform(0.03, 0.97) * height
        fr = rng.uniform(0.015, 0.055) * height * (1.6 if i < 8 else 1.0)
        col = np.array(palette[rng.randint(len(palette))])
        npet = rng.randint(5, 9)
        ph = rng.uniform(0, 2 * np.pi)
        rr = np.hypot(xx - fx, yy - fy)
        aa = np.arctan2(yy - fy, xx - fx)
        petal = rr <= fr * (0.55 + 0.45 * np.abs(np.cos(npet / 2.0 * (aa - ph))))
        shade = 1.0 - 0.35 * (rr / max(fr, 1.0))
        for c in range(3):
            img[..., c][petal] = col[c] * shade[petal]
        core = rr <= fr * 0.22
        img[core] = (0.45, 0.30, 0.08)

    img += 0.015 * rng.randn(height, width, 3)
    return np.clip(img, 0.0, 1.0)


def make_fisch(width=481, height=321, seed=31):
    """Striped fish under water, (height, width, 3) in [0, 1] — role of
    ``images/Fisch.jpg`` (481x321, the TV-L1 salt&pepper subject,
    example_tvl1.m:5).  Statistics: periodic body stripes + smooth caustic
    ripples + small bright bubbles — the impulsive-noise-robustness
    workload wants exactly this mix of edges and smooth waves."""
    rng = np.random.RandomState(seed)
    yy, xx = np.mgrid[0:height, 0:width].astype(np.float64)

    # water: blue gradient + caustic interference ripples
    img = np.zeros((height, width, 3))
    caust = (0.5 * np.sin(xx / 23.0 + yy / 31.0)
             + 0.5 * np.sin(xx / 13.0 - yy / 17.0 + 2.0))
    img[..., 0] = 0.05 + 0.05 * caust
    img[..., 1] = 0.30 + 0.08 * caust + 0.10 * (1 - yy / height)
    img[..., 2] = 0.55 + 0.10 * caust + 0.15 * (1 - yy / height)

    # fish body: ellipse + tail triangle, with vertical stripes
    cx, cy = width * 0.48, height * 0.52
    body = _ellipse(xx, yy, cx, cy, width * 0.22, height * 0.21)
    tail = ((xx > cx + width * 0.18) & (xx < cx + width * 0.30)
            & (np.abs(yy - cy) < (xx - cx - width * 0.18) * 0.9))
    stripes = 0.5 + 0.5 * np.sign(np.sin((xx - cx) / 11.0 + 0.3 * np.sin(yy / 19.0)))
    img[..., 0][body] = 0.95 * stripes[body] + 0.25 * (1 - stripes[body])
    img[..., 1][body] = 0.55 * stripes[body] + 0.20 * (1 - stripes[body])
    img[..., 2][body] = 0.15 * stripes[body] + 0.10 * (1 - stripes[body])
    img[tail] = (0.90, 0.50, 0.12)
    eye = _ellipse(xx, yy, cx - width * 0.155, cy - height * 0.055,
                   width * 0.018, height * 0.027)
    img[eye] = (0.95, 0.95, 0.95)
    pupil = _ellipse(xx, yy, cx - width * 0.150, cy - height * 0.050,
                     width * 0.008, height * 0.012)
    img[pupil] = (0.05, 0.05, 0.05)

    # bubbles
    for _ in range(14):
        bx = rng.uniform(0.05, 0.95) * width
        by = rng.uniform(0.05, 0.6) * height
        br = rng.uniform(0.004, 0.012) * width
        img[_ellipse(xx, yy, bx, by, br, br)] = (0.85, 0.92, 0.97)

    img += 0.015 * rng.randn(height, width, 3)
    return np.clip(img, 0.0, 1.0)


def make_house(width=495, height=330, seed=37):
    """House facade, (height, width, 3) in [0, 1] — role of
    ``images/house.png`` (495x330).  Statistics: piecewise-constant
    regions with long straight axis-aligned and diagonal edges (walls,
    roof, window grid) — the classic cartoon/TV test-image class, with
    almost no texture."""
    rng = np.random.RandomState(seed)
    yy, xx = np.mgrid[0:height, 0:width].astype(np.float64)

    img = np.zeros((height, width, 3))
    img[..., 0] = 0.55 + 0.15 * (1 - yy / height)  # sky
    img[..., 1] = 0.70 + 0.12 * (1 - yy / height)
    img[..., 2] = 0.90
    ground = yy > 0.82 * height
    img[ground] = (0.35, 0.50, 0.25)

    # wall
    x0, x1 = 0.18 * width, 0.82 * width
    wy0, wy1 = 0.38 * height, 0.84 * height
    wall = (xx >= x0) & (xx <= x1) & (yy >= wy0) & (yy <= wy1)
    img[wall] = (0.85, 0.78, 0.62)

    # roof: triangle over the wall
    apex_y = 0.10 * height
    roof = ((yy >= apex_y) & (yy <= wy0)
            & (np.abs(xx - 0.5 * width)
               <= (yy - apex_y) / (wy0 - apex_y) * 0.36 * width))
    img[roof] = (0.55, 0.22, 0.16)

    # chimney
    chim = (xx >= 0.62 * width) & (xx <= 0.68 * width) & \
           (yy >= 0.12 * height) & (yy <= 0.30 * height)
    img[chim] = (0.45, 0.30, 0.25)

    # window grid: 2 rows x 3 cols with cross bars
    for wy in (0.46, 0.64):
        for wx in (0.25, 0.45, 0.65):
            win = ((xx >= wx * width) & (xx <= (wx + 0.10) * width)
                   & (yy >= wy * height) & (yy <= (wy + 0.11) * height))
            img[win] = (0.25, 0.35, 0.50)
            bar = win & ((np.abs(xx - (wx + 0.05) * width) < 1.5)
                         | (np.abs(yy - (wy + 0.055) * height) < 1.5))
            img[bar] = (0.95, 0.95, 0.92)

    # door
    door = ((xx >= 0.47 * width) & (xx <= 0.55 * width)
            & (yy >= 0.66 * height) & (yy <= 0.84 * height))
    img[door] = (0.40, 0.22, 0.12)

    img += 0.012 * rng.randn(height, width, 3)
    return np.clip(img, 0.0, 1.0)


def make_maske2(width=700, height=464, seed=41):
    """Inpainting mask, (height, width) in {0, 1} — role of
    ``images/maske2.png`` (700x464, same geometry as lion.png): WHITE
    (1.0) strokes mark the pixels to REMOVE (example_tv_inpaint.m:10
    computes m = 1 - (mask > 0), so the data term vanishes exactly on the
    white strokes).  The reference mask covers ~25% of the image with
    thick scribbles + text-like dash rows; this reproduces that coverage
    deterministically."""
    rng = np.random.RandomState(seed)
    mask = np.zeros((height, width), dtype=np.float64)
    yy, xx = np.mgrid[0:height, 0:width].astype(np.float64)

    # thick scribble strokes: random-walk polylines rasterized as discs
    for _ in range(9):
        px = rng.uniform(0.05, 0.95) * width
        py = rng.uniform(0.05, 0.95) * height
        ang = rng.uniform(0, 2 * np.pi)
        thick = rng.uniform(6.0, 14.0)
        for _step in range(60):
            mask[(xx - px) ** 2 + (yy - py) ** 2 <= thick ** 2] = 1.0
            ang += rng.uniform(-0.45, 0.45)
            px = np.clip(px + 9.0 * np.cos(ang), 0, width - 1)
            py = np.clip(py + 9.0 * np.sin(ang), 0, height - 1)

    # text-like dash rows
    for row in range(4):
        ry = (0.12 + 0.24 * row) * height
        cxx = 0.06 * width
        while cxx < 0.94 * width:
            wlen = rng.uniform(0.02, 0.06) * width
            dash = ((xx >= cxx) & (xx <= cxx + wlen)
                    & (np.abs(yy - ry) < rng.uniform(3.0, 6.0)))
            mask[dash] = 1.0
            cxx += wlen + rng.uniform(0.01, 0.03) * width
    return mask


def main():
    from PIL import Image

    here = os.path.dirname(os.path.abspath(__file__))

    def save(name, img):
        Image.fromarray((img * 255.0 + 0.5).astype(np.uint8)).save(
            os.path.join(here, name))
        print("wrote", os.path.join(here, name))

    save("cow.png", make_cow())
    save("junction_gray.png", make_junction())
    save("lion.png", make_lion())
    save("dog.png", make_dog())
    save("flowers.png", make_flowers())
    save("fisch.png", make_fisch())
    save("house.png", make_house())
    save("maske2.png", make_maske2())


if __name__ == "__main__":
    main()
