"""Hardware bit-equivalence verifier for the banded fused kernels.

The pytest suite runs the Pallas kernels in INTERPRET mode on CPU, where
out-of-range dynamic-slice starts are CLAMPED — a kernel whose manual
DMAs use wrong offsets can pass every interpret-mode test and still
write its outputs to the wrong rows on real hardware (this exact bug
shipped in the ml banded kernel: per-band VMEM output blocks mixed with
global row offsets).  This tool re-runs every banded-vs-whole-plane
equivalence check ON THE REAL TPU and fails loudly on any mismatch.

Run from the repo root: python tools/tpu_verify.py [subset...]
[--json PATH].  --json writes the per-check maxdiffs as a committable
artifact (VERIFY_r*.json) so each round's hardware verification leaves
a record; bench.py refuses to label banded numbers "verified" without
a current one.
"""

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

TOL = 1e-6  # hardware and interpret paths may fuse differently

_CHECKS = []  # (name, maxdiff, ok) records for the --json artifact


def _check(name, ref, got, tol=TOL):
    import jax.numpy as jnp

    d = float(jnp.max(jnp.abs(jnp.asarray(ref) - jnp.asarray(got))))
    scale = float(jnp.max(jnp.abs(jnp.asarray(ref)))) or 1.0
    ok = d <= tol * max(1.0, scale)
    print(f"  {name}: maxdiff {d:.3e} {'OK' if ok else 'MISMATCH'}")
    _CHECKS.append({"check": name, "maxdiff": d, "ok": ok})
    return ok


def verify_rof():
    import jax.numpy as jnp

    from prost_tpu.ops.fused_rof import (rof_fused_chunk,
                                         rof_fused_chunk_banded)

    print("ROF banded (512x512, nb=4, ri=10):")
    rng = np.random.RandomState(3)
    x = jnp.asarray(rng.rand(512, 512), jnp.float32)
    q = jnp.asarray(0.1 * rng.randn(2, 512, 512), jnp.float32)
    q = q.at[0, -1, :].set(0.0).at[1, :, -1].set(0.0)  # dead duals
    f = jnp.asarray(rng.rand(512, 512), jnp.float32)
    w = jnp.ones_like(x)
    args = (0.9, 1.1, 1.0, 16.0, 0.5, 10)
    ref = rof_fused_chunk(x, q, f, w, *args)
    ban = rof_fused_chunk_banded(x, q, f, w, *args, 4)
    ok = all(_check(f"out[{i}]", a, b) for i, (a, b) in
             enumerate(zip(ref[:4], ban[:4])))
    ok = _check("norms", ref[4], ban[4], tol=1e-5) and ok
    # double-buffered variant: cross-grid-step DMA pipelining is exactly
    # the class of scheduling interpret mode cannot validate
    db = rof_fused_chunk_banded(x, q, f, w, *args, 4, double_buffer=True)
    ok = all(_check(f"db out[{i}]", a, b) for i, (a, b) in
             enumerate(zip(ref[:4], db[:4]))) and ok
    return ok and _check("db norms", ref[4], db[4], tol=1e-5)


def verify_ml():
    import jax.numpy as jnp

    from prost_tpu.ops.fused_multilabel import (ml_fused_chunk,
                                                ml_fused_chunk_banded)

    print("multilabel banded (256x256x8, nb=2, ri=10):")
    rng = np.random.RandomState(4)
    L, nx, ny = 8, 256, 256
    u = jnp.asarray(rng.rand(L, nx, ny), jnp.float32)
    q = jnp.asarray(0.1 * rng.randn(2 * L, nx, ny), jnp.float32)
    q = q.at[:L, -1, :].set(0.0).at[L:, :, -1].set(0.0)  # dead duals
    s = jnp.asarray(0.1 * rng.randn(nx, ny), jnp.float32)
    f = jnp.asarray(rng.rand(L, nx, ny), jnp.float32)
    args = (0.9, 1.1, 1.0, 0.5, 1.0, 10)
    ref = ml_fused_chunk(u, q, s, f, *args)
    ban = ml_fused_chunk_banded(u, q, s, f, *args, 2)
    ok = all(_check(f"out[{i}]", a, b) for i, (a, b) in
             enumerate(zip(ref[:6], ban[:6])))
    ok = _check("norms", ref[6], ban[6], tol=1e-5) and ok
    # wider band count: nb=4 exercises TWO interior bands (both the
    # clamped-low and clamped-high DMA offset branches plus unclamped)
    ban4 = ml_fused_chunk_banded(u, q, s, f, *args, 4)
    ok = all(_check(f"nb4 out[{i}]", a, b) for i, (a, b) in
             enumerate(zip(ref[:6], ban4[:6]))) and ok
    ok = _check("nb4 norms", ref[6], ban4[6], tol=1e-5) and ok
    # double-buffered variant (round-4): shared run_banded_db pipeline
    db = ml_fused_chunk_banded(u, q, s, f, *args, 4, double_buffer=True)
    ok = all(_check(f"db out[{i}]", a, b) for i, (a, b) in
             enumerate(zip(ref[:6], db[:6]))) and ok
    return ok and _check("db norms", ref[6], db[6], tol=1e-5)


def verify_tight():
    import jax.numpy as jnp

    from prost_tpu.ops.fused_tight import (tight_fused_chunk,
                                           tight_fused_chunk_banded)

    print("tight banded (128x128x4 k=6, nb=2, ri=10):")
    rng = np.random.RandomState(5)
    L, k, nx, ny = 4, 6, 128, 128
    u = jnp.asarray(rng.rand(L, nx, ny), jnp.float32)
    v = jnp.asarray(0.1 * rng.randn(2 * k, nx, ny), jnp.float32)
    q = jnp.asarray(0.1 * rng.randn(2 * L, nx, ny), jnp.float32)
    p = jnp.asarray(0.1 * rng.randn(2 * k, nx, ny), jnp.float32)
    s = jnp.asarray(0.1 * rng.randn(nx, ny), jnp.float32)
    f = jnp.asarray(rng.rand(L, nx, ny), jnp.float32)
    # P^T taps for the standard pairwise difference matrix on L labels
    taps = []
    m = 0
    for a in range(L):
        for b in range(a + 1, L):
            for comp in range(2):  # x and y parts
                taps.append((comp * L + a, comp * k + m, 1.0))
                taps.append((comp * L + b, comp * k + m, -1.0))
            m += 1
    taps = tuple(taps)
    consts = (0.5, 1.0, 1.0 / L, 1.0 / (2.0 + L), 1.0 / 3.0)
    args = (0.9, 1.1, 1.0, 0.5, 1.0, 10, taps, consts)
    new_r, prev_r, n_r = tight_fused_chunk(u, v, q, p, s, f, *args)
    new_b, prev_b, n_b = tight_fused_chunk_banded(u, v, q, p, s, f, *args, 2)
    ok = all(_check(f"new[{i}]", a, b) for i, (a, b) in
             enumerate(zip(new_r, new_b)))
    ok = all(_check(f"prev[{i}]", a, b) for i, (a, b) in
             enumerate(zip(prev_r, prev_b))) and ok
    ok = _check("norms", n_r, n_b, tol=1e-5) and ok
    # wider band count: interior bands' unclamped DMA offsets
    new_b4, prev_b4, n_b4 = tight_fused_chunk_banded(
        u, v, q, p, s, f, *args, 4)
    ok = all(_check(f"nb4 new[{i}]", a, b) for i, (a, b) in
             enumerate(zip(new_r, new_b4))) and ok
    ok = _check("nb4 norms", n_r, n_b4, tol=1e-5) and ok
    # double-buffered variant (round-4)
    new_db, prev_db, n_db = tight_fused_chunk_banded(
        u, v, q, p, s, f, *args, 4, double_buffer=True)
    ok = all(_check(f"db new[{i}]", a, b) for i, (a, b) in
             enumerate(zip(new_r, new_db))) and ok
    return ok and _check("db norms", n_r, n_db, tol=1e-5)


def verify_deblur():
    import jax.numpy as jnp

    from prost_tpu.ops.fused_deblur import (deblur_banded_ok,
                                            deblur_fused_chunk,
                                            deblur_fused_chunk_banded)

    print("deblur banded (nx2=512, nb=2, ri=10, 7x7-reach taps):")
    nx = ny = 506
    k = 7
    nx2 = ny2 = nx + k - 1
    assert deblur_banded_ok(nx2, 2)
    # normalized so the 10-iteration chunk stays numerically tame
    taps = tuple((dx, dy, 1.0 / (16 * (1 + dx + dy)))
                 for dx in range(0, k, 2) for dy in range(0, k, 2))
    rng = np.random.RandomState(6)

    def emb(a):
        out = np.zeros(a.shape[:-2] + (nx2, ny2), np.float32)
        out[..., :nx, :ny] = a
        return jnp.asarray(out)

    x = emb(rng.rand(nx, ny).astype(np.float32))
    q = emb(0.2 * rng.randn(2, nx, ny).astype(np.float32))
    yv = jnp.asarray(0.1 * rng.randn(nx2, ny2), jnp.float32)
    fb = jnp.asarray(rng.rand(nx2, ny2), jnp.float32)
    sv = jnp.asarray(0.5 + rng.rand(nx2, ny2), jnp.float32)
    args = (0.9, 1.1, 1.0, 25.0, 0.5, 10, nx, ny, taps, 0.5, 0.2)
    ref = deblur_fused_chunk(x, yv, q, fb, sv, *args)
    ban = deblur_fused_chunk_banded(x, yv, q, fb, sv, *args, 2)
    ok = all(_check(f"out[{i}]", a, b) for i, (a, b) in
             enumerate(zip(ref[:6], ban[:6])))
    ok = _check("norms", ref[6], ban[6], tol=1e-5) and ok
    # nb=4 exercises the MIDDLE-band DMA branch (distinct offset
    # arithmetic from the clamped edge bands) on real hardware; at ri=10
    # the 7x7-reach halo (136 rows) exceeds 128-row bands, so this case
    # runs a shorter chunk (ri=4 -> halo 64)
    assert deblur_banded_ok(nx2, 4)
    args4 = (0.9, 1.1, 1.0, 25.0, 0.5, 4, nx, ny, taps, 0.5, 0.2)
    ref4 = deblur_fused_chunk(x, yv, q, fb, sv, *args4)
    ban4 = deblur_fused_chunk_banded(x, yv, q, fb, sv, *args4, 4)
    ok = all(_check(f"nb4 out[{i}]", a, b) for i, (a, b) in
             enumerate(zip(ref4[:6], ban4[:6]))) and ok
    ok = _check("nb4 norms", ref4[6], ban4[6], tol=1e-5) and ok
    # double-buffered variant (round-4): inlined conditional pipeline
    # (edge bands zero-fill + valid-row fetch)
    db4 = deblur_fused_chunk_banded(x, yv, q, fb, sv, *args4, 4,
                                    double_buffer=True)
    ok = all(_check(f"db out[{i}]", a, b) for i, (a, b) in
             enumerate(zip(ref4[:6], db4[:6]))) and ok
    return ok and _check("db norms", ref4[6], db4[6], tol=1e-5)


def verify_admm():
    """The ADMM chunk has no banded sibling to cross-check, so compare
    the compiled Mosaic kernel against interpret mode (pure-JAX
    semantics) on the same inputs.  Loose tolerance: the in-kernel CGLS
    loop accumulates fma-contraction differences over 10x10 steps; this
    catches layout/offset bugs, not ulp drift."""
    import jax.numpy as jnp

    from prost_tpu.ops.fused_admm import admm_fused_chunk

    print("ADMM chunk (256x256, ri=10, cg 10): compiled vs interpret:")
    rng = np.random.RandomState(7)
    nx = ny = 256

    def plane(*lead):
        return jnp.asarray(0.3 * rng.randn(*lead, nx, ny), jnp.float32)

    xh, xp, xd, warm = plane(), plane(), plane(), plane()
    zh, zp, zd = plane(2), plane(2), plane(2)
    f = jnp.asarray(rng.rand(nx, ny), jnp.float32)
    w = jnp.ones_like(f)
    rho = jnp.asarray(1.0, jnp.float32)
    cg_tols = jnp.asarray(1e-3 / (1 + np.arange(10.0)), jnp.float32)
    args = (xh, xp, xd, zh, zp, zd, warm, f, w, rho, 16.0, 0.5,
            cg_tols, 10, 10, 1.7)
    hw = admm_fused_chunk(*args)
    ref = admm_fused_chunk(*args, interpret=True)
    ok = all(_check(f"out[{i}]", a, b, tol=1e-3) for i, (a, b) in
             enumerate(zip(ref[:7], hw[:7])))
    return ok and _check("norms", ref[7], hw[7], tol=1e-3)


def verify_admm_banded():
    """Banded Chebyshev-ADMM vs the whole-plane cheby chunk kernel on
    real hardware — the banded kernel's manual window DMAs are exactly
    the class of code interpret mode cannot validate."""
    import jax.numpy as jnp

    from prost_tpu.ops.fused_admm import admm_banded_iter, admm_fused_chunk

    print("ADMM banded cheby (512x512, nb=4 + nb=8, deg=10):")
    rng = np.random.RandomState(8)
    nx = ny = 512

    def plane(*lead):
        return jnp.asarray(0.3 * rng.randn(*lead, nx, ny), jnp.float32)

    xh, xp, xd, warm = plane(), plane(), plane(), plane()
    zh, zp, zd = plane(2), plane(2), plane(2)

    def _cl(z):  # dead duals (fused canonicalization)
        return z.at[0, -1, :].set(0.0).at[1, :, -1].set(0.0)

    zh, zp, zd = _cl(zh), _cl(zp), _cl(zd)
    f = jnp.asarray(rng.rand(nx, ny), jnp.float32)
    w = jnp.ones_like(f)
    rho = jnp.asarray(1.3, jnp.float32)
    tols = jnp.asarray([1e-9], jnp.float32)
    ref = admm_fused_chunk(xh, xp, xd, zh, zp, zd, warm, f, w, rho, 16.0,
                           0.5, tols, 1, 10, 1.7, cheby_degree=10)
    ok = True
    for nb in (4, 8):
        ban = admm_banded_iter(xh, xp, xd, zh, zp, zd, warm, f, w, rho,
                               16.0, 0.5, nb, 10, 1.7)
        ok = all(_check(f"nb{nb} out[{i}]", a, b) for i, (a, b) in
                 enumerate(zip(ref[:7], ban[:7]))) and ok
        ok = _check(f"nb{nb} norms", ref[7], ban[7], tol=1e-5) and ok
    # double-buffered variant (the round-3 default): cross-grid-step DMA
    # pipelining with per-buffer semaphores — exactly the scheduling
    # interpret mode cannot validate
    for nb in (4, 8):
        db = admm_banded_iter(xh, xp, xd, zh, zp, zd, warm, f, w, rho,
                              16.0, 0.5, nb, 10, 1.7, double_buffer=True)
        ok = all(_check(f"db nb{nb} out[{i}]", a, b) for i, (a, b) in
                 enumerate(zip(ref[:7], db[:7]))) and ok
        ok = _check(f"db nb{nb} norms", ref[7], db[7], tol=1e-5) and ok
    return ok


def verify_admm_chunk_banded():
    """The chunked banded Chebyshev-ADMM kernel (admm_banded_chunk:
    grid = (ri, n_bands), IN-PLACE ping-pong slots, z_proj dropped) vs
    the whole-plane chunk — in-place aliasing + cross-iteration DMA
    pipelining is exactly what interpret mode cannot validate.  Both
    parities (odd/even count) and a pending dual-rescale fac != 1."""
    import jax.numpy as jnp

    from prost_tpu.ops.fused_admm import admm_banded_chunk, admm_fused_chunk

    print("ADMM chunked banded (512x512, nb in {2,4,8}, deg=10):")
    rng = np.random.RandomState(12)
    nx = ny = 512

    def plane(*lead):
        return jnp.asarray(0.3 * rng.randn(*lead, nx, ny), jnp.float32)

    xh, xp, xd, warm = plane(), plane(), plane(), plane()
    zh, zd = plane(2), plane(2)

    def _cl(z):  # dead duals (fused canonicalization)
        return z.at[0, -1, :].set(0.0).at[1, :, -1].set(0.0)

    zh, zd = _cl(zh), _cl(zd)
    f = jnp.asarray(rng.rand(nx, ny), jnp.float32)
    w = jnp.ones_like(f)
    rho = jnp.asarray(1.3, jnp.float32)
    fac = jnp.asarray(0.8, jnp.float32)

    def dbl(a):
        return jnp.zeros((2,) + a.shape, a.dtype).at[0].set(a)

    ok = True
    for count in (3, 10):
        # whole-plane reference consumes the SAME rescaled duals and a
        # z_proj consistent with the invariant z_proj == grad(x_proj)
        ii = jnp.arange(nx)[:, None] < nx - 1
        jj = jnp.arange(ny)[None, :] < ny - 1
        zp_ = jnp.stack([jnp.where(ii, jnp.roll(xp, -1, 0) - xp, 0.0),
                         jnp.where(jj, jnp.roll(xp, -1, 1) - xp, 0.0)])
        tols = jnp.full((count,), 1e-9, jnp.float32)
        ref = admm_fused_chunk(xh, xp, xd * fac, zh, zp_, zd * fac, warm,
                               f, w, rho, 16.0, 0.5, tols, count, 10, 1.7,
                               cheby_degree=10)
        exp = [ref[0], ref[1], ref[2], ref[3], ref[5], ref[6]]
        for nb, db in ((2, True), (4, True), (4, False), (8, True)):
            outs = admm_banded_chunk(
                dbl(xh), dbl(xp), dbl(xd), dbl(zh), dbl(zd), dbl(warm),
                f, w, 0, rho, fac, 16.0, 0.5, count, nb, 10, 1.7,
                double_buffer=db)
            slot = count % 2
            tag = f"c{count} nb{nb}{'db' if db else ''}"
            for nm, g, e in zip(("xh", "xp", "xd", "zh", "zd", "warm"),
                                [o[slot] for o in outs[:6]], exp):
                ok = _check(f"{tag} {nm}", e, g) and ok
            ok = _check(f"{tag} norms", ref[7], outs[6], tol=1e-5) and ok
    return ok


def verify_multichunk():
    """The multi-chunk kernels with IN-KERNEL adaptation
    (rof_fused_multichunk / admm_fused_multichunk) vs k sequential
    single-chunk launches with the adaptation outside — the in-kernel
    lax.cond branching + SMEM scalar math on real hardware."""
    import math

    import jax.numpy as jnp

    from prost_tpu.ops.fused_admm import (admm_adapt_scalars,
                                          admm_fused_chunk,
                                          admm_fused_multichunk)
    from prost_tpu.ops.fused_rof import (adapt_scalars, rof_fused_chunk,
                                         rof_fused_multichunk)

    print("multi-chunk in-kernel adaptation (512x512, ri=10, K=4):")
    rng = np.random.RandomState(13)
    nx = ny = 512
    ri, K = 10, 4
    x = jnp.asarray(rng.rand(nx, ny), jnp.float32)
    q = jnp.asarray(0.1 * rng.randn(2, nx, ny), jnp.float32)
    q = q.at[0, -1, :].set(0.0).at[1, :, -1].set(0.0)  # dead duals
    f = jnp.asarray(rng.rand(nx, ny), jnp.float32)
    w = jnp.ones_like(x)
    nrows, ncols = 2.0 * nx * ny, 1.0 * nx * ny
    consts = (math.sqrt(nrows), math.sqrt(ncols), 1.5, 0.95, 1.05, 0.8)
    t = 1e-4  # tolerances loose enough for boyd branches to fire

    # reference: K sequential chunks + host-side adaptation
    tau = sigma = jnp.asarray(1.0, jnp.float32)
    aa = jnp.asarray(0.5, jnp.float32)
    al = au = jnp.asarray(0.0, jnp.float32)
    xs, qs = x, q
    for c in range(K):
        x2, q2, xp_, qp_, n2 = rof_fused_chunk(
            xs, qs, f, w, tau, sigma, 1.0, 16.0, 0.5, ri)
        pr, pn = jnp.sqrt(n2[0]), jnp.sqrt(n2[1])
        dr, dn = jnp.sqrt(n2[2]), jnp.sqrt(n2[3])
        it = jnp.asarray((c + 1) * ri - 1, jnp.float32)
        tau, sigma, aa, al, au, _ = adapt_scalars(
            "boyd", consts, (t, t, t, t), it, tau, sigma, aa, al, au,
            pr, pn, dr, dn)
        xs, qs = x2, q2
    scal13 = jnp.asarray(
        [1.0, 1.0, 1.0, 16.0, 0.5, 0.5, 0.0, 0.0, 0.0, t, t, t, t],
        jnp.float32)
    mx, mq, mxp, mqp, mnorms, sout = rof_fused_multichunk(
        x, q, f, w, scal13, ri, K, "square", "boyd", consts)
    ok = _check("rof x", xs, mx)
    ok = _check("rof q", qs, mq) and ok
    ok = _check("rof tau", tau, sout[0], tol=1e-6) and ok
    ok = _check("rof sigma", sigma, sout[1], tol=1e-6) and ok
    ok = _check("rof chunks_done", jnp.asarray(float(K)), sout[6]) and ok

    # ADMM multichunk vs sequential cheby chunks + admm_adapt_scalars
    xh = jnp.asarray(0.3 * rng.randn(nx, ny), jnp.float32)
    xp2, xd, warm = xh + 0.1, xh * 0.5, xh * 0.2
    zh = jnp.asarray(0.3 * rng.randn(2, nx, ny), jnp.float32)
    zh = zh.at[0, -1, :].set(0.0).at[1, :, -1].set(0.0)  # dead duals
    zp_, zd = zh * 0.9, zh * 0.1
    rho = jnp.asarray(1.0, jnp.float32)
    delta = jnp.asarray(1.05, jnp.float32)
    al = au = jnp.asarray(0.0, jnp.float32)
    aconsts = (math.sqrt(nrows), math.sqrt(ncols), 0.8, 1.01)
    st = (xh, xp2, xd, zh, zp_, zd, warm)
    tols_k = jnp.full((ri,), 1e-9, jnp.float32)
    for c in range(K):
        outs = admm_fused_chunk(*st, f, w, rho, 16.0, 0.5, tols_k, ri,
                                10, 1.7, cheby_degree=10)
        n2 = outs[7]
        pr, pn = jnp.sqrt(n2[0]), jnp.sqrt(n2[1])
        dr, dn = jnp.sqrt(n2[2]), jnp.sqrt(n2[3])
        it = jnp.asarray((c + 1) * ri, jnp.float32)
        rho, delta, al, au, fc, _ = admm_adapt_scalars(
            aconsts, (t, t, t, t), it, rho, delta, al, au, pr, pn, dr, dn)
        st = (outs[0], outs[1], outs[2] * fc, outs[3], outs[4],
              outs[5] * fc, outs[6])
    scal11 = jnp.asarray(
        [1.0, 16.0, 0.5, 1.05, 0.0, 0.0, 0.0, t, t, t, t], jnp.float32)
    m = admm_fused_multichunk(xh, xp2, xd, zh, zp_, zd, warm, f, w,
                              scal11, ri, K, 1.7, 10, aconsts)
    # the multichunk kernel applies each chunk's dual rescale eagerly
    # (including the last chunk's), matching the sequential reference
    ok = _check("admm xh", st[0], m[0]) and ok
    ok = _check("admm xd", st[2], m[2]) and ok
    ok = _check("admm rho", rho, m[8][0], tol=1e-6) and ok
    return ok


def verify_multichunk_ml():
    """The ml whole-plane multichunk kernel (prev iterate written to the
    output refs INSIDE the cond-active branch) vs K sequential chunks +
    host adaptation, on hardware."""
    import math

    import jax.numpy as jnp

    from prost_tpu.ops.fused_multilabel import (ml_fused_chunk,
                                                ml_fused_multichunk)
    from prost_tpu.ops.fused_rof import adapt_scalars

    print("ml multi-chunk (256x256x8, ri=10, K=4):")
    rng = np.random.RandomState(21)
    L, nx, ny = 8, 256, 256
    ri, K = 10, 4
    u = jnp.asarray(rng.rand(L, nx, ny), jnp.float32)
    q = jnp.asarray(0.1 * rng.randn(2 * L, nx, ny), jnp.float32)
    q = q.at[:L, -1, :].set(0.0).at[L:, :, -1].set(0.0)  # dead duals
    s = jnp.asarray(0.1 * rng.randn(nx, ny), jnp.float32)
    f = jnp.asarray(rng.rand(L, nx, ny), jnp.float32)
    nrows = float(2 * L * nx * ny + nx * ny)
    ncols = float(L * nx * ny)
    consts = (math.sqrt(nrows), math.sqrt(ncols), 1.5, 0.95, 1.05, 0.8)
    t = 1e-4

    tau = sigma = jnp.asarray(1.0, jnp.float32)
    aa = jnp.asarray(0.5, jnp.float32)
    al = au = jnp.asarray(0.0, jnp.float32)
    us, qs, ss = u, q, s
    up = qp = sp = None
    for c in range(K):
        u2, q2, s2, up, qp, sp, n2 = ml_fused_chunk(
            us, qs, ss, f, tau, sigma, 1.0, 0.5, 1.0, ri)
        pr, pn = jnp.sqrt(n2[0]), jnp.sqrt(n2[1])
        dr, dn = jnp.sqrt(n2[2]), jnp.sqrt(n2[3])
        it = jnp.asarray((c + 1) * ri - 1, jnp.float32)
        tau, sigma, aa, al, au, _ = adapt_scalars(
            "boyd", consts, (t, t, t, t), it, tau, sigma, aa, al, au,
            pr, pn, dr, dn)
        us, qs, ss = u2, q2, s2
    scal13 = jnp.asarray(
        [1.0, 1.0, 1.0, 0.5, 1.0, 0.5, 0.0, 0.0, 0.0, t, t, t, t],
        jnp.float32)
    mu, mq, ms, mup, mqp, msp, mnorms, sout = ml_fused_multichunk(
        u, q, s, f, scal13, ri, K, "boyd", consts)
    ok = _check("u", us, mu)
    ok = _check("q", qs, mq) and ok
    ok = _check("u_prev", up, mup) and ok
    ok = _check("q_prev", qp, mqp) and ok
    ok = _check("tau", tau, sout[0], tol=1e-6) and ok
    return ok and _check("chunks_done", jnp.asarray(float(K)), sout[6])


def verify_banded_multichunk():
    """The banded multi-chunk kernel (rof_fused_multichunk_banded:
    grid (K, bands), in-place ping-pong slots, in-kernel adaptation on
    SMEM scratch) vs K sequential banded chunk launches + host
    adaptation — on hardware, where interpret mode cannot see the slot
    aliasing or the cross-step semaphore state."""
    import math

    import jax.numpy as jnp

    from prost_tpu.ops.fused_rof import (adapt_scalars,
                                         rof_fused_chunk_banded,
                                         rof_fused_multichunk_banded)

    print("ROF banded multi-chunk (1024x512, nb=4, ri=10, K=4):")
    rng = np.random.RandomState(18)
    nx, ny = 1024, 512
    ri, K, nb = 10, 4, 4
    x = jnp.asarray(rng.rand(nx, ny), jnp.float32)
    q = jnp.asarray(0.1 * rng.randn(2, nx, ny), jnp.float32)
    q = q.at[0, -1, :].set(0.0).at[1, :, -1].set(0.0)  # dead duals
    f = jnp.asarray(rng.rand(nx, ny), jnp.float32)
    w = jnp.ones_like(x)
    nrows, ncols = 2.0 * nx * ny, 1.0 * nx * ny
    consts = (math.sqrt(nrows), math.sqrt(ncols), 1.5, 0.95, 1.05, 0.8)
    t = 1e-4

    tau = sigma = jnp.asarray(1.0, jnp.float32)
    aa = jnp.asarray(0.5, jnp.float32)
    al = au = jnp.asarray(0.0, jnp.float32)
    xs, qs = x, q
    for c in range(K):
        x2, q2, xp_, qp_, n2 = rof_fused_chunk_banded(
            xs, qs, f, w, tau, sigma, 1.0, 16.0, 0.5, ri, nb)
        pr, pn = jnp.sqrt(n2[0]), jnp.sqrt(n2[1])
        dr, dn = jnp.sqrt(n2[2]), jnp.sqrt(n2[3])
        it = jnp.asarray((c + 1) * ri - 1, jnp.float32)
        tau, sigma, aa, al, au, _ = adapt_scalars(
            "boyd", consts, (t, t, t, t), it, tau, sigma, aa, al, au,
            pr, pn, dr, dn)
        xs, qs = x2, q2
    scal13 = jnp.asarray(
        [1.0, 1.0, 1.0, 16.0, 0.5, 0.5, 0.0, 0.0, 0.0, t, t, t, t],
        jnp.float32)
    mx, mq, mxp, mqp, mnorms, sout = rof_fused_multichunk_banded(
        x, q, f, w, scal13, ri, K, nb, "square", "boyd", consts)
    ok = _check("x", xs, mx)
    ok = _check("q", qs, mq) and ok
    ok = _check("tau", tau, sout[0], tol=1e-6) and ok
    ok = _check("sigma", sigma, sout[1], tol=1e-6) and ok
    ok = _check("chunks_done", jnp.asarray(float(K)), sout[6]) and ok
    return ok


def verify_banded_multichunk_ml():
    """The banded multilabel multi-chunk kernel vs K sequential banded
    chunk launches + host adaptation, on hardware."""
    import math

    import jax.numpy as jnp

    from prost_tpu.ops.fused_multilabel import (ml_fused_chunk_banded,
                                                ml_fused_multichunk_banded)
    from prost_tpu.ops.fused_rof import adapt_scalars

    print("ml banded multi-chunk (512x256x4, nb=4, ri=10, K=4):")
    rng = np.random.RandomState(19)
    L, nx, ny = 4, 512, 256
    ri, K, nb = 10, 4, 4
    u = jnp.asarray(rng.rand(L, nx, ny), jnp.float32)
    q = jnp.asarray(0.1 * rng.randn(2 * L, nx, ny), jnp.float32)
    q = q.at[:L, -1, :].set(0.0).at[L:, :, -1].set(0.0)  # dead duals
    s = jnp.asarray(0.1 * rng.randn(nx, ny), jnp.float32)
    f = jnp.asarray(rng.rand(L, nx, ny), jnp.float32)
    nrows = float(2 * L * nx * ny + nx * ny)
    ncols = float(L * nx * ny)
    consts = (math.sqrt(nrows), math.sqrt(ncols), 1.5, 0.95, 1.05, 0.8)
    t = 1e-4

    tau = sigma = jnp.asarray(1.0, jnp.float32)
    aa = jnp.asarray(0.5, jnp.float32)
    al = au = jnp.asarray(0.0, jnp.float32)
    us, qs, ss = u, q, s
    for c in range(K):
        u2, q2, s2, up_, qp_, sp_, n2 = ml_fused_chunk_banded(
            us, qs, ss, f, tau, sigma, 1.0, 0.5, 1.0, ri, nb)
        pr, pn = jnp.sqrt(n2[0]), jnp.sqrt(n2[1])
        dr, dn = jnp.sqrt(n2[2]), jnp.sqrt(n2[3])
        it = jnp.asarray((c + 1) * ri - 1, jnp.float32)
        tau, sigma, aa, al, au, _ = adapt_scalars(
            "boyd", consts, (t, t, t, t), it, tau, sigma, aa, al, au,
            pr, pn, dr, dn)
        us, qs, ss = u2, q2, s2
    scal13 = jnp.asarray(
        [1.0, 1.0, 1.0, 0.5, 1.0, 0.5, 0.0, 0.0, 0.0, t, t, t, t],
        jnp.float32)
    mu, mq, ms, mup, mqp, msp, mnorms, sout = ml_fused_multichunk_banded(
        u, q, s, f, scal13, ri, K, nb, "boyd", consts)
    ok = _check("u", us, mu)
    ok = _check("q", qs, mq) and ok
    ok = _check("s", ss, ms) and ok
    ok = _check("tau", tau, sout[0], tol=1e-6) and ok
    return ok and _check("chunks_done", jnp.asarray(float(K)), sout[6])


def verify_banded_multichunk_vol():
    """The banded volumetric multi-chunk kernel vs K sequential banded
    chunk launches + host adaptation, on hardware."""
    import math

    import jax.numpy as jnp

    from prost_tpu.ops.fused_rof import adapt_scalars
    from prost_tpu.ops.fused_vol import (vol_fused_chunk_banded,
                                         vol_fused_multichunk_banded)

    print("vol banded multi-chunk (4x512x256, nb=4, ri=10, K=4):")
    rng = np.random.RandomState(20)
    L, nx, ny = 4, 512, 256
    ri, K, nb = 10, 4, 4
    u = jnp.asarray(rng.rand(L, nx, ny), jnp.float32)
    q = jnp.asarray(0.1 * rng.randn(3, L, nx, ny), jnp.float32)
    q = q.at[0, :, -1, :].set(0.0).at[1, :, :, -1].set(0.0)  # dead duals
    f = jnp.asarray(rng.rand(L, nx, ny), jnp.float32)
    w = jnp.ones_like(u)
    nrows, ncols = float(3 * L * nx * ny), float(L * nx * ny)
    consts = (math.sqrt(nrows), math.sqrt(ncols), 1.5, 0.95, 1.05, 0.8)
    t = 1e-4

    tau = sigma = jnp.asarray(1.0, jnp.float32)
    aa = jnp.asarray(0.5, jnp.float32)
    al = au = jnp.asarray(0.0, jnp.float32)
    us, qs = u, q
    for c in range(K):
        u2, q2, up_, qp_, n2 = vol_fused_chunk_banded(
            us, qs, f, w, tau, sigma, 1.0, 6.0, 0.5, ri, nb)
        pr, pn = jnp.sqrt(n2[0]), jnp.sqrt(n2[1])
        dr, dn = jnp.sqrt(n2[2]), jnp.sqrt(n2[3])
        it = jnp.asarray((c + 1) * ri - 1, jnp.float32)
        tau, sigma, aa, al, au, _ = adapt_scalars(
            "boyd", consts, (t, t, t, t), it, tau, sigma, aa, al, au,
            pr, pn, dr, dn)
        us, qs = u2, q2
    scal13 = jnp.asarray(
        [1.0, 1.0, 1.0, 6.0, 0.5, 0.5, 0.0, 0.0, 0.0, t, t, t, t],
        jnp.float32)
    mu, mq, mup, mqp, mnorms, sout = vol_fused_multichunk_banded(
        u, q, f, w, scal13, ri, K, nb, "square", "boyd", consts)
    ok = _check("u", us, mu)
    ok = _check("q", qs, mq) and ok
    ok = _check("tau", tau, sout[0], tol=1e-6) and ok
    return ok and _check("chunks_done", jnp.asarray(float(K)), sout[6])


def verify_sharded_banded_ml():
    """Banding WITHIN a multilabel shard block (nonzero shard-global
    off_ref) on hardware — round-3 verified only ROF's composition."""
    import jax.numpy as jnp

    from prost_tpu.ops.fused_multilabel import (ml_fused_chunk,
                                                ml_fused_chunk_banded)

    print("ml sharded-banded (shard 1 of 512x256x4, nb=2, ri=10):")
    rng = np.random.RandomState(14)
    L, nx, ny, halo8 = 4, 512, 256, 24
    u = jnp.asarray(rng.rand(L, nx, ny), jnp.float32)
    q = jnp.asarray(0.1 * rng.randn(2 * L, nx, ny), jnp.float32)
    q = q.at[:L, -1, :].set(0.0).at[L:, :, -1].set(0.0)  # dead duals
    s = jnp.asarray(0.1 * rng.randn(nx, ny), jnp.float32)
    f = jnp.asarray(rng.rand(L, nx, ny), jnp.float32)
    args = (0.9, 1.1, 1.0, 0.5, 1.0, 10)
    ref = ml_fused_chunk(u, q, s, f, *args)

    blk = slice(256 - halo8, 512)  # shard 1 owns rows [256, 512)
    outs = ml_fused_chunk_banded(
        u[:, blk], q[:, blk], s[blk], f[:, blk], *args, 2,
        own_lo=halo8, out_rows=256, nx_global=nx,
        row_offset0=jnp.asarray(256 - halo8, jnp.int32))
    own = slice(256, None)
    ok = _check("u2", ref[0][:, own], outs[0])
    ok = _check("q2", ref[1][:, own], outs[1]) and ok
    ok = _check("s2", ref[2][own], outs[2]) and ok
    ok = _check("u_prev", ref[3][:, own], outs[3]) and ok
    return ok


def verify_sharded_banded_tight():
    """Banding WITHIN a tight-multilabel shard block on hardware."""
    import jax.numpy as jnp

    from prost_tpu.ops.fused_tight import (tight_fused_chunk,
                                           tight_fused_chunk_banded)

    print("tight sharded-banded (shard 1 of 256x128x3 k=3, nb=2, ri=10):")
    rng = np.random.RandomState(15)
    L, nx, ny, halo8 = 3, 256, 128, 24
    k = L * (L - 1) // 2
    u = jnp.asarray(rng.rand(L, nx, ny), jnp.float32)
    v = jnp.asarray(0.1 * rng.randn(2 * k, nx, ny), jnp.float32)
    q = jnp.asarray(0.1 * rng.randn(2 * L, nx, ny), jnp.float32)
    p = jnp.asarray(0.1 * rng.randn(2 * k, nx, ny), jnp.float32)
    s = jnp.asarray(0.1 * rng.randn(nx, ny), jnp.float32)
    f = jnp.asarray(rng.rand(L, nx, ny), jnp.float32)
    taps = []
    m = 0
    for a in range(L):
        for b in range(a + 1, L):
            for comp in range(2):
                taps.append((comp * L + a, comp * k + m, 1.0))
                taps.append((comp * L + b, comp * k + m, -1.0))
            m += 1
    taps = tuple(taps)
    consts = (0.5, 1.0, 1.0 / L, 1.0 / (2.0 + L), 1.0 / 3.0)
    args = (0.9, 1.1, 1.0, 0.5, 1.0, 10, taps, consts)
    new_r, prev_r, _ = tight_fused_chunk(u, v, q, p, s, f, *args)

    blk = slice(128 - halo8, 256)  # shard 1 owns rows [128, 256)
    new_b, prev_b, _ = tight_fused_chunk_banded(
        u[:, blk], v[:, blk], q[:, blk], p[:, blk], s[blk], f[:, blk],
        *args, 2, own_lo=halo8, out_rows=128, nx_global=nx,
        row_offset0=jnp.asarray(128 - halo8, jnp.int32))
    ok = True
    for i, (a, b) in enumerate(zip(new_r, new_b)):
        own = (slice(128, None),) if a.ndim == 2 \
            else (slice(None), slice(128, None))
        ok = _check(f"new[{i}]", a[own], b) and ok
    return ok


def verify_sharded_banded_deblur():
    """Banding WITHIN a deblur shard block (own_lo != 0 path: uniform
    interior fetches, no edge zero-fill) on hardware."""
    import jax.numpy as jnp

    from prost_tpu.ops.fused_deblur import (deblur_fused_chunk,
                                            deblur_fused_chunk_banded)

    print("deblur sharded-banded (shard 1 of nx2=512, nb=2, ri=4):")
    nx = ny = 506
    kk = 7
    nx2 = ny2 = nx + kk - 1
    taps = tuple((dx, dy, 1.0 / (16 * (1 + dx + dy)))
                 for dx in range(0, kk, 2) for dy in range(0, kk, 2))
    rng = np.random.RandomState(16)

    def emb(a):
        out = np.zeros(a.shape[:-2] + (nx2, ny2), np.float32)
        out[..., :nx, :ny] = a
        return jnp.asarray(out)

    x = emb(rng.rand(nx, ny).astype(np.float32))
    q = emb(0.2 * rng.randn(2, nx, ny).astype(np.float32))
    yv = jnp.asarray(0.1 * rng.randn(nx2, ny2), jnp.float32)
    fb = jnp.asarray(rng.rand(nx2, ny2), jnp.float32)
    sv = jnp.asarray(0.5 + rng.rand(nx2, ny2), jnp.float32)
    args = (0.9, 1.1, 1.0, 25.0, 0.5, 4, nx, ny, taps, 0.5, 0.2)
    ref = deblur_fused_chunk(x, yv, q, fb, sv, *args)

    halo8 = 64  # 8-rounded (2*ri+2)*reach conv halo for ri=4
    # shard 1 owns padded rows [256, 512); the halo-extended block the
    # real sharded path builds has halo rows on BOTH sides (ppermute
    # zero-fills past the domain edge) — the deblur kernel's uniform
    # interior windows REQUIRE the bottom halo to exist (no clamping;
    # omitting it DMAs out of bounds and kills the device context)
    blk = slice(256 - halo8, 512)

    def ext_blk(a):
        pad = [(0, 0)] * (a.ndim - 2) + [(0, halo8), (0, 0)]
        return jnp.pad(a[..., blk, :], pad)

    outs = deblur_fused_chunk_banded(
        ext_blk(x), ext_blk(yv), ext_blk(q), ext_blk(fb), ext_blk(sv),
        *args, 2, own_lo=halo8, out_rows=256,
        row_offset0=jnp.asarray(256 - halo8, jnp.int32))
    own = slice(256, None)
    ok = _check("x2", ref[0][own], outs[0])
    ok = _check("yv2", ref[1][own], outs[1]) and ok
    ok = _check("q2", ref[2][:, own], outs[2]) and ok
    return ok


def verify_sharded_banded_vol():
    """Banding WITHIN a volumetric shard block on hardware (round-4
    ShardedFusedVol composition)."""
    import jax.numpy as jnp

    from prost_tpu.ops.fused_vol import (vol_fused_chunk,
                                         vol_fused_chunk_banded)

    print("vol sharded-banded (shard 1 of 4x512x256, nb=2, ri=10):")
    rng = np.random.RandomState(17)
    L, nx, ny, halo8 = 4, 512, 256, 24
    u = jnp.asarray(rng.rand(L, nx, ny), jnp.float32)
    q = jnp.asarray(0.1 * rng.randn(3, L, nx, ny), jnp.float32)
    q = q.at[0, :, -1, :].set(0.0).at[1, :, :, -1].set(0.0)  # dead duals
    f = jnp.asarray(rng.rand(L, nx, ny), jnp.float32)
    w = jnp.ones_like(u)
    args = (0.9, 1.1, 1.0, 6.0, 0.5, 10)
    ref = vol_fused_chunk(u, q, f, w, *args)

    blk = slice(256 - halo8, 512)
    outs = vol_fused_chunk_banded(
        u[:, blk], q[:, :, blk], f[:, blk], w[:, blk], *args, 2,
        own_lo=halo8, out_rows=256, nx_global=nx,
        row_offset0=jnp.asarray(256 - halo8, jnp.int32))
    own = slice(256, None)
    ok = _check("u2", ref[0][:, own], outs[0])
    ok = _check("q2", ref[1][:, :, own], outs[1]) and ok
    return ok


def verify_sharded_banded():
    """Banded kernel on a halo-extended SHARD block (own_lo/out_rows/
    row_offset0 path) vs the whole-plane kernel — the shard composition's
    DMA offset arithmetic, on real hardware.  The shard_map wrapper adds
    only ppermutes (mesh-independent math), so verifying the per-shard
    kernel on one chip covers the hardware-specific surface."""
    import jax.numpy as jnp

    from prost_tpu.ops.fused_rof import (rof_fused_chunk,
                                         rof_fused_chunk_banded)

    print("ROF sharded-banded (512 rows of 1024x512, nb=4, ri=10):")
    rng = np.random.RandomState(9)
    nx, ny, halo8 = 1024, 512, 24
    x = jnp.asarray(rng.rand(nx, ny), jnp.float32)
    q = jnp.asarray(0.1 * rng.randn(2, nx, ny), jnp.float32)
    q = q.at[0, -1, :].set(0.0).at[1, :, -1].set(0.0)  # dead duals
    f = jnp.asarray(rng.rand(nx, ny), jnp.float32)
    w = jnp.ones_like(x)
    args = (0.9, 1.1, 1.0, 16.0, 0.5, 10)
    ref = rof_fused_chunk(x, q, f, w, *args)

    # shard 1 of 2: owns rows [512, 1024); extended block [488, 1024)
    blk = slice(512 - halo8, 1024)
    x2, q2, xp, qp, _ = rof_fused_chunk_banded(
        x[blk], q[:, blk], f[blk], w[blk], *args, 4,
        own_lo=halo8, out_rows=512, nx_global=nx,
        row_offset0=jnp.asarray(512 - halo8, jnp.int32))
    ok = _check("x2", ref[0][512:], x2)
    ok = _check("q2", ref[1][:, 512:], q2) and ok
    ok = _check("x_prev", ref[2][512:], xp) and ok
    return _check("q_prev", ref[3][:, 512:], qp) and ok


def verify_ensemble_banded():
    """Banded+batched ensemble kernel (grid = (B, n_bands)) vs the
    whole-instance batched kernel on real hardware."""
    import jax.numpy as jnp

    from prost_tpu.ops.fused_rof import (rof_fused_chunk_banded_batched,
                                         rof_fused_chunk_batched)

    print("ROF ensemble banded (B=4 x 256x256, nb=2, ri=10):")
    rng = np.random.RandomState(10)
    B, nx, ny = 4, 256, 256
    x = jnp.asarray(rng.rand(B, nx, ny), jnp.float32)
    q = jnp.asarray(0.1 * rng.randn(B, 2, nx, ny), jnp.float32)
    q = q.at[:, 0, -1, :].set(0.0).at[:, 1, :, -1].set(0.0)  # dead duals
    f = jnp.asarray(rng.rand(B, nx, ny), jnp.float32)
    w = jnp.ones_like(x)
    scal = jnp.asarray(0.5 + rng.rand(5, B), jnp.float32)
    ref = rof_fused_chunk_batched(x, q, f, w, scal, 10)
    ban = rof_fused_chunk_banded_batched(x, q, f, w, scal, 10, 2)
    ok = all(_check(f"out[{i}]", a, b) for i, (a, b) in
             enumerate(zip(ref[:4], ban[:4])))
    ok = _check("norms", ref[4], ban[4], tol=1e-5) and ok
    # nb=4: interior bands with unclamped offsets inside each instance
    ban4 = rof_fused_chunk_banded_batched(x, q, f, w, scal, 10, 4)
    ok = all(_check(f"nb4 out[{i}]", a, b) for i, (a, b) in
             enumerate(zip(ref[:4], ban4[:4]))) and ok
    return ok and _check("nb4 norms", ref[4], ban4[4], tol=1e-5)


def verify_vol():
    """Banded volumetric-TV kernel vs the whole-volume kernel on real
    hardware (ops/fused_vol.py)."""
    import jax.numpy as jnp

    from prost_tpu.ops.fused_vol import (vol_fused_chunk,
                                         vol_fused_chunk_banded)

    print("volumetric banded (8x256x256, nb=2, ri=10):")
    rng = np.random.RandomState(11)
    L, nx, ny = 8, 256, 256
    u = jnp.asarray(rng.rand(L, nx, ny), jnp.float32)
    q = jnp.asarray(0.1 * rng.randn(3, L, nx, ny), jnp.float32)
    q = q.at[0, :, -1, :].set(0.0).at[1, :, :, -1].set(0.0)  # dead duals
    f = jnp.asarray(rng.rand(L, nx, ny), jnp.float32)
    w = jnp.ones_like(u)
    args = (0.9, 1.1, 1.0, 6.0, 0.5, 10)
    ref = vol_fused_chunk(u, q, f, w, *args)
    ban = vol_fused_chunk_banded(u, q, f, w, *args, 2)
    ok = all(_check(f"out[{i}]", a, b) for i, (a, b) in
             enumerate(zip(ref[:4], ban[:4])))
    ok = _check("norms", ref[4], ban[4], tol=1e-5) and ok
    # double-buffered variant (round-4)
    db = vol_fused_chunk_banded(u, q, f, w, *args, 2, double_buffer=True)
    ok = all(_check(f"db out[{i}]", a, b) for i, (a, b) in
             enumerate(zip(ref[:4], db[:4]))) and ok
    return ok and _check("db norms", ref[4], db[4], tol=1e-5)


def main():
    import jax

    if jax.default_backend() == "cpu":
        print("No TPU available — this verifier needs real hardware.")
        sys.exit(2)
    argv = sys.argv[1:]
    json_path = None
    if "--json" in argv:
        i = argv.index("--json")
        json_path = argv[i + 1]
        argv = argv[:i] + argv[i + 2:]
    want = set(argv)  # optional subset, e.g. tpu_verify.py deblur
    results = {}
    for name, fn in (("rof", verify_rof), ("ml", verify_ml),
                     ("tight", verify_tight), ("deblur", verify_deblur),
                     ("admm", verify_admm), ("admm_banded", verify_admm_banded),
                     ("admm_chunk_banded", verify_admm_chunk_banded),
                     ("multichunk", verify_multichunk),
                     ("multichunk_ml", verify_multichunk_ml),
                     ("banded_multichunk", verify_banded_multichunk),
                     ("banded_multichunk_ml", verify_banded_multichunk_ml),
                     ("banded_multichunk_vol", verify_banded_multichunk_vol),
                     ("sharded_banded", verify_sharded_banded),
                     ("sharded_banded_ml", verify_sharded_banded_ml),
                     ("sharded_banded_tight", verify_sharded_banded_tight),
                     ("sharded_banded_deblur", verify_sharded_banded_deblur),
                     ("sharded_banded_vol", verify_sharded_banded_vol),
                     ("ensemble_banded", verify_ensemble_banded),
                     ("vol", verify_vol)):
        if want and name not in want:
            continue
        del _CHECKS[:]
        try:
            results[name] = {"ok": fn()}
        except Exception as e:  # compile/runtime failure is a failure
            print(f"  {name}: EXCEPTION {type(e).__name__}: {e}")
            results[name] = {"ok": False, "error": f"{type(e).__name__}: {e}"}
        results[name]["checks"] = list(_CHECKS)
    if json_path:
        with open(json_path, "w") as fh:
            json.dump({
                "date": time.strftime("%Y-%m-%d %H:%M:%S"),
                "device": str(jax.devices()[0]),
                "partial": sorted(want) if want else False,
                "results": results,
            }, fh, indent=1)
        print(f"wrote {json_path}")
    bad = [k for k, v in results.items() if not v["ok"]]
    if bad:
        print(f"FAILED: {', '.join(bad)}")
        sys.exit(1)
    print("all banded kernels bit-equivalent on hardware")


if __name__ == "__main__":
    main()
