"""Serial-chain kernel-only rates for every whole-plane fused chunk
kernel (ROF, TV-L1, multilabel, tight, deblur, vol, ADMM-cheby/cgls) at
the PERFORMANCE.md benchmark sizes.  These are the in-kernel numbers the
roofline table (tools/roofline.py) pairs with bench.py's end-to-end
rates; the gap between the two is per-chunk dispatch/state glue.

Timing: tools/probe_timing.py (see its docstring for why the earlier
host-loop probes under-reported).  Run ONE TPU process at a time.
"""

import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from probe_timing import chain_loop, serial_chunk_time  # noqa: E402
from deblur_probe import motion_taps  # noqa: E402


def main():
    import jax.numpy as jnp

    ri = 10
    rng = np.random.RandomState(0)
    results = {}

    def measure(name, chunk, init, short=10, long_=110):
        t = serial_chunk_time(chain_loop(chunk, init), short=short,
                              long_=long_)
        results[name] = ri / t
        print(f"{name}: {1e6*t:.0f} us/chunk "
              f"({ri/t/1e3:.1f}k it/s kernel-only)", flush=True)

    # ROF 512^2 (square) and TV-L1 (abs)
    from prost_tpu.ops.fused_rof import rof_fused_chunk

    nx = ny = 512
    x = jnp.asarray(rng.rand(nx, ny), jnp.float32)
    q = jnp.asarray(0.1 * rng.randn(2, nx, ny), jnp.float32)
    f = jnp.asarray(rng.rand(nx, ny), jnp.float32)
    w = jnp.ones_like(x)
    for dt in ("square", "abs"):
        def chunk(st, _dt=dt):
            x2, q2, xp, qp, norms = rof_fused_chunk(
                st[0], st[1], st[2], st[3], 0.9, 1.1, 1.0, 16.0, 0.5,
                ri, dataterm=_dt)
            return (x2, q2, st[2], st[3]), norms[0]

        measure(f"rof512 {dt}", chunk, (x, q, f, w), short=20, long_=220)

    # multilabel 256x256x8
    from prost_tpu.ops.fused_multilabel import ml_fused_chunk

    u = jnp.asarray(rng.rand(8, 256, 256), jnp.float32)
    qm = jnp.asarray(0.1 * rng.randn(16, 256, 256), jnp.float32)
    sm = jnp.asarray(0.1 * rng.randn(256, 256), jnp.float32)
    fm = jnp.asarray(rng.rand(8, 256, 256), jnp.float32)

    def chunk(st):
        u2, q2, s2, up, qp, sp, norms2 = ml_fused_chunk(
            st[0], st[1], st[2], st[3], 0.9, 1.1, 1.0, 0.5, 1.0, ri)
        return (u2, q2, s2, st[3]), norms2[0]

    measure("ml256x8", chunk, (u, qm, sm, fm))

    # tight 128x128x4 (k=6)
    from prost_tpu.ops.fused_tight import match_tight_structure  # noqa
    import bench

    bt = bench.build_tight(128, 128, L=4)
    t_ = bt.tight
    from prost_tpu.ops.fused_tight import tight_fused_chunk

    L, k = t_["L"], t_["k"]
    nx = ny = 128
    ut = jnp.asarray(rng.rand(L, nx, ny), jnp.float32)
    vt = jnp.asarray(0.1 * rng.randn(2 * k, nx, ny), jnp.float32)
    qt = jnp.asarray(0.1 * rng.randn(2 * L, nx, ny), jnp.float32)
    pt_ = jnp.asarray(0.1 * rng.randn(2 * k, nx, ny), jnp.float32)
    st_ = jnp.asarray(0.1 * rng.randn(nx, ny), jnp.float32)
    ft = jnp.asarray(t_["f"], jnp.float32)
    radius = jnp.asarray(t_["radius"], jnp.float32)
    d_s = jnp.asarray(t_["d_s"], jnp.float32)

    def chunk(st):
        new, prev, norms2 = tight_fused_chunk(
            st[0], st[1], st[2], st[3], st[4], st[5], 0.9, 1.1, 1.0,
            radius, d_s, ri, t_["taps"], t_["consts"])
        return tuple(new) + (st[5],), norms2[0]

    measure("tight128x4", chunk, (ut, vt, qt, pt_, st_, ft),
            short=20, long_=220)

    # deblur 512^2 T=7
    from prost_tpu.ops import fused_deblur as fd

    nx = ny = 512
    klen = 9
    nx2, ny2 = nx + klen - 1, ny + klen - 1
    taps = motion_taps(klen)

    def emb(a):
        out = np.zeros(a.shape[:-2] + (nx2, ny2), np.float32)
        out[..., :nx, :ny] = a
        return jnp.asarray(out)

    xd = emb(rng.rand(nx, ny))
    qd = emb(0.1 * rng.randn(2, nx, ny))
    yv = jnp.asarray(0.1 * rng.randn(nx2, ny2), jnp.float32)
    fb = jnp.asarray(rng.rand(nx2, ny2), jnp.float32)
    sv = jnp.ones((nx2, ny2), jnp.float32) * 0.2

    def chunk(st):
        x2, yv2, q2, xp, yvp, qp, norms = fd.deblur_fused_chunk(
            st[0], st[1], st[2], st[3], st[4], 0.9, 1.1, 1.0, 100.0, 1.0,
            ri, nx, ny, taps, 0.5, 1.0 / 7.0)
        return (x2, yv2, q2, st[3], st[4]), norms[0]

    measure("deblur512 T=7", chunk, (xd, yv, qd, fb, sv))

    # vol 8x256x256
    from prost_tpu.ops.fused_vol import vol_fused_chunk

    uv = jnp.asarray(rng.rand(8, 256, 256), jnp.float32)
    qv = jnp.asarray(0.1 * rng.randn(3, 8, 256, 256), jnp.float32)
    fv = jnp.asarray(rng.rand(8, 256, 256), jnp.float32)
    wv = jnp.ones_like(uv)

    def chunk(st):
        u2, q2, up, qp, norms2 = vol_fused_chunk(
            st[0], st[1], st[2], st[3], 0.9, 1.1, 1.0, 6.0, 0.5, ri)
        return (u2, q2, st[2], st[3]), norms2[0]

    measure("vol8x256", chunk, (uv, qv, fv, wv))

    print(" ".join(f"{k.split()[0]}={v:.0f}" for k, v in results.items()))


if __name__ == "__main__":
    main()
