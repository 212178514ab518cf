"""A/B probes for committed kernel-routing decisions, on the real TPU:

* ROF banded chunk: single- vs double-buffered window DMA at 2048^2 and
  4096^2 (VERDICT r2 next-step #3).
* Fused ADMM whole-plane 512^2: CGLS vs Chebyshev inner projection (the
  projection="auto" default).
* Banded Chebyshev-ADMM per-iteration kernel at 2048^2 (with/without
  in-kernel norms).

Timing: tools/probe_timing.py serial-chain method (the earlier host-loop
timeit under-reported device time ~7x on this platform — round-2/-3
numbers measured with it are superseded by these).  Run ONE TPU process
at a time.
"""

import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from probe_timing import chain_loop, serial_chunk_time  # noqa: E402


def main():
    import jax.numpy as jnp

    from prost_tpu.ops.fused_admm import admm_banded_iter, admm_fused_chunk
    from prost_tpu.ops.fused_rof import band_count, rof_fused_chunk_banded

    ri = 10
    rng = np.random.RandomState(0)
    # double-buffered scratch is ~27 live planes vs 20 single-buffer:
    # pick each variant's band count at its own VMEM footprint
    cases = ((2048, band_count(2048, 2048, ri),
              band_count(2048, 2048, ri, n_planes=27), 5, 55),
             (4096, band_count(4096, 4096, ri),
              band_count(4096, 4096, ri, n_planes=27), 3, 23))
    for nx, nb, nb_db, short, long_ in cases:
        ny = nx
        x = jnp.asarray(rng.rand(nx, ny), jnp.float32)
        q = jnp.asarray(0.1 * rng.randn(2, nx, ny), jnp.float32)
        f = jnp.asarray(rng.rand(nx, ny), jnp.float32)
        w = jnp.ones_like(x)

        for db, _nb in ((False, nb), (True, nb_db)):
            # f/w ride the carry so they enter as jit arguments, not
            # baked-in constants (remote compile rejects big programs)
            def chunk(st, _db=db, _n=_nb):
                x_, q_, f_, w_ = st
                x2, q2, xp, qp, norms = rof_fused_chunk_banded(
                    x_, q_, f_, w_, 0.9, 1.1, 1.0, 16.0, 0.5, ri, _n,
                    double_buffer=_db)
                return (x2, q2, f_, w_), norms[0]

            t = serial_chunk_time(chain_loop(chunk, (x, q, f, w)),
                                  short=short, long_=long_)
            name = "double" if db else "single"
            print(f"ROF {nx}^2 nb={_nb} {name}-buffer: {1e6*t:.0f} "
                  f"us/chunk ({ri/t/1e3:.2f}k it/s kernel-only)",
                  flush=True)

    # whole-plane ADMM chunk: CGLS (reductions + masked loop) vs
    # Chebyshev (pure stencils) at 512^2, ri=10
    nx = ny = 512
    xh = jnp.asarray(0.3 * rng.randn(nx, ny), jnp.float32)
    xp_, xd, warm = xh + 0.1, xh * 0.5, xh * 0.2
    zh = jnp.asarray(0.3 * rng.randn(2, nx, ny), jnp.float32)
    zp_, zd = zh * 0.9, zh * 0.1
    f = jnp.asarray(rng.rand(nx, ny), jnp.float32)
    w = jnp.ones_like(f)
    rho = jnp.asarray(1.0, jnp.float32)
    tols = jnp.asarray(np.full(10, 1e-9), jnp.float32)

    for name, deg in (("cgls", None), ("cheby", 10)):
        def chunk(st, _d=deg):
            f_, w_ = st[7], st[8]
            out = admm_fused_chunk(
                *st[:7], f_, w_, rho, 16.0,
                0.5, tols, ri, 10, 1.7, cheby_degree=_d)
            return out[:7] + (f_, w_), out[7][0]

        t = serial_chunk_time(
            chain_loop(chunk, (xh, xp_, xd, zh, zp_, zd, warm, f, w)),
            short=10, long_=110)
        print(f"ADMM 512^2 whole {name}: {1e6*t:.0f} us/chunk "
              f"({ri/t/1e3:.2f}k it/s kernel-only)", flush=True)

    # banded Chebyshev-ADMM per-iteration kernel at 2048^2
    nx = ny = 2048
    xh = jnp.asarray(0.3 * rng.randn(nx, ny), jnp.float32)
    xp_, xd, warm = xh + 0.1, xh * 0.5, xh * 0.2
    zh = jnp.asarray(0.3 * rng.randn(2, nx, ny), jnp.float32)
    zp_, zd = zh * 0.9, zh * 0.1
    f = jnp.asarray(rng.rand(nx, ny), jnp.float32)
    w = jnp.ones_like(f)
    for wn in (False, True):
        def chunk(st, _wn=wn):
            f_, w_ = st[7], st[8]
            out = admm_banded_iter(
                st[0], st[1], st[2], st[3], st[4], st[5], st[6], f_, w_,
                rho, 16.0, 0.5, 8, 10, 1.7, with_norms=_wn)
            return out[:7] + (f_, w_), out[7][0]

        t = serial_chunk_time(
            chain_loop(chunk, (xh, xp_, xd, zh, zp_, zd, warm, f, w)),
            short=10, long_=110)
        print(f"ADMM 2048^2 nb=8 deg=10 norms={wn}: {1e6*t:.0f} us/iter "
              f"(-> {1/t:.0f} it/s kernel-only)", flush=True)


if __name__ == "__main__":
    main()
