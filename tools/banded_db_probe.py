"""A/B the single-buffer vs double-buffered ROF banded chunk kernels on
the real TPU (VERDICT r2 next-step #3): the double-buffered variant
overlaps band i+1's window fetch and band i-1's writeback with band i's
compute, targeting the ~12% un-hidden band DMA measured at ROF 2048^2.
Also times the banded Chebyshev-ADMM iteration kernel at large sizes.

Two-point timing per bench.py's method (see tools/ml_banded_probe.py);
run ONE TPU process at a time.
"""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def timeit(fn, *args, short=30, long_=230):
    import jax

    out = fn(*args)
    jax.block_until_ready(out)

    def run(n):
        t0 = time.perf_counter()
        o = None
        for _ in range(n):
            o = fn(*args)
        jax.block_until_ready(o)
        return time.perf_counter() - t0

    # median of SANE estimates only: a contention spike inside the short
    # run makes (tl - ts) artificially small, and min-positive-of-N then
    # cherry-picks exactly the corrupted pair (measured: a 30x-too-fast
    # "33 us/chunk" at 2048^2 under heavy tunnel load).  Require the
    # delta to carry most of the long run (bench.py's 0.2 guard) and
    # report the median.
    import numpy as _np

    ests = []
    for _ in range(4):
        ts = run(short)
        tl = run(long_)
        delta = tl - ts
        if delta >= 0.2 * tl:
            ests.append(delta / (long_ - short))
    if not ests:
        raise RuntimeError(
            "measurement failed: every two-point delta was "
            "contention-corrupted — rerun on a quieter chip"
        )
    return float(_np.median(ests))


def main():
    import jax
    import jax.numpy as jnp

    from prost_tpu.ops.fused_admm import admm_banded_iter
    from prost_tpu.ops.fused_rof import rof_fused_chunk_banded

    from prost_tpu.ops.fused_rof import band_count

    ri = 10
    rng = np.random.RandomState(0)
    # double-buffered scratch is ~27 live planes vs 20 single-buffer:
    # pick each variant's band count at its own VMEM footprint
    cases = ((2048, band_count(2048, 2048, ri),
              band_count(2048, 2048, ri, n_planes=27)),
             (4096, band_count(4096, 4096, ri),
              band_count(4096, 4096, ri, n_planes=27)))
    for nx, nb, nb_db in cases:
        ny = nx
        x = jnp.asarray(rng.rand(nx, ny), jnp.float32)
        q = jnp.asarray(0.1 * rng.randn(2, nx, ny), jnp.float32)
        f = jnp.asarray(rng.rand(nx, ny), jnp.float32)
        w = jnp.ones_like(x)
        short, long_ = (30, 230) if nx == 2048 else (10, 60)

        sb = jax.jit(lambda x_, q_, f_, w_, _nb=nb: rof_fused_chunk_banded(
            x_, q_, f_, w_, 0.9, 1.1, 1.0, 16.0, 0.5, ri, _nb))
        t1 = timeit(sb, x, q, f, w, short=short, long_=long_)
        print(f"ROF {nx}^2 nb={nb} single-buffer: {1e6*t1:.0f} us/chunk",
              flush=True)
        db = jax.jit(lambda x_, q_, f_, w_, _nb=nb_db: rof_fused_chunk_banded(
            x_, q_, f_, w_, 0.9, 1.1, 1.0, 16.0, 0.5, ri, _nb,
            double_buffer=True))
        t2 = timeit(db, x, q, f, w, short=short, long_=long_)
        print(f"ROF {nx}^2 nb={nb_db} double-buffer: {1e6*t2:.0f} us/chunk "
              f"({t2/t1:.3f}x of single)", flush=True)

    # whole-plane ADMM chunk: CGLS (reductions + masked loop) vs
    # Chebyshev (pure stencils) at 512^2, ri=10
    from prost_tpu.ops.fused_admm import admm_fused_chunk

    nx = ny = 512
    xh = jnp.asarray(0.3 * rng.randn(nx, ny), jnp.float32)
    xp_, xd, warm = xh + 0.1, xh * 0.5, xh * 0.2
    zh = jnp.asarray(0.3 * rng.randn(2, nx, ny), jnp.float32)
    zp_, zd = zh * 0.9, zh * 0.1
    f = jnp.asarray(rng.rand(nx, ny), jnp.float32)
    w = jnp.ones_like(f)
    rho = jnp.asarray(1.0, jnp.float32)
    tols = jnp.asarray(np.full(10, 1e-9), jnp.float32)
    cg = jax.jit(lambda *a: admm_fused_chunk(*a, tols, 10, 10, 1.7))
    t1 = timeit(cg, xh, xp_, xd, zh, zp_, zd, warm, f, w, rho, 16.0, 0.5,
                short=20, long_=120)
    print(f"ADMM 512^2 whole cgls:  {1e6*t1:.0f} us/chunk", flush=True)
    ch = jax.jit(lambda *a: admm_fused_chunk(*a, tols, 10, 10, 1.7,
                                             cheby_degree=10))
    t2 = timeit(ch, xh, xp_, xd, zh, zp_, zd, warm, f, w, rho, 16.0, 0.5,
                short=20, long_=120)
    print(f"ADMM 512^2 whole cheby: {1e6*t2:.0f} us/chunk "
          f"({t2/t1:.3f}x of cgls)", flush=True)

    # banded Chebyshev-ADMM per-iteration kernel at 2048^2
    nx = ny = 2048
    xh = jnp.asarray(0.3 * rng.randn(nx, ny), jnp.float32)
    xp_, xd, warm = xh + 0.1, xh * 0.5, xh * 0.2
    zh = jnp.asarray(0.3 * rng.randn(2, nx, ny), jnp.float32)
    zp_, zd = zh * 0.9, zh * 0.1
    f = jnp.asarray(rng.rand(nx, ny), jnp.float32)
    w = jnp.ones_like(f)
    rho = jnp.asarray(1.0, jnp.float32)
    for wn in (False, True):
        fn = jax.jit(lambda *a, _wn=wn: admm_banded_iter(
            *a, 8, 10, 1.7, with_norms=_wn))
        t = timeit(fn, xh, xp_, xd, zh, zp_, zd, warm, f, w, rho, 16.0,
                   0.5, short=20, long_=120)
        print(f"ADMM 2048^2 nb=8 deg=10 norms={wn}: {1e6*t:.0f} us/iter "
              f"(-> {1/t:.0f} it/s kernel-only)", flush=True)


if __name__ == "__main__":
    main()
