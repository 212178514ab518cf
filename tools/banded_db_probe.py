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

    best = float("inf")
    for _ in range(4):
        ts = run(short)
        tl = run(long_)
        est = (tl - ts) / (long_ - short)
        if est > 0:
            best = min(best, est)
    if best == float("inf"):
        raise RuntimeError(
            "measurement failed: all two-point deltas non-positive "
            "(tunnel contention) — rerun on a quieter chip"
        )
    return best


def main():
    import jax
    import jax.numpy as jnp

    from prost_tpu.ops.fused_admm import admm_banded_iter
    from prost_tpu.ops.fused_rof import rof_fused_chunk_banded

    ri = 10
    rng = np.random.RandomState(0)
    for nx, nb in ((2048, 8), (4096, 16)):
        ny = nx
        x = jnp.asarray(rng.rand(nx, ny), jnp.float32)
        q = jnp.asarray(0.1 * rng.randn(2, nx, ny), jnp.float32)
        f = jnp.asarray(rng.rand(nx, ny), jnp.float32)
        w = jnp.ones_like(x)
        args = (0.9, 1.1, 1.0, 16.0, 0.5, ri, nb)
        short, long_ = (30, 230) if nx == 2048 else (10, 60)

        sb = jax.jit(lambda *a: rof_fused_chunk_banded(*a))
        t1 = timeit(sb, x, q, f, w, *args, short=short, long_=long_)
        print(f"ROF {nx}^2 nb={nb} single-buffer: {1e6*t1:.0f} us/chunk",
              flush=True)
        db = jax.jit(
            lambda *a: rof_fused_chunk_banded(*a, double_buffer=True))
        t2 = timeit(db, x, q, f, w, *args, short=short, long_=long_)
        print(f"ROF {nx}^2 nb={nb} double-buffer: {1e6*t2:.0f} us/chunk "
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
