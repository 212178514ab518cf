"""Microbenchmark the ml banded chunk kernel in isolation on the TPU:
times (a) the whole-plane ml kernel at 256x256x8, (b) the banded kernel
at 512x512x8 (nb=4 selected vs forced nb=2), and (c) the banded kernel
at 256x256x8 with n_bands=2 (same total work as (a) + halo overhead) —
to separate intrinsic banded compute slowness from chunk-level effects.

Timing: tools/probe_timing.py serial-chain method (the earlier host-loop
timeit under-reported device time on this platform)."""

import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from probe_timing import chain_loop, serial_chunk_time  # noqa: E402


def main():
    import jax.numpy as jnp

    from prost_tpu.ops.fused_multilabel import (ml_fused_chunk,
                                                ml_fused_chunk_banded)

    ri = 10
    rng = np.random.RandomState(0)

    def mk(L, nx, ny):
        u = jnp.asarray(rng.rand(L, nx, ny), jnp.float32)
        q = jnp.asarray(0.1 * rng.randn(2 * L, nx, ny), jnp.float32)
        s = jnp.asarray(0.1 * rng.randn(nx, ny), jnp.float32)
        f = jnp.asarray(rng.rand(L, nx, ny), jnp.float32)
        return u, q, s, f

    args = (0.9, 1.1, 1.0, 0.5, 1.0)

    def measure(name, fn, state, short=10, long_=110):
        # the f planes ride the carry so they enter as jit arguments
        def chunk(st):
            u2, q2, s2, up, qp, sp, norms2 = fn(st[0], st[1], st[2], st[3])
            return (u2, q2, s2, st[3]), norms2[0]

        t = serial_chunk_time(chain_loop(chunk, state), short=short,
                              long_=long_)
        print(f"{name}: {1e6*t:.0f} us/chunk "
              f"({ri/t/1e3:.1f}k it/s kernel-only)", flush=True)
        return t

    u, q, s, f = mk(8, 256, 256)
    t = measure("whole 256x256x8",
                lambda u_, q_, s_, f_: ml_fused_chunk(
                    u_, q_, s_, f_, *args, ri), (u, q, s, f))
    t2 = measure("banded 256x256x8 nb=2",
                 lambda u_, q_, s_, f_: ml_fused_chunk_banded(
                     u_, q_, s_, f_, *args, ri, 2), (u, q, s, f))
    print(f"  -> nb=2 banding overhead at equal work: {t2/t:.2f}x",
          flush=True)

    u, q, s, f = mk(8, 512, 512)
    for nb in (4, 2):
        t4 = measure(f"banded 512x512x8 nb={nb}",
                     lambda u_, q_, s_, f_, _n=nb: ml_fused_chunk_banded(
                         u_, q_, s_, f_, *args, ri, _n), (u, q, s, f),
                     short=5, long_=55)
        print(f"  -> {t4/(4*t):.2f}x of 4x whole-256", flush=True)


if __name__ == "__main__":
    main()
