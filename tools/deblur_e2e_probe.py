"""Bisect the end-to-end fused-deblur chunk overhead (round 3): the raw
whole-plane chunk kernel measures ~30 us but the solver path measures
~1 ms/chunk.  Time a while_loop of (a) bare kernel chunks carried as
planes, (b) kernel + the _fused_deblur_run embed/unpack glue per chunk.

Run ONE TPU process at a time.
"""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from deblur_probe import motion_taps  # noqa: E402


def main():
    import jax
    import jax.numpy as jnp
    from jax import lax

    from prost_tpu.ops import fused_deblur as fd

    ri = 10
    nx = ny = 512
    klen = 9
    nx2, ny2 = nx + klen - 1, ny + klen - 1
    n, m2 = nx * ny, nx2 * ny2
    taps = motion_taps(klen)
    rng = np.random.RandomState(0)

    def emb(a):
        out = np.zeros(a.shape[:-2] + (nx2, ny2), np.float32)
        out[..., :nx, :ny] = a
        return jnp.asarray(out)

    x = emb(rng.rand(nx, ny))
    q = emb(0.1 * rng.randn(2, nx, ny))
    yv = jnp.asarray(0.1 * rng.randn(nx2, ny2), jnp.float32)
    fb = jnp.asarray(rng.rand(nx2, ny2), jnp.float32)
    sv = jnp.ones((nx2, ny2), jnp.float32) * 0.2

    def kern(x_, yv_, q_):
        return fd.deblur_fused_chunk(
            x_, yv_, q_, fb, sv, 0.9, 1.1, 1.0, 100.0, 1.0, ri, nx, ny,
            taps, 0.5, 1.0 / 7.0)

    @jax.jit
    def loop_bare(x_, yv_, q_, nchunks):
        def body(c):
            i, x_, yv_, q_, acc = c
            x2, yv2, q2, xp, yvp, qp, norms = kern(x_, yv_, q_)
            return i + 1, x2, yv2, q2, acc + norms[0]

        out = lax.while_loop(lambda c: c[0] < nchunks, body,
                             (jnp.asarray(0, jnp.int32), x_, yv_, q_,
                              jnp.asarray(0.0, jnp.float32)))
        return out[1], out[4]

    @jax.jit
    def loop_glue(xf, yf, nchunks):
        """State as the solver's flat vectors; embed/unpack per chunk as
        _fused_deblur_run.fused_chunk does."""
        def body(c):
            i, xf, yf, acc = c
            x_ = fd._embed(xf.reshape(nx, ny), nx2, ny2)
            yv_ = yf[:m2].reshape(nx2, ny2)
            q_ = fd._embed(yf[m2:].reshape(2, nx, ny), nx2, ny2)
            x2, yv2, q2, xp, yvp, qp, norms = kern(x_, yv_, q_)
            xf2 = x2[:nx, :ny].reshape(-1)
            yf2 = jnp.concatenate([yv2.reshape(-1),
                                   q2[:, :nx, :ny].reshape(-1)])
            xp2 = xp[:nx, :ny].reshape(-1)
            yp2 = jnp.concatenate([yvp.reshape(-1),
                                   qp[:, :nx, :ny].reshape(-1)])
            return i + 1, xf2, yf2 + 0.0 * yp2 + 0.0 * xp2.sum(), \
                acc + norms[0]

        out = lax.while_loop(lambda c: c[0] < nchunks, body,
                             (jnp.asarray(0, jnp.int32), xf, yf,
                              jnp.asarray(0.0, jnp.float32)))
        return out[1], out[3]

    def two_point(fn, args, short=20, long_=220):
        o = fn(*args, jnp.asarray(short, jnp.int32))
        jax.block_until_ready(o)
        ests = []
        for _ in range(4):
            t0 = time.perf_counter()
            o = fn(*args, jnp.asarray(short, jnp.int32))
            jax.block_until_ready(o)
            ts = time.perf_counter() - t0
            t0 = time.perf_counter()
            o = fn(*args, jnp.asarray(long_, jnp.int32))
            jax.block_until_ready(o)
            tl = time.perf_counter() - t0
            if tl - ts >= 0.2 * tl:
                ests.append((tl - ts) / (long_ - short))
        return float(np.median(ests)) if ests else float("nan")

    t = two_point(loop_bare, (x, yv, q))
    print(f"bare kernel loop: {1e6*t:.0f} us/chunk", flush=True)

    xf = jnp.asarray(rng.rand(n), jnp.float32)
    yf = jnp.asarray(0.1 * rng.randn(m2 + 2 * n), jnp.float32)
    t = two_point(loop_glue, (xf, yf))
    print(f"embed/unpack loop: {1e6*t:.0f} us/chunk", flush=True)

    # (c) the REAL solver path: backend.run deltas (chunks only — the
    # align/tail loops do not execute between aligned iterations)
    import bench

    backend = bench.build_deblur(nx, ny)
    state = backend.run(backend.initial_state(), 21)
    assert int(np.asarray(state.iteration)) == 21

    def run_pair(short, long_):
        nonlocal state
        t0 = time.perf_counter()
        state = backend.run(state, int(np.asarray(state.iteration)) + short)
        int(np.asarray(state.iteration))
        ts = time.perf_counter() - t0
        t0 = time.perf_counter()
        state = backend.run(state, int(np.asarray(state.iteration)) + long_)
        int(np.asarray(state.iteration))
        tl = time.perf_counter() - t0
        return ts, tl

    ests = []
    for _ in range(4):
        ts, tl = run_pair(200, 2200)
        if tl - ts >= 0.2 * tl:
            ests.append((tl - ts) / 2000 * ri)
    t = float(np.median(ests)) if ests else float("nan")
    print(f"backend.run loop: {1e6*t:.0f} us/chunk", flush=True)


if __name__ == "__main__":
    main()
