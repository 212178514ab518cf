"""Sound device-time measurement for kernel probes.

The earlier probe ``timeit`` (host loop over independent calls +
``jax.block_until_ready``) is NOT sound on the axon remote platform:
block_until_ready has been observed to return before the device work
drains (bench.py's measure_backend warns about exactly this), and the
independent calls let the runtime overlap dispatch with execution — the
two-point delta then measures per-call DISPATCH cost, not device time.
Measured: the fused deblur chunk "takes" 30 us under the host loop but
223 us when actually executed serially (round 3).

Sound method (matches how the solver really runs, and how bench.py
measures): wrap the chunk in a lax.while_loop with a loop-CARRIED
dependency, return a scalar derived from the final state, and sync via
``np.asarray`` (a real D2H read, which the axon platform cannot skip).
Two-point over the chunk count cancels dispatch + sync.
"""

import time

import numpy as np


def chain_loop(chunk, init):
    """Build a jitted ``run(n)`` executing ``chunk`` n times serially.

    ``chunk(state) -> (new_state, scalar)``; states must share pytree
    structure/shapes.  ``run(n)`` returns the running sum of the per-chunk
    scalars (forcing every chunk into the dependency chain).
    """
    import jax
    import jax.numpy as jnp
    from jax import lax

    @jax.jit
    def _run(n, st0):
        def body(c):
            i, st, acc = c
            st2, s = chunk(st)
            return i + 1, st2, acc + jnp.asarray(s, jnp.float32)

        out = lax.while_loop(
            lambda c: c[0] < n, body,
            (jnp.asarray(0, jnp.int32), st0, jnp.asarray(0.0, jnp.float32)))
        return out[2]

    # the state enters as a jit ARGUMENT — closing over large planes bakes
    # them into the serialized program as constants, which the remote
    # compile service rejects (HTTP 413) at 2048^2+
    return lambda n: _run(n, init)


def serial_chunk_time(run, short=20, long_=220, repeats=4):
    """Median seconds/chunk of ``run(n)`` (a jitted serial n-chunk loop,
    e.g. from chain_loop) via two-point deltas; np.asarray sync.

    Rejects contention-corrupted pairs (delta < 0.2 * long-run time) like
    bench.measure_backend; raises if every pair was corrupted.
    """
    def sync(o):
        return float(np.asarray(o))

    sync(run(short))  # compile + warm
    ests = []
    for _ in range(repeats):
        t0 = time.perf_counter()
        sync(run(short))
        ts = time.perf_counter() - t0
        t0 = time.perf_counter()
        sync(run(long_))
        tl = time.perf_counter() - t0
        if tl - ts >= 0.2 * tl:
            ests.append((tl - ts) / (long_ - short))
    if not ests:
        raise RuntimeError(
            "measurement failed: every two-point delta was "
            "contention-corrupted — rerun on a quieter chip")
    return float(np.median(ests))
