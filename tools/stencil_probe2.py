"""Follow-up probe: per-axis roll costs and alternative up-shift forms.

rolls_many showed shift n-1 costs 2.2x shift 1 (tools/stencil_probe.py).
Hypothesis: the LANE rotate (axis 1) by 511 decomposes into log2 stages
while shift 1 is one stage; the sublane roll (axis 0) should be cheap at
any shift.  Measures 16 rolls x 10 iters per chunk of each kind, plus
alternative up-shift-by-1 lowerings (negative shift, concat-slice).
"""

import json
import os
import sys
from functools import partial

import numpy as np

sys.path.insert(0, os.path.dirname(__file__))
from probe_timing import chain_loop, serial_chunk_time  # noqa: E402

_VMEM = 96 * 1024 * 1024


def _mk_kernel(shift_fn, count):
    def kern(x_ref, xo_ref, n_ref):
        import jax.numpy as jnp
        from jax import lax

        def body(_, u):
            acc = u
            for _i in range(16):
                acc = shift_fn(acc)
            return u + 1e-7 * acc

        u2 = lax.fori_loop(0, count, body, x_ref[...])
        xo_ref[...] = u2
        n_ref[0] = jnp.sum(u2 * u2)
    return kern


def main():
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    nx = ny = 512
    count = 10
    rng = np.random.RandomState(0)
    x0 = jnp.asarray(rng.rand(nx, ny), jnp.float32)

    plane = pl.BlockSpec(memory_space=pltpu.VMEM)
    smem = pl.BlockSpec(memory_space=pltpu.SMEM)
    results = {}

    def measure(name, shift_fn):
        call = pl.pallas_call(
            _mk_kernel(shift_fn, count),
            out_shape=[
                jax.ShapeDtypeStruct((nx, ny), jnp.float32),
                jax.ShapeDtypeStruct((1,), jnp.float32),
            ],
            in_specs=[plane],
            out_specs=[plane, smem],
            compiler_params=pltpu.CompilerParams(vmem_limit_bytes=_VMEM),
        )

        def chunk(st):
            u2, n = call(st)
            return u2, n[0]

        try:
            t = serial_chunk_time(chain_loop(chunk, x0), short=20,
                                  long_=220)
        except Exception as e:
            print(f"{name}: FAILED {type(e).__name__}: {e}", flush=True)
            results[name] = None
            return
        per_roll = 1e6 * t / (16 * count)
        results[name] = per_roll
        print(f"{name}: {1e6*t:.1f} us/chunk = {per_roll:.3f} us/roll",
              flush=True)

    r = pltpu.roll
    measure("ax0_s1", lambda u: r(u, 1, 0))
    measure("ax0_sN", lambda u: r(u, nx - 1, 0))
    measure("ax1_s1", lambda u: r(u, 1, 1))
    measure("ax1_sN", lambda u: r(u, ny - 1, 1))
    measure("ax0_neg", lambda u: r(u, -1, 0))
    measure("ax1_neg", lambda u: r(u, -1, 1))
    measure("ax1_concat",
            lambda u: jnp.concatenate([u[:, 1:], u[:, :1]], axis=1))
    measure("ax0_concat",
            lambda u: jnp.concatenate([u[1:, :], u[:1, :]], axis=0))
    measure("ax1_s128", lambda u: r(u, 128, 1))
    measure("ax1_s384", lambda u: r(u, 384, 1))  # -128 mod 512
    measure("ax1_s8", lambda u: r(u, 8, 1))

    print(json.dumps(results))


if __name__ == "__main__":
    main()
