"""Third probe: single-toggle shift-form A/Bs inside the REAL chunk-kernel
shape (10-iteration ROF update chain at 512^2), starting from the qinv
variant (maskless adjoints; tools/stencil_probe.py measured 42.0 us vs
49.1 baseline).  Synthetic roll chains (stencil_probe2) measure latency
chains, not issue slots — only whole-kernel A/Bs are trustworthy here.

Toggles (each swaps ONE shift's lowering):
  dyC   dy up-shift via concat-slice instead of roll(ny-1, 1)
  dxC   dx up-shift via concat-slice instead of roll(nx-1, 0)
  dytC  dyt down-shift via concat-slice instead of roll(1, 1)
  dxtC  dxt down-shift via concat-slice instead of roll(1, 0)
"""

import itertools
import json
import os
import sys
from functools import partial

import numpy as np

sys.path.insert(0, os.path.dirname(__file__))
from probe_timing import chain_loop, serial_chunk_time  # noqa: E402

_VMEM = 96 * 1024 * 1024


def _chunk_kernel(scal_ref, x_ref, q_ref, f_ref, xo_ref, qo_ref, n_ref, *,
                  count, toggles):
    import jax.numpy as jnp
    from jax import lax
    from jax.experimental.pallas import tpu as pltpu

    shape = x_ref.shape
    ri = lax.broadcasted_iota(jnp.int32, shape, 0)
    ci = lax.broadcasted_iota(jnp.int32, shape, 1)
    not_last_r = ri < (shape[0] - 1)
    not_last_c = ci < (shape[1] - 1)

    def up0(u):
        if "dxC" in toggles:
            return jnp.concatenate([u[1:, :], u[:1, :]], axis=0)
        return pltpu.roll(u, shape[0] - 1, 0)

    def up1(u):
        if "dyC" in toggles:
            return jnp.concatenate([u[:, 1:], u[:, :1]], axis=1)
        return pltpu.roll(u, shape[1] - 1, 1)

    def down0(p):
        if "dxtC" in toggles:
            return jnp.concatenate([p[-1:, :], p[:-1, :]], axis=0)
        return pltpu.roll(p, 1, 0)

    def down1(p):
        if "dytC" in toggles:
            return jnp.concatenate([p[:, -1:], p[:, :-1]], axis=1)
        return pltpu.roll(p, 1, 1)

    def dx(u):
        return jnp.where(not_last_r, up0(u) - u, 0.0)

    def dy(u):
        return jnp.where(not_last_c, up1(u) - u, 0.0)

    def dxt(p):  # exact given p[-1, :] == 0
        return down0(p) - p

    def dyt(p):  # exact given p[:, -1] == 0
        return down1(p) - p

    tau = scal_ref[0] * 0.25
    sig = scal_ref[1] * 0.5
    theta = scal_ref[2]
    sig_p = sig * (1.0 + theta)
    sig_t = sig * theta
    lmb = scal_ref[3]
    radius = scal_ref[4]
    f = f_ref[...]
    dt0 = (tau * lmb) * f
    dt1 = 1.0 / (1.0 + tau * lmb)

    def body(_, carry):
        x, qx, qy, gx, gy = carry
        kty = dxt(qx) + dyt(qy)
        arg = x - tau * kty
        x_new = (arg + dt0) * dt1
        gx_new = dx(x_new)
        gy_new = dy(x_new)
        ax = qx + sig_p * gx_new - sig_t * gx
        ay = qy + sig_p * gy_new - sig_t * gy
        scale = jnp.minimum(1.0, radius * lax.rsqrt(ax * ax + ay * ay))
        return x_new, ax * scale, ay * scale, gx_new, gy_new

    x = x_ref[...]
    out = lax.fori_loop(0, count, body,
                        (x, q_ref[0], q_ref[1], dx(x), dy(x)))
    xo_ref[...] = out[0]
    qo_ref[0] = out[1]
    qo_ref[1] = out[2]
    n_ref[0] = jnp.sum(out[0] * out[0])


def main():
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    nx = ny = 512
    count = 10
    rng = np.random.RandomState(0)
    x0 = jnp.asarray(rng.rand(nx, ny), jnp.float32)
    q0 = jnp.asarray(0.1 * rng.randn(2, nx, ny), jnp.float32)
    q0 = q0.at[0, -1, :].set(0.0).at[1, :, -1].set(0.0)
    f0 = jnp.asarray(rng.rand(nx, ny), jnp.float32)
    scal = jnp.asarray([0.9, 1.1, 1.0, 16.0, 0.5], jnp.float32)

    plane = pl.BlockSpec(memory_space=pltpu.VMEM)
    smem = pl.BlockSpec(memory_space=pltpu.SMEM)
    results = {}
    outs = {}

    def run_variant(name, toggles):
        call = pl.pallas_call(
            partial(_chunk_kernel, count=count, toggles=toggles),
            out_shape=[
                jax.ShapeDtypeStruct((nx, ny), jnp.float32),
                jax.ShapeDtypeStruct((2, nx, ny), jnp.float32),
                jax.ShapeDtypeStruct((1,), jnp.float32),
            ],
            in_specs=[smem, plane, plane, plane],
            out_specs=[plane, plane, smem],
            compiler_params=pltpu.CompilerParams(vmem_limit_bytes=_VMEM),
        )

        def chunk(st):
            x2, q2, n = call(scal, st[0], st[1], f0)
            return (x2, q2), n[0]

        # bit-equivalence vs the pure-roll form on ONE chunk
        x2, q2, _ = call(scal, x0, q0, f0)
        outs[name] = (np.asarray(x2), np.asarray(q2))

        try:
            t = serial_chunk_time(chain_loop(chunk, (x0, q0)), short=20,
                                  long_=220)
        except RuntimeError as e:
            print(f"{name}: {e}", flush=True)
            results[name] = None
            return
        results[name] = 1e6 * t
        print(f"{name}: {1e6*t:.1f} us/chunk ({count/t/1e3:.1f}k it/s)",
              flush=True)

    from probe_interleave import interleaved_times

    runners = {}

    def build_variant(name, toggles):
        call = pl.pallas_call(
            partial(_chunk_kernel, count=count, toggles=toggles),
            out_shape=[
                jax.ShapeDtypeStruct((nx, ny), jnp.float32),
                jax.ShapeDtypeStruct((2, nx, ny), jnp.float32),
                jax.ShapeDtypeStruct((1,), jnp.float32),
            ],
            in_specs=[smem, plane, plane, plane],
            out_specs=[plane, plane, smem],
            compiler_params=pltpu.CompilerParams(vmem_limit_bytes=_VMEM),
        )

        def chunk(st):
            x2, q2, n = call(scal, st[0], st[1], f0)
            return (x2, q2), n[0]

        x2, q2, _ = call(scal, x0, q0, f0)
        outs[name] = (np.asarray(x2), np.asarray(q2))
        runners[name] = chain_loop(chunk, (x0, q0))

    build_variant("qinv", frozenset())
    for tog in ("dyC", "dxC", "dytC", "dxtC"):
        build_variant(tog, frozenset({tog}))
    build_variant("allC", frozenset({"dyC", "dxC", "dytC", "dxtC"}))
    res = interleaved_times(runners, short=20, long_=220, sweeps=5)
    for name, rr in res.items():
        if rr is None:
            print(f"{name}: all sweeps corrupted", flush=True)
            results[name] = None
        else:
            print(f"{name}: {rr['us']:.1f} us/chunk "
                  f"[{rr['min']:.1f}-{rr['max']:.1f}, n={rr['n']}] "
                  f"({count/rr['us']*1e3:.1f}k it/s)", flush=True)
            results[name] = rr

    ref = outs["qinv"]
    for name, (xv, qv) in outs.items():
        same = (np.array_equal(xv, ref[0]) and np.array_equal(qv, ref[1]))
        print(f"bit-equal[{name} vs qinv]: {same}", flush=True)
    print(json.dumps(results))


if __name__ == "__main__":
    main()
