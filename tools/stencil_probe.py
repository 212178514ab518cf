"""Stencil-kernel variant probe (round-4 verdict, task #2: the VPU
issue-slot gap).

The ROF chunk kernel's update spends its non-FLOP issue slots on 4
pltpu.rolls and 6 jnp.where boundary selects per iteration
(roofline: 28-38% of VPU issue slots used, gap attributed to exactly
these).  This probe measures, at 512^2 f32 with count=10 chunks under
the serial-chain method (tools/probe_timing.py):

  baseline   the current _shift_ops math (masked dx/dy; 2-select dxt/dyt)
  qinv       maskless dxt/dyt exploiting the dual-boundary invariant
             (qx[-1,:] == 0, qy[:,-1] == 0 -> the circular roll wraps a
             ZERO row, so dxt(p) = roll(p,1,0) - p exactly); dx/dy keep
             their single select — 6 selects/iter -> 2
  nomask     ALL selects removed (WRONG math; isolates select cost)
  noroll     rolls replaced by identity (WRONG math; isolates roll cost)
  roll1/rollN  8 bare rolls by shift 1 vs shift n-1 (does Mosaic lower
             large static shift amounts worse?)

Run ONE TPU process at a time.
"""

import json
import os
import sys
from functools import partial

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
sys.path.insert(0, os.path.dirname(__file__))

from probe_timing import chain_loop, serial_chunk_time  # noqa: E402

_VMEM = 96 * 1024 * 1024


def _update(x, qx, qy, gx, gy, dt0, dt1, tau, sig_p, sig_t, radius,
            variant, shape):
    import jax.numpy as jnp
    from jax import lax
    from jax.experimental.pallas import tpu as pltpu

    roll = pltpu.roll
    ri = lax.broadcasted_iota(jnp.int32, shape, 0)
    ci = lax.broadcasted_iota(jnp.int32, shape, 1)
    not_last_r = ri < (shape[0] - 1)
    not_first_r = ri > 0
    not_last_c = ci < (shape[1] - 1)
    not_first_c = ci > 0
    ident = variant == "noroll"

    def R(u, s, a):
        return u if ident else roll(u, s, a)

    if variant in ("baseline",):
        def dx(u):
            return jnp.where(not_last_r, R(u, shape[0] - 1, 0) - u, 0.0)

        def dy(u):
            return jnp.where(not_last_c, R(u, shape[1] - 1, 1) - u, 0.0)

        def dxt(p):
            lead = jnp.where(not_first_r, R(p, 1, 0), 0.0)
            return lead - jnp.where(not_last_r, p, 0.0)

        def dyt(p):
            lead = jnp.where(not_first_c, R(p, 1, 1), 0.0)
            return lead - jnp.where(not_last_c, p, 0.0)
    elif variant == "qinv":
        def dx(u):
            return jnp.where(not_last_r, R(u, shape[0] - 1, 0) - u, 0.0)

        def dy(u):
            return jnp.where(not_last_c, R(u, shape[1] - 1, 1) - u, 0.0)

        def dxt(p):  # exact given p[-1, :] == 0
            return R(p, 1, 0) - p

        def dyt(p):  # exact given p[:, -1] == 0
            return R(p, 1, 1) - p
    else:  # nomask / noroll: no selects anywhere
        def dx(u):
            return R(u, shape[0] - 1, 0) - u

        def dy(u):
            return R(u, shape[1] - 1, 1) - u

        def dxt(p):
            return R(p, 1, 0) - p

        def dyt(p):
            return R(p, 1, 1) - p

    kty = dxt(qx) + dyt(qy)
    arg = x - tau * kty
    x_new = (arg + dt0) * dt1
    gx_new = dx(x_new)
    gy_new = dy(x_new)
    ax = qx + sig_p * gx_new - sig_t * gx
    ay = qy + sig_p * gy_new - sig_t * gy
    scale = jnp.minimum(1.0, radius * lax.rsqrt(ax * ax + ay * ay))
    return x_new, ax * scale, ay * scale, gx_new, gy_new


def _chunk_kernel(scal_ref, x_ref, q_ref, f_ref, xo_ref, qo_ref, n_ref, *,
                  count, variant):
    import jax.numpy as jnp
    from jax import lax

    shape = x_ref.shape
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

    def dx0(u):
        ri = lax.broadcasted_iota(jnp.int32, shape, 0)
        from jax.experimental.pallas import tpu as pltpu
        return jnp.where(ri < shape[0] - 1,
                         pltpu.roll(u, shape[0] - 1, 0) - u, 0.0)

    def dy0(u):
        ci = lax.broadcasted_iota(jnp.int32, shape, 1)
        from jax.experimental.pallas import tpu as pltpu
        return jnp.where(ci < shape[1] - 1,
                         pltpu.roll(u, shape[1] - 1, 1) - u, 0.0)

    x = x_ref[...]
    qx = q_ref[0]
    qy = q_ref[1]

    def body(_, carry):
        x, qx, qy, gx, gy = carry
        return _update(x, qx, qy, gx, gy, dt0, dt1, tau, sig_p, sig_t,
                       radius, variant, shape)

    out = lax.fori_loop(0, count, body, (x, qx, qy, dx0(x), dy0(x)))
    x2, qx2, qy2 = out[0], out[1], out[2]
    xo_ref[...] = x2
    qo_ref[0] = qx2
    qo_ref[1] = qy2
    n_ref[0] = jnp.sum(x2 * x2)


def _rolls_kernel(x_ref, xo_ref, n_ref, *, count, shift_kind):
    """8 bare rolls + adds per 'iteration' — isolates roll issue cost."""
    import jax.numpy as jnp
    from jax import lax
    from jax.experimental.pallas import tpu as pltpu

    shape = x_ref.shape

    def body(_, u):
        if shift_kind == "one":
            s0, s1 = 1, 1
        else:
            s0, s1 = shape[0] - 1, shape[1] - 1
        a = pltpu.roll(u, s0, 0)
        b = pltpu.roll(u, s1, 1)
        c = pltpu.roll(a, s0, 0)
        d = pltpu.roll(b, s1, 1)
        e = pltpu.roll(c, s0, 0)
        f = pltpu.roll(d, s1, 1)
        g = pltpu.roll(e, s0, 0)
        h = pltpu.roll(f, s1, 1)
        return u + 1e-7 * (a + b + c + d + e + f + g + h)

    u2 = lax.fori_loop(0, count, body, x_ref[...])
    xo_ref[...] = u2
    n_ref[0] = jnp.sum(u2 * u2)


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
    # enforce the boundary invariant so qinv is EXACT
    q0 = q0.at[0, -1, :].set(0.0).at[1, :, -1].set(0.0)
    f0 = jnp.asarray(rng.rand(nx, ny), jnp.float32)
    scal = jnp.asarray([0.9, 1.1, 1.0, 16.0, 0.5], jnp.float32)

    plane = pl.BlockSpec(memory_space=pltpu.VMEM)
    smem = pl.BlockSpec(memory_space=pltpu.SMEM)
    results = {}

    def run_variant(variant):
        call = pl.pallas_call(
            partial(_chunk_kernel, count=count, variant=variant),
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

        t = serial_chunk_time(chain_loop(chunk, (x0, q0)), short=20,
                              long_=220)
        results[variant] = 1e6 * t
        print(f"{variant}: {1e6*t:.1f} us/chunk "
              f"({count/t/1e3:.1f}k it/s)", flush=True)

    def run_rolls(kind):
        call = pl.pallas_call(
            partial(_rolls_kernel, count=count, shift_kind=kind),
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

        t = serial_chunk_time(chain_loop(chunk, x0), short=20, long_=220)
        results[f"rolls_{kind}"] = 1e6 * t
        print(f"rolls_{kind} (8 rolls x {count}): {1e6*t:.1f} us/chunk",
              flush=True)

    # correctness: qinv must be bit-identical to baseline under the
    # invariant (run both in interpret=False on-device, compare)
    for v in ("baseline", "qinv", "nomask", "noroll"):
        run_variant(v)
    for k in ("one", "many"):
        run_rolls(k)

    print(json.dumps(results))


if __name__ == "__main__":
    main()
