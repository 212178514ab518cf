"""Deblur-kernel roofline probe (VERDICT r2 next-step #6): measure the
whole-plane fused deblur chunk at 512^2 / T=7 on the real TPU, isolating
the tap-sum association (pairwise tree vs the round-2 serialized left
fold).

Uses the SOUND serial-chain method (tools/probe_timing.py) — the earlier
host-loop timeit under-reported device time ~7x on this platform.  Run
ONE TPU process at a time.
"""

import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from probe_timing import chain_loop, serial_chunk_time  # noqa: E402


def motion_taps(klen=9):
    kern = np.zeros((klen, klen))
    c = (klen - 1) / 2
    t = np.deg2rad(45.0)
    for i in np.linspace(-c, c, 4 * klen):
        y, x = int(round(c + i * np.sin(t))), int(round(c + i * np.cos(t)))
        kern[y, x] = 1.0
    kern /= kern.sum()
    return tuple(
        (int(dx), int(dy), float(kern[dx, dy]))
        for dx in range(klen) for dy in range(klen) if kern[dx, dy] != 0.0
    )


def main():
    import jax.numpy as jnp

    from prost_tpu.ops import fused_deblur as fd

    ri = 10
    nx = ny = 512
    klen = 9
    nx2, ny2 = nx + klen - 1, ny + klen - 1
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

    sys.path.insert(0, os.path.dirname(__file__))
    from probe_interleave import interleaved_times

    runners = {}
    outs = {}
    for name, (tree, baseroll) in {
        "tree+baseroll": (True, True),
        "tree+largerolls": (True, False),
        "fold+baseroll": (False, True),
    }.items():
        fd._TAP_SUM_TREE = tree
        fd._ADJ_BASE_ROLL = baseroll

        def chunk(st, _t=tree, _b=baseroll):
            x_, yv_, q_ = st
            x2, yv2, q2, xp, yvp, qp, norms = fd.deblur_fused_chunk(
                x_, yv_, q_, fb, sv, 0.9, 1.1, 1.0, 100.0, 1.0, ri, nx,
                ny, taps, 0.5, 1.0 / 7.0)
            return (x2, yv2, q2), norms[0]

        outs[name] = fd.deblur_fused_chunk(
            x, yv, q, fb, sv, 0.9, 1.1, 1.0, 100.0, 1.0, ri, nx, ny,
            taps, 0.5, 1.0 / 7.0)[0]
        runners[name] = chain_loop(chunk, (x, yv, q))
    fd._TAP_SUM_TREE = True
    fd._ADJ_BASE_ROLL = True

    ref = np.asarray(outs["tree+baseroll"])
    for name, o in outs.items():
        print(f"bit-equal[{name}]: "
              f"{np.array_equal(np.asarray(o), ref)}", flush=True)
    res = interleaved_times(runners, short=20, long_=220, sweeps=4)
    for name, r in res.items():
        if r is None:
            print(f"{name}: all sweeps corrupted", flush=True)
            continue
        print(f"deblur 512^2 T={len(taps)} [{name}]: {r['us']:.0f} us "
              f"[{r['min']:.0f}-{r['max']:.0f}, n={r['n']}] "
              f"(ri={ri} -> {ri/r['us']*1e3:.1f}k it/s)", flush=True)


if __name__ == "__main__":
    main()
