"""Same-session interleaved A/B for the multilabel multi-chunk path
(round-4 verdict, task #1: the ml row was committed BEFORE
ml_fused_multichunk landed and has no e2e A/B — either the 86.4k record
is stale or something structurally caps ml at 76% of kernel-only).

Measures multilabel 256x256x8 end-to-end with k_chunks=8 (phase B0 on)
vs k_chunks=0 (launch-per-chunk), strictly interleaved TwoPointMeter
sweeps, plus the serial-chain kernel-only rate of the ml chunk kernel in
the same session for the efficiency denominator.  Run ONE TPU process.
"""

import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
sys.path.insert(0, os.path.dirname(__file__))


def main():
    import jax

    if jax.default_backend() == "cpu":
        print("needs real TPU")
        return 2

    from bench import TwoPointMeter, build_multilabel
    from probe_timing import chain_loop, serial_chunk_time

    out = {}

    b_on = build_multilabel(256, 256, L=8)
    b_off = build_multilabel(256, 256, L=8)
    b_off.k_chunks = 0
    assert b_on.ml is not None and b_off.ml is not None
    print("warm ml256x8 on/off", flush=True)
    m_on = TwoPointMeter(b_on, 1000, 11000)
    m_off = TwoPointMeter(b_off, 1000, 11000)
    for s in range(5):
        print(f"# sweep {s}", flush=True)
        m_on.sweep()
        m_off.sweep()
    out["ml256x8_multichunk_on"] = m_on.result()
    out["ml256x8_multichunk_off"] = m_off.result()
    del b_on, b_off, m_on, m_off

    # same-session kernel-only rate (serial chain, 10-iteration chunks)
    import jax.numpy as jnp

    from prost_tpu.ops.fused_multilabel import ml_fused_chunk

    ri = 10
    rng = np.random.RandomState(0)
    L, nx, ny = 8, 256, 256
    u = jnp.asarray(rng.rand(L, nx, ny), jnp.float32)
    q = jnp.asarray(0.1 * rng.randn(2 * L, nx, ny), jnp.float32)
    q = q.at[:L, -1, :].set(0.0).at[L:, :, -1].set(0.0)
    sm = jnp.asarray(0.1 * rng.randn(nx, ny), jnp.float32)
    f = jnp.asarray(rng.rand(L, nx, ny), jnp.float32)

    def chunk(st):
        u2, q2, s2, _up, _qp, _sp, norms2 = ml_fused_chunk(
            st[0], st[1], st[2], f, 0.9, 1.1, 1.0, 0.5, 1.0, ri)
        return ((u2, q2, s2), norms2[0])

    t = serial_chunk_time(chain_loop(chunk, (u, q, sm)), short=10,
                          long_=110)
    out["ml256x8_kernel_only_it_per_s"] = ri / t
    print(f"kernel-only: {ri/t/1e3:.1f}k it/s ({1e6*t:.0f} us/chunk)",
          flush=True)

    for k, v in out.items():
        print(k, v, flush=True)
    print(json.dumps(out))
    return 0


if __name__ == "__main__":
    sys.exit(main())
