"""Same-session A/B probes for the round-4 multi-chunk and chunked
banded-ADMM designs, on the real TPU:

1. ROF 512^2 end-to-end: multi-chunk launches with in-kernel adaptation
   (k_chunks=8, phase B0) vs the launch-per-chunk round-3 path
   (k_chunks=0).  This is the headline A/B the round-3 verdict asked for
   (weak #1): both variants measured interleaved in ONE session so
   tunnel contention cannot masquerade as a routing regression.
2. ADMM 512^2 end-to-end: same A/B on the whole-plane Chebyshev path.
3. ADMM 2048^2 end-to-end: the chunked in-place banded kernel
   (admm_banded_chunk, grid=(ri, nb)) vs the round-3 launch-per-
   iteration kernel (admm_banded_iter) — measured through the full
   FusedROFADMM run path by monkeypatching the round-3 `_fused_admm
   _banded_run` back in is NOT possible (it was replaced), so the old
   kernel is timed through a serial chain of per-iteration launches
   (tools/probe_timing.py) and the new one through measure_backend.

Timing: bench.py measure_backend two-point method / probe_timing
serial-chain method.  Run ONE TPU process at a time.
"""

import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))


def main():
    import jax

    from bench import build_rof, measure_backend, _solver_opts
    from probe_timing import chain_loop, serial_chunk_time
    from prost_tpu.backend.admm import ADMMOptions
    from prost_tpu.ops import FusedROFADMM

    if jax.default_backend() == "cpu":
        print("needs real TPU")
        return 2

    out = {}

    # --- 1. ROF 512^2: k_chunks 8 vs 0, interleaved -------------------
    from bench import TwoPointMeter

    b_on, _ = build_rof(512, 512)
    b_off, _ = build_rof(512, 512)
    b_off.k_chunks = 0
    print("warm rof512 on/off", flush=True)
    m_on = TwoPointMeter(b_on, 2000, 22000)
    m_off = TwoPointMeter(b_off, 2000, 22000)
    for s in range(3):
        m_on.sweep()
        m_off.sweep()
    out["rof512_multichunk_on"] = m_on.result()
    out["rof512_multichunk_off"] = m_off.result()
    print("rof512 on:", out["rof512_multichunk_on"], flush=True)
    print("rof512 off:", out["rof512_multichunk_off"], flush=True)

    # --- 2. ADMM 512^2: k_chunks 8 vs 0, interleaved ------------------
    def admm512(k):
        _, prob = build_rof(512, 512)
        a = FusedROFADMM(prob, ADMMOptions(residual_iter=10),
                         _solver_opts())
        a.k_chunks = k
        assert a.mode == "cheby", a.mode
        return a

    am_on = TwoPointMeter(admm512(8), 500, 5500)
    am_off = TwoPointMeter(admm512(0), 500, 5500)
    for s in range(3):
        am_on.sweep()
        am_off.sweep()
    out["admm512_multichunk_on"] = am_on.result()
    out["admm512_multichunk_off"] = am_off.result()
    print("admm512 on:", out["admm512_multichunk_on"], flush=True)
    print("admm512 off:", out["admm512_multichunk_off"], flush=True)

    # --- 3. ADMM 2048^2 banded: chunked kernel e2e vs old per-iteration
    # kernel serial-chain ----------------------------------------------
    import jax.numpy as jnp

    from prost_tpu.ops.fused_admm import admm_banded_iter

    _, prob = build_rof(2048, 2048)
    a = FusedROFADMM(prob, ADMMOptions(residual_iter=10), _solver_opts())
    assert a.mode == "banded", a.mode
    print(f"banded plan: nb={a.rof['n_bands']} "
          f"db={a.rof['double_buffer']}", flush=True)
    m = measure_backend(a, short=100, long_=1100, repeats=3)
    out["admm2048_chunked_e2e"] = m
    print("admm2048 chunked e2e:", m, flush=True)

    rng = np.random.RandomState(0)
    nx = ny = 2048
    xh = jnp.asarray(0.3 * rng.randn(nx, ny), jnp.float32)
    xp_, xd, warm = xh + 0.1, xh * 0.5, xh * 0.2
    zh = jnp.asarray(0.3 * rng.randn(2, nx, ny), jnp.float32)
    zp_, zd = zh * 0.9, zh * 0.1
    f = jnp.asarray(rng.rand(nx, ny), jnp.float32)
    w = jnp.ones_like(f)
    rho = jnp.asarray(1.0, jnp.float32)

    for nb, db in ((8, False), (8, True), (16, True)):
        def it_old(st, _nb=nb, _db=db):
            f_, w_ = st[7], st[8]
            o = admm_banded_iter(
                st[0], st[1], st[2], st[3], st[4], st[5], st[6], f_, w_,
                rho, 16.0, 0.5, _nb, 10, 1.7, with_norms=False,
                double_buffer=_db)
            return o[:7] + (f_, w_), o[7][0]

        try:
            t = serial_chunk_time(
                chain_loop(it_old, (xh, xp_, xd, zh, zp_, zd, warm, f, w)),
                short=10, long_=110)
            out[f"admm2048_old_iter_nb{nb}{'db' if db else ''}"] = \
                {"us_per_iter": round(1e6 * t, 1),
                 "it_per_s": round(1 / t, 1)}
            print(f"old per-iter kernel nb={nb} db={db}: "
                  f"{1e6 * t:.0f} us/iter ({1 / t:.0f} it/s)", flush=True)
        except Exception as e:
            print(f"old kernel nb={nb} db={db}: {type(e).__name__} {e}",
                  flush=True)

    json_path = sys.argv[1] if len(sys.argv) > 1 else None
    if json_path:
        with open(json_path, "w") as fh:
            json.dump(out, fh, indent=1)
        print(f"wrote {json_path}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
