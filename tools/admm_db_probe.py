"""A/B the single- vs double-buffered banded Chebyshev-ADMM iteration
kernel at 2048^2 on the real TPU (serial-chain method).  The DB variant
needs ~2x the window scratch, so it may force a narrower band tiling —
each variant runs at its own admm_band_count footprint."""

import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from probe_timing import chain_loop, serial_chunk_time  # noqa: E402


def main():
    import jax.numpy as jnp

    from prost_tpu.ops.fused_admm import admm_band_count, admm_banded_iter

    rng = np.random.RandomState(0)
    nx = ny = 2048
    xh = jnp.asarray(0.3 * rng.randn(nx, ny), jnp.float32)
    xp_, xd, warm = xh + 0.1, xh * 0.5, xh * 0.2
    zh = jnp.asarray(0.3 * rng.randn(2, nx, ny), jnp.float32)
    zp_, zd = zh * 0.9, zh * 0.1
    f = jnp.asarray(rng.rand(nx, ny), jnp.float32)
    w = jnp.ones_like(f)
    rho = jnp.asarray(1.0, jnp.float32)

    nb = admm_band_count(nx, ny, 10)
    nb_db = admm_band_count(nx, ny, 10, n_planes=40)
    print(f"band counts: single nb={nb}, double nb={nb_db}", flush=True)
    for db, _nb in ((False, nb), (True, nb_db), (True, nb)):
        def chunk(st, _db=db, _n=_nb):
            f_, w_ = st[7], st[8]
            out = admm_banded_iter(
                st[0], st[1], st[2], st[3], st[4], st[5], st[6], f_, w_,
                rho, 16.0, 0.5, _n, 10, 1.7, with_norms=True,
                double_buffer=_db)
            return out[:7] + (f_, w_), out[7][0]

        try:
            t = serial_chunk_time(
                chain_loop(chunk, (xh, xp_, xd, zh, zp_, zd, warm, f, w)),
                short=10, long_=110)
        except Exception as e:  # Mosaic capacity rejection at tight nb
            print(f"ADMM 2048^2 nb={_nb} db={db}: FAILED ({e})",
                  flush=True)
            continue
        print(f"ADMM 2048^2 nb={_nb} db={db}: {1e6*t:.0f} us/iter "
              f"(-> {1/t:.0f} it/s kernel-only)", flush=True)


if __name__ == "__main__":
    main()
