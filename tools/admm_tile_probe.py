"""A/B the chunked banded-ADMM kernel's tiling choices end-to-end on the
real TPU: n_bands x double_buffer at ROF ADMM 2048^2, through the full
FusedROFADMM run path (bench.py measure_backend two-point method).

This is the probe behind `admm_chunk_band_plan`'s DB-preference rule
(2026-08-21 session: nb=16 db 1635 > nb=8 db 1554 > nb=16 single 1346 >
nb=8 single 1188 it/s).  Run ONE TPU process at a time.
"""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main():
    import jax

    from bench import build_rof, measure_backend, _solver_opts
    from prost_tpu.backend.admm import ADMMOptions
    from prost_tpu.ops import FusedROFADMM

    if jax.default_backend() == "cpu":
        print("needs real TPU")
        return 2

    for nb, db in ((8, False), (8, True), (16, True), (16, False)):
        _, prob = build_rof(2048, 2048)
        a = FusedROFADMM(prob, ADMMOptions(residual_iter=10),
                         _solver_opts())
        assert a.mode == "banded"
        a.rof["n_bands"] = nb
        a.rof["double_buffer"] = db
        try:
            m = measure_backend(a, short=100, long_=1100, repeats=3)
            print(f"nb={nb} db={db}: {m}", flush=True)
        except Exception as e:
            print(f"nb={nb} db={db}: {type(e).__name__}: {str(e)[:160]}",
                  flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
