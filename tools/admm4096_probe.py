"""DB-vs-single A/B for the chunked banded Chebyshev ADMM at 4096^2 —
the size where the double-buffered footprint forces a wider tiling than
the single-buffer one (round-3 advisor low #1 / round-4 verdict weak
#8a: the DB-first policy of admm_chunk_band_plan was only measured at
2048^2).  End-to-end two-point timing through FusedROFADMM with the
plan overridden per variant, interleaved sweeps."""

import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
sys.path.insert(0, os.path.dirname(__file__))


def main():
    import bench
    from probe_interleave import interleaved_times
    from prost_tpu.backend.admm import ADMMOptions
    from prost_tpu.ops.fused_admm import FusedROFADMM, admm_chunk_band_plan

    nx = ny = 4096
    plan = admm_chunk_band_plan(nx, ny, 10)
    print(f"planner at {nx}^2: {plan}", flush=True)

    # candidate tilings: the planner's DB pick, the narrowest single
    # tiling, and single at the DB tiling (isolates buffering from halo)
    def fused(n_bands, db):
        _, prob = bench.build_rof(nx, ny, image="house")
        a = FusedROFADMM(prob, ADMMOptions(residual_iter=10),
                         bench._solver_opts())
        assert a.mode == "banded", a.mode
        a.rof["n_bands"], a.rof["double_buffer"] = n_bands, db
        return a

    nb_db, _ = plan
    # narrowest single-buffer tiling: re-run the fits logic with the
    # single footprint by asking the planner's internals via fallback
    from prost_tpu.ops.fused_admm import admm_cheby_halo_rows, _VMEM_LIMIT
    budget = int(0.75 * _VMEM_LIMIT)
    halo = admm_cheby_halo_rows(10)
    nb_single = None
    for nb in range(2, nx + 1):
        if nx % nb:
            continue
        rows = nx // nb
        ext = min(rows + 2 * halo, nx)
        if rows % 8 == 0 and rows >= halo and ext * ny * 4 * 22 <= budget:
            nb_single = nb
            break
    print(f"tilings: db nb={nb_db}, single nb={nb_single}", flush=True)

    variants = {
        f"db_nb{nb_db}": (nb_db, True),
        f"single_nb{nb_single}": (nb_single, False),
        f"single_nb{nb_db}": (nb_db, False),
    }

    runners = {}
    for name, (nb, db) in variants.items():
        b = fused(nb, db)
        box = {"st": b.run(b.initial_state(), 21), "done": 21}

        def run(n, _b=b, _box=box):
            # n chunks of 10 iterations, advancing the kept state (the
            # jitted run DONATES its state argument — never reuse it)
            _box["done"] += int(n) * 10
            _box["st"] = _b.run(_box["st"], _box["done"])
            return _box["st"].iteration

        runners[name] = run
    res = interleaved_times(runners, short=5, long_=55, sweeps=4)
    out = {}
    for name, r in res.items():
        if r is None:
            print(f"{name}: all sweeps corrupted", flush=True)
            continue
        its = 10 / (r["us"] * 1e-6)
        out[name] = {"it_per_s": its, **r}
        print(f"{name}: {its:.0f} it/s [{10/(r['max']*1e-6):.0f}-"
              f"{10/(r['min']*1e-6):.0f}, n={r['n']}]", flush=True)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
