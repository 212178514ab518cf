"""Focused bench session: run a SUBSET of bench._all_configs with more
sweeps per config (the full 11-config round-robin spreads a session so
thin that a contended hour leaves banded rows with 1-2 valid sweeps).
Emits the same session-artifact schema as bench.py --all so
tools/merge_bench.py can consume it.

Usage: python tools/bench_subset.py OUT.json substr1 [substr2 ...]
       [--sweeps N]
Configs whose metric name contains any substring are run.
"""

import json
import sys
import time


def main(argv):
    sweeps = 6
    if "--sweeps" in argv:
        i = argv.index("--sweeps")
        sweeps = int(argv[i + 1])
        argv = argv[:i] + argv[i + 2:]
    out_path, subs = argv[0], argv[1:]

    import bench

    configs = [c for c in bench._all_configs()
               if any(s in c[0] for s in subs)]
    print(f"# {len(configs)} configs x {sweeps} sweeps", file=sys.stderr,
          flush=True)
    verify = bench._latest_verify()
    meters = []
    for name, builder, short, long_, _n, baseline, banded in configs:
        print(f"# warm {name}", file=sys.stderr, flush=True)
        meters.append(bench.TwoPointMeter(builder(), short, long_))
    for s in range(sweeps):
        for (name, *_), meter in zip(configs, meters):
            print(f"# sweep {s} {name}", file=sys.stderr, flush=True)
            meter.sweep()

    records = []
    for (name, _, _, _, _, baseline, banded), meter in zip(configs,
                                                           meters):
        m = meter.result()
        if name.startswith("ensemble"):
            B = 1024
            m = {**m, "value": m["value"] * B, "min": m["min"] * B,
                 "max": m["max"] * B}
        rec = {"metric": name, **bench._fields(m, baseline),
               "unit": "it/s"}
        if banded:
            rec["hw_verified"] = verify or False
        records.append(rec)
        print(json.dumps(rec), file=sys.stderr, flush=True)

    with open(out_path, "w") as fh:
        json.dump({"date": time.strftime("%Y-%m-%d %H:%M:%S"),
                   "interleaved": True, "hw_verified": verify or False,
                   "records": records,
                   "note": f"focused subset session, {sweeps} sweeps"},
                  fh, indent=1)
    print(f"# wrote {out_path}", file=sys.stderr, flush=True)
    return 0


if __name__ == "__main__":
    sys.path.insert(0, ".")
    sys.exit(main(sys.argv[1:]))
