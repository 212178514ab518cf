"""Round-robin interleaved variant timing for probe scripts.

Sequential serial_chunk_time calls are corrupted by contention bursts on
the shared tunnel chip (a variant measured in a bad minute reads 4x
slow).  This driver builds ALL variants' chained runners first, then
rotates (short, long) two-point pairs across them so bursts hit every
variant equally; reports per-variant MEDIAN over the guard-passing
sweeps with min/max (same discipline as bench.py --all)."""

import time

import numpy as np


def interleaved_times(runners, short=20, long_=220, sweeps=5):
    """runners: {name: run(n)->traced-scalar-output}.  Returns
    {name: {us_per_chunk, min, max, n}} with us per chunk unit."""
    def sync(o):
        return float(np.asarray(o))

    for r in runners.values():
        sync(r(short))  # compile + warm

    ests = {k: [] for k in runners}
    for s in range(sweeps):
        for name, run in runners.items():
            t0 = time.perf_counter()
            sync(run(short))
            ts = time.perf_counter() - t0
            t0 = time.perf_counter()
            sync(run(long_))
            tl = time.perf_counter() - t0
            if tl - ts >= 0.2 * tl:
                ests[name].append((tl - ts) / (long_ - short))
    out = {}
    for name, es in ests.items():
        if not es:
            out[name] = None
            continue
        out[name] = {
            "us": 1e6 * float(np.median(es)),
            "min": 1e6 * min(es), "max": 1e6 * max(es), "n": len(es),
        }
    return out
