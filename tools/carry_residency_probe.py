"""HBM residency of the plane-carry chunk loops (round-3 advisor, low #2;
round-4 verdict weak #8b).

The fused runs that carry PLANES between chunks (fused_tight,
fused_deblur, the ml run's (u, q, s) tuple) keep the stale flat state
vectors (s.x, s.y, ...) inside the carried PDHGState alongside the plane
copies.  Question: does XLA alias the reshape (flat <-> planes) so the
"stale" vectors cost no extra HBM, or is solver-state residency ~2x?

Method: lower + compile the jitted run for a mid-size problem on the
TPU and read XLA's own memory analysis (temp_size = all live buffers).
Compare against the analytic state footprint with and without
duplication.  A: ml 256x256x8 (plane-carry via state replace — x/y
REPLACED by reshapes each chunk, should alias);
B: tight 128x128x4 (true carry tuple alongside state).
"""

import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main():
    import jax
    import jax.numpy as jnp

    import bench
    from prost_tpu.util.profiling import compiled_memory_analysis

    def report(name, backend, n_state_planes, plane_bytes):
        st = backend.initial_state()

        def run(s):
            return backend.run(s, 101)

        mem = compiled_memory_analysis(run, st)
        temp = mem.get("temp_size_in_bytes", 0)
        arg = mem.get("argument_size_in_bytes", 0)
        state_b = n_state_planes * plane_bytes
        print(f"{name}: args {arg/1e6:.1f} MB, temps {temp/1e6:.1f} MB; "
              f"one state copy = {state_b/1e6:.1f} MB "
              f"(temps/state = {temp/state_b:.2f})", flush=True)
        return mem

    b_ml = bench.build_multilabel(256, 256, L=8)
    # ml state: x,y,x_prev,y_prev,kx,kty,kx_prev,kty_prev = 4*(17n) + 4*(17n)
    n = 256 * 256
    report("ml256x8", b_ml, 8, 17 * n * 4)

    b_t = bench.build_tight(128, 128, L=4)
    nt = 128 * 128
    k = 4 * 3 // 2
    per_state = (4 + 2 * k) * nt * 4 + (2 * 4 + 2 * k + 1) * nt * 4
    report("tight128x4", b_t, 8, per_state)


if __name__ == "__main__":
    main()
