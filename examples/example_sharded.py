"""Multi-chip solving: spatial sharding and hand-scheduled halo exchange.

No reference counterpart — the reference is single-GPU (SURVEY.md §2.8);
this demonstrates the framework's scale-out layer on one big ROF problem:

1. ``ShardedPDHG``      — annotate shardings, let XLA's SPMD partitioner
                          place the collectives (the scaling-book recipe).
2. ``ShardedFusedROF``  — the hand-scheduled alternative: the fused
                          Pallas chunk kernel under shard_map with one
                          explicit ppermute halo exchange + one 4-scalar
                          psum per residual_iter chunk.

Run on real multi-chip hardware as-is; on a single host, pass --virtual N
to emulate an N-device mesh on CPU (the same SPMD program, compiled for N
host devices — how the test suite validates all sharded paths).

Usage: python examples/example_sharded.py [--size N] [--virtual N] [--cpu]
"""

import argparse
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
from _common import add_std_args, flatten_image, force_cpu, synthetic_image


def run(size=256, n_shards=None, max_iters=2000, verbose=True,
        interpret=None):
    import jax

    import prost_tpu as pt
    from prost_tpu import block, function
    from prost_tpu.backend.pdhg import PDHGOptions
    from prost_tpu.parallel import (ShardedFusedROF, ShardedPDHG, make_mesh)

    n_shards = n_shards or len(jax.devices())
    if interpret is None:
        interpret = jax.default_backend() == "cpu"
    mesh = make_mesh((n_shards,), axis_names=("sp",))

    nx = ny = size
    n = nx * ny
    lmb = 16.0
    rng = np.random.RandomState(42)
    f = flatten_image(synthetic_image(ny, nx, 1)) + 0.05 * rng.randn(n)

    u = pt.Variable(n)
    q = pt.Variable(2 * n)
    prob = pt.MinMaxProblem([u], [q])
    prob.add_function(u, function.sum_1d("square", 1, f, lmb))
    prob.add_function(q, function.sum_norm2(2, False, "ind_leq0", 1, 1, 1))
    prob.add_dual_pair(u, q, block.gradient2d(nx, ny, 1))
    core = prob.finalize()

    # halo width = 2*residual_iter + 2 rows must fit in one shard;
    # shrink the chunk for small demo sizes
    ri = min(10, max(1, (nx // n_shards - 2) // 2))
    popts = PDHGOptions(stepsize="boyd", residual_iter=ri,
                        scale_steps_operator=False)
    sopts = pt.SolverOptions(verbose=False, tol_rel_primal=1e-5,
                             tol_rel_dual=1e-5, tol_abs_primal=1e-5,
                             tol_abs_dual=1e-5)

    results = {}
    for name, make in [
        ("auto-SPMD (ShardedPDHG)",
         lambda: ShardedPDHG(core, popts, sopts, mesh=mesh)),
        ("halo-scheduled (ShardedFusedROF)",
         lambda: ShardedFusedROF(core, popts, sopts, mesh,
                                 interpret=interpret)),
    ]:
        backend = make()
        state = backend.initial_state()
        t0 = time.time()
        state = backend.run(state, max_iters)
        jax.block_until_ready(state.x)
        dt = time.time() - t0
        it = int(np.asarray(state.iteration))
        results[name] = np.asarray(state.x)
        if verbose:
            print(f"{name}: {it} its over {n_shards} shards in {dt:.3f}s "
                  f"({it / dt:.0f} it/s), "
                  f"primal res {float(state.primal_residual):.3e}")

    vals = list(results.values())
    diff = float(np.max(np.abs(vals[0] - vals[1])))
    if verbose:
        print(f"max |auto - halo| = {diff:.2e} (same algorithm, same "
              "trajectory)")
    return {"u": vals[1], "diff": diff, "n_shards": n_shards}


def main():
    ap = add_std_args(argparse.ArgumentParser(), size=256)
    ap.add_argument("--virtual", type=int, default=None,
                    help="emulate N devices on host CPU")
    args = ap.parse_args()
    if args.virtual:
        os.environ["XLA_FLAGS"] = (
            os.environ.get("XLA_FLAGS", "")
            + f" --xla_force_host_platform_device_count={args.virtual}"
        )
        force_cpu()
    elif args.cpu:
        force_cpu()
    run(size=args.size, n_shards=args.virtual,
        max_iters=args.max_iters or 2000)
    return 0


if __name__ == "__main__":
    sys.exit(main())
