"""ROF image denoising, saddle-point form, solved with PDHG.

Python counterpart of /root/reference/matlab/examples/example_rof_primaldual.m
(+ the primal-dual-gap stopping callback of example_rof_pdgap.m):

    min_u  lmb/2 ||u - f||^2 + ||grad u||_{2,1}

Usage: python examples/example_rof_primaldual.py [--size N] [--cpu]
"""

import argparse
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def load_image(size):
    """Grayscale test image: the reference uses images/lion.png; we build a
    synthetic piecewise-smooth image so the example has no data dependency,
    and add noise like the MATLAB script (f = im + 0.05 * randn)."""
    rng = np.random.RandomState(42)
    x = np.linspace(0, 1, size)
    xx, yy = np.meshgrid(x, x, indexing="ij")
    im = 0.4 * ((xx - 0.5) ** 2 + (yy - 0.5) ** 2 < 0.09) + 0.3 * (xx > 0.7)
    im += 0.2 * np.sin(6 * np.pi * yy) * (xx < 0.25)
    f = im + 0.05 * rng.randn(size, size)
    return im.astype(np.float32), f.astype(np.float32)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--size", type=int, default=256)
    ap.add_argument("--cpu", action="store_true")
    ap.add_argument("--gap-tol", type=float, default=1e-5)
    args = ap.parse_args()

    if args.cpu:
        import jax

        jax.config.update("jax_platforms", "cpu")

    import jax.numpy as jnp

    import prost_tpu as pt
    from prost_tpu.backend import BackendPDHG, PDHGOptions
    from prost_tpu.linop import BlockGradient2D, LinearOperator
    from prost_tpu.prox import ProxElem1D, ProxElemNorm2, ProxMoreau

    nx = ny = args.size
    n = nx * ny
    lmb = 16.0
    _, f_img = load_image(args.size)
    f = f_img.reshape(-1)

    grad = BlockGradient2D(row=0, col=0, nx=nx, ny=ny, L=1)
    linop = LinearOperator.create([grad])
    prox_g = [
        ProxElem1D(index=0, size=n, fun="square",
                   coeffs=(1.0, f, lmb, 0.0, 0.0, 0.0, 0.0))
    ]
    pn = ProxElemNorm2(index=0, size=2 * n, count=n, dim=2, interleaved=False,
                       fun="abs", coeffs=(1.0, 0.0, 1.0, 0.0, 0.0, 0.0, 0.0))
    prox_fstar = [ProxMoreau(index=0, size=2 * n, child=pn)]
    prob = pt.Problem.create(linop, prox_g=prox_g, prox_fstar=prox_fstar)

    K = prob.linop

    def energies(u, y):
        """Primal and dual ROF energies (example_rof_pdgap.m:4-15)."""
        g = np.asarray(K.apply(jnp.asarray(u)))
        norms = np.sqrt(g[:n] ** 2 + g[n:] ** 2)
        en_primal = lmb / 2 * np.sum((u - f) ** 2) + np.sum(norms)
        div = np.asarray(K.apply_adjoint(jnp.asarray(y)))
        en_dual = -1 / (2 * lmb) * np.sum(div**2) + np.sum(f * div)
        return en_primal, en_dual

    def pd_gap_callback(it, u, y):
        ep, ed = energies(u, y)
        gap_per_px = (ep - ed) / n
        print(f"  it {it:5d}: primal={ep:.6f} dual={ed:.6f} "
              f"gap/px={gap_per_px:.3e}")
        return gap_per_px < args.gap_tol

    opts = pt.SolverOptions(
        max_iters=10000, num_cback_calls=25, verbose=True,
        tol_rel_primal=0, tol_rel_dual=0,
        tol_abs_primal=0, tol_abs_dual=0,  # stop on gap only
        interm_cb=pd_gap_callback,
    )
    solver = pt.Solver(
        prob, lambda p, o: BackendPDHG(p, PDHGOptions(stepsize="boyd"), o), opts
    )

    t0 = time.time()
    res = solver.solve()
    dt = time.time() - t0

    ep, ed = energies(res.x, res.y)
    print(f"solved in {dt:.3f}s, {res.iterations} iterations "
          f"({res.iterations / dt:.1f} it/s)")
    print(f"result: {res.result.value}, final gap/px = {(ep - ed) / n:.3e}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
