"""Checkpoint/resume + profiling utility tests."""

import os

import numpy as np
import jax.numpy as jnp
import pytest

import prost_tpu as pt
from prost_tpu.backend import BackendPDHG, PDHGOptions
from prost_tpu.linop import BlockGradient2D, LinearOperator
from prost_tpu.prox import ProxElem1D, ProxElemNorm2, ProxMoreau
from prost_tpu.util import (
    compiled_memory_analysis,
    load_state,
    memory_stats,
    save_state,
    timed,
)


def rof_backend(nx=12, ny=12, seed=0):
    n = nx * ny
    rng = np.random.RandomState(seed)
    f = rng.rand(n).astype(np.float32)
    grad = BlockGradient2D(row=0, col=0, nx=nx, ny=ny, L=1)
    prox_g = [ProxElem1D(index=0, size=n, fun="square",
                         coeffs=(1.0, f, 5.0, 0.0, 0.0, 0.0, 0.0))]
    pn = ProxElemNorm2(index=0, size=2 * n, count=n, dim=2, interleaved=False,
                       fun="abs", coeffs=(1.0, 0.0, 1.0, 0.0, 0.0, 0.0, 0.0))
    prob = pt.Problem.create(
        LinearOperator.create([grad]), prox_g=prox_g,
        prox_fstar=[ProxMoreau(index=0, size=2 * n, child=pn)],
    )
    opts = pt.SolverOptions(verbose=False, tol_rel_primal=1e-7,
                            tol_rel_dual=1e-7, tol_abs_primal=1e-7,
                            tol_abs_dual=1e-7)
    return BackendPDHG(prob, PDHGOptions(scale_steps_operator=False), opts)


def test_checkpoint_resume_is_exact(tmp_path):
    """Run 100 its, checkpoint, run 100 more; must equal 200 straight its
    (resume is exact because the full loop state is saved)."""
    b = rof_backend()
    s = b.run(b.initial_state(), 100)
    path = os.path.join(tmp_path, "ckpt.npz")
    save_state(path, s)

    s2 = load_state(path, b.initial_state())
    assert int(s2.iteration) == 100
    s2 = b.run(s2, 200)

    s_straight = b.run(b.initial_state(), 200)
    np.testing.assert_allclose(np.asarray(s2.x), np.asarray(s_straight.x),
                               atol=1e-6)
    np.testing.assert_allclose(float(s2.tau), float(s_straight.tau),
                               rtol=1e-6)


def test_checkpoint_structure_mismatch_raises(tmp_path):
    b = rof_backend()
    path = os.path.join(tmp_path, "ckpt.npz")
    save_state(path, b.initial_state())
    with pytest.raises(ValueError):
        load_state(path, {"wrong": jnp.zeros(3)})


def test_timed_returns_ms():
    out, ms = timed(lambda x: x * 2.0, jnp.ones(1000))
    np.testing.assert_allclose(np.asarray(out), 2.0)
    assert ms >= 0


def test_compiled_memory_analysis():
    stats = compiled_memory_analysis(lambda x: x @ x.T, jnp.ones((64, 64)))
    # CPU backend may not implement the analysis; when present, sizes are sane
    if stats:
        assert stats["output_size_in_bytes"] >= 64 * 64 * 4


def test_memory_stats_dict():
    assert isinstance(memory_stats(), dict)
