"""Wire-format (de)serialization round trips, mirroring the reference's
factory registry contract (factory.cpp:18-134)."""

import json

import numpy as np
import jax.numpy as jnp
import pytest

import prost_tpu as pt
from prost_tpu.linop import (
    BlockConv2D,
    BlockDense,
    BlockDiags,
    BlockGradient2D,
    BlockGradient3D,
    BlockIdKron,
    BlockKronId,
    BlockSparse,
    BlockZero,
    LinearOperator,
)
from prost_tpu.modeling import wire
from prost_tpu.prox import (
    ProxElem1D,
    ProxElemNorm2,
    ProxMoreau,
    ProxTransform,
)


def test_prox_spec_roundtrip_names():
    f = np.arange(6.0)
    p = ProxElem1D(index=0, size=6, fun="abs",
                   coeffs=(1.0, f, 2.0, 0.0, 0.0, 0.0, 0.0))
    spec = wire.to_prox_spec(p)
    assert spec["name"] == "elem_operation:1d:abs"
    q = wire.from_prox_spec(json.loads(json.dumps(spec)))
    assert isinstance(q, ProxElem1D) and q.fun == "abs"
    np.testing.assert_allclose(np.asarray(q.coeffs[1]), f)

    pn = ProxElemNorm2(index=0, size=6, count=3, dim=2, interleaved=False,
                       fun="square",
                       coeffs=(1.0, 0.0, 1.0, 0.0, 0.0, 0.0, 0.0))
    m = ProxMoreau(index=0, size=6, child=pn)
    spec = wire.to_prox_spec(m)
    assert spec["name"] == "moreau"
    q = wire.from_prox_spec(spec)
    assert isinstance(q.child, ProxElemNorm2) and q.child.fun == "square"


def test_block_specs_roundtrip_eval():
    rng = np.random.RandomState(0)
    K = rng.randn(4, 6)
    blocks = [
        BlockSparse.create(0, 0, 4, 6, K),
        BlockDense.create(0, 0, K),
        BlockDiags.create(0, 0, 5, 5, [1.0, -2.0], [0, 1]),
        BlockGradient2D(row=0, col=0, nx=4, ny=5, L=2),
        BlockGradient3D(row=0, col=0, nx=4, ny=5, L=2),
        BlockKronId.create(0, 0, 3, K),
        BlockIdKron.create(0, 0, 3, K),
        BlockConv2D.create(0, 0, 6, 5, 1, rng.randn(3, 3)),
        BlockZero(row=0, col=0, nrows=4, ncols=9),
    ]
    for b in blocks:
        spec = json.loads(json.dumps(wire.to_block_spec(b)))
        b2 = wire.from_block_spec(spec)
        assert type(b2) is type(b)
        x = jnp.asarray(rng.randn(b.ncols).astype(np.float32))
        np.testing.assert_allclose(
            np.asarray(b.apply(x)), np.asarray(b2.apply(x)), atol=1e-5)


def test_problem_spec_roundtrip_solves_identically():
    nx = ny = 12
    n = nx * ny
    rng = np.random.RandomState(1)
    f = rng.rand(n).astype(np.float32)
    grad = BlockGradient2D(row=0, col=0, nx=nx, ny=ny, L=1)
    prox_g = [ProxElem1D(index=0, size=n, fun="square",
                         coeffs=(1.0, f, 5.0, 0.0, 0.0, 0.0, 0.0))]
    pn = ProxElemNorm2(index=0, size=2 * n, count=n, dim=2, interleaved=False,
                       fun="abs", coeffs=(1.0, 0.0, 1.0, 0.0, 0.0, 0.0, 0.0))
    prob = pt.Problem.create(
        LinearOperator.create([grad]), prox_g=prox_g,
        prox_fstar=[ProxMoreau(index=0, size=2 * n, child=pn)])

    spec = json.loads(json.dumps(wire.to_spec(prob)))
    prob2 = wire.from_spec(spec)
    np.testing.assert_allclose(np.asarray(prob2.scaling_left),
                               np.asarray(prob.scaling_left), rtol=1e-6)

    from prost_tpu.backend import BackendPDHG, PDHGOptions

    opts = pt.SolverOptions(verbose=False, tol_rel_primal=1e-6,
                            tol_rel_dual=1e-6, tol_abs_primal=1e-6,
                            tol_abs_dual=1e-6)
    po = PDHGOptions(scale_steps_operator=False)
    s1 = BackendPDHG(prob, po, opts)
    s2 = BackendPDHG(prob2, po, opts)
    r1 = s1.run(s1.initial_state(), 200)
    r2 = s2.run(s2.initial_state(), 200)
    np.testing.assert_allclose(np.asarray(r1.x), np.asarray(r2.x), atol=1e-5)


def test_save_load_spec(tmp_path):
    p = ProxTransform(index=0, size=4,
                      child=ProxElem1D(index=0, size=4, fun="abs",
                                       coeffs=(1.0, 0.0, 1.0, 0.0, 0.0,
                                               0.0, 0.0)),
                      a=2.0, b=1.0)
    spec = wire.to_prox_spec(p)
    path = str(tmp_path / "p.json")
    wire.save_spec(path, spec)
    q = wire.from_prox_spec(wire.load_spec(path))
    arg = jnp.asarray([3.0, -1.0, 0.5, 2.0])
    tau = jnp.ones(4)
    np.testing.assert_allclose(
        np.asarray(p.eval_local(arg, tau, 1.0, False)),
        np.asarray(q.eval_local(arg, tau, 1.0, False)), atol=1e-6)


def test_unknown_kind_raises():
    with pytest.raises(pt.ProstError):
        wire.from_prox_spec({"name": "nope", "idx": 0, "size": 1, "data": {}})
    with pytest.raises(pt.ProstError):
        wire.from_block_spec({"name": "nope", "row": 0, "col": 0, "data": {}})
