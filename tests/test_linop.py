"""Linear-operator tests: each block type vs an explicitly assembled dense
matrix oracle (forward, adjoint, row/col sums), plus the randomized
block-grid composition test (test_linop_sparse_zero.m pattern) and the
adjointness property <Kx, y> == <x, K^T y>.
"""

import numpy as np
import jax.numpy as jnp
import pytest

from prost_tpu.config import ProstError
from prost_tpu.linop import (
    BlockDense,
    BlockDiags,
    BlockGradient2D,
    BlockGradient3D,
    BlockIdKron,
    BlockKronId,
    BlockSparse,
    BlockZero,
    DualLinearOperator,
    LinearOperator,
)


def dense_oracle_checks(block, dense, atol=1e-4):
    """Check fwd/adjoint/row_sum/col_sum of a block against its dense form."""
    nrows, ncols = dense.shape
    assert block.nrows == nrows and block.ncols == ncols
    rng = np.random.RandomState(0)
    x = rng.randn(ncols).astype(np.float32)
    y = rng.randn(nrows).astype(np.float32)

    np.testing.assert_allclose(
        np.asarray(block.apply(jnp.asarray(x))), dense @ x, atol=atol)
    np.testing.assert_allclose(
        np.asarray(block.apply_adjoint(jnp.asarray(y))), dense.T @ y, atol=atol)
    for alpha in (1.0, 2.0):
        np.testing.assert_allclose(
            np.asarray(block.row_sum(alpha)),
            np.abs(dense) ** alpha @ np.ones(ncols), atol=atol)
        np.testing.assert_allclose(
            np.asarray(block.col_sum(alpha)),
            np.abs(dense.T) ** alpha @ np.ones(nrows), atol=atol)


def spmat_gradient2d(nx, ny, L):
    """Dense oracle for the forward-difference gradient
    (matlab/+prost/+test/private/spmat_gradient2d.m semantics):
    flat index = y + ny*x + nx*ny*l, output [gx; gy]."""
    n = nx * ny * L
    K = np.zeros((2 * n, n), dtype=np.float64)
    def idx(l, x, y):
        return y + ny * x + nx * ny * l
    for l in range(L):
        for x in range(nx):
            for y in range(ny):
                r = idx(l, x, y)
                if x < nx - 1:
                    K[r, idx(l, x + 1, y)] += 1
                    K[r, idx(l, x, y)] -= 1
                if y < ny - 1:
                    K[n + r, idx(l, x, y + 1)] += 1
                    K[n + r, idx(l, x, y)] -= 1
    return K


def test_gradient2d_vs_dense():
    nx, ny, L = 5, 4, 3
    g = BlockGradient2D(row=0, col=0, nx=nx, ny=ny, L=L)
    K = spmat_gradient2d(nx, ny, L)
    n = nx * ny * L
    rng = np.random.RandomState(1)
    x = rng.randn(n).astype(np.float32)
    y = rng.randn(2 * n).astype(np.float32)
    np.testing.assert_allclose(np.asarray(g.apply(jnp.asarray(x))), K @ x,
                               atol=1e-5)
    np.testing.assert_allclose(np.asarray(g.apply_adjoint(jnp.asarray(y))),
                               K.T @ y, atol=1e-5)
    # hardcoded preconditioner sums (block_gradient2d.cu:150-160)
    np.testing.assert_allclose(np.asarray(g.row_sum(1.0)), 2.0)
    np.testing.assert_allclose(np.asarray(g.col_sum(1.0)), 4.0)


def test_gradient3d_adjointness():
    nx, ny, L = 4, 3, 5
    g = BlockGradient3D(row=0, col=0, nx=nx, ny=ny, L=L)
    n = nx * ny * L
    rng = np.random.RandomState(2)
    x = rng.randn(n).astype(np.float32)
    y = rng.randn(3 * n).astype(np.float32)
    kx = np.asarray(g.apply(jnp.asarray(x)))
    kty = np.asarray(g.apply_adjoint(jnp.asarray(y)))
    np.testing.assert_allclose(kx @ y, x @ kty, rtol=1e-4)
    # label axis has Dirichlet boundary: gl at last label = -u
    u = x.reshape(L, nx, ny)
    gl = kx[2 * n:].reshape(L, nx, ny)
    np.testing.assert_allclose(gl[L - 1], -u[L - 1], atol=1e-5)


def test_block_sparse_vs_dense():
    rng = np.random.RandomState(3)
    m = (rng.rand(20, 15) < 0.3) * rng.randn(20, 15)
    blk = BlockSparse.create(0, 0, 20, 15, m)
    dense_oracle_checks(blk, m)


def test_block_dense():
    rng = np.random.RandomState(4)
    m = rng.randn(12, 17)
    blk = BlockDense.create(0, 0, m)
    dense_oracle_checks(blk, m)


def test_block_diags():
    nrows, ncols = 10, 14
    factors = [2.0, -1.0, 0.5]
    offsets = [0, 1, -2]
    dense = np.zeros((nrows, ncols))
    for f, o in zip(factors, offsets):
        for r in range(nrows):
            c = r + o
            if 0 <= c < ncols:
                dense[r, c] += f
    blk = BlockDiags.create(0, 0, nrows, ncols, factors, offsets)
    dense_oracle_checks(blk, dense)


def test_kron_blocks():
    rng = np.random.RandomState(5)
    M = rng.randn(4, 6)
    d = 7
    # kron(M, I_d)
    blk = BlockKronId.create(0, 0, d, M)
    dense_oracle_checks(blk, np.kron(M, np.eye(d)))
    # kron(I_n, M)
    blk2 = BlockIdKron.create(0, 0, d, M)
    dense_oracle_checks(blk2, np.kron(np.eye(d), M))


def test_block_zero():
    blk = BlockZero(row=0, col=0, nrows=8, ncols=5)
    dense_oracle_checks(blk, np.zeros((8, 5)))


@pytest.mark.parametrize("seed", range(5))
def test_random_block_grid_composition(seed):
    """Assemble a random grid of sparse/dense/zero blocks; compare against
    the concatenated dense matrix (test_linop_sparse_zero.m:6-60)."""
    rng = np.random.RandomState(seed)
    grid_r, grid_c = rng.randint(2, 5), rng.randint(2, 5)
    row_sizes = rng.randint(3, 9, grid_r)
    col_sizes = rng.randint(3, 9, grid_c)
    row_off = np.concatenate([[0], np.cumsum(row_sizes)])
    col_off = np.concatenate([[0], np.cumsum(col_sizes)])

    blocks = []
    dense = np.zeros((row_off[-1], col_off[-1]))
    for i in range(grid_r):
        for j in range(grid_c):
            kind = rng.randint(3)
            m = np.zeros((row_sizes[i], col_sizes[j]))
            if kind == 0:
                m = (rng.rand(*m.shape) < 0.4) * rng.randn(*m.shape)
                blocks.append(BlockSparse.create(
                    row_off[i], col_off[j], *m.shape, m))
            elif kind == 1:
                m = rng.randn(*m.shape)
                blocks.append(BlockDense.create(row_off[i], col_off[j], m))
            else:
                blocks.append(BlockZero(row=int(row_off[i]), col=int(col_off[j]),
                                        nrows=int(m.shape[0]),
                                        ncols=int(m.shape[1])))
            dense[row_off[i]:row_off[i + 1], col_off[j]:col_off[j + 1]] = m

    K = LinearOperator.create(blocks)
    assert K.nrows == dense.shape[0] and K.ncols == dense.shape[1]
    x = rng.randn(K.ncols).astype(np.float32)
    y = rng.randn(K.nrows).astype(np.float32)
    np.testing.assert_allclose(np.asarray(K.apply(jnp.asarray(x))),
                               dense @ x, atol=1e-4)
    np.testing.assert_allclose(np.asarray(K.apply_adjoint(jnp.asarray(y))),
                               dense.T @ y, atol=1e-4)
    np.testing.assert_allclose(np.asarray(K.row_sum(1.0)),
                               np.abs(dense).sum(axis=1), atol=1e-4)
    np.testing.assert_allclose(np.asarray(K.col_sum(1.0)),
                               np.abs(dense).sum(axis=0), atol=1e-4)


def test_overlap_rejected():
    b1 = BlockZero(row=0, col=0, nrows=5, ncols=5)
    b2 = BlockZero(row=4, col=4, nrows=5, ncols=5)
    with pytest.raises(ProstError):
        LinearOperator.create([b1, b2])


def test_dual_linop_is_negative_transpose():
    rng = np.random.RandomState(7)
    m = rng.randn(9, 6)
    K = LinearOperator.create([BlockDense.create(0, 0, m)])
    D = DualLinearOperator(child=K)
    x = rng.randn(9).astype(np.float32)
    y = rng.randn(6).astype(np.float32)
    np.testing.assert_allclose(np.asarray(D.apply(jnp.asarray(x))),
                               -m.T @ x, atol=1e-4)
    np.testing.assert_allclose(np.asarray(D.apply_adjoint(jnp.asarray(y))),
                               -m @ y, atol=1e-4)
    np.testing.assert_allclose(np.asarray(D.row_sum(1.0)),
                               np.abs(m.T).sum(axis=1), atol=1e-4)


def test_conv2d_block_vs_convmtx():
    """BlockConv2D vs the explicit sparse convolution matrix (the
    reference's deblurring pattern, example_deblurring.m:33-37)."""
    import os, sys
    sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "examples"))
    from example_deblurring import convmtx2, motion_kernel
    from prost_tpu.linop import BlockConv2D

    nx, ny = 12, 10
    kernel = motion_kernel(5, 30.0)
    kernel[0, 1] += 0.3
    B, ny2, nx2 = convmtx2(kernel, ny, nx)
    blk = BlockConv2D.create(0, 0, nx, ny, 1, kernel)
    rng = np.random.RandomState(0)
    u = rng.randn(nx * ny).astype(np.float32)
    v = rng.randn(ny2 * nx2).astype(np.float32)
    np.testing.assert_allclose(np.asarray(blk.apply(jnp.asarray(u))), B @ u,
                               atol=1e-5)
    np.testing.assert_allclose(
        np.asarray(blk.apply_adjoint(jnp.asarray(v))), B.T @ v, atol=1e-5)
    np.testing.assert_allclose(
        np.asarray(blk.row_sum(1.0)), np.abs(B) @ np.ones(nx * ny), atol=1e-5)
    np.testing.assert_allclose(
        np.asarray(blk.col_sum(1.0)), np.abs(B).T @ np.ones(ny2 * nx2),
        atol=1e-5)
