"""Native host runtime (_native/src/prost_host.cpp) vs numpy/scipy oracles,
plus fallback-path coverage."""

import numpy as np
import pytest

from prost_tpu._native import host


def test_native_library_builds():
    # the toolchain is part of the environment; the native path must be live
    assert host.available()


def test_coo_sort_perm_matches_lexsort():
    rng = np.random.RandomState(0)
    r = rng.randint(0, 50, 500).astype(np.int32)
    c = rng.randint(0, 40, 500).astype(np.int32)
    perm = host.coo_sort_perm(r, c)
    ref = np.lexsort((c, r))
    # permutations may differ on ties only in stable order of equal keys;
    # compare the sorted key sequences and that perm is a permutation
    np.testing.assert_array_equal(np.sort(perm), np.arange(500))
    np.testing.assert_array_equal(r[perm], r[ref])
    np.testing.assert_array_equal(c[perm], c[ref])


def test_check_prox_domain():
    assert host.check_prox_domain([0, 4, 9], [4, 5, 1], 10) is None
    assert host.check_prox_domain([0, 5], [4, 5], 10) is not None  # gap
    assert host.check_prox_domain([0, 3], [4, 7], 10) is not None  # overlap
    assert host.check_prox_domain([1], [9], 10) is not None  # start != 0
    assert host.check_prox_domain([0], [9], 10) is not None  # short


def test_prox_gaps():
    assert host.prox_gaps([2, 8], [3, 2], 12) == [(0, 2), (5, 3), (10, 2)]
    assert host.prox_gaps([0], [12], 12) == []
    with pytest.raises(ValueError):
        host.prox_gaps([0, 3], [5, 5], 12)


def test_check_block_overlap_randomized():
    """Sweep-line result matches the O(n^2) oracle over random block grids
    (test_linop_sparse_zero.m pattern)."""
    rng = np.random.RandomState(1)
    for _ in range(20):
        n = rng.randint(2, 12)
        rows = rng.randint(0, 30, n)
        cols = rng.randint(0, 30, n)
        nrows = rng.randint(1, 10, n)
        ncols = rng.randint(1, 10, n)

        def oracle():
            for i in range(n):
                for j in range(i + 1, n):
                    if (cols[i] < cols[j] + ncols[j]
                            and cols[j] < cols[i] + ncols[i]
                            and rows[i] < rows[j] + nrows[j]
                            and rows[j] < rows[i] + nrows[i]):
                        return True
            return False

        got = host.check_block_overlap(rows, cols, nrows, ncols)
        assert (got is not None) == oracle()


def test_csr_roundtrip_and_matvec():
    import scipy.sparse as sp

    rng = np.random.RandomState(2)
    A = sp.random(200, 150, 0.05, random_state=2).tocsr()
    cp, ri, vt = host.csr_to_csc(200, 150, A.indptr, A.indices, A.data)
    B = A.tocsc()
    np.testing.assert_array_equal(cp, B.indptr)
    np.testing.assert_array_equal(ri, B.indices)
    np.testing.assert_allclose(vt, B.data)

    x = rng.rand(150)
    np.testing.assert_allclose(
        host.csr_matvec(200, A.indptr, A.indices, A.data, x), A @ x
    )
    np.testing.assert_allclose(
        host.csr_row_alpha_sum(200, A.indptr, A.data, 1.5),
        np.asarray((abs(A).power(1.5)).sum(axis=1)).ravel(),
    )
