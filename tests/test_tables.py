"""Tests of the table-gather primitives (piecewise_test.cpp equivalents).

The reference checks compiled-kernel lookups against host evaluation
(graph_tests/piecewise_test.cpp); here we check the jitted gathers against
straightforward numpy indexing with the same clamped-truncation semantics.
"""

import jax
import jax.numpy as jnp
import numpy as np

from graph_framework_tpu.ops import (
    piecewise_1d, piecewise_2d, index_1d, table_index_1d)


def test_index_clamps_and_truncates():
    # i = (uint) min(max((x-offset)/scale, 0), n-1)  (piecewise.hpp:26-60)
    n = 10
    xs = jnp.array([-5.0, -0.01, 0.0, 0.49, 0.51, 3.99, 9.0, 9.99, 50.0])
    idx = table_index_1d(xs, 1.0, 0.0, n)
    np.testing.assert_array_equal(
        np.asarray(idx), [0, 0, 0, 0, 0, 3, 9, 9, 9])


def test_index_scale_offset():
    n = 100
    scale, offset = 0.25, -3.0
    xs = jnp.linspace(-5.0, 30.0, 77)
    idx = np.asarray(table_index_1d(xs, scale, offset, n))
    expect = np.clip((np.asarray(xs) - offset) / scale, 0, n - 1).astype(int)
    np.testing.assert_array_equal(idx, expect)


def test_piecewise_1d_gather():
    data = jnp.arange(8.0) * 1.5 + 3.0
    xs = jnp.array([0.2, 1.7, 6.99, 7.2, -4.0, 100.0])
    vals = piecewise_1d(data, xs, 1.0, 0.0)
    expect = np.asarray(data)[[0, 1, 6, 7, 0, 7]]
    np.testing.assert_allclose(np.asarray(vals), expect)


def test_piecewise_1d_derivative_is_zero():
    # The lookup is piecewise constant: df == 0 (piecewise.hpp:241-243).
    data = jnp.arange(8.0) ** 2
    g = jax.grad(lambda x: piecewise_1d(data, x, 1.0, 0.0))(2.5)
    assert float(g) == 0.0


def test_piecewise_2d_row_col_order():
    # data[i*num_cols + j], i from x/rows, j from y/cols
    # (piecewise.hpp:1078-1125).
    rows, cols = 5, 7
    data = jnp.arange(rows * cols, dtype=jnp.float64).reshape(rows, cols)
    val = piecewise_2d(data, 3.2, 1.0, 0.0, 4.9, 1.0, 0.0)
    assert float(val) == 3 * cols + 4

    # clamping on both axes
    val = piecewise_2d(data, -1.0, 1.0, 0.0, 99.0, 1.0, 0.0)
    assert float(val) == 0 * cols + (cols - 1)


def test_piecewise_2d_batched():
    rows, cols = 4, 6
    data = jnp.arange(rows * cols, dtype=jnp.float64).reshape(rows, cols)
    xs = jnp.array([0.1, 1.5, 3.9])
    ys = jnp.array([5.5, 0.0, 2.1])
    vals = piecewise_2d(data, xs, 1.0, 0.0, ys, 1.0, 0.0)
    expect = np.asarray(data)[[0, 1, 3], [5, 0, 2]]
    np.testing.assert_allclose(np.asarray(vals), expect)


def test_index_1d_matches_piecewise():
    values = jnp.array([3.0, 1.0, 4.0, 1.0, 5.0])
    xs = jnp.array([0.0, 2.2, 9.0])
    np.testing.assert_allclose(
        np.asarray(index_1d(values, xs, 1.0, 0.0)),
        np.asarray(piecewise_1d(values, xs, 1.0, 0.0)))


def test_complex_argument_uses_real_part():
    # For complex scalars the generated index wraps the coordinate in real()
    # (piecewise.hpp compile_index complex branch).
    data = jnp.arange(6.0)
    val = piecewise_1d(data, jnp.complex128(2.5 + 40.0j), 1.0, 0.0)
    assert complex(val) == 2.0
