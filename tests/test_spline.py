"""Tests of offset-normalized cubic/bicubic spline evaluation.

Validates against scipy splines fit to smooth functions, and checks the
derivative-through-spline semantics (gradients flow through the polynomial
only, matching the reference's piecewise df == 0 rule; SURVEY.md section 7
"hard parts").
"""

import jax
import jax.numpy as jnp
import numpy as np
from scipy.interpolate import CubicSpline

from graph_framework_tpu.ops import spline_1d, eval_bicubic_2d
from graph_framework_tpu.ops.spline import (
    eval_cubic_1d, to_cell_major_1d, to_cell_major_2d)


def _cell_coeffs_from_scipy(cs, offset, scale, n_cells):
    """Convert a scipy CubicSpline on a uniform grid into the reference's
    per-cell global-normalized-coordinate coefficient tables.

    scipy stores value = sum_k c[k, i] * (x - x_i)^(3-k) per cell i.  The
    reference evaluates sum_k c_k[i] * u^k with u = (x - offset)/scale
    global (equilibrium.hpp:1120-1131), so we rebase each cell's polynomial
    from (x - x_i) to u = (x - offset)/scale: with x = offset + scale*u and
    x_i = offset + scale*i, (x - x_i) = scale*(u - i).
    """
    c0 = np.zeros(n_cells)
    c1 = np.zeros(n_cells)
    c2 = np.zeros(n_cells)
    c3 = np.zeros(n_cells)
    s = scale
    for i in range(n_cells):
        # scipy per-cell poly in t = x - x_i: a3 t^3 + a2 t^2 + a1 t + a0,
        # with t = s*(u - i); expand in powers of u.
        a3, a2, a1, a0 = cs.c[:, min(i, cs.c.shape[1] - 1)]
        c3[i] = a3 * s**3
        c2[i] = a2 * s**2 - 3 * a3 * s**3 * i
        c1[i] = a1 * s - 2 * a2 * s**2 * i + 3 * a3 * s**3 * i * i
        c0[i] = a0 - a1 * s * i + a2 * s * s * i * i - a3 * s**3 * i**3
    return c0, c1, c2, c3


def test_spline_1d_matches_scipy():
    offset, scale, n = -2.0, 0.125, 48
    xs_grid = offset + scale * np.arange(n + 1)
    f = np.sin(xs_grid) * np.exp(-0.1 * xs_grid**2)
    cs = CubicSpline(xs_grid, f)
    c0, c1, c2, c3 = _cell_coeffs_from_scipy(cs, offset, scale, n)

    xq = np.linspace(offset + 0.01, offset + scale * n - 0.01, 333)
    got = spline_1d(jnp.array(c0), jnp.array(c1), jnp.array(c2),
                    jnp.array(c3), jnp.array(xq), scale, offset)
    np.testing.assert_allclose(np.asarray(got), cs(xq), rtol=0, atol=1e-12)


def test_spline_1d_gradient_matches_scipy_derivative():
    offset, scale, n = 0.0, 0.1, 64
    xs_grid = offset + scale * np.arange(n + 1)
    f = np.cos(2.0 * xs_grid)
    cs = CubicSpline(xs_grid, f)
    c0, c1, c2, c3 = _cell_coeffs_from_scipy(cs, offset, scale, n)
    tables = tuple(jnp.array(c) for c in (c0, c1, c2, c3))

    def eval_one(x):
        return spline_1d(*tables, x, scale, offset)

    dfun = jax.vmap(jax.grad(eval_one))
    xq = np.linspace(0.05, scale * n - 0.05, 101)
    got = dfun(jnp.array(xq))
    np.testing.assert_allclose(np.asarray(got), cs(xq, 1),
                               rtol=0, atol=1e-10)


def test_bicubic_separable_polynomial():
    # A bicubic with constant coefficient tables is a global polynomial in
    # (u, v); check exact evaluation and autodiff.
    nr, nc = 8, 9
    rng = np.random.default_rng(0)
    coeffs = np.broadcast_to(
        rng.normal(size=(4, 4, 1, 1)), (4, 4, nr, nc)).copy()
    cj = jnp.array(to_cell_major_2d(coeffs))
    x_scale, x_offset = 0.5, 1.0
    y_scale, y_offset = 0.25, -1.0

    def poly(x, y):
        u = (x - x_offset) / x_scale
        v = (y - y_offset) / y_scale
        return sum(coeffs[a, b, 0, 0] * u**a * v**b
                   for a in range(4) for b in range(4))

    for x, y in [(1.3, -0.7), (2.9, 0.4), (1.01, -0.99)]:
        got = eval_bicubic_2d(cj, x, x_scale, x_offset, y, y_scale, y_offset)
        np.testing.assert_allclose(float(got), poly(x, y), rtol=1e-12)

    # gradient against analytic derivative
    gx = jax.grad(lambda x, y: eval_bicubic_2d(
        cj, x, x_scale, x_offset, y, y_scale, y_offset), argnums=(0, 1))
    g = gx(1.3, -0.7)
    eps = 1e-6
    num_gx = (poly(1.3 + eps, -0.7) - poly(1.3 - eps, -0.7)) / (2 * eps)
    num_gy = (poly(1.3, -0.7 + eps) - poly(1.3, -0.7 - eps)) / (2 * eps)
    np.testing.assert_allclose(float(g[0]), num_gx, rtol=1e-6)
    np.testing.assert_allclose(float(g[1]), num_gy, rtol=1e-6)


def test_bicubic_batched():
    nr, nc = 6, 7
    rng = np.random.default_rng(1)
    coeffs = jnp.array(to_cell_major_2d(rng.normal(size=(4, 4, nr, nc))))
    xs = jnp.array(rng.uniform(0.2, nr - 1.2, size=50))
    ys = jnp.array(rng.uniform(0.2, nc - 1.2, size=50))
    batched = eval_bicubic_2d(coeffs, xs, 1.0, 0.0, ys, 1.0, 0.0)
    single = jnp.stack([
        eval_bicubic_2d(coeffs, xs[i], 1.0, 0.0, ys[i], 1.0, 0.0)
        for i in range(50)])
    np.testing.assert_allclose(np.asarray(batched), np.asarray(single),
                               rtol=1e-13)


def test_eval_cubic_1d_cell_major_matches_spline_1d():
    offset, scale, n = -2.0, 0.125, 48
    xs_grid = offset + scale * np.arange(n + 1)
    f = np.sin(xs_grid) * np.exp(-0.1 * xs_grid**2)
    cs = CubicSpline(xs_grid, f)
    c0, c1, c2, c3 = _cell_coeffs_from_scipy(cs, offset, scale, n)
    cm = jnp.array(to_cell_major_1d(np.stack([c0, c1, c2, c3])))

    xq = jnp.array(np.linspace(offset + 0.01, offset + scale * n - 0.01, 77))
    got = eval_cubic_1d(cm, xq, scale, offset)
    want = spline_1d(jnp.array(c0), jnp.array(c1), jnp.array(c2),
                     jnp.array(c3), xq, scale, offset)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=0, atol=1e-12)
