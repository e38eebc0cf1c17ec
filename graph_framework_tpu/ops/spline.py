"""Offset-normalized cubic / bicubic spline evaluation.

The reference stores cubic splines as four per-cell coefficient tables
(c0..c3) and evaluates the polynomial in the *global* normalized coordinate
u = (x - offset)/scale with the coefficients gathered from the cell
containing u (equilibrium.hpp ``build_1D_spline``, :1120-1131 - the
offset/scale algebra there is exactly the expansion of
c0 + c1*u + c2*u^2 + c3*u^3 in powers of raw x).  Bicubic surfaces use 16
tables c_ab and evaluate sum_ab c_ab * v^b * u^a (equilibrium.hpp
``efit::build_psi``, :1278-1313: four 1D splines in z combined cubically
in r).

Derivatives: coefficients are piecewise constant w.r.t. the coordinate
(tables.py), so autodiff differentiates the polynomial only - matching the
reference's symbolic ``df`` through ``piecewise_*`` nodes.
"""

import math

import numpy as np
import jax.numpy as jnp

from graph_framework_tpu.ops.tables import table_index_1d


def rebase_cells_1d(coeffs):
    """Rebase (4, n) global-coordinate cell tables to cell-local form.

    The file format stores polynomials in the *global* normalized coordinate
    u, which makes f64 evaluation ill-conditioned at large u (terms up to
    ~4e7 times the value cancel in the efit.nc psi tables).  Rebasing each
    cell's polynomial to t = u - i (t in [0, 1)) at load time - in extended
    precision, so the rebase itself doesn't reintroduce the cancellation -
    gives near-machine-accurate evaluation.  Pass the result to
    :func:`spline_1d`/:func:`eval_cubic_1d` with ``local=True``.
    """
    c = np.asarray(coeffs, dtype=np.longdouble)
    n = c.shape[1]
    cells = np.arange(n, dtype=np.longdouble)
    out = np.zeros((4, n), dtype=np.float64)
    for k in range(4):
        acc = np.zeros(n, dtype=np.longdouble)
        for i in range(k, 4):
            acc += math.comb(i, k) * c[i] * cells ** (i - k)
        out[k] = acc.astype(np.float64)
    return out


def rebase_cells_2d(coeffs):
    """Rebase a (4, 4, nr, nc) global-coordinate bicubic stack to
    cell-local coordinates in both directions (see :func:`rebase_cells_1d`).
    """
    c = np.asarray(coeffs, dtype=np.longdouble)
    _, _, nr, nc = c.shape
    iu = np.arange(nr, dtype=np.longdouble)[:, None]
    jv = np.arange(nc, dtype=np.longdouble)[None, :]
    out = np.zeros((4, 4, nr, nc), dtype=np.float64)
    for k in range(4):
        for l in range(4):
            acc = np.zeros((nr, nc), dtype=np.longdouble)
            for a in range(k, 4):
                for b in range(l, 4):
                    acc += (math.comb(a, k) * math.comb(b, l)
                            * c[a, b] * iu ** (a - k) * jv ** (b - l))
            out[k, l] = acc.astype(np.float64)
    return out


def spline_1d(c0, c1, c2, c3, x, scale, offset, local=False):
    """Evaluate a 1D cubic spline from four coefficient tables.

    Equivalent to ``equilibrium::build_1D_spline`` applied to four
    ``piecewise_1D`` gathers (equilibrium.hpp:1120-1131): the value is the
    Horner evaluation c0[i] + u*(c1[i] + u*(c2[i] + u*c3[i])) with
    u = (x - offset)/scale and i = clamp(trunc(u)).
    """
    u = (x - offset) / scale
    idx = table_index_1d(x, scale, offset, c0.shape[0])
    if local:
        u = u - idx.astype(u.dtype)
    a0 = jnp.take(c0, idx, axis=0)
    a1 = jnp.take(c1, idx, axis=0)
    a2 = jnp.take(c2, idx, axis=0)
    a3 = jnp.take(c3, idx, axis=0)
    return a0 + u * (a1 + u * (a2 + u * a3))


def eval_cubic_1d(coeffs, x, scale, offset, local=False):
    """Evaluate a 1D cubic spline from a stacked (4, n) coefficient array."""
    return spline_1d(coeffs[0], coeffs[1], coeffs[2], coeffs[3],
                     x, scale, offset, local=local)


def eval_bicubic_2d(coeffs, x, x_scale, x_offset, y, y_scale, y_offset,
                    local=False):
    """Evaluate a bicubic spline surface from a (4, 4, nr, nc) table stack.

    ``coeffs[a, b]`` is the (nr, nc) table of the u^a * v^b coefficient where
    u = (x - x_offset)/x_scale indexes rows and v = (y - y_offset)/y_scale
    indexes columns.  Mirrors ``efit::build_psi``
    (equilibrium.hpp:1278-1313): 16 piecewise_2D gathers, a cubic in v per
    row of coefficients, then a cubic in u.

    The 16 gathers share one (i, j) cell index - the TPU-friendly layout
    gathers a single (4, 4) block per point instead of 16 scalar lookups
    (the reference's USE_INDEX_CACHE optimisation, piecewise.hpp:256-325,
    done at the data-layout level).
    """
    _, _, num_rows, num_cols = coeffs.shape
    u = (x - x_offset) / x_scale
    v = (y - y_offset) / y_scale
    i = table_index_1d(x, x_scale, x_offset, num_rows)
    j = table_index_1d(y, y_scale, y_offset, num_cols)
    if local:
        u = u - i.astype(u.dtype)
        v = v - j.astype(v.dtype)
    return _bicubic_from_block(coeffs[:, :, i, j], u, v)


def _bicubic_from_block(block, u, v):
    """Evaluate sum_ab block[a, b] u^a v^b for a gathered (4, 4[, ...])
    coefficient block."""
    # cubic in v for each power of u: c_a = sum_b block[a, b] * v^b
    vpow = jnp.stack([jnp.ones_like(v), v, v * v, v * v * v])
    ca = jnp.tensordot(block, vpow, axes=[[1], [0]]) if block.ndim == 2 \
        else jnp.einsum("ab...,b...->a...", block, vpow)
    # cubic in u: ((c3*u + c2)*u + c1)*u + c0
    return ca[0] + u * (ca[1] + u * (ca[2] + u * ca[3]))


def eval_cubic_multi(coeffs, x, scale, offset, local=False):
    """Evaluate several cubic splines sharing one argument and index.

    ``coeffs``: (num_profiles, 4, n).  One gather fetches the
    (num_profiles, 4) coefficient block per point - the EFIT profile
    splines (ne, te, pressure, fpol) all key on the same psi, so fusing
    them quarters the gather count of the hot loop.
    Returns an array of shape (num_profiles[, ...batch]).
    """
    u = (x - offset) / scale
    idx = table_index_1d(x, scale, offset, coeffs.shape[2])
    if local:
        u = u - idx.astype(u.dtype)
    block = coeffs[:, :, idx]                     # (P, 4[, ...])
    return (block[:, 0] + u * (block[:, 1]
            + u * (block[:, 2] + u * block[:, 3])))


def eval_bicubic_jet(coeffs, x, x_scale, x_offset, y, y_scale, y_offset,
                     local=False):
    """Bicubic value and first derivatives from ONE coefficient gather.

    Returns (value, d/dx, d/dy).  The derivative polynomials are evaluated
    analytically from the same gathered (4, 4) block, so callers needing
    the spline gradient (the B field, equilibrium.hpp:1364-1382) avoid a
    nested jax.grad whose transpose the outer ray-equation gradient would
    then have to differentiate through.  The jet itself is built from
    gathers + polynomials only, so higher derivatives via plain autodiff
    remain exact and cheap.
    """
    _, _, num_rows, num_cols = coeffs.shape
    u = (x - x_offset) / x_scale
    v = (y - y_offset) / y_scale
    i = table_index_1d(x, x_scale, x_offset, num_rows)
    j = table_index_1d(y, y_scale, y_offset, num_cols)
    if local:
        u = u - i.astype(u.dtype)
        v = v - j.astype(v.dtype)
    block = coeffs[:, :, i, j]                    # (4, 4[, ...])
    one = jnp.ones_like(v)
    vpow = jnp.stack([one, v, v * v, v * v * v])        # v^b
    dvpow = jnp.stack([jnp.zeros_like(v), one, 2.0 * v, 3.0 * v * v])
    if block.ndim == 2:
        ca = block @ vpow                          # sum_b block[a,b] v^b
        cb = block @ dvpow                         # sum_b b block[a,b] v^(b-1)
    else:
        ca = jnp.einsum("ab...,b...->a...", block, vpow)
        cb = jnp.einsum("ab...,b...->a...", block, dvpow)
    val = ca[0] + u * (ca[1] + u * (ca[2] + u * ca[3]))
    dval_du = ca[1] + u * (2.0 * ca[2] + 3.0 * u * ca[3])
    dval_dv = cb[0] + u * (cb[1] + u * (cb[2] + u * cb[3]))
    return val, dval_du / x_scale, dval_dv / y_scale
