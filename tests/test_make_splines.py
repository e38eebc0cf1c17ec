"""Roundtrip tests for the spline-file generator (tools/make_splines.py).

The reference produces its EFIT input files with Mathematica notebooks
(utilities/BiCubicSplines.nb); these tests check that the numpy generator
fits splines whose evaluation through the *production loader + evaluators*
(make_efit -> eval_bicubic_2d / eval_cubic_1d) reproduces the sampled
analytic fields to spline accuracy.
"""

import numpy as np
import jax.numpy as jnp

from graph_framework_tpu.models.efit import make_efit
from graph_framework_tpu.ops.spline import eval_cubic_1d
from graph_framework_tpu.tools import (
    cubic_spline_coeffs, bicubic_spline_coeffs, write_efit_file)


def test_cubic_1d_interpolates_samples_and_converges():
    x = np.linspace(0.0, 2.0 * np.pi, 41)
    y = np.sin(x)
    c = cubic_spline_coeffs(y)                    # global-coordinate tables
    tabs = jnp.asarray(np.ascontiguousarray(c.T))  # (ncells, 4) cell-major
    dx = x[1] - x[0]
    # exact at the knots
    at_knots = eval_cubic_1d(tabs, jnp.asarray(x[:-1]), dx, x[0])
    np.testing.assert_allclose(np.asarray(at_knots), y[:-1], atol=1e-12)
    # interior accuracy between knots ~ h^4
    fine = np.linspace(x[3], x[-4], 301)
    vals = eval_cubic_1d(tabs, jnp.asarray(fine), dx, x[0])
    assert np.max(np.abs(np.asarray(vals) - np.sin(fine))) < 5e-5


def test_bicubic_2d_interpolates_samples():
    r = np.linspace(1.0, 2.0, 33)
    z = np.linspace(-0.5, 0.5, 33)
    f = np.sin(2.0 * r)[:, None] * np.cos(3.0 * z)[None, :]
    c = bicubic_spline_coeffs(f)                  # (4, 4, nr-1, nz-1)
    # evaluate cell (i, j) at its lower-left knot in global coordinates
    # u = i, v = j: value must equal the sample (longdouble rebase check)
    i, j = 5, 7
    u, v = float(i), float(j)
    val = sum(c[a, b, i, j] * u ** a * v ** b
              for a in range(4) for b in range(4))
    np.testing.assert_allclose(val, f[i, j], rtol=1e-10)


def test_efit_file_roundtrip(tmp_path):
    r = np.linspace(1.0, 2.4, 57)
    z = np.linspace(-0.7, 0.7, 57)
    # smooth tokamak-ish flux surface map
    psi = ((r[:, None] - 1.7) ** 2 / 0.49
           + (z[None, :] ** 2) / 0.25
           + 0.05 * np.sin(3.0 * r)[:, None] * np.cos(2.0 * z)[None, :])
    pgrid = np.linspace(psi.min(), psi.max() + 0.1, 65)
    ne = 1.0e19 * (1.0 - 0.8 * (pgrid - pgrid[0]) / np.ptp(pgrid))
    te = 2.0e3 * (1.0 - 0.9 * (pgrid - pgrid[0]) / np.ptp(pgrid)) ** 2
    pres = 1.60218e-19 * ne * te * 2.5
    fpol = 3.4 + 0.1 * np.sin(pgrid)

    path = tmp_path / "gen_efit.nc"
    write_efit_file(path, r=r, z=z, psi=psi, psi_profile=pgrid,
                    ne=ne, te=te, pressure=pres, fpol=fpol)

    eq = make_efit(str(path))                     # production loader

    # psi surface through the production bicubic evaluator (interior)
    rt = np.linspace(r[4], r[-5], 40)
    zt = np.linspace(z[4], z[-5], 40)
    got = np.asarray(eq.psi_rz(jnp.asarray(rt), jnp.asarray(zt)))
    want = ((rt - 1.7) ** 2 / 0.49 + zt ** 2 / 0.25
            + 0.05 * np.sin(3.0 * rt) * np.cos(2.0 * zt))
    np.testing.assert_allclose(got, want, atol=5e-5)

    # profiles roundtrip at their knots (note the loader's reference-quirk
    # default copies te_c0/c1 into ne; disable for a clean roundtrip)
    eq_clean = make_efit(str(path), replicate_reference_quirks=False)
    pos = jnp.stack([jnp.asarray(rt), jnp.zeros(40), jnp.asarray(zt)])
    psi_here = np.asarray(eq_clean.psi(pos))
    ne_got = np.asarray(eq_clean.electron_density(pos))
    ne_want = np.interp(psi_here, pgrid, ne)      # linear ref; loose tol
    np.testing.assert_allclose(ne_got, ne_want, rtol=2e-3)

    # B field is finite and divergence behaves: spot check values
    b = np.asarray(eq.magnetic_field(pos))
    assert np.all(np.isfinite(b))
    # toroidal component ~ fpol / r
    fpol_here = np.interp(psi_here, pgrid, fpol)
    bphi_mag = np.abs(b[0] * (-np.sin(0.0)) + b[1] * np.cos(0.0))
    np.testing.assert_allclose(bphi_mag, fpol_here / rt, rtol=2e-3)


def test_vmec_file_roundtrip(tmp_path):
    from graph_framework_tpu.models.vmec import make_vmec
    from graph_framework_tpu.tools import write_vmec_file

    ns = 21
    s_full = np.linspace(0.0, 1.0, ns)
    ds = s_full[1] - s_full[0]
    s_half = s_full - ds / 2.0
    # linear-in-s mode profiles: natural cubic splines reproduce them
    # exactly, so the roundtrip check is exact up to float64
    xm = np.array([0.0, 1.0])
    xn = np.array([0.0, 0.0])
    rmnc = np.stack([np.full(ns, 3.0), 0.5 * s_full])
    zmns = np.stack([np.zeros(ns), 0.4 * s_full])
    lmns = np.stack([np.zeros(ns), 0.1 * s_half])
    chi = 0.7 * s_full                           # linear flux profile

    path = tmp_path / "gen_vmec.nc"
    write_vmec_file(path, s_full=s_full, s_half=s_half, chi=chi,
                    rmnc=rmnc, zmns=zmns, lmns=lmns, xm=xm, xn=xn,
                    signj=-1.0, dphi=0.9)

    eq = make_vmec(str(path))                    # production loader

    s, u, v = 0.4, 0.9, 0.3
    r, z, l = eq._rzl(jnp.asarray(s), jnp.asarray(u), jnp.asarray(v))
    np.testing.assert_allclose(float(r), 3.0 + 0.5 * s * np.cos(u),
                               rtol=1e-12)
    np.testing.assert_allclose(float(z), 0.4 * s * np.sin(u), rtol=1e-12)
    np.testing.assert_allclose(float(l), 0.1 * s * np.sin(u), rtol=1e-10)

    pos = jnp.asarray([s, u, v])
    b = np.asarray(eq.magnetic_field(pos))
    assert np.all(np.isfinite(b))
    # dchi/ds through the loaded spline equals the linear slope
    np.testing.assert_allclose(
        float(eq.chi(jnp.asarray(0.6))) - float(eq.chi(jnp.asarray(0.2))),
        0.7 * 0.4, rtol=1e-10)
