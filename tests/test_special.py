"""Tests of the special functions (erfi_test.cpp equivalent + scipy cross
checks of the Faddeeva function)."""

import h5py
import jax
import jax.numpy as jnp
import numpy as np
import pytest
import scipy.special as sps

from graph_framework_tpu.ops.special import (
    wofz, erf_complex, erfi, dawson, erfcx, z_plasma, z_erfi, z_power_series)


def test_wofz_against_scipy_grid():
    rng = np.random.default_rng(42)
    x = rng.uniform(-12, 12, size=500)
    y = rng.uniform(-8, 8, size=500)
    z = x + 1j * y
    got = np.asarray(wofz(jnp.array(z)))
    expect = sps.wofz(z)
    # norm-relative accuracy
    err = np.abs(got - expect) / np.abs(expect)
    assert np.max(err) < 5e-13, np.max(err)


def test_wofz_large_z():
    z = np.array([50 + 1j, -30 + 0.1j, 100 - 2j, 7.5 + 0.0j, 0.0 + 20j])
    got = np.asarray(wofz(jnp.array(z)))
    expect = sps.wofz(z)
    err = np.abs(got - expect) / np.abs(expect)
    assert np.max(err) < 1e-13, np.max(err)


def test_erf_complex_against_scipy():
    rng = np.random.default_rng(7)
    x = rng.uniform(-5, 5, size=400)
    y = rng.uniform(-5, 5, size=400)
    z = x + 1j * y
    got = np.asarray(erf_complex(jnp.array(z)))
    expect = sps.erf(z)
    err = np.abs(got - expect) / np.maximum(np.abs(expect), 1e-300)
    assert np.max(err) < 2e-12, np.max(err)


def test_erf_small_z_series_region():
    z = np.array([1e-3 + 1e-3j, 0.05 - 0.02j, -0.01 + 0.1j, 0.0 + 0.0j])
    got = np.asarray(erf_complex(jnp.array(z)))
    expect = sps.erf(z)
    np.testing.assert_allclose(got, expect, rtol=1e-14, atol=1e-16)


def test_erfi_golden_file(erfi_file):
    """Port of graph_tests/erfi_test.cpp: compare against test_erfi.nc,
    skipping the first 5 entries as the reference does (overflow cases),
    at relative tolerance adapted for a different-but-equivalent algorithm
    (reference tolerance 2e-14, erfi_test.cpp:96)."""
    with h5py.File(erfi_file, "r") as h:
        x, y = h["x"][:], h["y"][:]
        re, im = h["re"][:], h["img"][:]
    z = jnp.array(x + 1j * y)
    got = np.asarray(erfi(z))
    gold = re + 1j * im
    for i in range(5, len(x)):
        g, t = gold[i], got[i]
        if np.isinf(g.real) or np.isinf(g.imag):
            continue
        if np.isinf(t.real) or np.isinf(t.imag):
            continue
        assert abs(1.0 - t / g) <= 5e-13, (i, z[i], g, t)


def test_erfi_real_argument():
    xs = np.linspace(-5, 5, 101)
    got = np.asarray(erfi(jnp.array(xs)))
    expect = sps.erfi(xs)
    np.testing.assert_allclose(got, expect, rtol=1e-12, atol=1e-14)
    assert not np.iscomplexobj(got)


def test_dawson_and_erfcx():
    xs = np.linspace(-8, 8, 201)
    np.testing.assert_allclose(np.asarray(dawson(jnp.array(xs))),
                               sps.dawsn(xs), rtol=1e-12, atol=1e-15)
    np.testing.assert_allclose(np.asarray(erfcx(jnp.array(xs))),
                               sps.erfcx(xs), rtol=1e-12)


def test_z_function_forms_agree():
    """Z = i sqrt(pi) w(zeta) must equal the reference's erfi form
    -sqrt(pi) exp(-z^2)(erfi(z) - i) (dispersion.hpp:288-302)."""
    rng = np.random.default_rng(3)
    zeta = jnp.array(rng.uniform(-3, 3, 100) + 1j * rng.uniform(-1, 1, 100))
    a = np.asarray(z_plasma(zeta))
    b = np.asarray(z_erfi(zeta))
    np.testing.assert_allclose(a, b, rtol=1e-11, atol=1e-13)


def test_z_power_series_limit():
    """For small zeta the power-series Z agrees with the exact Z
    (dispersion.hpp:261-280 is a small-zeta expansion)."""
    zeta = jnp.array([0.01 + 0.0j, 0.1 + 0.02j, -0.05 + 0.01j])
    np.testing.assert_allclose(np.asarray(z_power_series(zeta)),
                               np.asarray(z_plasma(zeta)), rtol=1e-5)


def test_wofz_gradient_holomorphic():
    """w'(z) = -2 z w(z) + 2i/sqrt(pi) (differential equation of w)."""
    pts = jnp.array([0.5 + 0.5j, 2.0 + 1.0j, -1.0 + 3.0j, 4.0 + 0.1j])
    dw = jax.vmap(jax.grad(lambda z: wofz(z), holomorphic=True))(pts)
    expect = -2.0 * pts * wofz(pts) + 2j / np.sqrt(np.pi)
    np.testing.assert_allclose(np.asarray(dw), np.asarray(expect),
                               rtol=1e-10, atol=1e-12)


def test_erfi_jit_and_vmap():
    f = jax.jit(erfi)
    z = jnp.array([1.0 + 0.5j, 2.0 - 0.25j])
    np.testing.assert_allclose(np.asarray(f(z)), sps.erfi(np.asarray(z)),
                               rtol=1e-12)


@pytest.mark.parametrize("dtype", [jnp.complex64])
def test_wofz_f32(dtype):
    """Single-precision path (reference float tolerance 2e-5,
    erfi_test.cpp:95)."""
    rng = np.random.default_rng(11)
    z = (rng.uniform(-6, 6, 200) + 1j * rng.uniform(-4, 4, 200))
    got = np.asarray(wofz(jnp.array(z, dtype=dtype)))
    expect = sps.wofz(z)
    err = np.abs(got - expect) / np.abs(expect)
    assert np.max(err) < 5e-4, np.max(err)
