"""Special functions: Faddeeva w(z), complex erf, erfi, Dawson, plasma Z.

TPU-native replacement for the reference's ``special_functions.hpp`` (a
branch-heavy scalar implementation derived from the MIT Faddeeva package,
compiled into device kernels - special_functions.hpp:40-1590).  Scalar
branching does not vectorize on the VPU, so this implementation selects
between three *regionally exact* evaluations with ``jnp.where``:

* ``|z| >= 6``   - Laplace continued fraction of w(z) (monotone convergence
  in the upper half-plane; 12 levels give ~1e-15 relative error there).
* ``|z| <  6``   - Weideman (1994, SIAM J. Num. Anal. 31) rational series
  with N=64 terms; coefficients are derived at import time from an FFT of
  the scaled Gaussian, giving ~1e-15 norm-relative accuracy on the disk.
* erf cancellation region ``|z| < 0.15`` - Maclaurin series of erf (the
  reference's ``taylor``/``taylor_erfi`` branches, special_functions.hpp
  :1472-1485, exist for the same reason: erf(z) = 1 - exp(-z^2) w(iz)
  cancels catastrophically near z = 0).

All functions are jit/vmap/grad compatible and work in f32/f64 (and the
matching complex dtypes).  Lower half-plane values use the reflection
w(z) = 2 exp(-z^2) - w(-z)bar... specifically w(-z) = 2 exp(-z^2) - w(z).
"""

import functools
import math

import numpy as np
import jax
import jax.numpy as jnp

_SQRT_PI = math.sqrt(math.pi)
_ISPI = 1.0 / _SQRT_PI


@functools.lru_cache(maxsize=None)
def _weideman_coeffs(n_terms: int):
    """Polynomial coefficients for Weideman's rational approximation of w.

    Follows the construction in J.A.C. Weideman, "Computation of the complex
    error function", SIAM J. Numer. Anal. 31 (1994) 1497-1518 (the public
    algorithm; coefficients derived by FFT of f(theta) = exp(-t^2)(L^2+t^2)
    with t = L tan(theta/2)).
    """
    m = 2 * n_terms
    m2 = 2 * m
    k = np.arange(-m + 1, m)
    ell = math.sqrt(n_terms / math.sqrt(2.0))
    theta = k * np.pi / m
    t = ell * np.tan(theta / 2.0)
    f = np.exp(-t * t) * (ell * ell + t * t)
    f = np.concatenate([[0.0], f])
    a = np.real(np.fft.fft(np.fft.fftshift(f))) / m2
    a = a[1:n_terms + 1][::-1]
    return ell, a


def _w_weideman(z, n_terms=64):
    """Weideman rational evaluation of w(z) for Im(z) >= 0, |z| small."""
    ell, a_np = _weideman_coeffs(n_terms)
    real_dtype = jnp.finfo(z.dtype).dtype
    a = jnp.asarray(a_np, dtype=real_dtype)
    iz = 1j * z
    recip = 1.0 / (ell - iz)
    bigz = (ell + iz) * recip
    # Horner evaluation of the degree-(N-1) polynomial in bigz.
    poly = jnp.zeros_like(z)
    for i in range(n_terms):
        poly = poly * bigz + a[i]
    return recip * recip * 2.0 * poly + _ISPI * recip


def _w_contfrac(z, levels=12):
    """Laplace continued fraction for w(z), Im(z) >= 0, |z| large.

    w(z) = (i/sqrt(pi)) / (z - (1/2)/(z - 1/(z - (3/2)/(z - ...))))
    """
    r = jnp.zeros_like(z)
    for n in range(levels, 0, -1):
        r = (0.5 * n) / (z - r)
    return (1j * _ISPI) / (z - r)


def wofz_upper(z):
    """Faddeeva w(z) = exp(-z^2) erfc(-iz) for Im(z) >= 0 (unchecked)."""
    big = (z.real * z.real + z.imag * z.imag) >= 36.0
    # Guard each branch's argument so the unselected branch cannot produce
    # inf/nan that would poison grads through jnp.where.
    z_big = jnp.where(big, z, 8.0 + 0.0j)
    z_small = jnp.where(big, 0.0 + 0.0j, z)
    return jnp.where(big, _w_contfrac(z_big), _w_weideman(z_small))


def wofz(z):
    """Faddeeva function w(z) on the whole complex plane.

    Lower half-plane by the reflection w(z) = 2 exp(-z^2) - conj(w(conj(z)))
    ... equivalently w(z) = 2 exp(-z^2) - w(-z); we use the latter since it
    keeps the function holomorphic for autodiff (no conj).
    """
    z = jnp.asarray(z)
    if not jnp.iscomplexobj(z):
        z = z.astype(jnp.result_type(z.dtype, jnp.complex64))
    upper = z.imag >= 0.0
    zu = jnp.where(upper, z, -z)
    wu = wofz_upper(zu)
    # exp(-z^2) expanded in real/imag parts to avoid complex-exp NaN issues
    # in overflow situations (the reference avoids complex exp for the same
    # reason, special_functions.hpp:1544-1547).
    mre = (z.imag - z.real) * (z.imag + z.real)
    mim = -2.0 * z.real * z.imag
    mre = jnp.where(upper, 0.0, mre)     # only needed in the lower branch
    expmz2 = jnp.exp(mre) * (jnp.cos(mim) + 1j * jnp.sin(mim))
    return jnp.where(upper, wu, 2.0 * expmz2 - wu)


def _erf_series(z):
    """Maclaurin series of erf(z), accurate to ~1e-16 for |z| <= 0.2."""
    z2 = z * z
    # erf(z) = 2/sqrt(pi) * z * sum_k (-1)^k z^(2k) / (k! (2k+1))
    coeffs = [1.0, -1.0 / 3.0, 1.0 / 10.0, -1.0 / 42.0, 1.0 / 216.0,
              -1.0 / 1320.0, 1.0 / 9360.0]
    s = jnp.zeros_like(z)
    for c in reversed(coeffs):
        s = s * z2 + c
    return (2.0 * _ISPI) * z * s


def erf_complex(z):
    """erf(z) for complex z, matching ``special::erf_complex``
    (special_functions.hpp:1498-1568): erf(z) = 1 - exp(-z^2) w(iz) for
    Re(z) >= 0, extended by oddness, with a Taylor branch near z = 0.
    """
    z = jnp.asarray(z)
    if not jnp.iscomplexobj(z):
        z = z.astype(jnp.result_type(z.dtype, jnp.complex64))
    sigma = jnp.where(z.real >= 0.0, 1.0, -1.0)
    zt = sigma * z
    x, y = zt.real, zt.imag
    mre = (y - x) * (x + y)          # Re(-z^2), computed as the reference does
    mim = -2.0 * x * y               # Im(-z^2)
    # exp(-z^2) in parts (avoids spurious NaN from complex exp overflow).
    expmz2 = jnp.exp(mre) * (jnp.cos(mim) + 1j * jnp.sin(mim))
    w_iz = wofz_upper(1j * zt)       # Im(i*zt) = Re(zt) >= 0: upper half-plane
    main = 1.0 - expmz2 * w_iz
    # Underflow region: erf -> 1 for Re(-z^2) very negative
    # (special_functions.hpp:1528-1531).
    main = jnp.where(mre < -750.0, 1.0 + 0.0j, main)
    # Axis guards (special_functions.hpp:1503-1513).  Without them the
    # general formula hits 0*inf = NaN when exp(-z^2) overflows on the
    # imaginary axis.  x == 0: erf(iy) = i exp(y^2) Im(w(y)), overflowing to
    # +-inf for y^2 > ~709 (the reference clamps to numeric_limits::max()).
    y2 = y * y
    exp_y2 = jnp.exp(jnp.minimum(y2, 700.0))
    w_im_y = wofz_upper(y + 0.0j).imag
    imag_axis = jnp.where(
        y2 > 700.0, jnp.sign(y) * jnp.inf, exp_y2 * w_im_y)
    # lax.complex instead of 1j*imag_axis: the latter is a complex multiply
    # whose 0*inf cross terms manufacture NaN.
    main = jnp.where(x == 0.0,
                     jax.lax.complex(jnp.zeros_like(imag_axis),
                                     imag_axis).astype(main.dtype), main)
    # y == 0: real erf (special_functions.hpp:1503-1505).
    main = jnp.where(y == 0.0,
                     jax.scipy.special.erf(x).astype(main.dtype), main)
    # Cancellation region |z| small: Maclaurin series.
    small = (x * x + y * y) < 0.04
    z_series = jnp.where(small, zt, 0.0 + 0.0j)
    series = _erf_series(z_series)
    out = jnp.where(small, series, main)
    # Undo the oddness flip componentwise; sigma*out as a complex multiply
    # would turn (0, inf) components into NaN via 0*inf cross terms.
    return jax.lax.complex(sigma * out.real, sigma * out.imag)


def erfi(z):
    """erfi(z) = -i erf(iz) (special_functions.hpp:1571-1587).

    Works for real or complex input; real input returns the real erfi.
    """
    z_arr = jnp.asarray(z)
    if jnp.iscomplexobj(z_arr):
        temp = erf_complex(1j * z_arr)
        return temp.imag + 1j * (-temp.real)
    # Real argument: erfi(x) = Im(erf(ix))... erf(ix) = i*erfi(x) is purely
    # imaginary, so take the imaginary part for a cheap real result.
    temp = erf_complex(1j * z_arr.astype(
        jnp.result_type(z_arr.dtype, jnp.complex64)))
    return temp.imag


def dawson(x):
    """Dawson integral D(x) = sqrt(pi)/2 * Im(w(x)) for real x."""
    return 0.5 * _SQRT_PI * wofz(jnp.asarray(x)).imag


def erfcx(x):
    """Scaled complementary error function exp(x^2) erfc(x).

    Real-argument counterpart of ``special::erfcx``
    (special_functions.hpp:1036-1055).  For x >= 0, erfcx(x) = Re(w(ix));
    for x < 0, erfcx(x) = 2 exp(x^2) - erfcx(-x).
    """
    x = jnp.asarray(x)
    ax = jnp.abs(x)
    pos = wofz_upper(1j * ax + 0.0).real
    return jnp.where(x >= 0.0, pos, 2.0 * jnp.exp(x * x) - pos)


def z_plasma(zeta):
    """Plasma dispersion function Z(zeta) = i sqrt(pi) w(zeta).

    Identical (analytically) to the reference's ``z_erfi`` form
    Z = -sqrt(pi) exp(-zeta^2) (erfi(zeta) - i) (dispersion.hpp:288-302),
    but evaluated through w directly, which is cheaper and avoids the
    exp(-zeta^2)*exp(+zeta^2) round trip.
    """
    return 1j * _SQRT_PI * wofz(zeta)


def z_power_series(zeta):
    """Large-argument power-series Z function (dispersion.hpp:261-280):
    Z = i sqrt(pi) exp(-zeta^2) - 2 zeta (1 - 2/3 z^2 + 4/15 z^4 - 8/105 z^6).
    """
    z2 = zeta * zeta
    z4 = z2 * z2
    z6 = z4 * z2
    return (1j * _SQRT_PI) * jnp.exp(-z2) - 2.0 * (
        1.0 - 2.0 / 3.0 * z2 + 4.0 / 15.0 * z4 - 8.0 / 105.0 * z6) * zeta


def z_erfi(zeta):
    """Z function in the reference's erfi form (dispersion.hpp:288-302)."""
    return -_SQRT_PI * jnp.exp(-zeta * zeta) * (erfi(zeta) - 1j)


def dawson_real(x, h=0.25, n_terms=33):
    """Dawson integral for real x without complex arithmetic.

    Rybicki's exponentially-convergent sampling method (G. Rybicki,
    Computers in Physics 3 (1989) 85):

        D(x) ~ (1/sqrt(pi)) sum_{n odd} exp(-(x - n h)^2) / n

    with the sum taken over odd n centred on x/h; truncation error is
    O(exp(-(pi/2h)^2)), ~1e-17 at h = 0.25 with ~33 terms.  Built from
    exp/adds only, so it runs on TPU backends without complex support
    (unlike dawson() above, which routes through w(z)).
    """
    x = jnp.asarray(x)
    # nearest even multiple of h below x: sum over odd offsets around it
    n0 = 2.0 * jnp.round(0.5 * x / h)
    ks = jnp.arange(-(n_terms // 2), n_terms // 2 + 1, dtype=x.dtype)
    n = n0[..., None] + 2.0 * ks + 1.0          # odd n grid
    t = x[..., None] - n * h
    # avoid 0-division when n == 0 (n is odd so n != 0 exactly)
    contrib = jnp.exp(-t * t) / n
    return jnp.sum(contrib, axis=-1) / _SQRT_PI


def z_plasma_real(zeta):
    """Plasma Z of a *real* argument as a (re, im) pair, complex-free.

    Z(x) = i sqrt(pi) w(x) with w(x) = exp(-x^2) + 2i D(x)/sqrt(pi)
    for real x, so Re Z = -2 D(x), Im Z = sqrt(pi) exp(-x^2).
    This is the split-complex path for TPU backends without complex
    dtypes (the absorption phase's zeta is real for real trajectories).
    """
    zeta = jnp.asarray(zeta)
    return (-2.0 * dawson_real(zeta),
            _SQRT_PI * jnp.exp(-zeta * zeta))
