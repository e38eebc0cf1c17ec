"""Dispersion zoo + ray-equation tests (dispersion_test.cpp equivalent,
plus finite-difference validation of the jax.grad ray RHS against the
reference's symbolic-derivative construction)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from graph_framework_tpu.models import dispersion as disp
from graph_framework_tpu.models.equilibrium import (
    make_slab, make_slab_density, make_no_magnetic_field,
    make_gaussian_density)
from graph_framework_tpu.models.rays import make_ray_rhs, RayState
from graph_framework_tpu.solver import make_ray_state
from graph_framework_tpu.constants import Q, ME, C, EPSILON0


def _state():
    return make_ray_state(1, w=900.0, x=0.3, y=0.1, z=-0.2,
                          kx=1000.0, ky=25.0, kz=15.0, t=0.0)


REAL_CASES = [
    (disp.simple, make_slab_density),
    (disp.stiff, make_slab_density),
    (disp.bohm_gross, make_no_magnetic_field),
    (disp.bohm_gross, make_slab),
    (disp.light_wave, make_no_magnetic_field),
    (disp.acoustic_wave, make_slab),
    (disp.gaussian_well, make_slab_density),
    (disp.ordinary_wave, make_slab_density),
    (disp.extra_ordinary_wave, make_slab_density),
    (disp.cold_plasma, make_slab_density),
    (disp.cold_plasma_expansion, make_slab_density),
    (disp.ion_cyclotron, make_slab),
]


@pytest.mark.parametrize("dfun,eqf", REAL_CASES,
                         ids=[f"{d.__name__}-{e.__name__}"
                              for d, e in REAL_CASES])
def test_rhs_matches_finite_difference(dfun, eqf):
    """dx/dt = -D_k/D_w and dk/dt = D_x/D_w (at fixed physical k) from
    jax.grad must agree with central finite differences of D."""
    eq = eqf()
    st = _state()
    rhs = make_ray_rhs(dfun, eq)
    d = rhs(st)

    def D_of(w, kx, ky, kz, x, y, z, t):
        pos = jnp.stack([x, y, z])
        kcov = jnp.stack([kx, ky, kz])
        kvec = eq.kvec(kcov, pos)
        return float(dfun(w, kvec, pos, t, eq))

    args = [float(st.w[0]), float(st.kx[0]), float(st.ky[0]),
            float(st.kz[0]), float(st.x[0]), float(st.y[0]),
            float(st.z[0]), float(st.t[0])]

    def fd(i):
        h = 1e-6 * max(abs(args[i]), 1.0)
        up = list(args); up[i] += h
        dn = list(args); dn[i] -= h
        return (D_of(*up) - D_of(*dn)) / (2 * h)

    dDdw = fd(0)
    dDdk = np.array([fd(1), fd(2), fd(3)])
    dDdx = np.array([fd(4), fd(5), fd(6)])

    got_dx = np.array([float(d.dxdt[0]), float(d.dydt[0]),
                       float(d.dzdt[0])])
    got_dk = np.array([float(d.dkxdt[0]), float(d.dkydt[0]),
                       float(d.dkzdt[0])])
    # FD cancellation noise floor: D ~ w^2 in magnitude, so the quotient
    # carries absolute noise ~ eps*|D|/(h*|dDdw|).
    atol = 1e-8
    np.testing.assert_allclose(got_dx, -dDdk / dDdw, rtol=2e-5, atol=atol)
    np.testing.assert_allclose(got_dk, dDdx / dDdw, rtol=2e-5, atol=atol)


def test_cold_plasma_value_sanity():
    """Cold plasma D at high frequency approaches the vacuum determinant
    (all eps -> 1): D -> (1-npara^2)(1-n^2) - ... check it's finite and the
    determinant structure is right by comparing with a dense determinant."""
    eq = make_slab_density()
    st = make_ray_state(1, w=2000.0, x=0.2, kx=1500.0, ky=100.0, kz=50.0)
    pos = jnp.stack([st.x[0], st.y[0], st.z[0]])
    kcov = jnp.stack([st.kx[0], st.ky[0], st.kz[0]])
    kvec = eq.kvec(kcov, pos)
    d = float(disp.cold_plasma(st.w[0], kvec, pos, st.t[0], eq))

    # dense determinant of M = eps + n n^T - n.n I in the (bhat-aligned)
    # frame used by the reference (npara along b, nperp in the plane).
    w = float(st.w[0])
    ne = float(eq.electron_density(pos))
    b = np.asarray(eq.magnetic_field(pos))
    blen = np.linalg.norm(b)
    # replicate the accumulation of dispersion.hpp:941-1008 verbatim
    wpe2 = ne * Q * Q / (EPSILON0 * ME * C * C)
    ec = -Q * blen / (ME * C)
    w2 = w * w
    denome = 1 - ec * ec / w2
    e11 = 1 - (wpe2 / w2) / denome
    e12 = ((ec / w) * (wpe2 / w2)) / denome
    e33 = wpe2
    mi = eq.ion_masses[0]
    ni = float(eq.ion_density(0, pos))
    wpi2 = ni * Q * Q / (EPSILON0 * mi * C * C)
    ic = Q * blen / (mi * C)
    denomi = 1 - ic * ic / w2
    e11 = e11 - (wpi2 / w2) / denomi
    e12 = e12 + ((ic / w) * (wpi2 / w2)) / denomi
    e33 = e33 + wpi2
    e12 = -e12
    e33 = 1 - e33 / w2

    n = np.asarray(kvec) / w
    bhat = b / blen
    npara = float(np.dot(bhat, n))
    nperp = float(np.linalg.norm(np.cross(bhat, n)))
    # The physical tensor has imaginary off-diagonals eps_xy = i e12 (Stix
    # form); the reference's real e12 bookkeeping folds the i*i = -1 into
    # its determinant expansion (dispersion.hpp:1004-1008).
    M = np.array([
        [e11 - npara ** 2, 1j * e12, npara * nperp],
        [-1j * e12, e11 - npara ** 2 - nperp ** 2, 0.0],
        [npara * nperp, 0.0, e33 - nperp ** 2]], dtype=complex)
    det = np.linalg.det(M)
    np.testing.assert_allclose(d, det.real, rtol=1e-8)
    assert abs(det.imag) < 1e-10 * abs(det.real)


def test_hot_plasma_complex_grad():
    """Hot plasma D is complex and holomorphic; the ray RHS must be finite
    and match finite differences in the complex plane."""
    eq = make_slab()
    dfun = disp.make_hot_plasma()
    st = make_ray_state(1, w=900.0, x=0.1, kx=850.0, ky=10.0, kz=400.0,
                        dtype=jnp.complex128)
    rhs = make_ray_rhs(dfun, eq, holomorphic=True)
    d = rhs(st)
    for comp in d:
        assert np.isfinite(complex(comp[0]).real)
        assert np.isfinite(complex(comp[0]).imag)

    # holomorphic derivative vs complex-step finite difference on kx
    def D_of(kx):
        pos = jnp.stack([st.x[0], st.y[0], st.z[0]])
        kcov = jnp.stack([kx, st.ky[0], st.kz[0]])
        kvec = eq.kvec(kcov, pos)
        return dfun(st.w[0], kvec, pos, st.t[0], eq)

    g = jax.grad(D_of, holomorphic=True)(st.kx[0])
    h = 1e-5
    fdg = (D_of(st.kx[0] + h) - D_of(st.kx[0] - h)) / (2 * h)
    np.testing.assert_allclose(complex(g), complex(fdg), rtol=1e-5)


def test_dispersions_registry_complete():
    expected = {"simple", "stiff", "bohm_gross", "light_wave",
                "acoustic_wave", "gaussian_well", "ion_cyclotron",
                "ordinary_wave", "extra_ordinary_wave", "cold_plasma",
                "cold_plasma_expansion", "hot_plasma",
                "hot_plasma_expansion"}
    assert expected <= set(disp.DISPERSIONS)


def test_generalized_coordinate_correction():
    """With a position-dependent contravariant basis the dk/dt correction
    term -D_kvec . dkvec/dx must appear (dispersion.hpp:1392-1433).  Use a
    synthetic equilibrium with a scaled basis e^1 = (1+a x) xhat and check
    against the analytically-derived ray equation."""
    import dataclasses
    from graph_framework_tpu.models.equilibrium import SlabDensity

    a = 0.3

    @jax.tree_util.register_dataclass
    @dataclasses.dataclass(frozen=True)
    class Scaled(SlabDensity):
        def esup(self, pos):
            e = jnp.eye(3, dtype=jnp.result_type(pos))
            return e.at[0, 0].set(1.0 + a * pos[0])

        def is_cartesian(self):
            return False

    eq = Scaled()
    st = make_ray_state(1, w=900.0, x=0.2, kx=700.0, ky=30.0, kz=10.0)

    # D = (kx^2 (1+ax)^2 + ky^2 + kz^2)/w^2 - 1
    w, kx, ky, kz, x = (float(st.w[0]), float(st.kx[0]), float(st.ky[0]),
                        float(st.kz[0]), float(st.x[0]))
    s = 1.0 + a * x
    dDdw = -2.0 * (kx * kx * s * s + ky * ky + kz * kz) / w ** 3
    dDdkx = 2.0 * kx * s * s / w ** 2
    dDdx_total = 2.0 * kx * kx * s * a / w ** 2

    # canonical (default): dk/dt uses the TOTAL spatial derivative,
    # conserving D along the ray (see rays.py module docstring).
    d = make_ray_rhs(disp.simple, eq)(st)
    np.testing.assert_allclose(float(d.dxdt[0]), -dDdkx / dDdw, rtol=1e-12)
    np.testing.assert_allclose(float(d.dkxdt[0]), dDdx_total / dDdw,
                               rtol=1e-12)

    # reference mode: the corrected D_x excludes the flow through the
    # basis; here D depends on x only through the basis, so dkx/dt = 0
    # (dispersion.hpp:1430-1433).
    dref = make_ray_rhs(disp.simple, eq, reference_correction=True)(st)
    np.testing.assert_allclose(float(dref.dkxdt[0]), 0.0, atol=1e-12)
    np.testing.assert_allclose(float(dref.dxdt[0]), -dDdkx / dDdw,
                               rtol=1e-12)
