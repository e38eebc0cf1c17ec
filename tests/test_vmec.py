"""VMEC equilibrium tests.

The reference ships no vmec_test; these validate internal consistency of
the flux-coordinate geometry (the reference's symbolic-df construction,
equilibrium.hpp:1958-2140) and that rays trace in flux coordinates.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from graph_framework_tpu.models.vmec import make_vmec
from graph_framework_tpu.models import dispersion as disp
from graph_framework_tpu.solver import Solver, make_ray_state, init_k
from graph_framework_tpu.models.rays import residual_fn


@pytest.fixture(scope="module")
def eq(vmec_file):
    return make_vmec(vmec_file)


def test_basis_duality(eq):
    """e^i . e_j = delta_ij with e_j from finite differences of the
    cartesian map."""
    pos0 = np.array([0.3, 0.7, 0.4])
    esup = np.asarray(eq.esup(jnp.asarray(pos0)))
    eps = 1e-6

    def xyz(p):
        return np.asarray(eq.to_xyz(jnp.asarray(p)))

    esub = np.stack([
        (xyz(pos0 + eps * np.eye(3)[i]) - xyz(pos0 - eps * np.eye(3)[i]))
        / (2 * eps) for i in range(3)])
    np.testing.assert_allclose(esup @ esub.T, np.eye(3), atol=1e-6)


def test_field_magnitude_physical(eq):
    """|B| of order 1 T across the volume (W7-X-like fixture); the
    reference's literal chi(s_norm_f) arithmetic would give ~1e6 T (see
    vmec.py chi docstring)."""
    for s in (0.1, 0.3, 0.6, 0.9, -0.5):
        b = eq.magnetic_field(jnp.asarray([s, 0.3, 0.2]))
        assert 0.2 < float(jnp.linalg.norm(b)) < 2.0


def test_divergence_free(eq):
    """div B = (1/J) d(J B^i)/dx^i = 0; in flux coordinates J B^u and
    J B^v are functions with d/du, d/dv of the right structure.  Check the
    cartesian divergence via the chain rule: div B = sum_i dB_cart/dxyz_i.
    Use finite differences of B as a function of cartesian position by
    inverting locally: dB/dxyz = dB/dflux . dflux/dxyz = dB/dflux . esup."""
    pos = jnp.asarray([0.4, 0.5, 0.3])
    jac_flux = np.asarray(jax.jacfwd(eq.magnetic_field)(pos))  # dB/d(s,u,v)
    esup = np.asarray(eq.esup(pos))  # rows e^s, e^u, e^v = grad of coords
    div = sum(np.dot(jac_flux[i], esup[:, i]) for i in range(3))
    # b ~ 0.65 T over gradient scale ~0.1 m: machine-level zero is < 1e-10
    assert abs(div) < 1e-8


def test_profiles(eq):
    pos = jnp.asarray([0.25, 0.0, 0.0])
    prof = (1.0 - 0.25 ** 1.5) ** 2
    np.testing.assert_allclose(float(eq.electron_density(pos)), 1e19 * prof)
    np.testing.assert_allclose(
        float(eq.electron_temperature(pos)), 1000.0 * prof)


def test_ray_trace_in_flux_coordinates(eq):
    """Trace an O-mode-ish cold-plasma ray in (s, u, v): the generalized
    coordinate machinery (esup in kvec + metric correction) must keep the
    dispersion residual small over steps."""
    st = make_ray_state(2, w=900.0, x=0.5, y=0.5, z=0.0,
                        kx=500.0, ky=0.0, kz=0.0)
    st = init_k(st, disp.cold_plasma, eq, "kx", tolerance=1e-22)
    res = residual_fn(disp.cold_plasma, eq)
    r0 = float(jnp.max(res(st)))
    assert r0 < 1e-18

    sol = Solver(disp.cold_plasma, eq, method="rk4", dt=2e-5, sub_steps=5)
    fin, traj = sol.trace(st, 4)
    # the canonical generalized-coordinate equations keep the ray on the
    # dispersion surface to machine precision (rays.py docstring); the
    # reference's corrected form would be ~4e-7 here.
    assert float(jnp.max(res(fin))) < 1e-18
    # the ray moved in flux space
    assert abs(float(fin.x[0]) - 0.5) + abs(float(fin.y[0]) - 0.5) > 1e-7


def test_gradients_wrt_fourier_coefficients(eq):
    """Reverse-mode grads through the whole VMEC stack w.r.t. rmnc tables
    (north-star differentiability)."""
    import dataclasses
    pos = jnp.asarray([0.4, 0.2, 0.1])

    def loss(rmnc):
        eq2 = dataclasses.replace(eq, rmnc_coeffs=rmnc)
        b = eq2.magnetic_field(pos)
        return jnp.sum(b * b)

    g = jax.grad(loss)(eq.rmnc_coeffs)
    assert g.shape == eq.rmnc_coeffs.shape
    assert np.isfinite(np.asarray(g)).all()
    assert np.any(np.asarray(g) != 0)


def test_vmec_frozen_radial_cells(vmec_file):
    """Radial freeze window (VmecEquilibrium.freeze_cells): the frozen
    view is EXACT at the window-base state (same cell, same polynomial)
    and the frozen trace stays within the extrapolation bound of the
    plain trace (s drifts O(dt*v_s) against ds = 1/99 cells)."""
    import jax
    from graph_framework_tpu.solver import Solver, make_ray_state, init_k
    from graph_framework_tpu.models.dispersion import cold_plasma

    eq = make_vmec(vmec_file, dtype=jnp.float64)
    st = make_ray_state(8, w=900.0, x=0.5, y=0.5, z=0.0,
                        kx=500.0, ky=0.0, kz=0.0)
    st = init_k(st, cold_plasma, eq, "kx")

    pos = jnp.stack([st.x, st.y, st.z])
    feq = eq.freeze_cells(pos)
    g0, g1 = eq._geometry(pos), feq._geometry(pos)
    assert float(jnp.max(jnp.abs(g0["bvec"] - g1["bvec"]))) < 1e-10
    assert float(jnp.max(jnp.abs(g0["jac"] - g1["jac"]))) < 1e-12

    dt = 2.5e-6
    plain = Solver(cold_plasma, eq, method="rk4", dt=dt, sub_steps=10)
    frz = Solver(cold_plasma, eq, method="rk4", dt=dt, sub_steps=10,
                 frozen_cells=True, freeze_every=5)
    r0, r1 = plain.run(st, 10), frz.run(st, 10)
    dev = max(float(jnp.max(jnp.abs(getattr(r1, f) - getattr(r0, f))))
              for f in ("x", "y", "z", "kx", "ky", "kz"))
    assert dev < 1e-9, dev

    # guarded invalid configurations
    import pytest as _pytest
    with _pytest.raises(ValueError, match="quirky_chi"):
        make_vmec(vmec_file, dtype=jnp.float64,
                  quirky_chi=True).freeze_cells(pos)
