"""Physics-invariant tests (port of graph_tests/physics_test.cpp).

Analytic expectations: constant vacuum phase, Bohm-Gross parabolic
trajectory in a density gradient, light-wave parabola, O-mode cutoff
location.  Constants and configurations mirror the reference test file.
"""

import math

import jax.numpy as jnp
import numpy as np

from graph_framework_tpu.constants import Q, ME, EPSILON0, C
from graph_framework_tpu.models import dispersion as disp
from graph_framework_tpu.models.equilibrium import (
    make_slab_density, make_no_magnetic_field)
from graph_framework_tpu.solver import Solver, make_ray_state, init_k


def test_vacuum_phase_constant():
    """k.x - w t stays constant along a vacuum ray (physics_test.cpp:21-68,
    tolerance 5e-15 per step batch)."""
    rng = np.random.default_rng(5)
    w0, kx0 = rng.uniform(0.5, 2.0), rng.uniform(0.1, 1.0)
    x0, y0, z0 = rng.uniform(-1, 1, 3)
    eq = make_slab_density()
    st = make_ray_state(1, w=w0, kx=kx0, x=x0, y=y0, z=z0)
    st = init_k(st, disp.simple, eq, "kx")

    def phase(s):
        return (float(s.kx[0]) * float(s.x[0])
                + float(s.ky[0]) * float(s.y[0])
                + float(s.kz[0]) * float(s.z[0])
                - float(s.w[0]) * float(s.t[0]))

    sol = Solver(disp.simple, eq, method="rk2", dt=0.01, sub_steps=1)
    step = sol.step_fn()
    c0 = phase(st)
    for _ in range(20):
        st = step(st)
        assert abs(phase(st) - c0) < 1e-12


def test_bohm_gross_parabola():
    """Warm plasma wave in a linear density ramp follows
    x(t) = -3/8 vth^2 w2p/w0^2 t^2 + 3/2 vth^2/w0 k0 t + x0
    (physics_test.cpp:111-170; 20 rk4 steps of dt=0.1 from x=-1)."""
    w0 = 600.0
    ne0 = 1.0e19
    te = 1000.0
    omega2 = ne0 * 0.9 * Q * Q / (EPSILON0 * ME * C * C)
    omega2p = ne0 * 0.1 * Q * Q / (EPSILON0 * ME * C * C)
    vth2 = 2.0 * Q * te / (ME * C * C)
    k0 = math.sqrt(2.0 / 3.0 * (w0 * w0 - omega2) / vth2)

    eq = make_no_magnetic_field()
    st = make_ray_state(1, w=w0, kx=1000.0, x=-1.0)
    st = init_k(st, disp.bohm_gross, eq, "kx")
    np.testing.assert_allclose(float(st.kx[0]), k0, rtol=1e-8)

    sol = Solver(disp.bohm_gross, eq, method="rk4", dt=0.1, sub_steps=1)
    fin, _ = sol.trace(st, 20)
    time = 20 * 0.1
    expected = (-3.0 / 8.0 * vth2 * omega2p / (w0 * w0) * time * time
                + 3.0 / 2.0 * vth2 / w0 * k0 * time - 1.0)
    assert abs(float(fin.x[0]) - expected) ** 2 < 1e-10


def test_light_wave_parabola():
    """Light wave in the ramp: x(t) = -w2p/(4 w0^2) t^2 + k0/w0 t + x0
    (physics_test.cpp:208-260)."""
    w0 = 600.0
    ne0 = 1.0e19
    omega2 = ne0 * 0.9 * Q * Q / (EPSILON0 * ME * C * C)
    omega2p = ne0 * 0.1 * Q * Q / (EPSILON0 * ME * C * C)
    k0 = math.sqrt(w0 * w0 - omega2)

    eq = make_no_magnetic_field()
    st = make_ray_state(1, w=w0, kx=100.0, x=-1.0)
    st = init_k(st, disp.light_wave, eq, "kx")
    np.testing.assert_allclose(float(st.kx[0]), k0, rtol=1e-8)

    sol = Solver(disp.light_wave, eq, method="rk4", dt=0.001, sub_steps=1)
    fin, _ = sol.trace(st, 20)
    time = 20 * 0.001
    expected = (-omega2p / (4.0 * w0 * w0) * time * time
                + k0 / w0 * time - 1.0)
    assert abs(float(fin.x[0]) - expected) ** 2 < 1e-10


def test_o_mode_cutoff_position():
    """Newton over the *position* finds the O-mode cutoff where
    wpe(x) = w (physics_test.cpp:361-400: init(x) with k = 0 on the
    slab_density profile; x_cut = (w0^2 - wpe0^2)/(0.1 wpe0^2))."""
    ne0 = 1.0e19
    omega2 = ne0 * Q * Q / (EPSILON0 * ME * C * C)
    w0 = 1000.0
    x_cut = (w0 * w0 - omega2) / (omega2 * 0.1)

    eq = make_slab_density()
    st = make_ray_state(1, w=w0, kx=0.0, ky=0.0, kz=0.0, x=0.0)
    st = init_k(st, disp.ordinary_wave, eq, "x")
    assert (float(st.x[0]) - x_cut) ** 2 < 8.0e-10


def test_group_velocity_below_thermal():
    """Bohm-Gross group velocity 3/2 vth^2 k/w must stay below c and match
    the analytic value (physics_test doc, dispersion.hpp bohm-gross
    section)."""
    from graph_framework_tpu.models.rays import make_ray_rhs
    te = 1000.0
    vth2 = 2.0 * Q * te / (ME * C * C)
    eq = make_no_magnetic_field()
    st = make_ray_state(1, w=600.0, kx=1000.0, x=0.0)
    st = init_k(st, disp.bohm_gross, eq, "kx")
    rhs = make_ray_rhs(disp.bohm_gross, eq)
    d = rhs(st)
    vg = float(d.dxdt[0])
    expected = 1.5 * vth2 * float(st.kx[0]) / 600.0
    np.testing.assert_allclose(vg, expected, rtol=1e-8)
    assert abs(vg) < 1.0
