"""Round-3 fully-fused VMEC geometry jet kernel (pallas/vmec_geom.py).

Validated in Pallas interpret mode on CPU: the jet forward against the
pure-JAX reference and the default XLA geometry path; the custom-jvp
tangent/cotangent algebra against plain JAX autodiff of the reference;
and the integration surface (ray RHS = jax.grad through the geometry)
against the default path.
"""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from graph_framework_tpu.models.vmec import make_vmec
from graph_framework_tpu.pallas.vmec_geom import (
    make_fused_geometry, _reference_jet, _pad_tables, NUM_OUT)

VMEC_FILE = "/root/reference/graph_tests/vmec.nc"
N = 193          # deliberately not a multiple of the block (pad path)


@pytest.fixture(scope="module")
def eq():
    return make_vmec(VMEC_FILE, dtype=jnp.float32)


def _geom_args(eq):
    rz, lmt, xm, xn, ns_f, ns_h, cut_f, cut_h = _pad_tables(eq)
    geom = (float(eq.sminf + cut_f * eq.ds), float(eq.ds), ns_f,
            float(eq.sminh + cut_h * eq.ds), float(eq.ds), ns_h)
    return rz, lmt, xm, xn, geom


def _coords(n=N, seed=0):
    k = jax.random.split(jax.random.PRNGKey(seed), 3)
    s = jax.random.uniform(k[0], (n,), jnp.float32, 0.05, 0.95)
    u = jax.random.uniform(k[1], (n,), jnp.float32, 0.0, 6.28)
    v = jax.random.uniform(k[2], (n,), jnp.float32, 0.0, 6.28)
    return s, u, v


def test_fused_forward_matches_reference_jet(eq):
    s, u, v = _coords()
    f = make_fused_geometry(eq, block=64, interpret=True)
    got = f(s, u, v)
    rz, lmt, xm, xn, geom = _geom_args(eq)
    want = _reference_jet(s, u, v, rz, lmt, xm, xn, geom)[:10]
    for g, w in zip(got, want):
        np.testing.assert_allclose(np.asarray(g), np.asarray(w),
                                   rtol=2e-6, atol=2e-6)


def test_fused_forward_matches_default_rzl_and_jac(eq):
    """The kernel's ten outputs equal the default XLA _rzl_and_jac."""
    from graph_framework_tpu.models.vmec import _rzl_and_jac
    s, u, v = _coords(seed=1)
    # include negative-s transients (inside the radial cut, where the cut
    # table is bit-identical to the full one) and the above-range clamp
    # (both tables clamp to the same last cell)
    s = s.at[:8].set(jnp.linspace(-0.25, 1.05, 8, dtype=jnp.float32))
    f = make_fused_geometry(eq, block=64, interpret=True)
    r, z, drs, dru, drv, dzs, dzu, dzv, dlu, dlv = f(s, u, v)
    (r0, z0, _), (dr0, dz0, dl0) = _rzl_and_jac(eq, s, u, v)
    pairs = [(r, r0), (z, z0), (drs, dr0[0]), (dru, dr0[1]),
             (drv, dr0[2]), (dzs, dz0[0]), (dzu, dz0[1]), (dzv, dz0[2]),
             (dlu, dl0[1]), (dlv, dl0[2])]
    for g, w in pairs:
        scale = max(1.0, float(jnp.max(jnp.abs(w))))
        np.testing.assert_allclose(np.asarray(g), np.asarray(w),
                                   rtol=1e-4, atol=1e-5 * scale)


@pytest.mark.parametrize("mode", ["vjp", "jvp"])
def test_custom_jvp_matches_autodiff_of_reference(eq, mode):
    """The jet-linear tangent map (and its transpose) equals plain JAX
    autodiff of the reference forward - this checks every entry and sign
    of the hand-derived Hessian sum table."""
    s, u, v = _coords(seed=2, n=67)
    f = make_fused_geometry(eq, block=32, interpret=True)
    rz, lmt, xm, xn, geom = _geom_args(eq)

    def ref10(a, b, c):
        return tuple(_reference_jet(a, b, c, rz, lmt, xm, xn, geom)[:10])

    if mode == "vjp":
        ks = jax.random.split(jax.random.PRNGKey(7), 10)
        cts = tuple(jax.random.normal(k, s.shape, jnp.float32)
                    for k in ks)
        _, vjp = jax.vjp(f, s, u, v)
        got = vjp(cts)
        _, vjp_ref = jax.vjp(ref10, s, u, v)
        want = vjp_ref(cts)
        names = ("ct_s", "ct_u", "ct_v")
    else:
        ks = jax.random.split(jax.random.PRNGKey(8), 3)
        tans = tuple(jax.random.normal(k, s.shape, jnp.float32)
                     for k in ks)
        _, got = jax.jvp(f, (s, u, v), tans)
        _, want = jax.jvp(ref10, (s, u, v), tans)
        names = tuple(f"t{i}" for i in range(10))
    for g, w, name in zip(got, want, names):
        scale = max(1e-6, float(np.abs(np.asarray(w)).max()))
        np.testing.assert_allclose(np.asarray(g), np.asarray(w),
                                   rtol=2e-5, atol=1e-5 * scale,
                                   err_msg=name)


def test_fused_geometry_through_ray_rhs(eq):
    """Integration surface: the ray RHS is jax.grad of the dispersion
    through the geometry, so it exercises the transposed tangent map in
    exactly the production composition.  Fused must match default."""
    from graph_framework_tpu.models import dispersion as disp
    from graph_framework_tpu.models.rays import make_ray_rhs
    from graph_framework_tpu.solver import make_ray_state

    eqf = dataclasses.replace(eq, fused_mode_sums=True)
    st = make_ray_state(33, w=900.0, x=0.5, y=0.5, z=0.1,
                        kx=54.6, ky=3.0, kz=2.0, dtype=jnp.float32)
    d0 = make_ray_rhs(disp.cold_plasma, eq)(st)
    d1 = make_ray_rhs(disp.cold_plasma, eqf)(st)
    for a, b, name in zip(d0, d1, d0._fields):
        scale = max(1.0, float(jnp.max(jnp.abs(a))))
        np.testing.assert_allclose(np.asarray(b), np.asarray(a),
                                   rtol=5e-4, atol=5e-5 * scale,
                                   err_msg=name)


def test_fused_trace_matches_default(eq):
    """A short rk4 trace lands on the same endpoint as the default path
    (the BENCH_EQ=vmec BENCH_VMEC_FUSED=1 configuration)."""
    from graph_framework_tpu.models import dispersion as disp
    from graph_framework_tpu.solver import Solver, make_ray_state

    eqf = dataclasses.replace(eq, fused_mode_sums=True)
    st = make_ray_state(8, w=900.0, x=0.5, y=0.5, z=0.0,
                        kx=54.6, ky=0.0, kz=0.0, dtype=jnp.float32)
    f0 = Solver(disp.cold_plasma, eq, method="rk4", dt=2e-7,
                sub_steps=5).run(st, 3)
    f1 = Solver(disp.cold_plasma, eqf, method="rk4", dt=2e-7,
                sub_steps=5).run(st, 3)
    for a, b, name in zip(f0, f1, f0._fields):
        scale = max(1.0, float(jnp.max(jnp.abs(a))))
        np.testing.assert_allclose(np.asarray(b), np.asarray(a),
                                   rtol=1e-4, atol=1e-4 * scale,
                                   err_msg=name)
