"""Compensated (double-word) state accumulation (ops/compensated.py).

The fast high-precision path: state carried as (hi, lo) f32 pairs with
exact TwoSum accumulation, RHS in plain f32.  Validated at intermediate
tolerances against the f64 trace, the per-dtype pattern of
solver_test.cpp:104-116.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from graph_framework_tpu.models import make_efit, dispersion as disp
from graph_framework_tpu.ops.compensated import (
    _two_sum, comp_state_f64, init_comp_carry)
from graph_framework_tpu.solver import Solver, make_ray_state, init_k


def test_two_sum_exact():
    rng = np.random.default_rng(0)
    a = jnp.asarray(rng.uniform(-1e6, 1e6, 256), jnp.float32)
    b = jnp.asarray(rng.uniform(-1e-3, 1e-3, 256), jnp.float32)
    s, e = _two_sum(a, b)
    exact = a.astype(jnp.float64) + b.astype(jnp.float64)
    got = s.astype(jnp.float64) + e.astype(jnp.float64)
    np.testing.assert_array_equal(np.asarray(got), np.asarray(exact))


def _trace(efit_file, dtype=jnp.float32, compensated=False, steps=200,
           sub_steps=5, method="rk4"):
    eq = make_efit(efit_file, dtype=dtype)
    st = make_ray_state(4, w=500.0, x=2.5, y=0.0, z=0.0,
                        kx=-500.0, ky=0.0, kz=100.0, dtype=dtype)
    st = init_k(st, disp.cold_plasma, eq, "kx", tolerance=1e-12,
                max_iterations=100)
    if dtype == jnp.float32:
        # identical f32 launch state for both f32 variants: re-derive from
        # the f64 Newton solve so the comparison isolates the trace
        st = jax.tree.map(lambda a: a.astype(jnp.float32), st)
    sol = Solver(disp.cold_plasma, eq, method=method, dt=1e-6,
                 sub_steps=sub_steps, compensated=compensated)
    fin, carry = sol.run(st, steps, return_carry=True)
    if compensated:
        return comp_state_f64(carry)
    return jax.tree.map(lambda a: a.astype(jnp.float64), fin)


@pytest.mark.parametrize("method", ["rk4", "rk2"])
def test_compensated_beats_plain_f32(efit_file, method):
    """Endpoint error vs the f64 trace of the SAME integrator:
    compensated f32 must recover at least 10x of the plain-f32 drift on
    a 1000-substep EFIT trace (both increment-form steppers)."""
    ref = _trace(efit_file, dtype=jnp.float64, method=method)
    plain = _trace(efit_file, compensated=False, method=method)
    comp = _trace(efit_file, compensated=True, method=method)

    def err(t):
        return max(float(jnp.max(jnp.abs(getattr(t, f)
                                         - getattr(ref, f))))
                   for f in ("x", "y", "z"))

    e_plain, e_comp = err(plain), err(comp)
    assert e_comp < e_plain / 10.0, (e_plain, e_comp)
    # and the compensated trajectory is itself close to f64
    assert e_comp < 5e-5, e_comp


def test_compensated_carry_invariant(efit_file):
    """|lo| stays below ulp(hi): the double-word pair remains normalized
    across steps."""
    eq = make_efit(efit_file, dtype=jnp.float32)
    st = make_ray_state(4, w=500.0, x=2.5, y=0.0, z=0.0,
                        kx=-500.0, ky=0.0, kz=100.0, dtype=jnp.float32)
    st = init_k(st, disp.cold_plasma, eq, "kx", tolerance=1e-8)
    sol = Solver(disp.cold_plasma, eq, method="rk4", dt=1e-6,
                 sub_steps=5, compensated=True)
    _, carry = sol.run(st, 50, return_carry=True)
    for f in ("x", "y", "z", "kx", "ky", "kz"):
        hi = np.asarray(getattr(carry.hi, f))
        lo = np.asarray(getattr(carry.lo, f))
        ulp = np.spacing(np.abs(hi).astype(np.float32))
        assert (np.abs(lo) <= ulp).all(), f


def test_compensated_rejects_adaptive():
    from graph_framework_tpu.models.equilibrium import make_slab
    with pytest.raises(ValueError):
        Solver(disp.cold_plasma, make_slab(), method="adaptive_rk4",
               compensated=True)
