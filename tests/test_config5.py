"""Scaled-down BASELINE.json staged config 5 (VERDICT r1 item 3): EFIT
trace + per-step weak-damping absorption + reverse-mode gradient of total
absorbed power w.r.t. launch params AND psi spline tables, ray-sharded
over the 8-device CPU mesh.  bench.py's BENCH_MODE=config5 runs the same
pipeline at 1M rays on hardware; this keeps it correct in CI.
"""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from graph_framework_tpu.models import make_efit, dispersion as disp
from graph_framework_tpu.models.absorption import make_weak_damping_split
from graph_framework_tpu.solver import Solver, make_ray_state, init_k
from graph_framework_tpu.parallel.mesh import ray_mesh, shard_rays


def _absorbed_power_fn(eq0, state, steps, sub):
    """loss(psi_coeffs, kz0) = total absorbed power along the traced rays
    (k_sum += Im(kamp) dl per recorded step; power = exp(-2 k_sum);
    xrays.cpp:673-793)."""

    def absorbed_power(psi_coeffs, kz0):
        eq = dataclasses.replace(eq0, psi_coeffs=psi_coeffs)
        sol = Solver(disp.cold_plasma, eq, method="rk4",
                     dt=1.0 / (steps * sub), sub_steps=sub)
        kamp_fn = make_weak_damping_split(eq)
        step = jax.checkpoint(sol.step_fn(), prevent_cse=False)
        s0 = state._replace(kz=jnp.full_like(state.kz, kz0))

        def body(carry, _):
            s, ksum = carry
            s2 = step(s)
            dl = jnp.sqrt((s2.x - s.x) ** 2 + (s2.y - s.y) ** 2
                          + (s2.z - s.z) ** 2)
            _, kim = kamp_fn(s2)
            kim = jnp.nan_to_num(kim, nan=0.0, posinf=0.0, neginf=0.0)
            return (s2, ksum + kim * dl), None

        (_, ksum), _ = jax.lax.scan(
            body, (s0, jnp.zeros_like(s0.x)), None, length=steps)
        power = jnp.exp(-2.0 * jnp.abs(ksum))
        return jnp.sum(1.0 - power)

    return absorbed_power


@pytest.mark.parametrize("sharded", [False, True])
def test_config5_absorbed_power_gradient(efit_file, sharded):
    eq0 = make_efit(efit_file, dtype=jnp.float64)
    n, steps, sub = 16, 4, 5
    state = make_ray_state(n, w=800.0, x=2.0, y=0.0, z=0.0,
                           kx=-400.0, ky=-410.0, kz=50.0, dtype=jnp.float64)
    if sharded:
        state = shard_rays(state, ray_mesh(jax.devices()))
    state = init_k(state, disp.cold_plasma, eq0, "kx",
                   tolerance=1.0e-16, max_iterations=100)

    f = _absorbed_power_fn(eq0, state, steps, sub)
    vg = jax.jit(jax.value_and_grad(f, argnums=(0, 1)))
    v, (g_psi, g_kz) = vg(eq0.psi_coeffs, jnp.float64(50.0))

    # absorbed power is a physical fraction of launched power
    assert 0.0 < float(v) < n
    assert np.isfinite(np.asarray(g_psi)).all()
    assert float(jnp.sum(jnp.abs(g_psi))) > 0.0

    # gradient w.r.t. launch kz validates against central FD
    h = 1.0e-3
    fd = (f(eq0.psi_coeffs, jnp.float64(50.0 + h))
          - f(eq0.psi_coeffs, jnp.float64(50.0 - h))) / (2.0 * h)
    np.testing.assert_allclose(float(g_kz), float(fd), rtol=1e-5)

    # directional FD along the psi gradient (a random direction has ~zero
    # overlap with the sparse set of visited cells)
    vdir = g_psi / jnp.linalg.norm(g_psi.ravel())
    hp = 1.0e-7
    fd_psi = (f(eq0.psi_coeffs + hp * vdir, jnp.float64(50.0))
              - f(eq0.psi_coeffs - hp * vdir, jnp.float64(50.0))) / (2 * hp)
    np.testing.assert_allclose(float(jnp.sum(g_psi * vdir)), float(fd_psi),
                               rtol=1e-4)


def test_config5_sharded_matches_single_device(efit_file):
    """The ray-sharded loss and gradients equal the single-device ones
    (data parallelism must not change the physics)."""
    eq0 = make_efit(efit_file, dtype=jnp.float64)
    n, steps, sub = 16, 3, 4
    state = make_ray_state(n, w=800.0, x=2.0, y=0.0, z=0.0,
                           kx=-400.0, ky=-410.0, kz=50.0, dtype=jnp.float64)
    state = init_k(state, disp.cold_plasma, eq0, "kx",
                   tolerance=1.0e-16, max_iterations=100)

    f = _absorbed_power_fn(eq0, state, steps, sub)
    v1, g1 = jax.value_and_grad(f, argnums=1)(
        eq0.psi_coeffs, jnp.float64(50.0))

    state_sh = shard_rays(state, ray_mesh(jax.devices()))
    fsh = _absorbed_power_fn(eq0, state_sh, steps, sub)
    v2, g2 = jax.value_and_grad(fsh, argnums=1)(
        eq0.psi_coeffs, jnp.float64(50.0))

    np.testing.assert_allclose(float(v1), float(v2), rtol=1e-12)
    np.testing.assert_allclose(float(g1), float(g2), rtol=1e-10)
