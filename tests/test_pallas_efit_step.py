"""Parity tests for the VMEM-resident frozen-window EFIT step kernel.

The kernel (pallas/efit_step.py) must reproduce the XLA frozen-cell path
(Solver frozen_cells/freeze_every) exactly: same window-base freeze, same
stepper algebra, same compensated accumulation.  Run in interpret mode on
the CPU backend at f64, parity is ~1e-18 (the only differences are XLA
fusion orderings)."""

import jax
import jax.numpy as jnp
import pytest

from graph_framework_tpu.solver import Solver, make_ray_state, init_k
from graph_framework_tpu.models.dispersion import cold_plasma
from graph_framework_tpu.models.efit import make_efit
from graph_framework_tpu.pallas.efit_step import (
    make_frozen_window_step, pad_rays)
from graph_framework_tpu.ops.compensated import init_comp_carry, comp_state

from conftest import REFERENCE_DATA


@pytest.fixture(scope="module")
def eq():
    return make_efit(REFERENCE_DATA / "efit.nc", dtype=jnp.float64)


@pytest.fixture(scope="module")
def state(eq):
    st = make_ray_state(256, w=650.0, x=2.0, y=0.0, z=0.0,
                        kx=-400.0, ky=150.0, kz=0.0)
    return init_k(st, cold_plasma, eq, "kx")


def _max_dev(a, b):
    return max(float(jnp.max(jnp.abs(getattr(a, f) - getattr(b, f))))
               for f in a._fields)


@pytest.mark.parametrize("method,k", [("rk2", 1), ("rk2", 5), ("rk4", 5)])
def test_window_kernel_matches_xla_frozen(eq, state, method, k):
    sol = Solver(cold_plasma, eq, method=method, dt=1e-4, sub_steps=10,
                 frozen_cells=True, freeze_every=k)
    ref = sol.run(state, 3)
    step = make_frozen_window_step(
        eq, cold_plasma, method=method, dt=1e-4, sub_steps=10,
        freeze_every=k, block_rows=2, interpret=True)

    def go(c):
        def body(c, _):
            return step(c), None
        c, _ = jax.lax.scan(body, c, None, length=3)
        return c

    out = jax.jit(go)(state)
    assert _max_dev(out, ref) < 1e-12


def test_window_kernel_compensated(eq, state):
    sol = Solver(cold_plasma, eq, method="rk2", dt=1e-4, sub_steps=10,
                 frozen_cells=True, freeze_every=5, compensated=True)
    ref = sol.run(state, 3)
    step = make_frozen_window_step(
        eq, cold_plasma, method="rk2", dt=1e-4, sub_steps=10,
        freeze_every=5, block_rows=2, compensated=True, interpret=True)

    def go(c):
        def body(c, _):
            return step(c), None
        c, _ = jax.lax.scan(body, c, None, length=3)
        return c

    out = comp_state(jax.jit(go)(init_comp_carry(state)))
    assert _max_dev(out, ref) < 1e-12


def test_solver_pallas_window_path(eq, state):
    """Solver(pallas_window=True) routes run/trace through the kernel and
    matches the XLA frozen path (off-TPU: interpret mode)."""
    ref = Solver(cold_plasma, eq, method="rk2", dt=1e-4, sub_steps=10,
                 frozen_cells=True, freeze_every=5).run(state, 2)
    sol = Solver(cold_plasma, eq, method="rk2", dt=1e-4, sub_steps=10,
                 frozen_cells=True, freeze_every=5,
                 pallas_window=True, pallas_block_rows=2)
    out = sol.run(state, 2)
    assert _max_dev(out, ref) < 1e-12
    # compensated composition too
    refc = Solver(cold_plasma, eq, method="rk2", dt=1e-4, sub_steps=10,
                  frozen_cells=True, freeze_every=5,
                  compensated=True).run(state, 2)
    outc = Solver(cold_plasma, eq, method="rk2", dt=1e-4, sub_steps=10,
                  frozen_cells=True, freeze_every=5, compensated=True,
                  pallas_window=True, pallas_block_rows=2).run(state, 2)
    assert _max_dev(outc, refc) < 1e-12


def test_solver_pallas_window_validation(eq):
    with pytest.raises(ValueError, match="frozen_cells"):
        Solver(cold_plasma, eq, method="rk2", pallas_window=True)
    with pytest.raises(ValueError, match="rk2/rk4"):
        Solver(cold_plasma, eq, method="split_simplextic",
               frozen_cells=True, pallas_window=True)
    with pytest.raises(ValueError, match="redundant"):
        Solver(cold_plasma, eq, method="rk2", frozen_cells=True,
               pallas_window=True, remat_substeps=True)


@pytest.mark.parametrize("method,k", [("rk2", 5), ("rk4", 5)])
def test_window_kernel_gradient_matches_xla_frozen(eq, state, method, k):
    """Reverse mode through the window kernel (custom_vjp + in-kernel
    transpose, pallas/efit_step._window_bwd_kernel) must match the XLA
    frozen path's autodiff exactly: both treat the frozen blocks/indices
    as piecewise-constant in the window-base state (floor has zero
    gradient), so the backward algebras are transposes of the same
    function."""
    sub = jax.tree.map(lambda a: a[:256], state)

    def make_loss(step):
        def loss(s):
            def body(c, _):
                return step(c), None
            c, _ = jax.lax.scan(body, s, None, length=2)
            return (jnp.sum(c.x) + jnp.sum(c.z)
                    + 1e-3 * jnp.sum(c.kx)) / c.x.shape[0]
        return loss

    sol_ref = Solver(cold_plasma, eq, method=method, dt=1e-4, sub_steps=10,
                     frozen_cells=True, freeze_every=k)
    g_ref = jax.jit(jax.grad(make_loss(sol_ref.raw_step_fn())))(sub)

    step = make_frozen_window_step(
        eq, cold_plasma, method=method, dt=1e-4, sub_steps=10,
        freeze_every=k, block_rows=2, interpret=True)
    g_ker = jax.jit(jax.grad(make_loss(step)))(sub)

    for f in g_ref._fields:
        a, b = getattr(g_ref, f), getattr(g_ker, f)
        scale = float(jnp.max(jnp.abs(a))) + 1e-30
        assert float(jnp.max(jnp.abs(a - b))) / scale < 1e-10, f


def test_window_kernel_table_gradients(eq, state):
    """pallas_table_grads: spline-TABLE cotangents through the window
    kernel (backward kernel emits per-ray block cotangents; the freeze
    gather's transpose scatter-adds them into the tables) must match the
    XLA frozen path's table gradients."""
    import dataclasses
    sub = jax.tree.map(lambda a: a[:256], state)

    def loss_fn(pallas):
        def loss(psi_coeffs):
            eq2 = dataclasses.replace(eq, psi_coeffs=psi_coeffs)
            sol = Solver(cold_plasma, eq2, method="rk2", dt=1e-4,
                         sub_steps=10, frozen_cells=True, freeze_every=5,
                         pallas_window=pallas, pallas_block_rows=2,
                         pallas_table_grads=pallas)
            s = sol.run(sub, 2)
            return jnp.sum(s.x) + jnp.sum(s.kx)
        return loss

    g_ref = jax.jit(jax.grad(loss_fn(False)))(eq.psi_coeffs)
    g_ker = jax.jit(jax.grad(loss_fn(True)))(eq.psi_coeffs)
    scale = float(jnp.max(jnp.abs(g_ref)))
    assert float(jnp.max(jnp.abs(g_ref - g_ker))) / scale < 1e-10


def test_pad_rays(eq, state):
    sub = jax.tree.map(lambda a: a[:100], state)   # 100 not a tile multiple
    padded, n = pad_rays(sub, block_rows=2)
    assert n == 100 and padded.x.shape[0] == 256
    # cyclic repetition: padded rays are copies of early rays
    assert jnp.allclose(padded.x[100:200], sub.x[:100])
    # stepping the padded ensemble reproduces the unpadded rays
    sol = Solver(cold_plasma, eq, method="rk2", dt=1e-4, sub_steps=10,
                 frozen_cells=True, freeze_every=5,
                 pallas_window=True, pallas_block_rows=2)
    out = sol.run(padded, 2)
    ref = Solver(cold_plasma, eq, method="rk2", dt=1e-4, sub_steps=10,
                 frozen_cells=True, freeze_every=5).run(sub, 2)
    dev = max(float(jnp.max(jnp.abs(getattr(out, f)[:100]
                                    - getattr(ref, f))))
              for f in ref._fields)
    assert dev < 1e-12
