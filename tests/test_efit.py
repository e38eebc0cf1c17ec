"""EFIT golden-file test (port of graph_tests/efit_test.cpp).

Compares spline-evaluated B, ne, te against the Mathematica-generated
efit_gold.nc grids at the reference's tolerances (efit_test.cpp:173-186:
squared relative error bounds 4e-12 for bx, 4e-23 absolute-ish for by,
1e-12 bz, 5e-13 ne/te) and checks div(B) = 0 through autodiff.
"""

import h5py
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from graph_framework_tpu.models import make_efit


@pytest.fixture(scope="module")
def gold(efit_gold_file):
    with h5py.File(efit_gold_file, "r") as h:
        return {k: np.asarray(h[k][...]) for k in
                ("r_grid", "z_grid", "bx_grid", "by_grid", "bz_grid",
                 "ne_grid", "te_grid", "pressure_grid")}


@pytest.fixture(scope="module")
def eq(efit_file):
    return make_efit(efit_file)


def _grid_positions(gold):
    r, z = np.meshgrid(gold["r_grid"], gold["z_grid"], indexing="ij")
    pos = jnp.stack([jnp.asarray(r.ravel()),
                     jnp.zeros(r.size, dtype=jnp.float64),
                     jnp.asarray(z.ravel())], axis=-1)
    return pos


def _rel_sq(test, expect):
    diff = test - expect
    denom = np.where(diff == 0, 1.0, expect)
    err = diff / denom
    return err * err


def test_b_field_golden(eq, gold):
    pos = _grid_positions(gold)
    b = jax.vmap(eq.magnetic_field)(pos)
    b = np.asarray(b)
    assert np.max(_rel_sq(b[:, 0], gold["bx_grid"].ravel())) <= 4.0e-12
    assert np.max(_rel_sq(b[:, 1], gold["by_grid"].ravel())) <= 4.0e-23
    assert np.max(_rel_sq(b[:, 2], gold["bz_grid"].ravel())) <= 1.0e-12


def test_profiles_golden(eq, gold):
    pos = _grid_positions(gold)
    ne = np.asarray(jax.vmap(eq.electron_density)(pos))
    te = np.asarray(jax.vmap(eq.electron_temperature)(pos))
    pres = np.asarray(jax.vmap(eq.pressure)(pos))
    assert np.max(_rel_sq(ne, gold["ne_grid"].ravel())) <= 5.0e-13
    assert np.max(_rel_sq(te, gold["te_grid"].ravel())) <= 5.0e-13
    # pressure isn't in the reference's golden test; near its zero crossing
    # the gold file itself is only ~5e-6-relative accurate, so the bound is
    # looser.
    assert np.max(_rel_sq(pres, gold["pressure_grid"].ravel())) <= 1.0e-10


def test_div_b_zero(eq, gold):
    """div(B) = 0 by construction of the flux representation; the reference
    asserts squared divergence <= 1e-20 via symbolic df (efit_test.cpp:
    158-186), we use jacfwd."""
    pos = _grid_positions(gold)

    def div_b(p):
        jac = jax.jacfwd(eq.magnetic_field)(p)
        return jac[0, 0] + jac[1, 1] + jac[2, 2]

    div = np.asarray(jax.vmap(div_b)(pos))
    assert np.max(div * div) <= 1.0e-20


def test_characteristic_field(eq):
    """|B| at the magnetic axis via on-device Newton
    (equilibrium.hpp:1584-1615).  The axis of this equilibrium sits near
    R ~ 1.8, z ~ 0 with |B| of order 2 T."""
    b0 = float(eq.characteristic_field())
    assert 0.5 < b0 < 10.0

    # the axis is the psi minimum: check psi there is close to psimin
    def fl(xa, za):
        p = jnp.stack([xa, jnp.zeros_like(xa), za])
        return (eq.psi(p) - eq.psimin) / eq.dpsi

    from graph_framework_tpu.ops.newton import newton_solve_multi
    (xa, za), _, _ = newton_solve_multi(
        fl, (jnp.asarray(1.7), jnp.asarray(0.0)), step=0.1)
    assert abs(float(fl(xa, za))) < 1e-6


def test_ion_quirks_replicated(eq):
    """ni = te profile and rounded q in ti (equilibrium.hpp:1358-1362)."""
    pos = jnp.asarray([1.8, 0.0, 0.1])
    assert float(eq.ion_density(0, pos)) == float(
        eq.electron_temperature(pos))
    q = 1.60218e-19
    ti_expect = (float(eq.pressure(pos))
                 - float(eq.electron_density(pos))
                 * float(eq.electron_temperature(pos)) * q) / (
        float(eq.ion_density(0, pos)) * q)
    np.testing.assert_allclose(float(eq.ion_temperature(0, pos)), ti_expect,
                               rtol=1e-12)


def test_gradients_wrt_coefficients(eq):
    """North-star capability: reverse-mode grads of field values w.r.t. the
    spline coefficient tables (BASELINE.md gradient targets)."""
    pos = jnp.asarray([1.8, 0.0, 0.1])

    def loss(psi_coeffs):
        import dataclasses
        eq2 = dataclasses.replace(eq, psi_coeffs=psi_coeffs)
        b = eq2.magnetic_field(pos)
        return jnp.sum(b * b)

    g = jax.grad(loss)(eq.psi_coeffs)
    assert g.shape == eq.psi_coeffs.shape
    assert np.isfinite(np.asarray(g)).all()
    assert np.any(np.asarray(g) != 0.0)


def test_plasma_quantities_fused_matches_accessors(eq):
    """The fused two-gather accessor (plasma_quantities) must agree exactly
    with the individual accessor methods it replaces in the hot path."""
    rng = np.random.default_rng(3)
    pos = jnp.stack([
        jnp.asarray(rng.uniform(1.2, 2.2, 64)),
        jnp.asarray(rng.uniform(-0.5, 0.5, 64)),
        jnp.asarray(rng.uniform(-0.8, 0.8, 64))], axis=-1)

    pq = jax.vmap(eq.plasma_quantities)(pos)
    np.testing.assert_allclose(pq.b, jax.vmap(eq.magnetic_field)(pos),
                               rtol=1e-14, atol=0)
    np.testing.assert_allclose(pq.ne, jax.vmap(eq.electron_density)(pos),
                               rtol=1e-14)
    np.testing.assert_allclose(pq.te, jax.vmap(eq.electron_temperature)(pos),
                               rtol=1e-14)
    np.testing.assert_allclose(
        pq.ni[0], jax.vmap(lambda p: eq.ion_density(0, p))(pos), rtol=1e-14)
    np.testing.assert_allclose(
        pq.ti[0], jax.vmap(lambda p: eq.ion_temperature(0, p))(pos),
        rtol=1e-12)


def test_frozen_cell_stepping_matches_exact(eq):
    """Frozen-cell stepping (Solver(frozen_cells=True) ->
    EfitEquilibrium.freeze_cells): one block gather per substep serves
    all RK stages.  Contract check: over a 50-substep f64 trace the
    endpoint matches exact rk4 to ~1e-9 relative (the cross-boundary
    polynomial extrapolation bound in the FrozenCellEfit docstring),
    and a stage that stays within the base cell is bitwise-identical
    physics (same polynomial)."""
    from graph_framework_tpu.models import dispersion as disp
    from graph_framework_tpu.solver import Solver, make_ray_state, init_k

    st = make_ray_state(2, w=500.0, x=2.3, y=0.0, z=0.0,
                        kx=-400.0, ky=150.0, kz=0.0)
    st = init_k(st, disp.cold_plasma, eq, "kx", tolerance=1e-14)
    outs = {}
    for key, kw in (("plain", {}),
                    ("frozen", dict(frozen_cells=True)),
                    ("frozen5", dict(frozen_cells=True, freeze_every=5))):
        sol = Solver(disp.cold_plasma, eq, method="rk4", dt=1.0e-4,
                     sub_steps=5, **kw)
        outs[key] = sol.run(st, 10)
    for key in ("frozen", "frozen5"):
        for f in ("x", "y", "z"):
            np.testing.assert_allclose(np.asarray(getattr(outs[key], f)),
                                       np.asarray(getattr(outs["plain"], f)),
                                       rtol=0, atol=1e-8)
        np.testing.assert_allclose(np.asarray(outs[key].kx),
                                   np.asarray(outs["plain"].kx), rtol=1e-8)
    with pytest.raises(ValueError, match="must divide"):
        Solver(disp.cold_plasma, eq, sub_steps=5, frozen_cells=True,
               freeze_every=3)
    with pytest.raises(ValueError, match="needs frozen_cells"):
        Solver(disp.cold_plasma, eq, sub_steps=5, freeze_every=5)

    # frozen_cells refuses analytic equilibria and non-rk methods
    from graph_framework_tpu.models.equilibrium import make_slab
    with pytest.raises(ValueError, match="freeze_cells"):
        Solver(disp.cold_plasma, make_slab(), frozen_cells=True)
    with pytest.raises(ValueError, match="rk2/rk4"):
        Solver(disp.cold_plasma, eq, method="adaptive_rk4",
               frozen_cells=True)
