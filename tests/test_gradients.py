"""End-to-end differentiability tests (the BASELINE.md north star):
reverse-mode gradients of trace outcomes w.r.t. launch parameters and
equilibrium spline coefficients, validated against finite differences."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from graph_framework_tpu.models import make_efit, dispersion as disp
from graph_framework_tpu.models.equilibrium import make_slab_density
from graph_framework_tpu.solver import Solver, make_ray_state, init_k


def _endpoint_slab(ky):
    eq = make_slab_density()
    st = make_ray_state(1, w=900.0, x=0.0, kx=700.0, ky=ky, kz=100.0)
    st = init_k(st, disp.cold_plasma, eq, "kx", tolerance=1e-24,
                max_iterations=50)
    sol = Solver(disp.cold_plasma, eq, method="rk4", dt=1e-4, sub_steps=5)
    fin, _ = sol.trace(st, 4)
    return fin.x[0]


def test_grad_through_full_trace_matches_fd():
    """d(end x)/d(launch ky) through Newton init + 20 RK4 steps."""
    g = jax.grad(_endpoint_slab)(30.0)
    h = 1e-3
    fd = (_endpoint_slab(30.0 + h) - _endpoint_slab(30.0 - h)) / (2 * h)
    np.testing.assert_allclose(float(g), float(fd), rtol=1e-5)


def test_grad_wrt_spline_coefficients_through_trace(efit_file):
    """d(end position)/d(psi spline tables) through a full EFIT trace is
    finite, nonzero, and matches a directional finite difference."""
    eq0 = make_efit(efit_file)

    def endpoint(psi_coeffs):
        eq = dataclasses.replace(eq0, psi_coeffs=psi_coeffs)
        # trace deep into the plasma (t = 0.5; the ray crosses the
        # separatrix near t ~ 0.2) so the psi tables actually steer it
        st = make_ray_state(1, w=500.0, x=2.5, y=0.0, z=0.0, kx=-500.0)
        sol = Solver(disp.cold_plasma, eq, method="rk4", dt=2e-3,
                     sub_steps=10)
        fin, _ = sol.trace(st, 25)
        return fin.x[0] + fin.z[0]

    g = jax.grad(endpoint)(eq0.psi_coeffs)
    assert np.isfinite(np.asarray(g)).all()
    assert float(jnp.sum(jnp.abs(g))) > 0

    # directional derivative along the gradient itself: a random direction
    # has ~zero overlap with the sparse set of visited cells, putting the
    # FD change below f64 noise.
    v = g / jnp.linalg.norm(g.ravel())
    h = 1e-7      # larger steps show trajectory nonlinearity (~0.1% at 1e-5)
    fd = (endpoint(eq0.psi_coeffs + h * v)
          - endpoint(eq0.psi_coeffs - h * v)) / (2 * h)
    dir_grad = float(jnp.sum(g * v))     # = ||g||
    np.testing.assert_allclose(dir_grad, float(fd), rtol=1e-5)


def test_grad_of_absorbed_power_wrt_launch(efit_file):
    """d(total path length proxy)/d(launch kz): the absorbed-power gradient
    pattern (power depends on the trajectory through bin_power)."""
    eq = make_efit(efit_file)

    def path_shift(kz):
        st = make_ray_state(1, w=500.0, x=2.5, y=0.0, z=0.0,
                            kx=-500.0, kz=kz)
        sol = Solver(disp.cold_plasma, eq, method="rk4", dt=2e-4,
                     sub_steps=5)
        fin, traj = sol.trace(st, 3)
        pos = jnp.stack([traj.x[:, 0], traj.y[:, 0], traj.z[:, 0]], -1)
        dl = jnp.linalg.norm(jnp.diff(pos, axis=0), axis=-1)
        return jnp.sum(dl)

    g = jax.grad(path_shift)(20.0)
    h = 1e-2
    fd = (path_shift(20.0 + h) - path_shift(20.0 - h)) / (2 * h)
    # by up-down symmetry this derivative is ~0; the FD value is pure
    # cancellation noise, so compare with an absolute tolerance.
    np.testing.assert_allclose(float(g), float(fd), rtol=1e-4, atol=1e-9)


def test_stored_trajectory_segment_chain_matches_monolithic(efit_file):
    """bench.py run_grad's round-3 backward structure: forward segments
    save step-boundary states, backward replays per-step vjps in a
    reverse scan over the stored trajectory.  The chained gradient must
    equal the monolithic jax.grad."""
    eq = make_efit(efit_file, dtype=jnp.float32)
    st = make_ray_state(8, w=500.0, x=2.5, y=0.0, z=0.0,
                        kx=-500.0, ky=0.0, kz=0.0, dtype=jnp.float32)
    st = init_k(st, disp.cold_plasma, eq, "kx", tolerance=1e-8,
                max_iterations=60)
    sol = Solver(disp.cold_plasma, eq, method="rk4", dt=1e-6,
                 sub_steps=2, remat_substeps=True)
    step = jax.checkpoint(sol.raw_step_fn(), prevent_cse=False)
    seg_steps, n_seg = 3, 2

    def loss(s):
        return (jnp.sum(s.x) + jnp.sum(s.kx)) / s.x.shape[0]

    def seg_fwd_traj(s0):
        def body(s, _):
            return step(s), s
        return jax.lax.scan(body, s0, None, length=seg_steps)

    def seg_bwd(traj, ct):
        def body(c, s_in):
            return jax.vjp(step, s_in)[1](c)[0], None
        out, _ = jax.lax.scan(body, ct, traj, reverse=True)
        return out

    trajs, s = [], st
    for _ in range(n_seg):
        s, traj = jax.jit(seg_fwd_traj)(s)
        trajs.append(traj)
    _, ct = jax.value_and_grad(loss)(s)
    for traj in reversed(trajs):
        ct = jax.jit(seg_bwd)(traj, ct)

    def mono(s0):
        def body(s, _):
            return step(s), None
        out, _ = jax.lax.scan(body, s0, None, length=seg_steps * n_seg)
        return loss(out)

    want = jax.grad(mono)(st)
    for g, w, name in zip(ct, want, st._fields):
        np.testing.assert_allclose(np.asarray(g), np.asarray(w),
                                   rtol=1e-5, atol=1e-8, err_msg=name)


def test_remat_policy_spline_jet_matches_default(efit_file):
    """Solver(remat_policy='spline_jet') saves the named gather products
    during backward recompute; gradients must be identical to the
    save-nothing policy."""
    eq = make_efit(efit_file, dtype=jnp.float32)
    st = make_ray_state(8, w=500.0, x=2.5, y=0.0, z=0.0,
                        kx=-500.0, ky=0.0, kz=0.0, dtype=jnp.float32)
    st = init_k(st, disp.cold_plasma, eq, "kx", tolerance=1e-8,
                max_iterations=60)

    def loss_for(policy):
        sol = Solver(disp.cold_plasma, eq, method="rk4", dt=1e-6,
                     sub_steps=2, remat_substeps=True,
                     remat_policy=policy)
        step = sol.raw_step_fn()

        def loss(s):
            def body(c, _):
                return step(c), None
            out, _ = jax.lax.scan(body, s, None, length=4)
            return jnp.sum(out.x) + jnp.sum(out.kx)

        return jax.grad(loss)(st)

    g0 = loss_for(None)
    g1 = loss_for("spline_jet")
    for a, b, name in zip(g0, g1, st._fields):
        np.testing.assert_allclose(np.asarray(b), np.asarray(a),
                                   rtol=1e-6, atol=1e-9, err_msg=name)


def test_frozen_cells_gradients_match_plain(efit_file):
    """Trace gradients through frozen-cell stepping equal the plain
    path's (the frozen view is plain XLA gathers + polynomials, so
    reverse-mode flows through it; cotangents w.r.t. the coordinate pass
    through the polynomial exactly as the reference's piecewise df
    semantics require)."""
    from graph_framework_tpu.models import make_efit
    eq = make_efit(efit_file)
    st = make_ray_state(4, w=500.0, x=2.2, y=0.0, z=0.0,
                        kx=-300.0, ky=150.0, kz=0.0)
    st = init_k(st, disp.cold_plasma, eq, "kx", tolerance=1e-14)

    grads = {}
    for frozen in (False, True):
        sol = Solver(disp.cold_plasma, eq, method="rk4", dt=1e-4,
                     sub_steps=5, frozen_cells=frozen)
        step = sol.raw_step_fn()

        def endpoint(s0, _step=step):
            def body(s, _):
                return _step(s), None
            s, _ = jax.lax.scan(body, s0, None, length=4)
            return jnp.sum(s.x) + jnp.sum(s.kx)

        grads[frozen] = jax.jit(jax.grad(endpoint))(st)
    for f in st._fields:
        np.testing.assert_allclose(
            np.asarray(getattr(grads[True], f)),
            np.asarray(getattr(grads[False], f)), rtol=2e-6, atol=1e-9,
            err_msg=f)


def test_frozen_compensated_blocked_compose(efit_file):
    """The three round-3/4 production options compose: frozen-cell
    stepping + compensated double-word accumulation + ensemble blocking
    in one run, equal to the unoptimized path at contract tolerance."""
    from graph_framework_tpu.models import make_efit
    import jax.numpy as jnp
    eq = make_efit(efit_file, dtype=jnp.float32)
    st = make_ray_state(8, w=500.0, x=2.2, y=0.0, z=0.0,
                        kx=-300.0, ky=150.0, kz=0.0, dtype=jnp.float32)
    plain = Solver(disp.cold_plasma, eq, method="rk4", dt=1e-4,
                   sub_steps=5)
    combo = Solver(disp.cold_plasma, eq, method="rk4", dt=1e-4,
                   sub_steps=5, frozen_cells=True, compensated=True)
    a = plain.run(st, 4)
    b = combo.run(st, 4, block_rays=4)
    np.testing.assert_allclose(np.asarray(b.x), np.asarray(a.x),
                               rtol=0, atol=5e-6)
    np.testing.assert_allclose(np.asarray(b.kx), np.asarray(a.kx),
                               rtol=5e-6)


def test_frozen_cells_table_gradients_match_plain(efit_file):
    """Spline-TABLE gradients (config5's north star: d absorbed power /
    d psi coefficients) flow through frozen-cell stepping exactly: the
    frozen block is itself a gather from psi_coeffs, so the backward
    scatter-adds land on the same cells - measured 7e-16 relative
    agreement with the plain path."""
    import dataclasses
    from graph_framework_tpu.models import make_efit

    eq0 = make_efit(efit_file)
    st = make_ray_state(4, w=500.0, x=2.2, y=0.0, z=0.0,
                        kx=-300.0, ky=150.0, kz=0.0)
    st = init_k(st, disp.cold_plasma, eq0, "kx", tolerance=1e-14)

    def loss_fn(frozen):
        def loss(psi_coeffs):
            eq = dataclasses.replace(eq0, psi_coeffs=psi_coeffs)
            sol = Solver(disp.cold_plasma, eq, method="rk4", dt=1e-4,
                         sub_steps=5, frozen_cells=frozen)
            s = sol.run(st, 3)
            return jnp.sum(s.x) + jnp.sum(s.kx)
        return loss

    g_plain = jax.jit(jax.grad(loss_fn(False)))(eq0.psi_coeffs)
    g_frozen = jax.jit(jax.grad(loss_fn(True)))(eq0.psi_coeffs)
    scale = float(jnp.max(jnp.abs(g_plain)))
    np.testing.assert_allclose(np.asarray(g_frozen) / scale,
                               np.asarray(g_plain) / scale,
                               rtol=0, atol=1e-12)


def test_custom_jet_frozen_parity(efit_file):
    """Analytic-jet custom_jvp (efit._make_frozen_pq_jet): forward,
    launch-gradient (second order through the jvp rule), and TABLE
    gradients all match the autodiff frozen path."""
    import dataclasses as dc
    from graph_framework_tpu.models.efit import make_efit
    from graph_framework_tpu.models.rays import make_ray_rhs
    from graph_framework_tpu.models import dispersion as disp
    from graph_framework_tpu.solver import Solver, make_ray_state, init_k

    eq0 = make_efit(efit_file)
    eqj = make_efit(efit_file, custom_jet=True)
    st = make_ray_state(8, w=650.0, x=2.0, y=0.3, z=0.1,
                        kx=-400.0, ky=150.0, kz=30.0)
    st = init_k(st, disp.cold_plasma, eq0, "kx")

    pos = jnp.stack([st.x, st.y, st.z])
    r0 = make_ray_rhs(disp.cold_plasma, eq0.freeze_cells(pos))(st)
    rj = make_ray_rhs(disp.cold_plasma, eqj.freeze_cells(pos))(st)
    for f in r0._fields:
        np.testing.assert_allclose(np.asarray(getattr(r0, f)),
                                   np.asarray(getattr(rj, f)),
                                   rtol=1e-10)

    def endpoint(eq, kx):
        sol = Solver(disp.cold_plasma, eq, method="rk2", dt=1e-4,
                     sub_steps=5, frozen_cells=True, remat_substeps=True)
        out = sol.run(st._replace(kx=kx), 2)
        return jnp.sum(out.x) + jnp.sum(out.kx)

    g0 = jax.grad(endpoint, argnums=1)(eq0, st.kx)
    gj = jax.grad(endpoint, argnums=1)(eqj, st.kx)
    np.testing.assert_allclose(np.asarray(g0), np.asarray(gj), rtol=1e-8)

    def table_loss(eq, coeffs):
        eq2 = dc.replace(eq, psi_coeffs=coeffs)
        sol = Solver(disp.cold_plasma, eq2, method="rk2", dt=1e-4,
                     sub_steps=5, frozen_cells=True, remat_substeps=True)
        return jnp.sum(sol.run(st, 2).x)

    t0 = jax.grad(table_loss, argnums=1)(eq0, eq0.psi_coeffs)
    tj = jax.grad(table_loss, argnums=1)(eqj, eqj.psi_coeffs)
    nz = np.abs(np.asarray(t0)) > 0
    np.testing.assert_allclose(np.asarray(t0)[nz], np.asarray(tj)[nz],
                               rtol=1e-8)
