"""Integrator order-of-convergence on a nonlinear ray Hamiltonian.

The reference's solver_test only checks the dispersion residual stays small
(solver_test.cpp:28-60); here we additionally verify the advertised orders:
endpoint error vs a fine-dt reference scales ~dt^2 for rk2 and ~dt^4 for
rk4.  The gaussian_well dispersion (dispersion.hpp:683-716) gives genuinely
curved trajectories (k and x both evolve), so integrator error is visible.
"""

import numpy as np
import jax.numpy as jnp
import pytest

from graph_framework_tpu.models import dispersion as disp
from graph_framework_tpu.models.equilibrium import make_no_magnetic_field
from graph_framework_tpu.solver import Solver, make_ray_state


def _endpoint(method, dt, n_steps):
    eq = make_no_magnetic_field()
    state = make_ray_state(1, w=1.2, x=0.3, kx=0.8, dtype=jnp.float64)
    sol = Solver(disp.gaussian_well, eq, method=method, dt=dt,
                 sub_steps=n_steps)
    out = sol.step_fn()(state)
    return np.array([float(out.x[0]), float(out.kx[0])])


@pytest.mark.parametrize("method,order", [("rk2", 2), ("rk4", 4)])
def test_integrator_convergence_order(method, order):
    t_end = 0.64
    ref = _endpoint("rk4", t_end / 2048, 2048)    # fine-dt truth
    errs = []
    for n in (8, 16, 32):
        errs.append(np.max(np.abs(_endpoint(method, t_end / n, n) - ref)))
    rates = [np.log2(errs[i] / errs[i + 1]) for i in range(len(errs) - 1)]
    # each halving of dt must cut the error by ~2^order
    for rate in rates:
        assert rate > order - 0.6, (method, errs, rates)
