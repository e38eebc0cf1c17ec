"""Adaptive-dt RK4 stepper (reference: solver::adaptive_rk4,
graph_framework/solver.hpp:343-530).

The reference runs, before every solver step, a Newton converge-kernel over
two per-ray auxiliary variables (dt, lambda) on the loss

    loss(dt, lambda) = 1/dt + lambda * D(next_state(dt))^2

where next_state(dt) is the full RK4 update expressed as a function of dt
(the pseudo-variable wrapping of kx_next..t_next at solver.hpp:393-401).
Driving the loss to zero balances step growth (1/dt -> 0 favors large dt)
against the post-step dispersion residual.  We reproduce the same scheme
with the RK4 update as a function of the per-ray dt and ``jax.grad`` for
the two partial derivatives.
"""

from __future__ import annotations

from typing import Callable

import jax
import jax.numpy as jnp

from graph_framework_tpu.models.rays import (
    RayState, make_ray_rhs, dispersion_residual)
from graph_framework_tpu.ops.integrators import rk4_step
from graph_framework_tpu.ops.newton import newton_solve_multi


def adaptive_rk4_step(dispersion: Callable, eq, rhs, state: RayState, dt,
                      *, tolerance=1.0e-30, max_iterations=1000):
    """One adaptive step: Newton-adapt (dt, lambda) per ray, then RK4.

    ``dt`` may be a scalar (used as the initial per-ray dt) or a per-ray
    array carried between calls by the caller.
    """
    d_one = dispersion_residual(dispersion, eq)
    vd = d_one if getattr(eq, "supports_batched", eq.is_cartesian)() \
        else jax.vmap(d_one)

    dt0 = jnp.broadcast_to(jnp.asarray(dt, dtype=state.t.dtype),
                           state.t.shape)
    lam0 = jnp.ones_like(dt0)

    def loss(dt_var, lam):
        nxt = rk4_step(rhs, state, dt_var)
        d = vd(nxt.t, nxt.w, nxt.x, nxt.y, nxt.z, nxt.kx, nxt.ky, nxt.kz)
        return 1.0 / dt_var + lam * d * d

    (dt_new, _lam), _, _ = newton_solve_multi(
        loss, (dt0, lam0), tolerance=tolerance,
        max_iterations=max_iterations)

    return rk4_step(rhs, state, dt_new)
