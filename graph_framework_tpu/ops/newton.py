"""Vectorized Newton root-finding with the reference's convergence loop.

Replaces ``solver::newton`` + ``workflow::converge_item`` (reference:
graph_framework/newton.hpp:34-51, workflow.hpp:179-205).  The reference JITs
a kernel applying ``x <- x - step * f/f'(x)`` to every ray and re-runs it
until the device-wide max of f^2 drops below tolerance, stagnates, or
oscillates with period 2; we express the same loop as ``lax.while_loop``
with the symbolic derivative replaced by ``jax.grad``.

The residual reduction is a *global* max over the ensemble (the reference's
max-reduction kernel, cuda_context.hpp:954-995); under a sharded ensemble
XLA lowers ``jnp.max`` to a cross-device collective automatically.
"""

from __future__ import annotations

from functools import partial
from typing import Callable, NamedTuple, Sequence

import jax
import jax.numpy as jnp


class NewtonDiagnostics(NamedTuple):
    """Telemetry of one Newton solve - the information the reference's
    converge_item reports on non-convergence (workflow.hpp:184-204: it
    prints the iteration count and the minimum residual reached).

    Non-differentiable (zero cotangent through lax.custom_root's aux).
    """
    iterations: jax.Array     # int32 loop trips taken
    residual: jax.Array       # final ensemble-max of |f|^2
    converged: jax.Array      # residual <= tolerance


def _abs2(v):
    """|v|^2 as a real number (works for real and complex residuals)."""
    if jnp.iscomplexobj(v):
        return v.real * v.real + v.imag * v.imag
    return v * v


def newton_solve(f: Callable,
                 x0,
                 *,
                 tolerance: float = 1.0e-30,
                 max_iterations: int = 1000,
                 step: float = 1.0,
                 holomorphic: bool = False):
    """Solve ``f(x) = 0`` for one unknown per ray.

    ``f`` maps a per-ray scalar (or batched array) ``x`` to the residual of
    the same shape; all other ray state is closed over.  Matches
    ``solver::newton`` with a single variable: the update is
    ``x <- x - step * f/f'`` and the loop terminates per the converge_item
    criteria (workflow.hpp:184-204):

      |max f^2| <= tol                     (converged)
      |last - current| <= tol              (stagnation)
      |before_last - current| <= tol       (2-cycle oscillation)
      iterations >= max_iterations         (give up)

    Returns ``(x, converged, diagnostics)`` with ``diagnostics`` a
    :class:`NewtonDiagnostics` carrying the true iteration count and final
    max residual (the converge_item's non-convergence report).

    Differentiability: the while loop itself is not reverse-differentiable,
    so the solve is wrapped in ``lax.custom_root`` - gradients of the root
    w.r.t. anything f closes over come from the implicit function theorem
    (dx*/dtheta = -f_theta/f_x), one linear solve instead of unrolling the
    iteration.  This is capability the reference does not have (its Newton
    runs device-side with no derivative of the *solution*).
    """
    df = _elementwise_grad(f, holomorphic=holomorphic)

    def residual_max(x):
        return jnp.max(_abs2(f(x)).real)

    def iterate(f_inner, x_init):
        df_inner = _elementwise_grad(f_inner, holomorphic=holomorphic)

        def cond(state):
            x, last, off_last, it = state
            cur = jnp.max(_abs2(f_inner(x)).real)
            keep = jnp.abs(cur) > tolerance
            keep &= jnp.abs(last - cur) > tolerance
            keep &= jnp.abs(off_last - cur) > tolerance
            keep &= it < max_iterations
            return keep

        def body(state):
            x, last, off_last, it = state
            cur = jnp.max(_abs2(f_inner(x)).real)
            new_off = jnp.where(it % 2 == 0, cur, off_last)
            x_new = x - step * f_inner(x) / df_inner(x)
            return x_new, cur, new_off, it + 1

        big = jnp.asarray(jnp.finfo(jnp.result_type(x_init.real)).max)
        x, _, _, it = jax.lax.while_loop(
            cond, body, (x_init, big, big, jnp.asarray(0, dtype=jnp.int32)))
        res = jnp.max(_abs2(f_inner(x)).real)
        # aux must be inexact: custom_root's jvp machinery builds tangents
        # for every aux leaf, and int32 leaves trip the float0 check when
        # the solve sits under jax.grad.  Iterations ride as f32.
        return x, (it.astype(jnp.float32), res)

    def tangent_solve(g, y):
        # g is linear (the pushforward of f at the root); elementwise
        # per-ray: solve g(x) = y  ->  x = y / g'(0).
        slope = _elementwise_grad(g, holomorphic=holomorphic)(
            jnp.zeros_like(y))
        return y / slope

    # has_aux routes the loop telemetry out of custom_root with zero
    # cotangent - the root stays differentiable via the implicit function
    # theorem, the diagnostics are metrics only.
    x, (it, res) = jax.lax.custom_root(f, x0, iterate, tangent_solve,
                                       has_aux=True)
    it = jax.lax.stop_gradient(it).astype(jnp.int32)
    res = jax.lax.stop_gradient(res)
    converged = res <= tolerance
    return x, converged, NewtonDiagnostics(it, res, converged)


def newton_solve_multi(f: Callable,
                       xs0: Sequence,
                       *,
                       tolerance: float = 1.0e-30,
                       max_iterations: int = 1000,
                       step: float = 1.0,
                       holomorphic: bool = False):
    """Simultaneous Newton on several unknowns of a shared scalar function.

    Matches ``solver::newton`` with multiple vars (newton.hpp:42-47): each
    variable gets its own setter ``x_i <- x_i - step * f/df_i`` using the
    *partial* derivative w.r.t. that variable; all setters are applied from
    the same pre-update state each iteration (the reference's kernel reads
    all inputs before writing outputs).  Used by adaptive_rk4's (dt, lambda)
    loss minimization (solver.hpp:404-431) and the EFIT axis find
    (equilibrium.hpp:1584-1615).

    ``f(*xs)`` returns the per-ray residual.  Returns
    ``(xs, converged, diagnostics)``.
    """
    n = len(xs0)
    grads = [
        _elementwise_grad(f, argnums=i, holomorphic=holomorphic)
        for i in range(n)
    ]

    def residual_max(xs):
        return jnp.max(_abs2(f(*xs)).real)

    def cond(state):
        xs, last, off_last, it = state
        cur = residual_max(xs)
        keep = jnp.abs(cur) > tolerance
        keep &= jnp.abs(last - cur) > tolerance
        keep &= jnp.abs(off_last - cur) > tolerance
        keep &= it < max_iterations
        return keep

    def body(state):
        xs, last, off_last, it = state
        cur = residual_max(xs)
        new_off = jnp.where(it % 2 == 0, cur, off_last)
        fx = f(*xs)
        xs_new = tuple(
            x - step * fx / g(*xs) for x, g in zip(xs, grads))
        return xs_new, cur, new_off, it + 1

    big = jnp.asarray(jnp.finfo(jnp.result_type(xs0[0].real)).max)
    xs, _, _, it = jax.lax.while_loop(
        cond, body, (tuple(xs0), big, big, jnp.asarray(0, dtype=jnp.int32)))
    res = residual_max(xs)
    converged = res <= tolerance
    return xs, converged, NewtonDiagnostics(it, res, converged)


def _elementwise_grad(f, argnums: int = 0, holomorphic: bool = False):
    """Gradient of an elementwise function evaluated batched.

    For ``f`` mapping batched arrays elementwise, df/dx_i depends only on
    x_i, so grad-of-sum gives the batched elementwise derivative in one
    backward pass (the vmap-free equivalent of the reference's per-ray
    symbolic derivative kernel).
    """

    def g(*args):
        def summed(*a):
            val = f(*a)
            return jnp.sum(val)
        return jax.grad(summed, argnums=argnums,
                        holomorphic=holomorphic)(*args)

    return g
