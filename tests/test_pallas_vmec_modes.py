"""Correctness of the fused VMEC mode-sum kernel (pallas/vmec_modes.py).

Runs the Pallas kernel in interpret mode on CPU against the plain-JAX
reference for values, first-order cotangents (the custom-vjp backward),
and second-order AD (reverse-over-reverse - the ray RHS is itself a
jax.grad, so trace gradients differentiate THROUGH the backward, which
is deliberately plain JAX)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from graph_framework_tpu.pallas.vmec_modes import (
    make_mode_sums, _reference_forward)

VMEC_FILE = "/root/reference/graph_tests/vmec.nc"

M = 90
N = 257          # deliberately not a multiple of the block (pad path)


@pytest.fixture(scope="module")
def data():
    k = jax.random.PRNGKey(0)
    ks = jax.random.split(k, 7)
    u = jax.random.uniform(ks[0], (N,), jnp.float64, 0.0, 6.0)
    v = jax.random.uniform(ks[1], (N,), jnp.float64, 0.0, 6.0)
    blocks = [jax.random.normal(ks[i], (N, M), jnp.float64)
              for i in range(2, 7)]
    xm = jnp.asarray(np.repeat(np.arange(10.0), 9))
    xn = jnp.asarray(np.tile(np.arange(9.0) - 4.0, 10))
    return (u, v, *blocks), (xm, xn)


def test_values_match_reference(data):
    args, (xm, xn) = data
    fused = make_mode_sums(xm, xn, block=128, interpret=True)
    got = fused(*args)
    want = _reference_forward(*args, xm, xn)
    for g, w in zip(got, want):
        np.testing.assert_allclose(np.asarray(g), np.asarray(w),
                                   rtol=1e-12, atol=1e-12)


def test_first_order_grads_match(data):
    args, (xm, xn) = data
    fused = make_mode_sums(xm, xn, block=128, interpret=True)

    def loss_f(*a):
        out = fused(*a)
        return sum(jnp.sum(jnp.sin(o) * (i + 1.0))
                   for i, o in enumerate(out))

    def loss_r(*a):
        out = _reference_forward(*a, xm, xn)
        return sum(jnp.sum(jnp.sin(o) * (i + 1.0))
                   for i, o in enumerate(out))

    gf = jax.grad(loss_f, argnums=tuple(range(7)))(*args)
    gr = jax.grad(loss_r, argnums=tuple(range(7)))(*args)
    for a, b in zip(gf, gr):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-10, atol=1e-10)


def test_second_order_ad_through_backward(data):
    """grad-of-grad works (plain-JAX backward) and matches the
    reference - the structure the trace-gradient benchmarks transpose."""
    args, (xm, xn) = data
    fused = make_mode_sums(xm, xn, block=128, interpret=True)

    def inner(f, u, v, rest):
        def g(uv):
            out = f(uv[0], uv[1], *rest)
            return jnp.sum(out[0] * out[3]) + jnp.sum(out[9])
        return jax.grad(g)(jnp.stack([u, v]))

    def outer_f(u):
        return jnp.sum(inner(fused, u, args[1], args[2:]) ** 2)

    def ref_fn(u, v, *rest):
        return _reference_forward(u, v, *rest, xm, xn)

    def outer_r(u):
        return jnp.sum(inner(ref_fn, u, args[1], args[2:]) ** 2)

    g2f = jax.grad(outer_f)(args[0])
    g2r = jax.grad(outer_r)(args[0])
    np.testing.assert_allclose(np.asarray(g2f), np.asarray(g2r),
                               rtol=1e-9, atol=1e-9)


def test_fused_flag_matches_default_through_geometry():
    """make_vmec(fused_mode_sums=True) reproduces the default XLA path
    through the full geometry (esup, B) on the batched f32 path - the
    integration surface the TPU bench flips with BENCH_VMEC_FUSED=1."""
    import dataclasses
    from graph_framework_tpu.models.vmec import make_vmec

    eq = make_vmec(VMEC_FILE, dtype=jnp.float32)
    eqf = dataclasses.replace(eq, fused_mode_sums=True)

    k = jax.random.PRNGKey(3)
    ks = jax.random.split(k, 3)
    pos = jnp.stack([
        jax.random.uniform(ks[0], (64,), jnp.float32, 0.2, 0.8),
        jax.random.uniform(ks[1], (64,), jnp.float32, 0.0, 6.0),
        jax.random.uniform(ks[2], (64,), jnp.float32, 0.0, 6.0)])

    g0 = eq._geometry(pos)
    g1 = eqf._geometry(pos)
    for key in ("r", "z", "jac"):
        np.testing.assert_allclose(np.asarray(g1[key]),
                                   np.asarray(g0[key]),
                                   rtol=2e-4, atol=2e-5)
    np.testing.assert_allclose(np.asarray(g1["bvec"]),
                               np.asarray(g0["bvec"]),
                               rtol=5e-3, atol=5e-4)
    np.testing.assert_allclose(np.asarray(g1["esup"]),
                               np.asarray(g0["esup"]),
                               rtol=5e-3, atol=5e-4)
