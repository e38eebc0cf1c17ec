"""Multi-step Pallas Boris push (pallas/boris.py) vs the XLA step.

Interpret mode on CPU; the kernel must reproduce models/korc.py's
u'/tau/sigma algebra exactly (same formulas, gamma recovered from the
Boris invariant instead of carried).
"""

import jax
import jax.numpy as jnp
import numpy as np

from graph_framework_tpu.models.equilibrium import make_slab
from graph_framework_tpu.models.korc import (
    ParticleState, initialize_gamma, make_boris_step)
from graph_framework_tpu.pallas.boris import make_slab_push


def test_kernel_matches_xla_step():
    n, steps = 256, 25
    rng = np.random.default_rng(0)
    st = ParticleState(
        x=jnp.asarray(rng.uniform(1.5, 2.0, n), jnp.float32),
        y=jnp.asarray(rng.uniform(-0.5, 0.5, n), jnp.float32),
        z=jnp.asarray(rng.uniform(-0.5, 0.5, n), jnp.float32),
        ux=jnp.asarray(rng.uniform(-0.3, 0.3, n), jnp.float32),
        uy=jnp.full(n, 0.9, jnp.float32),
        uz=jnp.full(n, 0.1, jnp.float32),
        gamma=jnp.ones(n, jnp.float32))
    st = initialize_gamma(st)

    eq = make_slab()
    b0 = float(eq.characteristic_field())
    dt = 0.5
    step = make_boris_step(eq, b0, dt, 1.0)
    ref = st
    for _ in range(steps):
        ref = step(ref)

    push = make_slab_push(dt=dt, b0=b0, b1=1.0, b_shear=0.1,
                          steps=steps, block_rows=1, interpret=True)
    x, y, z, ux, uy, uz = push(st.x, st.y, st.z, st.ux, st.uy, st.uz)
    for got, want, name in [(x, ref.x, "x"), (y, ref.y, "y"),
                            (z, ref.z, "z"), (ux, ref.ux, "ux"),
                            (uy, ref.uy, "uy"), (uz, ref.uz, "uz")]:
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   rtol=2e-5, atol=2e-5, err_msg=name)
    # energy conservation: gamma invariant preserved
    g = np.sqrt(1.0 + np.asarray(ux)**2 + np.asarray(uy)**2
                + np.asarray(uz)**2)
    np.testing.assert_allclose(g, np.asarray(ref.gamma), rtol=1e-5)
