"""Multi-step Pallas kernel for the relativistic Boris gyro push.

The XLA Boris step (models/korc.py) is pure elementwise work whose cost
is HBM round trips: every step reads and writes the 6 state arrays (plus
temporaries XLA materializes), measured 16.4 ms per 1e8-particle step on
v5e - 2.8x the bandwidth floor.  Particles are fully independent, so
this kernel keeps a particle block resident in VMEM and advances it
``steps`` Boris iterations per HBM round trip: traffic drops from
O(steps x state) to O(state), and the push becomes VPU-compute-bound.

The rotation algebra is the exact u'/tau/sigma energy-conserving variant
(xkorc.cpp:87-103), identical to models/korc.make_boris_step; gamma is
not carried - the Boris invariant gamma = sqrt(1 + u.u) recovers it
exactly each step (models/korc.initialize_gamma establishes it).

Field: the analytic slab B = z_hat (b1 + b_shear x) (equilibrium.hpp:
611-719) evaluated in-kernel - the framework-comparison benchmark axis
(code_performance.dox:42-60 is a uniform-B gyro push; b_shear = 0 gives
exactly that).  Spline-field pushes (EFIT) stay on the XLA path.

Layout: particles reshaped to (P/128, 128) so each state array maps onto
full VPU tiles; the kernel blocks over rows.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

LANES = 128


def _kernel(x_ref, y_ref, z_ref, ux_ref, uy_ref, uz_ref,
            xo_ref, yo_ref, zo_ref, uxo_ref, uyo_ref, uzo_ref,
            *, dt, b0, b1, b_shear, larmor, steps):
    x, y, z = x_ref[...], y_ref[...], z_ref[...]
    ux, uy, uz = ux_ref[...], uy_ref[...], uz_ref[...]

    def body(_, carry):
        x, y, z, ux, uy, uz = carry
        bz = (b1 + b_shear * x) / b0
        g = jnp.sqrt(1.0 + ux * ux + uy * uy + uz * uz)
        h = dt / (2.0 * g)

        # u' = u - h (u x b), b = (0, 0, bz)
        upx = ux - h * (uy * bz)
        upy = uy + h * (ux * bz)
        upz = uz

        tz = -0.5 * dt * bz
        tau_sq = tz * tz
        speed_sq = upx * upx + upy * upy + upz * upz
        sigma = 1.0 + speed_sq - tau_sq
        ustar = upz * tz
        g2 = jnp.sqrt(0.5 * (sigma + jnp.sqrt(
            sigma * sigma + 4.0 * (tau_sq + ustar * ustar))))
        tz2 = tz / g2
        s = 1.0 / (1.0 + tz2 * tz2)

        # u_next = s (u' + (u'.t) t + u' x t)
        udt = upz * tz2
        unx = s * (upx + upy * tz2)
        uny = s * (upy - upx * tz2)
        unz = s * (upz + udt * tz2)

        inv_g = larmor * dt / g2
        return (x + inv_g * unx, y + inv_g * uny, z + inv_g * unz,
                unx, uny, unz)

    x, y, z, ux, uy, uz = jax.lax.fori_loop(
        0, steps, body, (x, y, z, ux, uy, uz))
    xo_ref[...], yo_ref[...], zo_ref[...] = x, y, z
    uxo_ref[...], uyo_ref[...], uzo_ref[...] = ux, uy, uz


def make_slab_push(*, dt, b0, b1=1.0, b_shear=0.1, larmor=1.0,
                   steps=100, block_rows=32, interpret=False):
    """Build ``push(x, y, z, ux, uy, uz) -> same`` advancing ``steps``
    Boris iterations in one kernel launch.  Arrays are flat (P,) with P a
    multiple of ``block_rows * 128``.

    ``block_rows`` default 32: the round-3 default of 64 ran 22G
    particle-steps/s then but collapsed to 0.6G on the round-4 backend
    (same code, same chip class - Mosaic codegen drift between
    sessions); the round-4 sweep (NOTES_r4) measured 32 rows x >= 200
    in-kernel steps at 22-31G.  Re-sweep block_rows/steps whenever the
    serving stack changes.
    """

    def push(x, y, z, ux, uy, uz):
        p = x.shape[0]
        assert p % (block_rows * LANES) == 0, p
        rows = p // LANES
        shaped = [a.reshape(rows, LANES) for a in (x, y, z, ux, uy, uz)]
        spec = pl.BlockSpec((block_rows, LANES), lambda i: (i, 0))
        outs = pl.pallas_call(
            functools.partial(_kernel, dt=dt, b0=b0, b1=b1,
                              b_shear=b_shear, larmor=larmor,
                              steps=steps),
            grid=(rows // block_rows,),
            in_specs=[spec] * 6,
            out_specs=[spec] * 6,
            out_shape=[jax.ShapeDtypeStruct((rows, LANES), x.dtype)] * 6,
            interpret=interpret,
        )(*shaped)
        return tuple(o.reshape(p) for o in outs)

    return push
