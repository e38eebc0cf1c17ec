"""Pallas kernel fusing the VMEC Fourier mode sums.

Device profile of the VMEC RK4 substep (tools/profile_vmec.py, v5e):
~35% of device time is multiply+reduce fusions - the 10 mode-axis
contractions of models/vmec._rzl_and_jac - plus ~10% reshapes, because
XLA materializes each (rays, num_modes) product (rm*ca, xm*rm_sa, ...)
between reduction loops.  This kernel computes the per-mode trig IN VMEM
and accumulates all ten sums in one pass over the mode blocks, so each
coefficient block is read from HBM exactly once and no (rays, m)
intermediate ever round-trips.

Outputs (per ray): R, Z, dR/ds, dR/du, dR/dv, dZ/ds, dZ/du, dZ/dv,
dl/du, dl/dv (dl/ds is not used by the geometry - equilibrium.hpp's
jbsupu/jbsupv need only the angular lambda derivatives).

Differentiation: wrapped in jax.custom_vjp.  The BACKWARD is plain JAX
(elementwise products + two mode reductions) so reverse-over-reverse -
the ray RHS is itself a jax.grad, and trace gradients transpose through
it - keeps working; only the forward evaluation (which runs four times
per RK4 substep inside both the primal and the remat recompute) uses the
hand-written kernel.  The cotangents w.r.t. the coefficient blocks feed
XLA's transpose of the block fetch, preserving table gradients
(test_gradients_wrt_fourier_coefficients).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl


def _kernel(u_ref, v_ref, rm_ref, zm_ref, rms_ref, zms_ref, lm_ref,
            xm_ref, xn_ref, out_ref):
    u = u_ref[...]                      # (B, 1)
    v = v_ref[...]
    xm = xm_ref[...]                    # (1, m)
    xn = xn_ref[...]
    ang = u * xm - v * xn               # (B, m)
    ca = jnp.cos(ang)
    sa = jnp.sin(ang)
    rm = rm_ref[...]
    zm = zm_ref[...]
    rms = rms_ref[...]
    zms = zms_ref[...]
    lm = lm_ref[...]
    rm_sa = rm * sa
    zm_ca = zm * ca
    lm_ca = lm * ca

    def s(x):
        return jnp.sum(x, axis=1)

    sums = [
        s(rm * ca),                     # R
        s(zm * sa),                     # Z
        s(rms * ca),                    # dR/ds
        -s(xm * rm_sa),                 # dR/du
        s(xn * rm_sa),                  # dR/dv
        s(zms * sa),                    # dZ/ds
        s(xm * zm_ca),                  # dZ/du
        -s(xn * zm_ca),                 # dZ/dv
        s(xm * lm_ca),                  # dl/du
        -s(xn * lm_ca),                 # dl/dv
    ]
    # one aligned (B, 16) store: rays stay on sublanes, the 10 outputs
    # (+6 zero pad columns, keeping the minor dim a lane-tile-friendly
    # width) on lanes - a (10, B) output block would put a sublane
    # vector into a lane row (cross-lane transpose) and violate the
    # (8, 128) f32 tile rule (see pallas/deposit.py device-wedge note)
    tile = jnp.stack(sums + [jnp.zeros_like(sums[0])] * 6, axis=-1)
    out_ref[...] = tile


def _pallas_forward(u, v, rm, zm, rm_s, zm_s, lm, xm, xn, *,
                    block, interpret):
    n, m = rm.shape
    pad = (-n) % block
    if pad:
        args = [jnp.pad(a, ((0, pad),) + ((0, 0),) * (a.ndim - 1))
                for a in (u, v, rm, zm, rm_s, zm_s, lm)]
        u, v, rm, zm, rm_s, zm_s, lm = args
        n = n + pad
    u2 = u[:, None]
    v2 = v[:, None]
    xm2 = xm[None, :]
    xn2 = xn[None, :]
    grid = (n // block,)
    ray_spec = pl.BlockSpec((block, 1), lambda i: (i, 0))
    mode_spec = pl.BlockSpec((block, m), lambda i: (i, 0))
    const_spec = pl.BlockSpec((1, m), lambda i: (0, 0))
    out = pl.pallas_call(
        _kernel,
        grid=grid,
        in_specs=[ray_spec, ray_spec, mode_spec, mode_spec, mode_spec,
                  mode_spec, mode_spec, const_spec, const_spec],
        out_specs=pl.BlockSpec((block, 16), lambda i: (i, 0)),
        out_shape=jax.ShapeDtypeStruct((n, 16), rm.dtype),
        interpret=interpret,
    )(u2, v2, rm, zm, rm_s, zm_s, lm, xm2, xn2)
    if pad:
        out = out[:n - pad]
    return tuple(out[:, i] for i in range(10))


def _reference_forward(u, v, rm, zm, rm_s, zm_s, lm, xm, xn):
    """Plain-JAX forward with identical semantics (used for CPU and as
    the differentiation reference in tests)."""
    ang = u[:, None] * xm - v[:, None] * xn
    ca = jnp.cos(ang)
    sa = jnp.sin(ang)
    rm_sa = rm * sa
    zm_ca = zm * ca
    lm_ca = lm * ca

    def s(x):
        return jnp.sum(x, axis=1)

    return (s(rm * ca), s(zm * sa), s(rm_s * ca), -s(xm * rm_sa),
            s(xn * rm_sa), s(zm_s * sa), s(xm * zm_ca), -s(xn * zm_ca),
            s(xm * lm_ca), -s(xn * lm_ca))


@functools.partial(jax.jit, static_argnames=("block", "interpret",
                                             "use_pallas"))
def _dispatch(u, v, rm, zm, rm_s, zm_s, lm, xm, xn, *, block, interpret,
              use_pallas):
    if use_pallas:
        return _pallas_forward(u, v, rm, zm, rm_s, zm_s, lm, xm, xn,
                               block=block, interpret=interpret)
    return _reference_forward(u, v, rm, zm, rm_s, zm_s, lm, xm, xn)


def make_mode_sums(xm, xn, *, block=1024, interpret=False,
                   use_pallas=True):
    """Build the custom-vjp fused mode-sum function for one mode grid.

    Returns ``f(u, v, rm, zm, rm_s, zm_s, lm) -> 10-tuple of (rays,)``.
    ``interpret=True`` runs the kernel in Pallas interpret mode (CPU
    testing); ``use_pallas=False`` keeps the plain-JAX forward but the
    same custom-vjp backward (for apples-to-apples timing).
    """
    xm = jnp.asarray(xm)
    xn = jnp.asarray(xn)

    @jax.custom_vjp
    def mode_sums(u, v, rm, zm, rm_s, zm_s, lm):
        return _dispatch(u, v, rm, zm, rm_s, zm_s, lm, xm, xn,
                         block=block, interpret=interpret,
                         use_pallas=use_pallas)

    def fwd(u, v, rm, zm, rm_s, zm_s, lm):
        out = mode_sums(u, v, rm, zm, rm_s, zm_s, lm)
        return out, (u, v, rm, zm, rm_s, zm_s, lm)

    def bwd(res, cts):
        u, v, rm, zm, rm_s, zm_s, lm = res
        (ct_r, ct_z, ct_drs, ct_dru, ct_drv, ct_dzs, ct_dzu, ct_dzv,
         ct_dlu, ct_dlv) = [c[:, None] for c in cts]
        ang = u[:, None] * xm - v[:, None] * xn
        ca = jnp.cos(ang)
        sa = jnp.sin(ang)
        # adjoint of the bilinear sums: cotangents w.r.t. the trig grids
        ct_ca = (rm * ct_r + rm_s * ct_drs + xm * zm * ct_dzu
                 - xn * zm * ct_dzv + xm * lm * ct_dlu
                 - xn * lm * ct_dlv)
        ct_sa = (zm * ct_z - xm * rm * ct_dru + xn * rm * ct_drv
                 + zm_s * ct_dzs)
        # ... and w.r.t. the coefficient blocks
        ct_rm = ca * ct_r - xm * sa * ct_dru + xn * sa * ct_drv
        ct_zm = sa * ct_z + xm * ca * ct_dzu - xn * ca * ct_dzv
        ct_rms = ca * ct_drs
        ct_zms = sa * ct_dzs
        ct_lm = xm * ca * ct_dlu - xn * ca * ct_dlv
        # d(ang)/du = xm, d(ang)/dv = -xn; dca = -sa d(ang), dsa = ca d(ang)
        ct_ang = ct_sa * ca - ct_ca * sa
        ct_u = jnp.sum(ct_ang * xm, axis=1)
        ct_v = -jnp.sum(ct_ang * xn, axis=1)
        return ct_u, ct_v, ct_rm, ct_zm, ct_rms, ct_zms, ct_lm

    mode_sums.defvjp(fwd, bwd)
    return mode_sums
