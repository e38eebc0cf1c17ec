"""Pallas kernel for the PIC grid deposit (density + E-field).

Replaces the XLA scan in models/pic.deposit with one fused kernel: a tile
of the grid stays resident in VMEM while particle blocks stream in via the
pallas pipeline, accumulating

    n[g] += sum_p exp(-(x_p - grid_g)^2 / w)
    e[g] += sum_p (2 te / (q w)) (x_p - grid_g)

(the reference's loop_item deposit, xpic.cpp:99-131, serialized these
through index_1D gathers; the dense (grid-tile x block) outer difference
maps onto the VPU directly).  The 2D launch grid keeps the (tile x block)
intermediates within the ~16 MB VMEM budget.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _kernel(x_ref, mask_ref, grid_ref, out_ref, *, width, te, q):
    pi = pl.program_id(1)                 # particle-block index

    @pl.when(pi == 0)
    def _init():
        out_ref[...] = jnp.zeros_like(out_ref)

    x = x_ref[...]                        # (1, BLOCK)
    m = mask_ref[...]
    grid = grid_ref[...]                  # (TILE, 1)
    dx = x - grid                         # (TILE, BLOCK)
    n = jnp.sum(jnp.exp(dx * dx / -width) * m, axis=1)
    e = jnp.sum((2.0 * te / (q * width)) * dx * m, axis=1)
    # output block is (8, TILE) for f32 sublane alignment; rows 0/1 carry
    # density and field, the rest are padding.
    out_ref[0, :] += n
    out_ref[1, :] += e


@functools.partial(jax.jit,
                   static_argnames=("block", "tile", "width", "te", "q",
                                    "interpret"))
def deposit_pallas(x, mask, grid, *, block=2048, tile=256, width=1.0e-4,
                   te=1.0, q=1.0, interpret=False):
    """Deposit particles ``x`` (with validity ``mask``) onto ``grid``.

    Returns (n, epara), each of shape (num_grid,).  ``x`` length must be a
    multiple of ``block`` and ``grid`` length a multiple of ``tile`` (pad
    with mask=0 / unused grid points).
    """
    num_grid = grid.shape[0]
    nblocks = x.shape[0] // block
    ntiles = num_grid // tile
    assert nblocks * block == x.shape[0], "pad particles to a block multiple"
    assert ntiles * tile == num_grid, "pad the grid to a tile multiple"

    out = pl.pallas_call(
        functools.partial(_kernel, width=width, te=te, q=q),
        grid=(ntiles, nblocks),
        in_specs=[
            pl.BlockSpec((1, block), lambda g, p: (0, p),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, block), lambda g, p: (0, p),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((tile, 1), lambda g, p: (g, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((8, tile), lambda g, p: (0, g),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((8, num_grid), x.dtype),
        interpret=interpret,
    )(x[None, :], mask[None, :], grid[:, None])
    return out[0], out[1]
