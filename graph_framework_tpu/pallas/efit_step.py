"""VMEM-resident multi-substep Pallas kernel for frozen-window EFIT stepping.

The XLA frozen-window path (solver.py ``frozen_cells`` + ``freeze_every``)
already deletes the re-gathers inside a window, but every substep still
round-trips the 8 ray-state arrays (plus XLA's fusion temporaries) through
HBM: the best committed leg reports hbm utilization ~0.29 with ~1% VPU use
(BENCH_EFIT1M_r04).  Within a freeze window the right-hand side is
GATHER-FREE - the bicubic psi block and the fused profile block are in hand
- which is exactly the condition that made the Boris multi-step kernel
(pallas/boris.py) work: keep a ray block resident in VMEM and advance it
``freeze_every`` substeps per HBM round trip.

Structure per window:

  1. XLA gathers the frozen blocks at the window's base state
     (``EfitEquilibrium.freeze_cells`` - one bicubic block + one profile
     block per ray, the same freeze the XLA path uses, so the numerics
     are identical by construction);
  2. the blocks are laid out coefficient-leading - (16, rows, 128) - so
     each coefficient is a full VPU tile (a trailing 16-wide axis would
     pad 16 -> 128 lanes and waste 8x VMEM);
  3. one ``pallas_call`` advances the whole window: the kernel rebuilds
     the ray RHS with ``make_ray_rhs`` against a frozen view that reads
     the resident coefficients, and loops the rk2/rk4 stepper (optionally
     under the compensated double-word accumulator) ``freeze_every``
     times in VMEM.

HBM traffic per ray per window drops to one state read + write plus the
frozen blocks (~(2*8 + 2*16 + 3) * 4 B amortized over K substeps) versus
one state round trip per substep for the XLA path.

Reference analogue: the single fused "solver_kernel" launched per step
(cuda_context.hpp:524-529) - but fused across SUBSTEPS, which the
reference never does (its kernel is one substep; the host loops).

The dispersion algebra inside the kernel is the very same Python the XLA
path traces (models/rays.make_ray_rhs, models/dispersion.*,
ops/integrators.*, ops/compensated.*) - only the equilibrium view and the
launch mechanics differ; parity is pinned by tests/test_pallas_efit_step.

REVERSE MODE: the non-compensated window carries a ``jax.custom_vjp``
whose backward is itself a VMEM-resident kernel (``_window_bwd_kernel``:
in-kernel checkpointed recompute + per-substep ``jax.vjp``), so
``jax.grad`` through whole traces runs at kernel speed - 495.7M fwd+bwd
ray-steps/s full duration vs 36.2M for the best XLA remat path
(BENCH_GRAD_r05).  ``table_grads=True`` additionally threads the spline
tables through the custom_vjp and scatter-adds the backward kernel's
per-ray block cotangents into them (``_window_bwd_tab_kernel``;
config5's table gradients at 77.75M, 5.1x the XLA path).  The reference
has no reverse-mode capability (its symbolic ``df`` differentiates the
step expression, not the trace).
"""

from __future__ import annotations

import functools
from typing import Callable

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from graph_framework_tpu.models.equilibrium import PlasmaQuantities
from graph_framework_tpu.models.rays import RayState, make_ray_rhs
from graph_framework_tpu.ops.integrators import STEPPERS, INCREMENTS
from graph_framework_tpu.ops.compensated import (
    CompCarry, compensated_stepper)

LANES = 128


class _FrozenView:
    """Equilibrium view over VMEM-resident frozen coefficient tiles.

    Same narrowed contract and algebra as ``models.efit.FrozenCellEfit``
    (cell-local polynomial evaluation against the window-base blocks,
    stages may extrapolate slightly past the cell), but the 16 bicubic and
    16 profile coefficients arrive as separate (rows, 128) arrays - the
    coefficient-leading unrolled form a Mosaic kernel wants - instead of a
    trailing (..., 16) block axis.
    """

    def __init__(self, psi, prof, iu, jv, pidx, base):
        self.psi = psi          # list of 16 (rows, lanes): [a * 4 + b]
        self.prof = prof        # list of 16 (rows, lanes): [p * 4 + k]
        self.iu = iu
        self.jv = jv
        self.pidx = pidx
        self.base = base        # EfitEquilibrium (static scalars only)

    # -- protocol bits make_ray_rhs / dispersion need ---------------------
    @property
    def ion_masses(self):
        return self.base.ion_masses

    @property
    def ion_charges(self):
        return self.base.ion_charges

    @property
    def num_ion_species(self):
        return len(self.base.ion_masses)

    def is_cartesian(self):
        return True

    def supports_batched(self):
        return True

    def bind_point(self, pos):
        return self

    def kvec(self, kcov, pos):
        return kcov

    def plasma_quantities(self, pos):
        """FrozenCellEfit.plasma_quantities with the coefficient axis
        unrolled (models/efit.py:294; bicubic jet = ops/spline.py
        eval_bicubic_jet_block, profiles = eval_cubic_multi_block)."""
        base = self.base
        c = self.psi
        x, y, z = pos[0], pos[1], pos[2]
        r = jnp.sqrt(x * x + y * y)
        u = (r - base.rmin) / base.dr - self.iu
        v = (z - base.zmin) / base.dz - self.jv

        # cubic in v per u-power row, then cubic (and its derivative) in u
        ca = [c[4 * a + 0] + v * (c[4 * a + 1]
              + v * (c[4 * a + 2] + v * c[4 * a + 3])) for a in range(4)]
        cb = [c[4 * a + 1] + v * (2.0 * c[4 * a + 2]
              + 3.0 * v * c[4 * a + 3]) for a in range(4)]
        psi_val = ca[0] + u * (ca[1] + u * (ca[2] + u * ca[3]))
        dpsi_dr = (ca[1] + u * (2.0 * ca[2] + 3.0 * u * ca[3])) / base.dr
        dpsi_dz = (cb[0] + u * (cb[1] + u * (cb[2] + u * cb[3]))) / base.dz

        p = self.prof
        up = (psi_val - base.psimin) / base.dpsi - self.pidx
        vals = [p[4 * k + 0] + up * (p[4 * k + 1]
                + up * (p[4 * k + 2] + up * p[4 * k + 3]))
                for k in range(4)]
        ne = base.ne_scale * vals[0]
        te = base.te_scale * vals[1]
        pres = base.pres_scale * vals[2]
        fpol = vals[3]

        br = dpsi_dz / r
        bp = fpol / r
        bz = -dpsi_dr / r
        cr, sr = x / r, y / r      # algebraic rotation (models/efit.py)
        b = jnp.stack([br * cr - bp * sr, br * sr + bp * cr, bz])

        q = 1.60218e-19            # reference's rounded q + ni=te quirk
        ni = te
        ti = (pres - ne * te * q) / (ni * q)
        return PlasmaQuantities(b=b, ne=ne, te=te, ni=(ni,), ti=(ti,))


def _window_kernel(*refs, dispersion, method, dt, steps, base, compensated):
    """Advance one ray block ``steps`` substeps against resident frozen
    coefficients.  Ref order: state (8 or 16 with compensated lo words),
    psi (16, rows, lanes), prof (16, rows, lanes), iu, jv, pidx, then the
    matching state outputs."""
    ns = 16 if compensated else 8
    state_refs = refs[:ns]
    psi_ref, prof_ref = refs[ns], refs[ns + 1]
    iu_ref, jv_ref, pidx_ref = refs[ns + 2], refs[ns + 3], refs[ns + 4]
    out_refs = refs[ns + 5:]

    view = _FrozenView(
        psi=[psi_ref[i] for i in range(16)],
        prof=[prof_ref[i] for i in range(16)],
        iu=iu_ref[...], jv=jv_ref[...], pidx=pidx_ref[...], base=base)
    rhs = make_ray_rhs(dispersion, view, holomorphic=False)

    # The substep loop is UNROLLED: steps = freeze_every <= sub_steps is
    # small by construction (10 in the production stack), and a
    # fori_loop here carries an i64 counter under jax_enable_x64 (the
    # bench's f64 leg flips it globally) that Mosaic cannot lower
    # ("failed to legalize 'func.return'" on (i32, i64) - explicit i32
    # bounds did not stick either).
    if compensated:
        cstep = compensated_stepper(
            lambda s: INCREMENTS[method](rhs, s, dt))
        carry = CompCarry(
            RayState(*[r[...] for r in state_refs[:8]]),
            RayState(*[r[...] for r in state_refs[8:]]))
        for _ in range(steps):
            carry = cstep(carry)
        for r, v in zip(out_refs, tuple(carry.hi) + tuple(carry.lo)):
            r[...] = v
    else:
        stepper = STEPPERS[method]
        st = RayState(*[r[...] for r in state_refs])
        for _ in range(steps):
            st = stepper(rhs, st, dt)
        for r, v in zip(out_refs, st):
            r[...] = v


def _depad_call(fn, args):
    """Evaluate ``fn(args)`` with every negative-padding ``lax.pad``
    rewritten to the equivalent ``lax.slice``.

    jax's transpose rule for ``pad`` emits pads with NEGATED
    padding_config (a slice in pad clothing); Mosaic's pad lowering
    requires positive sizes and fails on them ("vector types must have
    positive constant sizes").  The double transpose in the backward
    window kernel (transpose of the positive pads that are themselves
    transposes of the RHS's component slices) hits exactly this.  The
    forward kernel's positive pads and plain slices lower fine, so the
    rewrite restores the representation Mosaic accepts without changing
    a single value.

    The traced computation is first-order (no call/scan primitives -
    asserted), so a flat jaxpr walk suffices.
    """
    closed = jax.make_jaxpr(fn)(
        *[jax.ShapeDtypeStruct(a.shape, a.dtype) for a in args])
    env = {}

    def read(v):
        return v.val if hasattr(v, "val") else env[v]

    jaxpr = closed.jaxpr
    for v, c in zip(jaxpr.constvars, closed.consts):
        env[v] = c
    for v, a in zip(jaxpr.invars, args):
        env[v] = a
    for eqn in jaxpr.eqns:
        assert not any(hasattr(p, "jaxpr") for p in eqn.params.values()), (
            "nested jaxpr inside the window-backward trace; extend "
            "_depad_call to recurse")
        invals = [read(v) for v in eqn.invars]
        prim = eqn.primitive
        if prim.name == "pad":
            cfg = eqn.params["padding_config"]
            if (all(i == 0 for _, _, i in cfg)
                    and any(lo < 0 or hi < 0 for lo, hi, _ in cfg)):
                op, pv = invals
                out = jax.lax.slice(
                    op,
                    [max(0, -lo) for lo, _, _ in cfg],
                    [d + min(0, hi)
                     for d, (_, hi, _) in zip(op.shape, cfg)])
                pos = [(max(0, lo), max(0, hi), 0) for lo, hi, _ in cfg]
                if any(lo or hi for lo, hi, _ in pos):
                    out = jax.lax.pad(out, pv, pos)
                env[eqn.outvars[0]] = out
                continue
        outs = prim.bind(*invals, **eqn.params)
        if prim.multiple_results:
            for v, o in zip(eqn.outvars, outs):
                env[v] = o
        else:
            env[eqn.outvars[0]] = outs
    return tuple(read(v) for v in jaxpr.outvars)


def _window_bwd_kernel(*refs, dispersion, method, dt, steps, base):
    """Reverse-mode companion of ``_window_kernel``: pull the window-output
    cotangent back to the window-input cotangent entirely in VMEM.

    In-kernel checkpointed transpose: a forward sweep re-advances the block
    storing each substep's INPUT state (10 x 8 tiles live for the
    production window - the coefficients are already resident), then the
    reverse sweep applies ``jax.vjp`` of ONE substep at a time, so the live
    residual set is one substep's linearization rather than the whole
    window's.  This is the XLA remat_substeps structure (solver.py) moved
    inside the kernel: the backward never round-trips HBM between substeps.

    Ref order: state-in (8), psi (16, rows, lanes), prof (16, rows, lanes),
    iu, jv, pidx, cotangent (8), then the 8 d_state outputs.

    The frozen blocks/indices are treated as constants (zero cotangent):
    their only dependence on the window-base state is through the integer
    cell indices, whose derivative is zero a.e. - exactly what the XLA
    frozen path's transpose produces through the gather (floor has zero
    gradient), so the two backward paths agree (tests/test_gradients.py).
    """
    state_refs = refs[:8]
    psi_ref, prof_ref = refs[8], refs[9]
    iu_ref, jv_ref, pidx_ref = refs[10], refs[11], refs[12]
    ct_refs = refs[13:21]
    out_refs = refs[21:]

    def pure_bwd(*args):
        st0 = args[:8]
        psi, prof = args[8:24], args[24:40]
        iu, jv, pidx = args[40:43]
        ct0 = args[43:51]
        view = _FrozenView(psi=list(psi), prof=list(prof),
                           iu=iu, jv=jv, pidx=pidx, base=base)
        rhs = make_ray_rhs(dispersion, view, holomorphic=False)
        stepper = STEPPERS[method]

        def substep(leaves):
            return tuple(stepper(rhs, RayState(*leaves), dt))

        sts = [st0]
        for _ in range(steps - 1):
            sts.append(substep(sts[-1]))
        ct = ct0
        for s_in in reversed(sts):
            _, vjp = jax.vjp(substep, s_in)
            (ct,) = vjp(ct)
        return ct

    args = (tuple(r[...] for r in state_refs)
            + tuple(psi_ref[i] for i in range(16))
            + tuple(prof_ref[i] for i in range(16))
            + (iu_ref[...], jv_ref[...], pidx_ref[...])
            + tuple(r[...] for r in ct_refs))
    for r, v in zip(out_refs, _depad_call(pure_bwd, args)):
        r[...] = v


def _window_bwd_tab_kernel(*refs, dispersion, method, dt, steps, base):
    """``_window_bwd_kernel`` with TABLE cotangents: additionally pulls the
    output cotangent back onto the frozen coefficient blocks (32 extra
    output tiles), accumulated across the window's substeps in VMEM.  The
    caller scatters them into the global spline tables via the transpose
    of the freeze gather (config5's grads of absorbed power w.r.t. the
    psi tables; the bicubic/profile values are linear in their blocks, so
    the block cotangent is exact - same contract as the XLA frozen path,
    tests/test_gradients.py)."""
    state_refs = refs[:8]
    psi_ref, prof_ref = refs[8], refs[9]
    iu_ref, jv_ref, pidx_ref = refs[10], refs[11], refs[12]
    ct_refs = refs[13:21]
    out_refs = refs[21:29]
    dpsi_ref, dprof_ref = refs[29], refs[30]

    def pure_bwd(*args):
        st0 = args[:8]
        psi, prof = args[8:24], args[24:40]
        iu, jv, pidx = args[40:43]
        ct0 = args[43:51]

        def substep(leaves, psi_l, prof_l):
            view = _FrozenView(psi=list(psi_l), prof=list(prof_l),
                               iu=iu, jv=jv, pidx=pidx, base=base)
            rhs = make_ray_rhs(dispersion, view, holomorphic=False)
            return tuple(STEPPERS[method](rhs, RayState(*leaves), dt))

        sts = [st0]
        for _ in range(steps - 1):
            sts.append(substep(sts[-1], psi, prof))
        ct, dpsi, dprof = ct0, None, None
        for s_in in reversed(sts):
            _, vjp = jax.vjp(substep, s_in, psi, prof)
            ct, dp, dq = vjp(ct)
            dpsi = dp if dpsi is None else tuple(
                a + b for a, b in zip(dpsi, dp))
            dprof = dq if dprof is None else tuple(
                a + b for a, b in zip(dprof, dq))
        return ct + dpsi + dprof

    args = (tuple(r[...] for r in state_refs)
            + tuple(psi_ref[i] for i in range(16))
            + tuple(prof_ref[i] for i in range(16))
            + (iu_ref[...], jv_ref[...], pidx_ref[...])
            + tuple(r[...] for r in ct_refs))
    outs = _depad_call(pure_bwd, args)
    for r, v in zip(out_refs, outs[:8]):
        r[...] = v
    for i in range(16):
        dpsi_ref[i] = outs[8 + i]
        dprof_ref[i] = outs[24 + i]


def make_frozen_window_step(eq, dispersion: Callable, *, method="rk2",
                            dt, sub_steps, freeze_every, block_rows=8,
                            compensated=False, interpret=False,
                            table_grads=False):
    """Build the recorded-step function ``carry -> carry`` (sub_steps
    integrator substeps as ``sub_steps // freeze_every`` windows, each one
    freeze gather + one multi-substep kernel launch).

    ``carry`` is a flat (N,) RayState (or CompCarry of two) with N a
    multiple of ``block_rows * 128``.  Drop-in replacement for the XLA
    ``Solver(frozen_cells=True, freeze_every=K)`` step - the freeze
    semantics (window-base gather, in-window extrapolation contract) are
    identical; see models/efit.FrozenCellEfit for the error bound.
    """
    if method not in ("rk2", "rk4"):
        raise ValueError("frozen window kernel supports rk2/rk4 only")
    if table_grads and compensated:
        raise ValueError("table_grads needs the differentiable "
                         "(non-compensated) window step")
    if sub_steps % freeze_every:
        raise ValueError(f"freeze_every={freeze_every} must divide "
                         f"sub_steps={sub_steps}")
    if jax.config.jax_enable_x64 and not interpret:
        # measured on this backend: Mosaic fails to legalize even a
        # trivial pallas_call under jax_enable_x64 ("failed to legalize
        # 'func.return'" on (i32, i64) - the x64-traced index types);
        # the kernel itself is f32-only anyway.
        raise ValueError(
            "pallas_window cannot compile with jax_enable_x64 on this "
            "backend (Mosaic i64 legalization); run the window kernel "
            "in an x64-disabled context (the production default) or "
            "use the XLA frozen path for f64")
    windows = sub_steps // freeze_every

    kernel = functools.partial(
        _window_kernel, dispersion=dispersion, method=method, dt=dt,
        steps=freeze_every, base=eq, compensated=compensated)
    bwd_kernel = functools.partial(
        _window_bwd_kernel, dispersion=dispersion, method=method, dt=dt,
        steps=freeze_every, base=eq)

    def _rows_of(n):
        if n % (block_rows * LANES):
            raise ValueError(
                f"num_rays={n} must be a multiple of "
                f"block_rows*{LANES}={block_rows * LANES} "
                "(pad the ensemble; see pad_rays)")
        return n // LANES

    def _tiles(hi, n, rows, psi_table=None, prof_table=None):
        """One window-base freeze gather, reshaped to kernel tiles:
        coefficient-leading (16, rows, lanes) blocks + index planes.
        Explicit ``psi_table``/``prof_table`` substitute the equilibrium's
        tables (the table_grads path differentiates through this gather:
        its vjp is the scatter-add onto the global tables)."""
        eq_ = eq
        if psi_table is not None:
            import dataclasses
            eq_ = dataclasses.replace(eq, psi_coeffs=psi_table,
                                      profile_coeffs=prof_table)
        feq = eq_.freeze_cells(jnp.stack([hi.x, hi.y, hi.z]))
        psi = feq.psi_block.T.reshape(16, rows, LANES)
        prof = feq.prof_block.reshape(n, 16).T.reshape(16, rows, LANES)
        iu = feq.iu.reshape(rows, LANES)
        jv = feq.jv.reshape(rows, LANES)
        pidx = feq.pidx.reshape(rows, LANES)
        return psi, prof, iu, jv, pidx

    spec = pl.BlockSpec((block_rows, LANES), lambda i: (i, 0))
    cspec = pl.BlockSpec((16, block_rows, LANES), lambda i: (0, i, 0))

    def _fwd_impl(leaves, psi_table=None, prof_table=None):
        """Gather + forward window kernel over flat (n,) leaves."""
        n = leaves[0].shape[0]
        rows = _rows_of(n)
        hi = RayState(*leaves[:8])
        tiles = _tiles(hi, n, rows, psi_table, prof_table)
        shaped = [a.reshape(rows, LANES) for a in leaves]
        ns = len(shaped)
        outs = pl.pallas_call(
            kernel,
            grid=(rows // block_rows,),
            in_specs=[spec] * ns + [cspec, cspec] + [spec] * 3,
            out_specs=[spec] * ns,
            out_shape=[jax.ShapeDtypeStruct((rows, LANES),
                                            hi.x.dtype)] * ns,
            interpret=interpret,
        )(*shaped, *tiles)
        return tuple(o.reshape(n) for o in outs)

    # -- reverse mode: custom_vjp whose backward is itself a VMEM-resident
    # kernel (in-kernel checkpointed recompute + per-substep transpose).
    # Residuals are the window INPUTS only - the backward re-freezes from
    # them, so under the fwd+bwd trace the forward pallas_call in the
    # transpose sweep has no consumers and XLA dead-code-eliminates it.
    @jax.custom_vjp
    def window8(*leaves):
        return _fwd_impl(leaves)

    def window8_fwd(*leaves):
        return _fwd_impl(leaves), leaves

    def window8_bwd(leaves, cts):
        n = leaves[0].shape[0]
        rows = _rows_of(n)
        hi = RayState(*leaves)
        tiles = _tiles(hi, n, rows)
        shaped = [a.reshape(rows, LANES) for a in leaves]
        cshaped = [jnp.asarray(c, hi.x.dtype).reshape(rows, LANES)
                   for c in cts]
        # The rk4 backward's live set (K stored substep inputs + one
        # substep's vjp residuals) exceeds Mosaic's default 16 MiB scoped
        # VMEM budget at block_rows=8 (measured 28.4 MiB); the v5e has
        # far more physical VMEM, so raise the cap for the backward call.
        params = (None if interpret else
                  pltpu.CompilerParams(vmem_limit_bytes=100 * 2 ** 20))
        outs = pl.pallas_call(
            bwd_kernel,
            grid=(rows // block_rows,),
            in_specs=[spec] * 8 + [cspec, cspec] + [spec] * 3 + [spec] * 8,
            out_specs=[spec] * 8,
            out_shape=[jax.ShapeDtypeStruct((rows, LANES),
                                            hi.x.dtype)] * 8,
            interpret=interpret,
            compiler_params=params,
        )(*shaped, *tiles, *cshaped)
        return tuple(o.reshape(n) for o in outs)

    window8.defvjp(window8_fwd, window8_bwd)

    # -- table-gradient variant: the spline tables are explicit primal
    # inputs, so cotangents flow back onto them (config5: grads of
    # absorbed power w.r.t. the psi tables).  The backward kernel emits
    # per-ray BLOCK cotangents; the freeze gather's vjp (jax.vjp over
    # _tiles) scatter-adds them into the global tables.
    bwd_tab_kernel = functools.partial(
        _window_bwd_tab_kernel, dispersion=dispersion, method=method,
        dt=dt, steps=freeze_every, base=eq)

    @jax.custom_vjp
    def windowt(leaves, psi_table, prof_table):
        return _fwd_impl(list(leaves), psi_table, prof_table)

    def windowt_fwd(leaves, psi_table, prof_table):
        return (windowt(leaves, psi_table, prof_table),
                (leaves, psi_table, prof_table))

    def windowt_bwd(res, cts):
        leaves, psi_table, prof_table = res
        n = leaves[0].shape[0]
        rows = _rows_of(n)
        hi = RayState(*leaves)
        tiles, gather_vjp = jax.vjp(
            lambda pt, qt: _tiles(hi, n, rows, pt, qt),
            psi_table, prof_table)
        shaped = [a.reshape(rows, LANES) for a in leaves]
        cshaped = [jnp.asarray(c, hi.x.dtype).reshape(rows, LANES)
                   for c in cts]
        params = (None if interpret else
                  pltpu.CompilerParams(vmem_limit_bytes=100 * 2 ** 20))
        outs = pl.pallas_call(
            bwd_tab_kernel,
            grid=(rows // block_rows,),
            in_specs=[spec] * 8 + [cspec, cspec] + [spec] * 3 + [spec] * 8,
            out_specs=[spec] * 8 + [cspec, cspec],
            out_shape=([jax.ShapeDtypeStruct((rows, LANES),
                                             hi.x.dtype)] * 8
                       + [jax.ShapeDtypeStruct((16, rows, LANES),
                                               hi.x.dtype)] * 2),
            interpret=interpret,
            compiler_params=params,
        )(*shaped, *tiles, *cshaped)
        d_leaves = tuple(o.reshape(n) for o in outs[:8])
        # scatter the block cotangents into the tables (iu/jv/pidx carry
        # zero cotangent: frozen integer indices)
        zero = jnp.zeros((rows, LANES), hi.x.dtype)
        d_psi_table, d_prof_table = gather_vjp(
            (outs[8], outs[9], zero, zero, zero))
        return d_leaves, d_psi_table, d_prof_table

    windowt.defvjp(windowt_fwd, windowt_bwd)

    def window(carry):
        if compensated:
            # compensated stays forward-only: the TwoSum error extraction
            # is numerically meaningless to differentiate (its exact
            # transpose reconstructs the plain-rk gradient at 2x the cost)
            hi = carry.hi
            n = hi.x.shape[0]
            rows = _rows_of(n)
            leaves = list(hi) + list(carry.lo)
            flat = _fwd_impl(leaves)
            return CompCarry(RayState(*flat[:8]), RayState(*flat[8:]))
        if table_grads:
            return RayState(*windowt(tuple(carry), eq.psi_coeffs,
                                     eq.profile_coeffs))
        return RayState(*window8(*carry))

    def step(carry):
        if windows == 1:
            return window(carry)

        def body(c, _):
            return window(c), None

        c, _ = jax.lax.scan(body, carry, None, length=windows)
        return c

    return step


def pad_rays(state, block_rows=8):
    """Pad a flat RayState up to a multiple of ``block_rows * 128`` by
    repeating rays cyclically (gather-produced buffers - freshly allocated,
    avoiding the measured 30x pad-buffer slowdown of jnp.pad views on this
    backend).  Returns (padded_state, original_n)."""
    n = state.x.shape[0]
    unit = block_rows * LANES
    m = ((n + unit - 1) // unit) * unit
    if m == n:
        return state, n
    idx = jnp.arange(m) % n
    return jax.tree.map(lambda a: a[idx], state), n
