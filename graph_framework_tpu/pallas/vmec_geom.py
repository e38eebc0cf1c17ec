"""Fully-fused VMEC Fourier geometry kernel: fetch + Horner + trig + sums.

Round-2's mode-sum kernel (pallas/vmec_modes.py) lost in context because the
radial-cell fetch stayed OUTSIDE the pallas_call: the fetched coefficient
blocks round-tripped HBM across the kernel boundary (a fusion barrier),
costing more than the kernel saved.  This kernel moves the whole geometry
core inside:

    (s, u, v) per ray  ->  one-hot radial fetch (MXU dot, in VMEM)
                       ->  cell-local Horner (values + radial derivatives)
                       ->  per-mode trig
                       ->  ALL Fourier sums the geometry and its
                           derivatives consume

so the only HBM traffic per ray is 3 input floats and the summed outputs;
the (rays, num_modes) intermediates that dominate the XLA path's device
profile (~40% generic fusions + ~35% multiply-reduce fusions + ~10%
reshapes, tools/profile_vmec.py) never exist in HBM at all.

Differentiation design - one kernel per RHS
-------------------------------------------
The ray RHS is jax.grad of the dispersion THROUGH this geometry, so the
kernel must be reverse-differentiable w.r.t. (s, u, v).  vmec.nc has 198
radial cells, padding the one-hot contraction to K = 256: the MXU fetch is
the kernel's dominant cost, so a separate backward kernel (which would
refetch) doubles it.  Instead the kernel emits the geometry's full
second-order jet - the 10 consumed outputs plus the 17 unique second
partial sums (Hessian symmetry) - and the wrapper exposes it via
``jax.custom_jvp`` whose tangent map is LINEAR in the tangents with
jet-valued coefficients.  JAX transposes that linear map automatically for
reverse mode, so forward AND backward of the geometry cost exactly ONE
kernel launch (one fetch) per RHS; the 30-multiply tangent/cotangent
combination runs as trivially-fused XLA.

Scope (documented narrowing vs the plain-XLA path):
  * f32, batched (rays,) coordinates, cell-local tables only (the TPU
    production trace path);
  * spline TABLES are captured as constants - gradients w.r.t. the
    Fourier coefficients require make_vmec(fused_mode_sums=False);
  * first-order AD only (jvp or vjp; all the forward trace needs - the
    RHS is one jax.grad and nothing differentiates through the RHS
    again).  Grad-of-grad raises on the jet kernel by construction.

Mode/table layout: modes padded to MODES_PAD = 128 lanes (padded modes
have zero coefficients and xm = xn = 0, contributing exactly zero to
every sum); radial tables CUT to the last CELLS_PAD = 128 cells - one
MXU tile of contraction depth (for vmec.nc: s >= -0.293, bit-identical
to the full table there; a ray dipping below the cut would clamp to the
cut edge instead of the true table edge - see the domain-cut comment in
``pack_tables`` and ``fused_geometry_jet``'s debug-mode guard); the
full-grid table packs [rmnc | zmns] per Horner coefficient row so slice
boundaries stay 128-lane aligned.

Reference: equilibrium.hpp:1958-2140 (the symbolic-df geometry this
replaces); piecewise.hpp:26-60 (index clamp semantics, replicated).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

MODES_PAD = 128
CELLS_PAD = 128
NUM_OUT = 27          # 10 first-order + 17 unique second-order sums
OUT_COLS = 40         # 10 values + 30 jvp-ordered partial duplicates
OUT_PAD = 48


def _radial(s, smin, ds, ns):
    """Clamped cell index + cell-local coordinate (piecewise.hpp:26-60:
    normalize, clamp as float to [0, ns-1], truncate; the cell-local u
    keeps the unclamped offset so d(u)/ds = 1/ds everywhere)."""
    un = (s - smin) / ds
    idx = jnp.clip(un, 0.0, float(ns - 1)).astype(jnp.int32)
    return idx, un - idx.astype(un.dtype)


def _jet_sums(s, u, v, fetch_rz, fetch_lm, xm, xn, geom):
    """The 27 jet sums, shared by the Pallas kernel and the pure-JAX
    reference (``fetch_rz``/``fetch_lm`` abstract the radial block
    fetches).

    s, u, v: (B, 1); xm, xn: (1, M); returns list of 27 (B,) arrays.
    """
    smin_f, ds_f, ns_f, smin_h, ds_h, ns_h = geom

    idx_f, ul_f = _radial(s, smin_f, ds_f, ns_f)
    blk = fetch_rz(idx_f)                                # (B, 4*2M)
    w2 = 2 * MODES_PAD
    c0, c1 = blk[:, :w2], blk[:, w2:2 * w2]
    c2, c3 = blk[:, 2 * w2:3 * w2], blk[:, 3 * w2:]
    val = c0 + ul_f * (c1 + ul_f * (c2 + ul_f * c3))
    dval = (c1 + ul_f * (2.0 * c2 + 3.0 * ul_f * c3)) / ds_f
    d2val = (2.0 * c2 + 6.0 * ul_f * c3) / (ds_f * ds_f)
    rm, zm = val[:, :MODES_PAD], val[:, MODES_PAD:]
    rms, zms = dval[:, :MODES_PAD], dval[:, MODES_PAD:]
    rmss, zmss = d2val[:, :MODES_PAD], d2val[:, MODES_PAD:]

    idx_h, ul_h = _radial(s, smin_h, ds_h, ns_h)
    blk_h = fetch_lm(idx_h)                              # (B, 4*M)
    w1 = MODES_PAD
    l0, l1 = blk_h[:, :w1], blk_h[:, w1:2 * w1]
    l2, l3 = blk_h[:, 2 * w1:3 * w1], blk_h[:, 3 * w1:]
    lm = l0 + ul_h * (l1 + ul_h * (l2 + ul_h * l3))
    lms = (l1 + ul_h * (2.0 * l2 + 3.0 * ul_h * l3)) / ds_h

    ang = u * xm - v * xn
    # Cody-Waite range reduction before the hardware trig: |ang| reaches
    # ~90 here (mode number x unwrapped angle) and TPU cos/sin range
    # reduction at such arguments costs ~|ang| * eps ~ 5e-6 of phase -
    # the dominant per-eval noise of the fused path (measured against an
    # f64 referee, NOTES_r3).  Two-constant 2*pi keeps the wrap exact to
    # ~1e-7 * k; three cheap VPU ops per element.
    two_pi_hi = jnp.float32(6.2831855)        # f32(2 pi)
    two_pi_lo = jnp.float32(-1.7484555e-07)   # 2 pi - f32(2 pi)
    k = jnp.round(ang * jnp.float32(0.15915494))     # ang / (2 pi)
    ang = (ang - k * two_pi_hi) - k * two_pi_lo
    ca = jnp.cos(ang)
    sa = jnp.sin(ang)

    def sm(t):
        return jnp.sum(t, axis=1)

    rm_sa, rm_ca = rm * sa, rm * ca
    zm_sa, zm_ca = zm * sa, zm * ca
    lm_sa, lm_ca = lm * sa, lm * ca
    rms_sa, zms_ca = rms * sa, zms * ca
    return [
        sm(rm_ca),                 # 0  r
        sm(zm_sa),                 # 1  z
        sm(rms * ca),              # 2  drs
        -sm(xm * rm_sa),           # 3  dru
        sm(xn * rm_sa),            # 4  drv
        sm(zms * sa),              # 5  dzs
        sm(xm * zm_ca),            # 6  dzu
        -sm(xn * zm_ca),           # 7  dzv
        sm(xm * lm_ca),            # 8  dlu
        -sm(xn * lm_ca),           # 9  dlv
        sm(rmss * ca),             # 10 drss
        -sm(xm * rms_sa),          # 11 drsu (= d(dru)/ds)
        sm(xn * rms_sa),           # 12 drsv (= d(drv)/ds)
        -sm(xm * xm * rm_ca),      # 13 druu
        sm(xm * xn * rm_ca),       # 14 druv (= d(drv)/du)
        -sm(xn * xn * rm_ca),      # 15 drvv
        sm(zmss * sa),             # 16 dzss
        sm(xm * zms_ca),           # 17 dzsu
        -sm(xn * zms_ca),          # 18 dzsv
        -sm(xm * xm * zm_sa),      # 19 dzuu
        sm(xm * xn * zm_sa),       # 20 dzuv
        -sm(xn * xn * zm_sa),      # 21 dzvv
        sm(xm * lms * ca),         # 22 dlus
        -sm(xn * lms * ca),        # 23 dlvs
        -sm(xm * xm * lm_sa),      # 24 dluu
        sm(xm * xn * lm_sa),       # 25 dluv
        -sm(xn * xn * lm_sa),      # 26 dlvv
    ]


def _jet_kernel(s_ref, u_ref, v_ref, *refs, geom, words):
    (rz_refs, lm_refs, xm_ref, xn_ref, out_ref) = (
        refs[:words], refs[words:2 * words], refs[-3], refs[-2], refs[-1])
    lanes = jax.lax.broadcasted_iota(jnp.int32, (1, CELLS_PAD), 1)

    def make_fetch(refs):
        # Exact selection at 3 MXU passes: one-hot rows have a single
        # 1.0 (exact in bf16) and the f32 tables are pre-split into
        # three bf16 words (_split3) whose selected values re-sum to the
        # f32 value to ~2^-23 relative.  Mosaic supports only DEFAULT
        # (1 bf16 pass) and HIGHEST (6 passes) dot precisions; HIGHEST
        # measured 1.7 ms of the 2.9 ms kernel call, so the hand-rolled
        # 3-pass split is the precision/throughput sweet spot.
        def fetch(idx):
            onehot = (idx == lanes).astype(jnp.bfloat16)
            return sum(
                jnp.dot(onehot, r[...],
                        preferred_element_type=jnp.float32)
                for r in refs)
        return fetch

    sums = _jet_sums(s_ref[...], u_ref[...], v_ref[...],
                     make_fetch(rz_refs), make_fetch(lm_refs),
                     xm_ref[...], xn_ref[...], geom)
    cols = _to_cols(sums)
    out_ref[...] = jnp.stack(
        cols + [jnp.zeros_like(cols[0])] * (OUT_PAD - OUT_COLS), axis=-1)


def _split_bf16(t, words):
    """Split an f32 table into ``words`` bf16 words summing back to
    ~8*words mantissa bits (3 words ~ f32; 4 words removes the residual
    splitting bias entirely)."""
    out = []
    rem = t
    for _ in range(words):
        w = rem.astype(jnp.bfloat16)
        out.append(w)
        rem = rem - w.astype(jnp.float32)
    return tuple(out)


def _reference_jet(s, u, v, rz, lmt, xm, xn, geom):
    """Pure-JAX jet with identical semantics (CPU fallback and the
    autodiff reference the kernel is tested against)."""
    return _jet_sums(s[:, None], u[:, None], v[:, None],
                     lambda idx: rz[idx[:, 0]],
                     lambda idx: lmt[idx[:, 0]],
                     xm[None, :], xn[None, :], geom)


def _pad_tables(eq):
    """Build the padded, kernel-layout tables from the eq's grid tables.

    Runs on concrete eq attributes (trace-time constants; XLA folds the
    result into the executable, exactly like the existing grid scatter).
    """
    rmnc = eq._grid_table(eq.rmnc_coeffs)        # (ns_f, 4, G)
    zmns = eq._grid_table(eq.zmns_coeffs)
    lmns = eq._grid_table(eq.lmns_coeffs)        # (ns_h, 4, G)
    ns_f, _, g = rmnc.shape
    ns_h = lmns.shape[0]
    if g > MODES_PAD:
        raise ValueError(
            f"fused VMEC geometry supports <= {MODES_PAD} grid modes "
            f"(got {g}); use fused_mode_sums=False")

    # Radial-domain cut: vmec.nc tables span s in [-1, 1] (198 cells) but
    # the physical flux label satisfies s >= 0 with only shallow negative
    # transients near the axis, so the fused path keeps the LAST
    # CELLS_PAD cells - one MXU tile of contraction depth instead of two.
    # For vmec.nc that is s in [-0.293, 1]: inside it (and above, where
    # both clamp to the same last cell) the kernel is bit-identical to
    # the full table; only s < -0.293 (deep axis crossing, unreachable in
    # every parity/bench configuration) would clamp differently.
    cut_f = max(0, ns_f - CELLS_PAD)
    cut_h = max(0, ns_h - CELLS_PAD)
    rmnc, zmns = rmnc[cut_f:], zmns[cut_f:]
    lmns = lmns[cut_h:]
    ns_f -= cut_f
    ns_h -= cut_h

    def padm(t):                                  # pad the mode axis
        return jnp.pad(t, ((0, 0), (0, 0), (0, MODES_PAD - g)))

    # coefficient-major flat layout: row cell -> [c0 | c1 | c2 | c3], each
    # [rmnc-modes | zmns-modes], so every kernel slice is 128-lane aligned
    rz = jnp.concatenate([padm(rmnc), padm(zmns)], axis=-1)
    rz = jnp.pad(rz, ((0, CELLS_PAD - ns_f), (0, 0), (0, 0)))
    rz = rz.reshape(CELLS_PAD, 4 * 2 * MODES_PAD)
    lmt = jnp.pad(padm(lmns), ((0, CELLS_PAD - ns_h), (0, 0), (0, 0)))
    lmt = lmt.reshape(CELLS_PAD, 4 * MODES_PAD)

    def padv(x):
        return jnp.pad(x.astype(jnp.float32), (0, MODES_PAD - g))

    return (rz.astype(jnp.float32), lmt.astype(jnp.float32),
            padv(eq.xm_grid), padv(eq.xn_grid), ns_f, ns_h, cut_f, cut_h)


# jvp coefficient table: output o's tangent = jet[J[o][0]] * ts
# + jet[J[o][1]] * tu + jet[J[o][2]] * tv  (Hessian symmetry gives the
# off-diagonal reuse; every entry and sign is checked against plain JAX
# autodiff of the reference jet by tests/test_pallas_vmec_geom.py).
_JVP_IDX = [
    (2, 3, 4),      # r
    (5, 6, 7),      # z
    (10, 11, 12),   # drs
    (11, 13, 14),   # dru
    (12, 14, 15),   # drv
    (16, 17, 18),   # dzs
    (17, 19, 20),   # dzu
    (18, 20, 21),   # dzv
    (22, 24, 25),   # dlu
    (23, 25, 26),   # dlv
]


def _to_cols(sums):
    """Order the 27 unique jet sums into the 40-column kernel layout:
    columns 0..9 the outputs, columns 10..39 the Jacobian in
    (output-major, (s,u,v)-minor) order - so the jvp/transpose below is
    ONE fused multiply-reduce over a (n, 10, 3) view instead of 27
    strided column extractions (measured: the column slicing cost ~23%
    of the fused substep before this layout)."""
    return [sums[i] for i in range(10)] + [
        sums[j] for idx in _JVP_IDX for j in idx]


def make_fused_geometry(eq, *, block=512, interpret=False,
                        use_pallas=True, split_words=3):
    """Build the custom-jvp fused geometry for one VMEC equilibrium.

    Returns ``f(s, u, v) -> (r, z, drs, dru, drv, dzs, dzu, dzv, dlu,
    dlv)`` over (rays,) f32 coordinates, differentiable once (forward or
    reverse) with the jet-linear tangent map described in the module
    docstring.  ``interpret=True`` runs the kernel in Pallas interpret
    mode (CPU testing); ``use_pallas=False`` keeps the pure-JAX jet with
    the same custom-jvp structure (timing comparisons).
    """
    rz, lmt, xm, xn, ns_f, ns_h, cut_f, cut_h = _pad_tables(eq)
    geom = (float(eq.sminf + cut_f * eq.ds), float(eq.ds), ns_f,
            float(eq.sminh + cut_h * eq.ds), float(eq.ds), ns_h)
    # the kernel consumes the bf16 splits; the reference path uses
    # their exact re-sum so both paths see the same effective tables
    rz3 = _split_bf16(rz, split_words)
    lm3 = _split_bf16(lmt, split_words)
    rz_eff = sum(t.astype(jnp.float32) for t in rz3)
    lm_eff = sum(t.astype(jnp.float32) for t in lm3)

    def jet(s, u, v):
        """(n, OUT_COLS) jet columns (see _to_cols)."""
        if not use_pallas:
            return jnp.stack(
                _to_cols(_reference_jet(s, u, v, rz_eff, lm_eff, xm, xn,
                                        geom)),
                axis=-1)
        n = s.shape[0]
        pad = (-n) % block
        if pad:
            s, u, v = (jnp.pad(a, (0, pad)) for a in (s, u, v))
        ray_spec = pl.BlockSpec((block, 1), lambda i: (i, 0))
        rz_spec = pl.BlockSpec((CELLS_PAD, 4 * 2 * MODES_PAD),
                               lambda i: (0, 0))
        lm_spec = pl.BlockSpec((CELLS_PAD, 4 * MODES_PAD),
                               lambda i: (0, 0))
        mode_spec = pl.BlockSpec((1, MODES_PAD), lambda i: (0, 0))
        out = pl.pallas_call(
            functools.partial(_jet_kernel, geom=geom, words=split_words),
            grid=((n + pad) // block,),
            in_specs=[ray_spec, ray_spec, ray_spec]
                     + [rz_spec] * split_words + [lm_spec] * split_words
                     + [mode_spec, mode_spec],
            out_specs=pl.BlockSpec((block, OUT_PAD), lambda i: (i, 0)),
            out_shape=jax.ShapeDtypeStruct((n + pad, OUT_PAD),
                                           jnp.float32),
            interpret=interpret,
        )(s[:, None], u[:, None], v[:, None], *rz3, *lm3,
          xm[None, :], xn[None, :])
        return out[:n, :OUT_COLS]

    def guard(s):
        """Debug-mode domain guard for the radial cut: below the cut the
        kernel clamps to the CUT edge, not the true table edge, and
        silently extrapolates from the wrong cell.  Under utils.set_debug
        a dipping ray raises a located checkify error (through
        checked_jit's user_checks) instead."""
        from graph_framework_tpu.utils import debug_enabled
        if debug_enabled() and (cut_f or cut_h):
            from jax.experimental import checkify
            checkify.check(
                jnp.all(s >= geom[0]),
                "VMEC fused-geometry radial coordinate below the "
                "CELLS_PAD table cut: extrapolating from the wrong cell "
                "(rebuild with use_pallas=False for the full table)")

    @jax.custom_jvp
    def fused(s, u, v):
        guard(s)
        out = jet(s, u, v)
        return tuple(out[:, i] for i in range(10))

    @fused.defjvp
    def fused_jvp(primals, tangents):
        s, u, v = primals
        t3 = jnp.stack(tangents, axis=-1)                  # (n, 3)
        out = jet(s, u, v)
        jac = out[:, 10:OUT_COLS].reshape(out.shape[0], 10, 3)
        tan = jnp.einsum("nod,nd->no", jac, t3)
        return (tuple(out[:, i] for i in range(10)),
                tuple(tan[:, o] for o in range(10)))

    return fused
