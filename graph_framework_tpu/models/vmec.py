"""VMEC stellarator equilibrium: Fourier-mode radial splines in flux coords.

TPU-native counterpart of ``equilibrium::vmec`` + ``make_vmec`` (reference:
graph_framework/equilibrium.hpp:1867-2651).  Coordinates are flux coordinates
(s, u, v); the cylindrical R, Z and the stream function lambda are Fourier
series over (xm, xn) modes with per-mode cubic radial splines:

    R(s,u,v) = sum_m rmnc_m(s) cos(xm_m u - xn_m v)        (:2113-2119)
    Z(s,u,v) = sum_m zmns_m(s) sin(xm_m u - xn_m v)
    l(s,u,v) = sum_m lmns_m(s) sin(xm_m u - xn_m v)        (half grid)

Covariant basis vectors come from jax.jacfwd of (R, Z) w.r.t. (s, u, v)
plus the cylinder rotation (the reference differentiates symbolically,
:1958-2018); the contravariant basis and B follow from cross products and
the Jacobian (:2030-2140).

The mode dimension is a dense vector axis (86 modes in vmec.nc), so the
Fourier sums are VPU-friendly elementwise reductions, and the radial spline
gather fetches a (4, num_modes) block per point.
"""

from __future__ import annotations

import dataclasses

import h5py
import jax
import jax.numpy as jnp
import numpy as np

from graph_framework_tpu.models.equilibrium import Equilibrium
from graph_framework_tpu.ops.tables import table_index_1d


def _spline_modes(coeffs, s, scale, offset, local):
    """Evaluate all per-mode radial splines at scalar s.

    ``coeffs``: cell-major (num_s, 4, num_modes) - one contiguous
    (4, num_modes) block gather per point (see ops.spline docstring for the
    measured one-index-gather win).  Returns (num_modes,).
    """
    u = (s - offset) / scale
    ns, _, m = coeffs.shape
    idx = table_index_1d(s, scale, offset, ns)
    if local:
        u = u - idx.astype(u.dtype)
    # flat single-trailing-dim gather + free reshape (see ops/spline.py:
    # multi-trailing-dim gathers lower to a slow TPU path)
    block = coeffs.reshape(ns, 4 * m)[idx].reshape(
        jnp.shape(idx) + (4, m))                 # (..., 4, num_modes)
    u = u[..., None] if jnp.ndim(u) else u       # broadcast over modes
    return (block[..., 0, :] + u * (block[..., 1, :]
            + u * (block[..., 2, :] + u * block[..., 3, :])))


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class VmecEquilibrium(Equilibrium):
    """Stellarator equilibrium in VMEC flux coordinates."""

    chi_coeffs: jax.Array       # (numsf, 4) poloidal flux chi(s), cell-major
    rmnc_coeffs: jax.Array      # (numsf, 4, num_modes) cell-major
    zmns_coeffs: jax.Array      # (numsf, 4, num_modes) cell-major
    lmns_coeffs: jax.Array      # (numsh, 4, num_modes) half grid, cell-major
    xm: jax.Array               # (num_modes,) poloidal mode numbers
    xn: jax.Array               # (num_modes,) toroidal mode numbers
    signj: float = dataclasses.field(metadata=dict(static=True))
    dphi: float = dataclasses.field(metadata=dict(static=True))
    sminf: float = dataclasses.field(metadata=dict(static=True))
    sminh: float = dataclasses.field(metadata=dict(static=True))
    ds: float = dataclasses.field(metadata=dict(static=True))
    cell_local: bool = dataclasses.field(
        default=False, metadata=dict(static=True))
    # replicate the reference's double-normalized chi argument (see chi()).
    quirky_chi: bool = dataclasses.field(
        default=False, metadata=dict(static=True))

    @property
    def ion_masses(self):
        # Single deuterium species (equilibrium.hpp:2206).
        return (3.34449469e-27,)

    @property
    def ion_charges(self):
        return (1,)

    def is_cartesian(self):
        return False

    def supports_batched(self):
        return True       # geometry is batched-polymorphic (see _geometry)

    # -- Fourier geometry --------------------------------------------------
    def _rzl(self, s, u, v):
        """R, Z, lambda at a flux-space point (equilibrium.hpp:2083-2121)."""
        rm = _spline_modes(self.rmnc_coeffs, s, self.ds, self.sminf,
                           self.cell_local)
        zm = _spline_modes(self.zmns_coeffs, s, self.ds, self.sminf,
                           self.cell_local)
        lm = _spline_modes(self.lmns_coeffs, s, self.ds, self.sminh,
                           self.cell_local)
        angle = (self.xm * u[..., None] if jnp.ndim(u)
                 else self.xm * u) - (self.xn * v[..., None]
                                      if jnp.ndim(v) else self.xn * v)
        ca, sa = jnp.cos(angle), jnp.sin(angle)
        return (jnp.sum(rm * ca, axis=-1), jnp.sum(zm * sa, axis=-1),
                jnp.sum(lm * sa, axis=-1))

    def chi(self, s):
        """Poloidal flux spline chi(s).

        NOTE: the reference evaluates chi at the *normalized* radial
        coordinate (``get_chi(s_norm_f)``, equilibrium.hpp:2131), which
        double-normalizes the argument: with vmec.nc's sminf = -1,
        ds = 1/99 the table index saturates at the last cell for any
        s > -0.99 and the polynomial is evaluated ~1e4 cells outside its
        range, making |B| ~ 1e6 T.  The VMEC field path has no golden test
        in the reference (graph_tests has no vmec_test), so we implement
        the physically-intended chi(s); ``quirky_chi=True`` reproduces the
        literal reference arithmetic for comparison runs."""
        arg = (s - self.sminf) / self.ds if self.quirky_chi else s
        un = (arg - self.sminf) / self.ds
        idx = table_index_1d(arg, self.ds, self.sminf,
                             self.chi_coeffs.shape[0])
        if self.cell_local:
            un = un - idx.astype(un.dtype)
        c = self.chi_coeffs[idx]
        return c[..., 0] + un * (c[..., 1] + un * (c[..., 2]
                                                   + un * c[..., 3]))

    def phi(self, s):
        """Toroidal flux: signj * dphi * s (equilibrium.hpp:2061)."""
        return self.signj * self.dphi * s

    # -- basis vectors ----------------------------------------------------
    def _geometry(self, pos):
        """Covariant/contravariant bases, Jacobian, B at (s, u, v).

        Mirrors set_cache (equilibrium.hpp:2073-2141) with a vmapped jvp
        supplying dR/d(s,u,v), dZ/d(s,u,v), dl/d(s,u,v).  Batched
        polymorphic: ``pos`` is (3,) per point or (3, num_rays), and all
        vector algebra is componentwise with the component axis leading
        (see models/rays.py for the measured lane-layout rationale)."""
        s, u, v = pos[0], pos[1], pos[2]

        (r, z, _l), (dr, dz, dl) = _rzl_and_jac(self, s, u, v)

        cv, sv = jnp.cos(v), jnp.sin(v)

        # rot(v) applied to (a, b, c): (a cv - b sv, a sv + b cv, c)
        def rot(a, b, c):
            return (a * cv - b * sv, a * sv + b * cv, c)

        def cross(a, b):
            return (a[1] * b[2] - a[2] * b[1],
                    a[2] * b[0] - a[0] * b[2],
                    a[0] * b[1] - a[1] * b[0])

        def dot(a, b):
            return a[0] * b[0] + a[1] * b[1] + a[2] * b[2]

        zero = jnp.zeros_like(r)
        esub_s = rot(dr[0], zero, dz[0])
        esub_u = rot(dr[1], zero, dz[1])
        esub_v = rot(dr[2], r, dz[2])

        cuv = cross(esub_u, esub_v)
        jac = dot(esub_s, cuv)
        inv_jac = 1.0 / jac

        def scale(vec, f):
            return jnp.stack([vec[0] * f, vec[1] * f, vec[2] * f])

        esup_s = scale(cuv, inv_jac)
        esup_u = scale(cross(esub_v, esub_s), inv_jac)
        esup_v = scale(cross(esub_s, esub_u), inv_jac)

        phip = self.signj * self.dphi                     # d(phi)/ds

        # grad-of-sum = elementwise derivative (chi is elementwise in s)
        def chi_sum(s_):
            return jnp.sum(self.chi(s_))
        dchi_ds = jax.grad(chi_sum,
                           holomorphic=jnp.iscomplexobj(s))(s)

        jbsupu = (dchi_ds - phip * dl[2]) * inv_jac
        jbsupv = phip * (1.0 + dl[1]) * inv_jac
        bvec = jnp.stack([
            jbsupu * esub_u[0] + jbsupv * esub_v[0],
            jbsupu * esub_u[1] + jbsupv * esub_v[1],
            jbsupu * esub_u[2] + jbsupv * esub_v[2]])

        return dict(r=r, z=z, esup=jnp.stack([esup_s, esup_u, esup_v]),
                    bvec=bvec, jac=jac)

    def esup(self, pos):
        return self._geometry(pos)["esup"]

    def magnetic_field(self, pos):
        return self._geometry(pos)["bvec"]

    def characteristic_field(self):
        """|B| at the axis (s, u, v) = 0 (equilibrium.hpp:2198-2205)."""
        zero = jnp.zeros(3, dtype=self.rmnc_coeffs.dtype)
        b = self.magnetic_field(zero)
        return jnp.sqrt(jnp.sum(b * b))

    def to_xyz(self, pos):
        s, u, v = pos[0], pos[1], pos[2]
        r, z, _ = self._rzl(s, u, v)
        return jnp.stack([r * jnp.cos(v), r * jnp.sin(v), z])

    # -- profiles (analytic in s; equilibrium.hpp:2150-2172) ---------------
    def profile(self, s):
        """(1 - (sqrt(s^2))^1.5)^2 (equilibrium.hpp:2150-2153)."""
        return (1.0 - jnp.sqrt(s * s) ** 1.5) ** 2

    def electron_density(self, pos):
        return 1.0e19 * self.profile(pos[0])

    def ion_density(self, index, pos):
        return self.electron_density(pos)

    def electron_temperature(self, pos):
        return 1000.0 * self.profile(pos[0])

    def ion_temperature(self, index, pos):
        return self.electron_temperature(pos)


def _rzl_and_jac(eq: VmecEquilibrium, s, u, v):
    """(R, Z, l) and their (s, u, v) derivatives in one jacfwd pass."""

    def f(coords):
        r, z, l = eq._rzl(coords[0], coords[1], coords[2])
        return jnp.stack([r, z, l])

    coords = jnp.stack([s, u, v])        # (3,) or (3, num_rays)
    # one vmapped jvp over the 3 coordinate tangents gives primal AND
    # Jacobian in a single pass (jacfwd discards its primal, which would
    # cost an extra Fourier/spline evaluation here).  Works for complex
    # coordinates too (the series is polynomial/trig, so the tangent is
    # the analytic continuation, matching the reference's symbolic df).
    eye = jnp.eye(3, dtype=coords.dtype)
    tangents = (eye if coords.ndim == 1
                else jnp.broadcast_to(eye[..., None],
                                      (3,) + coords.shape))
    vals3, jac_t = jax.vmap(
        lambda t: jax.jvp(f, (coords,), (t,)))(tangents)
    vals = vals3[0]                       # primal, identical across tangents
    jac = jnp.swapaxes(jac_t, 0, 1)       # (3 outputs, 3 coords[, rays])
    return (vals[0], vals[1], vals[2]), (jac[0], jac[1], jac[2])


def make_vmec(path, dtype=jnp.float64, cell_local=True, quirky_chi=False):
    """Load a VMEC spline file (make_vmec, equilibrium.hpp:2424-2651).

    ``cell_local``: rebase radial spline tables to cell-local coordinates at
    load time for well-conditioned evaluation (see efit.make_efit).
    """
    from graph_framework_tpu.ops.spline import (
        rebase_cells_1d, to_cell_major_1d)

    with h5py.File(path, "r") as h:
        def arr(name):
            return np.asarray(h[name][...], dtype=np.float64)

        chi = np.stack([arr(f"chi_c{i}") for i in range(4)])

        def stack_modes(prefix):
            # file layout (num_modes, num_s) per coefficient
            return np.stack([arr(f"{prefix}_c{i}") for i in range(4)])

        rmnc = stack_modes("rmnc")      # (4, 86, numsf)
        zmns = stack_modes("zmns")
        lmns = stack_modes("lmns")      # (4, 86, numsh)

        if cell_local:
            chi = rebase_cells_1d(chi)

            def rebase_modes(c):
                return np.stack([
                    rebase_cells_1d(c[:, m, :]) for m in range(c.shape[1])
                ], axis=1)

            rmnc = rebase_modes(rmnc)
            zmns = rebase_modes(zmns)
            lmns = rebase_modes(lmns)

        # cell-major runtime layout: (num_s, 4, num_modes) / (numsf, 4)
        chi = to_cell_major_1d(chi)
        rmnc = np.ascontiguousarray(rmnc.transpose(2, 0, 1))
        zmns = np.ascontiguousarray(zmns.transpose(2, 0, 1))
        lmns = np.ascontiguousarray(lmns.transpose(2, 0, 1))

        return VmecEquilibrium(
            chi_coeffs=jnp.asarray(chi, dtype=dtype),
            rmnc_coeffs=jnp.asarray(rmnc, dtype=dtype),
            zmns_coeffs=jnp.asarray(zmns, dtype=dtype),
            lmns_coeffs=jnp.asarray(lmns, dtype=dtype),
            xm=jnp.asarray(arr("xm"), dtype=dtype),
            xn=jnp.asarray(arr("xn"), dtype=dtype),
            signj=float(arr("signj")),
            dphi=float(arr("dphi")),
            sminf=float(arr("sminf")),
            sminh=float(arr("sminh")),
            ds=float(arr("ds")),
            cell_local=cell_local,
            quirky_chi=quirky_chi,
        )
