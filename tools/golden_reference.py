"""Independent "referee" implementation that generates golden parity
fixtures for the staged BASELINE.json configs.

Purpose (VERDICT round 1, item 1): every round-1 validation of the ray
tracer was self-referential (finite differences of the same jax graph,
order-of-convergence, field golden files).  This module is a *separate*
implementation of the same published physics that shares **no code and no
numerical mechanism** with the framework:

  * spline evaluation: raw global-coordinate polynomials straight from the
    file tables (the framework rebases to cell-local coordinates and
    gathers cell-major blocks);
  * derivatives of D: Richardson-extrapolated central finite differences
    (the framework uses one jax.grad reverse pass);
  * integration: scipy DOP853 at rtol=1e-12 (the framework uses scan-based
    RK4);
  * Newton init-k: scalar Newton with FD derivative;
  * plasma dispersion function Z: scipy.special.wofz (MIT Faddeeva; the
    framework derives Weideman-1994 coefficients at import time);
  * endpoint gradients: central finite differences over re-integrated
    trajectories (the framework reverse-differentiates through the scan).

Agreement between the two therefore cross-validates the autodiff ray
equations, the cell-local spline path, the integrators, and the Newton
solve all at once.  The physics formulas themselves (cold-plasma
determinant etc.) are the same published relations as the reference's
dispersion.hpp:227-1305 - re-deriving those would be re-deriving plasma
physics - but they are *evaluated* through an entirely different pipeline.

Everything is batch-polymorphic over a leading point axis (p: (..., 3),
k: (..., 3)) purely so the 29-point FD stencil of one RHS call evaluates
in one numpy pass - vectorization, not a mechanism change.

Run ``python tools/golden_reference.py`` to (re)generate
``tests/fixtures/golden_config*.npz``; tests/test_reference_parity.py
consumes them.  Generation is deterministic (no RNG).
"""

from __future__ import annotations

import pathlib

import numpy as np
import h5py
from scipy.integrate import solve_ivp
from scipy.special import wofz

FIXTURES = pathlib.Path(__file__).resolve().parent.parent / "tests" / "fixtures"

# physics constants, same published values as dispersion.hpp:489-503
EPS0 = 8.8541878138e-12
MU0 = np.pi * 4.0e-7
Q = 1.602176634e-19
ME = 9.1093837015e-31
C = 1.0 / np.sqrt(EPS0 * MU0)
MI_D = 3.34449469e-27


def wpe2_of(ne, q=Q, m=ME):
    return ne * q * q / (EPS0 * m * C * C)


def wc_of(q, b, m):
    return q * b / (m * C)


def _dot(a, b):
    return np.sum(a * b, axis=-1)


# ---------------------------------------------------------------------------
# referee equilibria (batched over a leading point axis)
# ---------------------------------------------------------------------------

class SlabDensityRef:
    """ne = 1e19 (0.1 x + 1), te = 1000 eV, B = (0,0,1)."""
    ion_masses = (MI_D,)
    ion_charges = (1,)

    def ne(self, p):
        return 1.0e19 * (0.1 * p[..., 0] + 1.0)

    def te(self, p):
        return np.broadcast_to(1000.0, p[..., 0].shape)

    def ni(self, i, p):
        return self.ne(p)

    def ti(self, i, p):
        return self.te(p)

    def b(self, p):
        out = np.zeros_like(p)
        out[..., 2] = 1.0
        return out


class GaussianDensityRef:
    """ne = 1e19 exp(-(x^2+y^2)/0.2), te = 1000 eV, B = (1,0,0)."""
    ion_masses = (MI_D,)
    ion_charges = (1,)

    def ne(self, p):
        return 1.0e19 * np.exp(-(p[..., 0] ** 2 + p[..., 1] ** 2) / 0.2)

    def te(self, p):
        return np.broadcast_to(1000.0, p[..., 0].shape)

    def ni(self, i, p):
        return self.ne(p)

    def ti(self, i, p):
        return self.te(p)

    def b(self, p):
        out = np.zeros_like(p)
        out[..., 0] = 1.0
        return out


class EfitRef:
    """EFIT equilibrium evaluated straight from the raw file tables.

    Polynomials are evaluated in the *global* normalized coordinate
    u = (x - offset)/scale with cell index clamp(trunc(u)) - the
    reference's literal build_1D_spline semantics (equilibrium.hpp:
    1120-1131) and NOT the framework's rebased cell-local form, so the
    two evaluation paths share nothing but the file bytes.

    Replicates the reference's documented quirks: ne_c0/ne_c1 loaded from
    the te tables (equilibrium.hpp:1478), ni = te, and the rounded
    q = 1.60218e-19 in the pressure-balance ti (equilibrium.hpp:1358-1362).
    """
    ion_masses = (MI_D,)
    ion_charges = (1,)

    def __init__(self, path):
        with h5py.File(path, "r") as h:
            g = lambda n: np.asarray(h[n][...], dtype=np.float64)
            self.psi_c = np.stack([
                np.stack([g(f"psi_c{a}{b}") for b in range(4)])
                for a in range(4)])               # (4,4,nr,nz)
            prof = {}
            for name in ("ne", "te", "pressure", "fpol"):
                prof[name] = np.stack(
                    [g(f"{name}_c{i}") for i in range(4)])  # (4, npsi)
            # reference quirk: ne_c0, ne_c1 come from te (equilibrium.hpp:1478)
            prof["ne"] = np.stack([prof["te"][0], prof["te"][1],
                                   prof["ne"][2], prof["ne"][3]])
            self.prof = prof
            self.psimin = float(g("psimin"))
            self.dpsi = float(g("dpsi"))
            self.rmin = float(g("rmin"))
            self.dr = float(g("dr"))
            self.zmin = float(g("zmin"))
            self.dz = float(g("dz"))
            self.scales = {"ne": float(g("ne_scale")),
                           "te": float(g("te_scale")),
                           "pressure": float(g("pres_scale")),
                           "fpol": 1.0}

    # raw global-coordinate spline evaluation (batched) ---------------------
    @staticmethod
    def _idx(u, n):
        return np.clip(np.trunc(u), 0, n - 1).astype(np.int64)

    def eval_prof(self, name, psi):
        c = self.prof[name]
        u = (psi - self.psimin) / self.dpsi
        i = self._idx(u, c.shape[1])
        return (c[0, i] + u * (c[1, i] + u * (c[2, i] + u * c[3, i]))) \
            * self.scales[name]

    def psi_rz(self, r, z):
        r = np.asarray(r, dtype=np.float64)
        z = np.asarray(z, dtype=np.float64)
        u = (r - self.rmin) / self.dr
        v = (z - self.zmin) / self.dz
        i = self._idx(u, self.psi_c.shape[2])
        j = self._idx(v, self.psi_c.shape[3])
        c = self.psi_c[:, :, i, j]                 # (4, 4, ...)
        up = np.stack([np.ones_like(u), u, u * u, u ** 3])
        vp = np.stack([np.ones_like(v), v, v * v, v ** 3])
        return np.einsum("a...,ab...,b...->...", up, c, vp)

    def psi(self, p):
        return self.psi_rz(np.hypot(p[..., 0], p[..., 1]), p[..., 2])

    def ne(self, p):
        return self.eval_prof("ne", self.psi(p))

    def te(self, p):
        return self.eval_prof("te", self.psi(p))

    def ni(self, i, p):
        return self.te(p)          # reference quirk (equilibrium.hpp:1361)

    def ti(self, i, p):
        qr = 1.60218e-19           # reference's rounded q
        psi = self.psi(p)
        ne = self.eval_prof("ne", psi)
        te = self.eval_prof("te", psi)
        pres = self.eval_prof("pressure", psi)
        return (pres - ne * te * qr) / (te * qr)

    def b(self, p):
        x, y, z = p[..., 0], p[..., 1], p[..., 2]
        r = np.hypot(x, y)
        # dpsi/dr, dpsi/dz by 4th-order central FD of the raw polynomial -
        # deliberately NOT an analytic/symbolic derivative, so the
        # derivative path is independent of any autodiff machinery.
        hr = self.dr * 1.0e-5
        hz = self.dz * 1.0e-5
        dpsi_dr = (8 * (self.psi_rz(r + hr, z) - self.psi_rz(r - hr, z))
                   - (self.psi_rz(r + 2 * hr, z)
                      - self.psi_rz(r - 2 * hr, z))) / (12 * hr)
        dpsi_dz = (8 * (self.psi_rz(r, z + hz) - self.psi_rz(r, z - hz))
                   - (self.psi_rz(r, z + 2 * hz)
                      - self.psi_rz(r, z - 2 * hz))) / (12 * hz)
        br = dpsi_dz / r
        bp = self.eval_prof("fpol", self.psi(p)) / r
        bz = -dpsi_dr / r
        cph, sph = x / r, y / r
        return np.stack([br * cph - bp * sph, br * sph + bp * cph, bz],
                        axis=-1)


class VmecRef:
    """VMEC stellarator equilibrium evaluated straight from the raw
    vmec.nc tables (equilibrium.hpp:1867-2651 semantics).

    Independence from the framework path (models/vmec.py):
      * per-mode radial splines evaluated as raw GLOBAL-coordinate
        polynomials u = (s - smin)/ds with clamp(trunc(u)) cells - the
        framework rebases to cell-local coordinates and gathers cell-major
        blocks (or one-hot matmuls);
      * per-mode transcendentals cos/sin(xm u - xn v) - the framework
        factors them through unique-mode outer products (_grid_trig);
      * ALL geometry derivatives (d(R,Z,l)/d(s,u,v), dchi/ds) by 4th-order
        central finite differences - the framework hand-writes the
        analytic mode-sum Jacobian and autodiffs through it.

    chi(s) is evaluated at the physical radial coordinate (the intended
    semantics; the reference's literal double-normalized get_chi argument
    makes |B| ~ 1e6 T and has no golden test - see models/vmec.py chi()).
    Profiles are the reference's analytic (1 - |s|^1.5)^2
    (equilibrium.hpp:2150-2172).
    """
    ion_masses = (MI_D,)
    ion_charges = (1,)

    def __init__(self, path):
        with h5py.File(path, "r") as h:
            g = lambda n: np.asarray(h[n][...], dtype=np.float64)
            self.chi_c = np.stack([g(f"chi_c{i}") for i in range(4)])
            self.rmnc = np.stack([g(f"rmnc_c{i}") for i in range(4)])
            self.zmns = np.stack([g(f"zmns_c{i}") for i in range(4)])
            self.lmns = np.stack([g(f"lmns_c{i}") for i in range(4)])
            self.xm = g("xm")
            self.xn = g("xn")
            self.signj = float(g("signj"))
            self.dphi = float(g("dphi"))
            self.sminf = float(g("sminf"))
            self.sminh = float(g("sminh"))
            self.ds = float(g("ds"))

    @staticmethod
    def _idx(u, n):
        return np.clip(np.trunc(u), 0, n - 1).astype(np.int64)

    def _modes(self, c, s, smin):
        """All per-mode radial polynomials at s: (4, nm, ns), (...) ->
        (..., nm), raw global-coordinate Horner."""
        u = (np.asarray(s) - smin) / self.ds
        i = self._idx(u, c.shape[2])
        cc = c[:, :, i]                              # (4, nm, ...)
        c0, c1, c2, c3 = (np.moveaxis(cc[a], 0, -1) for a in range(4))
        uu = u[..., None]
        return c0 + uu * (c1 + uu * (c2 + uu * c3))

    def rzl(self, s, u, v):
        rm = self._modes(self.rmnc, s, self.sminf)
        zm = self._modes(self.zmns, s, self.sminf)
        lm = self._modes(self.lmns, s, self.sminh)
        ang = (self.xm * np.asarray(u)[..., None]
               - self.xn * np.asarray(v)[..., None])
        ca, sa = np.cos(ang), np.sin(ang)
        return ((rm * ca).sum(-1), (zm * sa).sum(-1), (lm * sa).sum(-1))

    def chi(self, s):
        u = (np.asarray(s) - self.sminf) / self.ds
        i = self._idx(u, self.chi_c.shape[1])
        c = self.chi_c[:, i]
        return c[0] + u * (c[1] + u * (c[2] + u * c[3]))

    def _geo(self, p):
        """Covariant basis, contravariant basis and B at flux points
        p = (..., 3); every derivative by 4th-order central FD."""
        s, u, v = p[..., 0], p[..., 1], p[..., 2]
        hs = self.ds * 1.0e-4
        ha = 1.0e-6
        steps = np.array([-2.0, -1.0, 1.0, 2.0])

        def d4(vals, h):
            # vals at [-2h, -h, +h, +2h]
            return (8.0 * (vals[2] - vals[1]) - (vals[3] - vals[0])) \
                / (12.0 * h)

        R, Z, L = self.rzl(s, u, v)

        def stencil(dim, h):
            vals = []
            for st in steps:
                args = [np.asarray(s, dtype=np.float64).copy(),
                        np.asarray(u, dtype=np.float64).copy(),
                        np.asarray(v, dtype=np.float64).copy()]
                args[dim] = args[dim] + st * h
                vals.append(self.rzl(*args))
            return (d4([t[0] for t in vals], h),
                    d4([t[1] for t in vals], h),
                    d4([t[2] for t in vals], h))

        dRs, dZs, _ = stencil(0, hs)
        dRu, dZu, dLu = stencil(1, ha)
        dRv, dZv, dLv = stencil(2, ha)

        cv, sv = np.cos(v), np.sin(v)

        def rot(a, b, c):
            return np.stack([a * cv - b * sv, a * sv + b * cv, c], axis=-1)

        zero = np.zeros_like(R)
        e_s = rot(dRs, zero, dZs)
        e_u = rot(dRu, zero, dZu)
        e_v = rot(dRv, R, dZv)

        cuv = np.cross(e_u, e_v)
        jac = np.sum(e_s * cuv, axis=-1)
        esup = np.stack([cuv, np.cross(e_v, e_s), np.cross(e_s, e_u)],
                        axis=-2) / jac[..., None, None]

        dchi = d4([self.chi(s + st * hs) for st in steps], hs)
        phip = self.signj * self.dphi
        jbsupu = (dchi - phip * dLv) / jac
        jbsupv = phip * (1.0 + dLu) / jac
        b = jbsupu[..., None] * e_u + jbsupv[..., None] * e_v
        return dict(esup=esup, b=b)

    def esup(self, p):
        return self._geo(p)["esup"]

    def profile(self, s):
        return (1.0 - np.abs(s) ** 1.5) ** 2

    def ne(self, p):
        return 1.0e19 * self.profile(p[..., 0])

    def te(self, p):
        return 1000.0 * self.profile(p[..., 0])

    def ni(self, i, p):
        return self.ne(p)

    def ti(self, i, p):
        return self.te(p)

    def b(self, p):
        return self._geo(p)["b"]


def D_cold_flux(w, kcov, p, eq):
    """Cold-plasma D as a function of the COVARIANT wave-number components
    in flux coordinates: F(w, kcov, pos) = D(w, sum_i kcov_i e^i(pos), pos).

    x^i and k_i are canonically conjugate, so the cartesian Hamilton
    equations applied verbatim to this F (dx/dt = -F_k/F_w,
    dk/dt = F_x/F_w - i.e. the existing ray_rhs/newton_k/integrate
    machinery unchanged) ARE the canonical generalized-coordinate ray
    equations the framework integrates (models/rays.py module docstring);
    the position derivative automatically includes the basis rotation."""
    geo = eq._geo(p)        # one geometry pass serves esup AND b
    kvec = np.einsum("...i,...ij->...j", kcov, geo["esup"])
    return D_cold_plasma(w, kvec, p, _BoundVmecRef(eq, geo["b"]))


class _BoundVmecRef:
    """Adapter serving a precomputed B so D_cold_flux's single _geo pass
    covers both the basis (kvec) and the field (dispersion)."""

    def __init__(self, eq, b):
        self._eq = eq
        self._b = b
        self.ion_masses = eq.ion_masses
        self.ion_charges = eq.ion_charges

    def b(self, p):
        return self._b

    def ne(self, p):
        return self._eq.ne(p)

    def te(self, p):
        return self._eq.te(p)

    def ni(self, i, p):
        return self._eq.ni(i, p)

    def ti(self, i, p):
        return self._eq.ti(i, p)


# ---------------------------------------------------------------------------
# referee dispersion relations (published physics; dispersion.hpp:227-1305)
# ---------------------------------------------------------------------------

def D_ordinary(w, k, p, eq):
    wpe2 = wpe2_of(eq.ne(p))
    b = eq.b(p)
    bhat = b / np.linalg.norm(b, axis=-1, keepdims=True)
    n = k / np.asarray(w)[..., None]
    nperp2 = _dot(n, n) - _dot(bhat, n) ** 2
    return 1.0 - wpe2 / (w * w) - nperp2


def D_xmode(w, k, p, eq):
    wpe2 = wpe2_of(eq.ne(p))
    b = eq.b(p)
    wce = wc_of(-Q, np.linalg.norm(b, axis=-1), ME)
    bhat = b / np.linalg.norm(b, axis=-1, keepdims=True)
    n = k / np.asarray(w)[..., None]
    nperp2 = _dot(n, n) - _dot(bhat, n) ** 2
    wh2 = wpe2 + wce * wce
    w2 = w * w
    return 1.0 - wpe2 / w2 * (w2 - wpe2) / (w2 - wh2) - nperp2


def D_bohm_gross(w, k, p, eq):
    wpe2 = wpe2_of(eq.ne(p))
    vt2 = 2.0 * Q * eq.te(p) / (ME * C * C)
    b = eq.b(p)
    b2 = _dot(b, b)
    kpar2 = np.where(b2 > 0, _dot(b, k) ** 2 / np.where(b2 > 0, b2, 1.0),
                     _dot(k, k))
    return wpe2 + 1.5 * kpar2 * vt2 - w * w


def D_cold_plasma(w, k, p, eq):
    wpe2 = wpe2_of(eq.ne(p))
    b = eq.b(p)
    blen = np.linalg.norm(b, axis=-1)
    ec = wc_of(-Q, blen, ME)
    w2 = w * w
    denome = 1.0 - ec * ec / w2
    e11 = 1.0 - (wpe2 / w2) / denome
    e12 = ((ec / w) * (wpe2 / w2)) / denome
    e33 = wpe2
    for i, (mi, zi) in enumerate(zip(eq.ion_masses, eq.ion_charges)):
        qi = zi * Q
        wpi2 = wpe2_of(eq.ni(i, p), qi, mi)
        ic = wc_of(qi, blen, mi)
        denomi = 1.0 - ic * ic / w2
        e11 = e11 - (wpi2 / w2) / denomi
        e12 = e12 + ((ic / w) * (wpi2 / w2)) / denomi
        e33 = e33 + wpi2
    e12 = -e12
    e33 = 1.0 - e33 / w2
    n = k / np.asarray(w)[..., None]
    bhat = b / blen[..., None]
    n2 = _dot(n, n)
    npara2 = _dot(bhat, n) ** 2
    nperp2 = n2 - npara2
    m11 = e11 - npara2
    m22 = e11 - n2
    m33 = e33 - nperp2
    return (m11 * m22 - e12 * e12) * m33 - m22 * npara2 * nperp2


def D_cold_expansion(w, k, p, eq):
    """Electron cold-plasma expansion Dc (dispersion.hpp:1017-1092)."""
    b = eq.b(p)
    blen = np.linalg.norm(b, axis=-1)
    bhat = b / blen[..., None]
    ec = wc_of(Q, blen, ME)
    wpe2 = wpe2_of(eq.ne(p))
    P = wpe2 / (w * w)
    q = P / (2.0 * (1.0 + ec / w))
    n = k / np.asarray(w)[..., None]
    n2 = _dot(n, n)
    npara2 = _dot(n, bhat) ** 2
    nperp2 = n2 - npara2
    q_func = 1.0 - 2.0 * q
    n_func = n2 + npara2
    p_func = 1.0 - P
    gamma1 = ((1.0 - q) * n2 * nperp2
              + p_func * (n2 * npara2 - (1.0 - q) * n_func)
              + q_func * (p_func - nperp2))
    gamma0 = (nperp2 * (n2 - 2.0 * q_func)
              + p_func * (2.0 * q_func - n_func))
    return (-P / 2.0 * (1.0 + ec / w) * gamma0
            + (1.0 - ec * ec / (w * w)) * gamma1)


def D_hot_expansion(w, k, p, eq):
    """Weakly-damped hot expansion Dw (dispersion.hpp:1208-1299), with the
    plasma dispersion function from scipy's MIT Faddeeva wofz."""
    b = eq.b(p)
    blen = np.linalg.norm(b, axis=-1)
    bhat = b / blen[..., None]
    ec = wc_of(Q, blen, ME)
    wpe2 = wpe2_of(eq.ne(p))
    ve = np.sqrt(2.0 * Q * eq.te(p) / ME) / C
    P = wpe2 / (w * w)
    q = P / (2.0 * (1.0 + ec / w))
    n = k / np.asarray(w)[..., None]
    n2 = _dot(n, n)
    npara = _dot(bhat, n)
    npara2 = npara * npara
    nperp2 = n2 - npara2
    zeta = (1.0 - ec / w) / (npara * ve)
    Z = 1j * np.sqrt(np.pi) * wofz(zeta)
    q_func = 1.0 - 2.0 * q
    n_func = n2 + npara2
    p_func = 1.0 - P
    gamma5 = P * (n2 * npara2 - (1.0 - q) * n_func + q_func)
    gamma2 = (P * w / ec * nperp2 * (n2 - q_func)
              + P * P * w * w / (4.0 * ec * ec)
              * (n_func - 2.0 * q_func) * nperp2 / npara2)
    gamma1 = ((1.0 - q) * n2 * nperp2
              + p_func * (n2 * npara2 - (1.0 - q) * n_func)
              + q_func * (p_func - nperp2))
    return (-(1.0 + ec / w) * npara * ve
            * (gamma1 + gamma2
               + nperp2 / (2.0 * npara) * (w * w / (ec * ec))
               * ve * zeta * gamma5)
            * (1.0 / Z + zeta))


def D_hot_full(w, k, p, eq):
    """Full hot electron plasma D with Landau damping (the same published
    relation as dispersion.hpp:1099-1199), Z via scipy's MIT-Faddeeva wofz.
    Holomorphic in k (entire functions of n), so complex k is fine."""
    b = eq.b(p)
    blen = np.linalg.norm(b, axis=-1)
    bhat = b / blen[..., None]
    ne, te = eq.ne(p), eq.te(p)
    ve = np.sqrt(2.0 * Q * te / ME) / C
    ec = wc_of(Q, blen, ME)
    wpe2 = wpe2_of(ne)
    P = wpe2 / (w * w)
    q = P / (2.0 * (1.0 + ec / w))
    n = k / np.asarray(w)[..., None] if np.ndim(w) else k / w
    n2 = _dot(n, n)
    npara = _dot(n, bhat)
    npara2 = npara * npara
    nperp2 = n2 - npara2
    zeta = (1.0 - ec / w) / (npara * ve)
    Z = 1j * np.sqrt(np.pi) * wofz(zeta)
    zeta_func = 1.0 + zeta * Z
    F = ve * zeta * w / (2.0 * npara * ec)
    isigma = P * Z / (2.0 * npara * ve)
    q_func = 1.0 - 2.0 * q
    n_func = n2 + npara2
    p_func = 1.0 - P
    gamma5 = n2 * npara2 - (1.0 - q) * n_func + q_func
    gamma2 = ((n2 - q_func)
              + P * w / (4.0 * ec * npara2) * (n_func - 2.0 * q_func))
    gamma1 = (nperp2 * ((1.0 - q) * n2 - q_func)
              + p_func * (n2 * npara2 - (1.0 - q) * n_func + q_func))
    gamma0 = (nperp2 * (n2 - 2.0 * q_func)
              + p_func * (2.0 * q_func - n_func))
    return (isigma * gamma0 + gamma1
            + nperp2 * P * w / ec * zeta_func * (gamma2 + gamma5 * F))


def gen_rootfind_fixture(name, eq, w, states):
    """Complex-Newton kamp roots of the FULL hot-plasma D: starting from
    a = 0, solve D_hot(k + a khat) = 0 for the complex amplitude a
    (absorption.hpp:145-317 root_finder semantics).  The derivative is a
    central difference along the real-a direction - legitimate for the
    full complex derivative because D is holomorphic in a."""
    out_re, out_im = [], []
    for p, k in states:
        khat = k / np.linalg.norm(k)
        a = 0.0 + 0.0j
        h = 1.0e-4 * max(1.0, np.linalg.norm(k))

        def f(a_):
            return D_hot_full(w, (k + a_ * khat)[None], p[None], eq)[0]

        for _ in range(200):
            d = f(a)
            df = (8.0 * (f(a + h) - f(a - h))
                  - (f(a + 2 * h) - f(a - 2 * h))) / (12.0 * h)
            step = d / df
            a = a - step
            if abs(d) < 1.0e-10:
                break
        # the framework (and reference) report kamp = |k| + a
        out_re.append(np.linalg.norm(k) + a.real)
        out_im.append(a.imag)
    ps = np.array([s[0] for s in states])
    ks = np.array([s[1] for s in states])
    np.savez(FIXTURES / f"{name}.npz", w=np.float64(w), p=ps, k=ks,
             kamp_re=np.array(out_re), kamp_im=np.array(out_im))
    print(f"{name}: kamp = {np.array(out_re)} + i {np.array(out_im)}",
          flush=True)


# ---------------------------------------------------------------------------
# FD machinery, integration, Newton
# ---------------------------------------------------------------------------

FD_REL = 7.0e-4      # ~optimal absolute step factor for 5-point f64 stencil


def fd_grad(f, x0, scale):
    """4th-order central difference f'(x0) (scalar helper)."""
    h = FD_REL * scale
    return (8.0 * (f(x0 + h) - f(x0 - h))
            - (f(x0 + 2 * h) - f(x0 - 2 * h))) / (12.0 * h)


def ray_rhs(D, w, eq):
    """dx/dt = -D_k/D_w, dk/dt = D_x/D_w by FD (cartesian equilibria).

    All 28 stencil evaluations (7 derivatives x 4-point central stencils)
    are batched into ONE call of the vectorized D - numerically identical
    to evaluating them one by one, just not glacial."""

    def rhs(t, y):
        p, k = y[:3], y[3:]
        hw = FD_REL * abs(w)
        hk = FD_REL * np.maximum(abs(w), np.abs(k))
        hp = FD_REL * np.maximum(1.0, np.abs(p))

        # stencil rows: [w-+: 4] [k0..k2 -+: 12] [p0..p2 -+: 12]
        n_rows = 28
        ws = np.full(n_rows, w)
        ps = np.tile(p, (n_rows, 1))
        ks = np.tile(k, (n_rows, 1))
        steps = np.array([-2.0, -1.0, 1.0, 2.0])
        ws[0:4] += steps * hw
        for i in range(3):
            ks[4 + 4 * i:8 + 4 * i, i] += steps * hk[i]
            ps[16 + 4 * i:20 + 4 * i, i] += steps * hp[i]

        d = D(ws, ks, ps, eq)

        def central(block, h):
            # block = D at [-2h, -h, +h, +2h]
            return (8.0 * (block[2] - block[1])
                    - (block[3] - block[0])) / (12.0 * h)

        Dw = central(d[0:4], hw)
        dk = np.array([central(d[4 + 4 * i:8 + 4 * i], hk[i])
                       for i in range(3)])
        dx = np.array([central(d[16 + 4 * i:20 + 4 * i], hp[i])
                       for i in range(3)])
        return np.concatenate([-dk / Dw, dx / Dw])

    return rhs


def newton_k(D, w, p, k, which, eq, tol=1.0e-14, it_max=100):
    """Solve D = 0 for k[which] by Newton with FD derivative."""
    k = k.copy()
    for _ in range(it_max):
        f = D(w, k, p, eq)
        df = fd_grad(
            lambda v: D(w, np.where(np.arange(3) == which, v, k), p, eq),
            k[which], max(abs(w), abs(k[which])))
        step = f / df
        k[which] -= step
        if abs(f) <= tol * max(1.0, abs(w)):
            break
    return k


def integrate(D, w, p0, k0, eq, t_final, n_record, rtol=1.0e-12,
              fixed_dt=None):
    """Integrate one ray.  Default: scipy DOP853 at rtol.

    ``fixed_dt``: use classic fixed-step RK4 at that dt instead.  Needed
    for the SPLINE equilibria (EFIT): the fields are only C2 at cell
    boundaries, so DOP853's 8th-order error estimator sees a derivative
    jump at every crossing and rejects steps pathologically (measured:
    7,883 RHS evaluations for rtol 1e-6 over t=0.5; ~1e6 at rtol 1e-9 -
    the error at a crossing scales as h^3, so cost grows as tol^(-1/3)
    instead of tol^(-1/8)).  A fixed dt 25x below the framework's step
    gives (25)^4 ~ 4e5x smaller RK4 truncation error than the thing being
    tested, which is what a referee needs; pair with a 2*dt Richardson
    re-run to certify (gen_analytic_config prints the difference)."""
    ts = np.linspace(0.0, t_final, n_record + 1)
    if fixed_dt is None:
        sol = solve_ivp(ray_rhs(D, w, eq), (0.0, t_final),
                        np.concatenate([p0, k0]), method="DOP853",
                        rtol=rtol, atol=rtol, t_eval=ts,
                        dense_output=False)
        assert sol.success, sol.message
        return ts, sol.y.T        # (n_record+1, 6)

    rhs = ray_rhs(D, w, eq)
    interval = t_final / n_record
    n_per = int(round(interval / fixed_dt))
    assert abs(n_per * fixed_dt - interval) < 1e-12 * max(1.0, interval)
    y = np.concatenate([p0, k0]).astype(np.float64)
    traj = [y.copy()]
    t = 0.0
    h = fixed_dt
    for _ in range(n_record):
        for _ in range(n_per):
            k1 = rhs(t, y)
            k2 = rhs(t + 0.5 * h, y + 0.5 * h * k1)
            k3 = rhs(t + 0.5 * h, y + 0.5 * h * k2)
            k4 = rhs(t + h, y + h * k3)
            y = y + (h / 6.0) * (k1 + 2.0 * k2 + 2.0 * k3 + k4)
            t += h
        traj.append(y.copy())
    return ts, np.array(traj)


def endpoint_gradient(D, w, p0, k0, eq, t_final, *, wrt, h, rtol=1.0e-12,
                      fixed_dt=None):
    """d(endpoint xyz)/d(param) by central FD over full re-integrations.

    wrt: ("w",), ("p", i) or ("k", i).
    """

    def endpoint(wv, pv, kv):
        _, traj = integrate(D, wv, pv, kv, eq, t_final, 1, rtol=rtol,
                            fixed_dt=fixed_dt)
        return traj[-1, :3]

    if wrt[0] == "w":
        return (endpoint(w + h, p0, k0) - endpoint(w - h, p0, k0)) / (2 * h)
    if wrt[0] == "p":
        e = np.zeros(3)
        e[wrt[1]] = h
        return (endpoint(w, p0 + e, k0) - endpoint(w, p0 - e, k0)) / (2 * h)
    e = np.zeros(3)
    e[wrt[1]] = h
    return (endpoint(w, p0, k0 + e) - endpoint(w, p0, k0 - e)) / (2 * h)


# ---------------------------------------------------------------------------
# fixture generation
# ---------------------------------------------------------------------------

def gen_analytic_config(name, D, eq, w, p_launch, k_guess, which,
                        t_final, n_record=10, grad_params=(),
                        rtol=1.0e-12, t_grad=None, fixed_dt=None):
    """Generate one fixture: Newton roots, trajectories, optional grads.

    ``t_grad``: horizon for the endpoint-gradient integrations (defaults
    to t_final; config 3's +-h perturbed EFIT rays hit a cold-plasma
    resonance before t_final where DOP853 underflows its step size, so
    the gradients are pinned at a shorter, everywhere-regular horizon -
    the parity test evaluates the framework jacobian at the same time).
    The trajectory part is saved BEFORE the gradient integrations so a
    gradient failure never discards finished work.
    """
    n = len(p_launch)
    k_init = np.array([newton_k(D, w, p_launch[i], k_guess[i], which, eq)
                       for i in range(n)])
    trajs = []
    for i in range(n):
        ts, traj = integrate(D, w, p_launch[i], k_init[i], eq,
                             t_final, n_record, rtol=rtol,
                             fixed_dt=fixed_dt)
        trajs.append(traj)
        print(f"{name}: ray {i} end x = {traj[-1, 0]:.6f}", flush=True)
    if fixed_dt is not None:
        # Richardson certification: re-run ray 0 at 2*dt; RK4 halving
        # means the dt-run error is ~(diff / 15)
        _, traj2 = integrate(D, w, p_launch[0], k_init[0], eq, t_final,
                             n_record, fixed_dt=2.0 * fixed_dt)
        diff = float(np.max(np.abs(traj2 - trajs[0])))
        print(f"{name}: richardson |traj(2dt) - traj(dt)| = {diff:.3e}",
              flush=True)
    trajs = np.array(trajs)                 # (n, n_record+1, 6)

    out = dict(w=np.float64(w), which=np.int64(which),
               t_record=ts, p_launch=np.array(p_launch),
               k_guess=np.array(k_guess), k_init=k_init, traj=trajs)
    FIXTURES.mkdir(parents=True, exist_ok=True)
    np.savez(FIXTURES / f"{name}.npz", **out)

    if t_grad is None:
        t_grad = t_final
    for (wrt, h) in grad_params:
        g = endpoint_gradient(D, w, p_launch[0], k_init[0], eq, t_grad,
                              wrt=wrt, h=h, rtol=rtol, fixed_dt=fixed_dt)
        key = "grad_" + "_".join(str(v) for v in wrt)
        out[key] = g
        out["t_grad"] = np.float64(t_grad)
        np.savez(FIXTURES / f"{name}.npz", **out)   # incremental
        print(f"{name}: {key} = {g}", flush=True)

    print(f"{name}: endpoints x = {trajs[:, -1, 0]}", flush=True)
    return out


def gen_kamp_fixture(name, eq, w, states):
    """Weak-damping kamp at given (p, k) states:
    kamp = |k| - Dw / (khat . dDc/dk), gradients by FD, Z via wofz
    (absorption.hpp:328-432)."""
    out_re, out_im = [], []
    for p, k in states:
        dDc = np.array([
            fd_grad(lambda v, i=i: D_cold_expansion(
                w, np.where(np.arange(3) == i, v, k), p, eq),
                k[i], max(abs(w), abs(k[i]))) for i in range(3)])
        klen = np.linalg.norm(k)
        khat = k / klen
        dw = D_hot_expansion(w, k, p, eq)
        kamp = klen - dw / (khat @ dDc)
        out_re.append(kamp.real)
        out_im.append(kamp.imag)
    ps = np.array([s[0] for s in states])
    ks = np.array([s[1] for s in states])
    np.savez(FIXTURES / f"{name}.npz", w=np.float64(w), p=ps, k=ks,
             kamp_re=np.array(out_re), kamp_im=np.array(out_im))
    print(f"{name}: kamp_im = {np.array(out_im)}", flush=True)


def gen_absorption_fixtures(efit):
    """Absorption goldens at dedicated DAMPING-REGION states: inside the
    plasma (te ~ 1.5 keV) with a large parallel wave-number component and
    w = 650 chosen against the local ec ~ 722 so zeta ~ -2.1 - healthy
    Landau damping (Im kamp ~ 2-3), unlike the nearly-perpendicular
    trajectory states where e^{-zeta^2} underflows and a golden would
    compare denormals."""
    w = 650.0
    states = [(np.array([2.0, 0.0, z]), np.array([-100.0, -450.0, 50.0]))
              for z in (-0.1, -0.05, 0.0, 0.05, 0.1, 0.15)]
    gen_kamp_fixture("golden_kamp_efit", efit, w, states)
    gen_rootfind_fixture("golden_rootfind_efit", efit, w, states)


def main():
    import sys
    only = sys.argv[1] if len(sys.argv) > 1 else None
    efit_path = "/root/reference/graph_tests/efit.nc"
    vmec_path = "/root/reference/graph_tests/vmec.nc"

    if only in (None, "1"):
        # config 1: cold-plasma O-mode, analytic slab density ramp, RK4
        slab = SlabDensityRef()
        p1 = [np.array([0.0, y, 0.0]) for y in (-0.1, 0.0, 0.1, 0.2)]
        k1 = [np.array([300.0, 0.0, 140.0])] * 4
        gen_analytic_config(
            "golden_config1_omode_slab", D_ordinary, slab, 700.0, p1, k1,
            which=0, t_final=2.0,
            grad_params=[(("k", 0), 1.0e-3), (("p", 0), 1.0e-6),
                         (("w",), 1.0e-3)])

    if only in (None, "2"):
        # config 2a: X-mode + Newton init-k in the same slab
        slab = SlabDensityRef()
        p2 = [np.array([0.0, y, 0.0]) for y in (-0.1, 0.0, 0.1, 0.2)]
        k2 = [np.array([500.0, 0.0, 100.0])] * 4
        gen_analytic_config(
            "golden_config2_xmode_slab", D_xmode, slab, 1000.0, p2, k2,
            which=0, t_final=2.0,
            grad_params=[(("k", 0), 1.0e-3)])

        # config 2b: warm bohm-gross in the gaussian density well
        gauss = GaussianDensityRef()
        p2b = [np.array([-0.5, y, 0.0]) for y in (0.0, 0.05, 0.1, 0.15)]
        k2b = [np.array([3000.0, 0.0, 0.0])] * 4
        gen_analytic_config(
            "golden_config2_bohm_gross", D_bohm_gross, gauss, 650.0, p2b,
            k2b, which=0, t_final=0.5,
            grad_params=[(("k", 0), 1.0e-2)])

    if only in (None, "3"):
        # config 3: cold plasma in EFIT (bicubic tokamak fields).  rtol
        # 1e-9: the FD-derivative RHS noise (~1e-10 relative) plus the
        # merely-C2 spline cell boundaries make DOP853 at tighter
        # tolerances reject steps pathologically (measured: rtol 1e-11
        # burned an hour of CPU without finishing ray 0; 1e-9 integrates
        # in minutes and its error is still 100x below the 1e-6 parity
        # tolerance).
        efit = EfitRef(efit_path)
        # launch INSIDE the plasma (x = 2.0, finite kz): at the reference
        # bench's vacuum-edge launch (x = 2.5, |n| = 1) the O and X
        # branches of the cold-plasma determinant coincide, so D_k and
        # D_w both vanish (double root) and dx/dt = 0/0 - the ray
        # equations are singular there and cannot be cross-validated.
        p3 = [np.array([2.0, 0.0, z]) for z in (-0.1, 0.0, 0.1)]
        k3 = [np.array([-400.0, 0.0, 50.0])] * 3
        cfg3 = gen_analytic_config(
            "golden_config3_efit", D_cold_plasma, efit, 500.0, p3, k3,
            which=0, t_final=0.5, t_grad=0.25, fixed_dt=1.0e-5,
            # FD steps sized against the integrators' endpoint error
            # (~2e-7, Richardson-certified): the FD signal g*h must
            # dominate it.  h_k = 3 on k ~ 355 (endpoint moves ~2e-4);
            # h_p = 1e-3 (moves ~1e-3).  At the old h = 1e-3/1e-6 the
            # noise was 15x the small gradient components.
            grad_params=[(("k", 0), 3.0), (("p", 2), 1.0e-3)])

        gen_absorption_fixtures(efit)

    if only in (None, "adaptive"):
        # adaptive_rk4's referee (VERDICT r3 weak 9), part 2: the stiff
        # test system D = (1e3 (x - e^-t) - e^-t) kx + w
        # (dispersion.hpp:399-443) has CLOSED-FORM ray equations
        #   dx/dt = 1001 e^-t - 1000 x,   dkx/dt = 1000 kx
        # so the referee trajectory is analytic (better than any
        # integrator).  This is the configuration the reference's
        # adaptive scheme is built for: D drifts fast enough that the
        # (dt, lambda) coordinate-Newton has a well-defined target; on
        # residual-conserving dispersions (O-mode slab) the same scheme -
        # ours AND the reference's newton.hpp:42-47 math - diverges
        # (lambda <- lambda - loss/D^2 explodes as D^2 -> 0), which
        # test_adaptive_rejects... documents.
        t_final, n = 5.0e-3, 2000
        ts = np.linspace(0.0, t_final, n + 1)
        a, b = 1001.0, 1000.0
        x0, k0, w0 = 1.0, 1.0, 1.0
        xs = (x0 - a / (b - 1.0)) * np.exp(-b * ts) \
            + a / (b - 1.0) * np.exp(-ts)
        ks = k0 * np.exp(b * ts)
        traj = np.zeros((1, n + 1, 6))
        traj[0, :, 0] = xs
        traj[0, :, 3] = ks
        FIXTURES.mkdir(parents=True, exist_ok=True)
        np.savez(FIXTURES / "golden_adaptive_stiff.npz",
                 w=np.float64(w0), t_record=ts,
                 p_launch=np.array([[x0, 0.0, 0.0]]),
                 k_init=np.array([[k0, 0.0, 0.0]]), traj=traj)
        print("golden_adaptive_stiff: analytic, end x =", xs[-1],
              "end kx =", ks[-1], flush=True)

        # dense referee trajectory for the adaptive_rk4 parity test
        # (VERDICT r3 weak 9): the adaptive integrator adapts dt per ray,
        # so it lands at per-ray ACHIEVED times rather than fixed record
        # times - the test needs the referee trajectory on a grid dense
        # enough to interpolate at any achieved time.  2000 DOP853 points
        # at rtol 1e-12 over analytic slab fields (no spline-boundary
        # thrashing); linear interpolation error ~ (1e-3)^2 |x''| ~ 1e-7,
        # below the parity tolerance.
        slab = SlabDensityRef()
        gen_analytic_config(
            "golden_adaptive_omode_slab", D_ordinary, slab, 700.0,
            [np.array([0.0, 0.0, 0.0]), np.array([0.0, 0.1, 0.0])],
            [np.array([300.0, 0.0, 140.0])] * 2,
            which=0, t_final=2.0, n_record=2000)

    if only == "kamp":
        # regenerate just the absorption fixtures (no re-integration)
        gen_absorption_fixtures(EfitRef(efit_path))

    if only in (None, "4"):
        # config 4: cold plasma in the VMEC stellarator (3D Fourier-mode
        # radial-spline fields), integrated in flux coordinates with the
        # canonical generalized-coordinate ray equations (D_cold_flux).
        # rtol 3e-9: the doubly-nested FD (basis vectors inside the
        # ray-equation stencils) floors the RHS accuracy around 1e-9
        # relative; tighter tolerances only chase that noise (measured:
        # rtol 1e-10 thrashed for an hour without finishing ray 0).
        vmec = VmecRef(vmec_path)
        p4 = [np.array([0.5, u, 0.0]) for u in (0.3, 0.5, 0.7)]
        k4 = [np.array([500.0, 0.0, 0.0])] * 3
        gen_analytic_config(
            "golden_config4_vmec", D_cold_flux, vmec, 900.0, p4, k4,
            which=0, t_final=4.0e-3, rtol=3.0e-9,
            # FD steps sized against the integration noise (~1e-9
            # relative per endpoint): h must satisfy noise/h << grad,
            # so h = 1e-2 (k ~ 55) and 1e-4 (s ~ 0.5) - at h = 1e-6 the
            # re-integration noise amplified to ~1% of grad_p
            grad_params=[(("k", 0), 1.0e-2), (("p", 0), 1.0e-4)])


if __name__ == "__main__":
    main()
