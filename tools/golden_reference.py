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


def integrate(D, w, p0, k0, eq, t_final, n_record, rtol=1.0e-12):
    ts = np.linspace(0.0, t_final, n_record + 1)
    sol = solve_ivp(ray_rhs(D, w, eq), (0.0, t_final),
                    np.concatenate([p0, k0]), method="DOP853",
                    rtol=rtol, atol=rtol, t_eval=ts, dense_output=False)
    assert sol.success, sol.message
    return ts, sol.y.T        # (n_record+1, 6)


def endpoint_gradient(D, w, p0, k0, eq, t_final, *, wrt, h, rtol=1.0e-12):
    """d(endpoint xyz)/d(param) by central FD over full re-integrations.

    wrt: ("w",), ("p", i) or ("k", i).
    """

    def endpoint(wv, pv, kv):
        _, traj = integrate(D, wv, pv, kv, eq, t_final, 1, rtol=rtol)
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
                        rtol=1.0e-12, t_grad=None):
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
                             t_final, n_record, rtol=rtol)
        trajs.append(traj)
        print(f"{name}: ray {i} end x = {traj[-1, 0]:.6f}", flush=True)
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
                              wrt=wrt, h=h, rtol=rtol)
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


def main():
    import sys
    only = sys.argv[1] if len(sys.argv) > 1 else None
    efit_path = "/root/reference/graph_tests/efit.nc"

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
        # 1e-11: the FD-derivative RHS noise floor (~1e-10 relative) makes
        # tighter integrator tolerances meaningless, and the spiky bicubic
        # cell boundaries make them 10x slower.
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
            which=0, t_final=0.5, rtol=1.0e-11, t_grad=0.25,
            grad_params=[(("k", 0), 1.0e-3), (("p", 2), 1.0e-6)])

        # kamp golden along the config-3 ray-0 trajectory (vacuum-edge
        # states excluded: weak damping needs finite kpar and te > 0, so
        # shift k to add a parallel component as bench.py's absorption
        # mode does)
        states = []
        for row in cfg3["traj"][0][2:8]:
            p, k = row[:3].copy(), row[3:].copy()
            states.append((p, k))
        gen_kamp_fixture("golden_kamp_efit", efit, 500.0, states)


if __name__ == "__main__":
    main()
