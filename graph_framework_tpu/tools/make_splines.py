"""Generate spline-coefficient equilibrium files from raw grid samples.

The reference's EFIT input files (equilibrium.hpp:84-115) are produced by
Mathematica notebooks (utilities/BiCubicSplines.nb): natural cubic splines of
the 1D profiles and a tensor-product bicubic of psi(R, Z), stored as per-cell
polynomial coefficients **in the global normalized coordinate**
u = (x - offset)/scale (the format ``build_1D_spline`` evaluates,
equilibrium.hpp:1120-1131).  This module is the pure-numpy replacement: feed
it raw uniform-grid samples, get a file ``models.efit.make_efit`` loads.

The bicubic construction mirrors the evaluation structure the reference
documents ("four 1D splines in z combined cubically in r",
equilibrium.hpp:1278-1313): spline each grid row in z, then spline each of
the four z-coefficient fields in r.

All coefficient algebra runs in ``np.longdouble``: the local->global
monomial rebase is ill-conditioned at large cell indices (see
ops.spline.rebase_cells_1d, which performs the inverse rebase at load time),
so extended precision keeps the written tables faithful to the fitted
splines.
"""

from __future__ import annotations

import math

import numpy as np


def _natural_spline_local(y, axis=0):
    """Natural cubic spline of uniformly-spaced samples, cell-local form.

    ``y``: samples along ``axis`` (n points -> n-1 cells).  Returns an array
    with a new leading axis of size 4: coefficients (c0, c1, c2, c3) of
    c0 + c1 t + c2 t^2 + c3 t^3 with t in [0, 1] the in-cell coordinate.
    Second derivatives solve the standard tridiagonal system with natural
    boundary conditions (M_0 = M_{n-1} = 0).
    """
    y = np.moveaxis(np.asarray(y, dtype=np.longdouble), axis, 0)
    n = y.shape[0]
    if n < 2:
        raise ValueError("need at least 2 samples")
    m = np.zeros_like(y)
    if n > 2:
        # tridiagonal [1, 4, 1] m_inner = 6 * second difference
        rhs = 6.0 * (y[2:] - 2.0 * y[1:-1] + y[:-2])
        k = n - 2
        diag = np.full(k, 4.0, dtype=np.longdouble)
        lower = np.ones(k - 1, dtype=np.longdouble)
        upper = np.ones(k - 1, dtype=np.longdouble)
        # Thomas algorithm (vectorized over trailing dims)
        cp = np.zeros(k, dtype=np.longdouble)
        dp = np.zeros((k,) + y.shape[1:], dtype=np.longdouble)
        cp[0] = upper[0] / diag[0] if k > 1 else 0.0
        dp[0] = rhs[0] / diag[0]
        for i in range(1, k):
            denom = diag[i] - lower[i - 1] * cp[i - 1]
            if i < k - 1:
                cp[i] = upper[i] / denom
            dp[i] = (rhs[i] - lower[i - 1] * dp[i - 1]) / denom
        sol = np.zeros_like(dp)
        sol[-1] = dp[-1]
        for i in range(k - 2, -1, -1):
            sol[i] = dp[i] - cp[i] * sol[i + 1]
        m[1:-1] = sol
    c0 = y[:-1]
    c1 = (y[1:] - y[:-1]) - (2.0 * m[:-1] + m[1:]) / 6.0
    c2 = m[:-1] / 2.0
    c3 = (m[1:] - m[:-1]) / 6.0
    out = np.stack([c0, c1, c2, c3])              # (4, n-1, ...)
    return np.moveaxis(out, 1, axis + 1)


def _local_to_global_1d(coeffs):
    """Rebase (4, ncells, ...) cell-local coefficients to the global
    normalized coordinate u = t + i (the file format; inverse of
    ops.spline.rebase_cells_1d)."""
    c = np.asarray(coeffs, dtype=np.longdouble)
    ncells = c.shape[1]
    cells = np.arange(ncells, dtype=np.longdouble)
    cells = cells.reshape((ncells,) + (1,) * (c.ndim - 2))
    out = np.zeros_like(c)
    # c_k t^k = c_k (u - i)^k = sum_{a<=k} C(k,a) c_k (-i)^(k-a) u^a
    for k in range(4):
        for a in range(k + 1):
            out[a] += math.comb(k, a) * c[k] * (-cells) ** (k - a)
    return out


def cubic_spline_coeffs(y, *, local=False):
    """Natural cubic spline coefficients of 1D uniform-grid samples.

    Returns (4, n-1) float64: tables c0..c3 in the file's global normalized
    coordinate (or cell-local when ``local=True``), ready to write as
    ``<name>_c0..3`` and load with ``eval_cubic_1d`` / ``spline_1d``.
    """
    c = _natural_spline_local(y, axis=0)
    if not local:
        c = _local_to_global_1d(c)
    return c.astype(np.float64)


def bicubic_spline_coeffs(f, *, local=False):
    """Tensor-product bicubic coefficients of 2D uniform-grid samples.

    ``f``: (nr, nz) samples.  Returns (4, 4, nr-1, nz-1) float64 indexed
    [a, b, i, j] with a the power of the normalized r coordinate and b the
    power of the normalized z coordinate - the reference's ``psi_cAB``
    layout (equilibrium.hpp:84-115).
    """
    f = np.asarray(f, dtype=np.longdouble)
    # splines along z for every r grid line: (4, nr, nz-1) local in t_z
    cz = _natural_spline_local(f, axis=1)
    # spline each z-coefficient field along r: (4, 4, nr-1, nz-1),
    # [a (r power), b (z power), i, j] local in t_r
    cr = np.stack([_natural_spline_local(cz[b], axis=0)
                   for b in range(4)], axis=1)
    if not local:
        # _local_to_global_1d expects (power, cells, ...): rebase r with
        # the r-cell axis i second, then z with the z-cell axis j second.
        t = np.moveaxis(cr, 2, 1)                 # (4a, i, 4b, j)
        t = _local_to_global_1d(t)                # rebase over i
        t = np.moveaxis(t, 1, 2)                  # (4a, 4b, i, j)
        t = np.transpose(t, (1, 3, 0, 2))         # (4b, j, 4a, i)
        t = _local_to_global_1d(t)                # rebase over j
        cr = np.transpose(t, (2, 0, 3, 1))        # (4a, 4b, i, j)
    return cr.astype(np.float64)


def write_efit_file(path, *, r, z, psi, psi_profile, ne, te, pressure,
                    fpol):
    """Write an EFIT spline file in the reference's format.

    ``r``/``z``: uniform 1D grids [m]; ``psi``: (nr, nz) flux samples;
    ``psi_profile``: uniform 1D grid of psi values the profile samples live
    on; ``ne``/``te``/``pressure``/``fpol``: 1D profile samples on that
    grid (SI units; ne/te/pressure are normalized by their max into the
    file's ``*_scale`` scalars, as the reference's files are).

    Readable by :func:`models.efit.make_efit` (loader keys:
    equilibrium.hpp:1627-1844).
    """
    import h5py

    r = np.asarray(r, dtype=np.float64)
    z = np.asarray(z, dtype=np.float64)
    psi_profile = np.asarray(psi_profile, dtype=np.float64)

    def uniform_step(g, name):
        d = np.diff(g)
        if not np.allclose(d, d[0], rtol=1e-10, atol=0.0):
            raise ValueError(f"{name} grid must be uniform")
        return float(d[0])

    dr = uniform_step(r, "r")
    dz = uniform_step(z, "z")
    dpsi = uniform_step(psi_profile, "psi_profile")

    psi_tables = bicubic_spline_coeffs(psi)

    with h5py.File(path, "w") as h:
        def scalar(name, v):
            h.create_dataset(name, data=np.float64(v))

        scalar("rmin", r[0])
        scalar("dr", dr)
        scalar("zmin", z[0])
        scalar("dz", dz)
        scalar("psimin", psi_profile[0])
        scalar("dpsi", dpsi)
        for a in range(4):
            for b in range(4):
                h.create_dataset(f"psi_c{a}{b}", data=psi_tables[a, b])
        # loader scale keys: ne_scale/te_scale/pres_scale; fpol unscaled
        for name, scale_key, samples in (
                ("ne", "ne_scale", ne), ("te", "te_scale", te),
                ("pressure", "pres_scale", pressure),
                ("fpol", None, fpol)):
            samples = np.asarray(samples, dtype=np.float64)
            if scale_key is not None:
                scale = float(np.max(np.abs(samples))) or 1.0
                scalar(scale_key, scale)
            else:
                scale = 1.0
            tabs = cubic_spline_coeffs(samples / scale)
            for k in range(4):
                h.create_dataset(f"{name}_c{k}", data=tabs[k])
    return path


def write_vmec_file(path, *, s_full, s_half, chi, rmnc, zmns, lmns,
                    xm, xn, signj, dphi):
    """Write a VMEC spline file in the reference's format
    (make_vmec loader keys, equilibrium.hpp:2424-2651; replaces
    utilities/VMECSplines.nb).

    ``s_full``/``s_half``: uniform radial grids (full / half mesh);
    ``chi``: poloidal-flux samples on the full grid; ``rmnc``/``zmns``:
    (num_modes, ns_full) Fourier-coefficient samples on the full grid;
    ``lmns``: (num_modes, ns_half) on the half grid; ``xm``/``xn``: mode
    numbers; ``signj``: Jacobian sign; ``dphi``: toroidal flux derivative.
    Radial cubic splines are fitted per mode (natural BC) and stored in the
    global normalized coordinate, as :func:`models.vmec.make_vmec` expects.
    """
    import h5py

    s_full = np.asarray(s_full, dtype=np.float64)
    s_half = np.asarray(s_half, dtype=np.float64)

    def uniform_step(g, name):
        d = np.diff(g)
        if not np.allclose(d, d[0], rtol=1e-10, atol=0.0):
            raise ValueError(f"{name} grid must be uniform")
        return float(d[0])

    ds = uniform_step(s_full, "s_full")
    dsh = uniform_step(s_half, "s_half")
    if not np.isclose(ds, dsh, rtol=1e-10):
        raise ValueError("full and half mesh must share the step ds")

    def mode_tables(samples):
        # (num_modes, ns) -> (4, num_modes, ncells): spline along s per mode
        c = cubic_spline_coeffs(np.asarray(samples, dtype=np.float64).T)
        return np.moveaxis(c, 2, 1)    # (4, ns-1, m) -> (4, m, ns-1)

    with h5py.File(path, "w") as h:
        def scalar(name, v):
            h.create_dataset(name, data=np.float64(v))

        scalar("signj", signj)
        scalar("dphi", dphi)
        scalar("sminf", s_full[0])
        scalar("sminh", s_half[0])
        scalar("ds", ds)
        h.create_dataset("xm", data=np.asarray(xm, dtype=np.float64))
        h.create_dataset("xn", data=np.asarray(xn, dtype=np.float64))
        chi_tabs = cubic_spline_coeffs(np.asarray(chi, dtype=np.float64))
        for k in range(4):
            h.create_dataset(f"chi_c{k}", data=chi_tabs[k])
        for name, samples in (("rmnc", rmnc), ("zmns", zmns),
                              ("lmns", lmns)):
            tabs = mode_tables(samples)
            for k in range(4):
                h.create_dataset(f"{name}_c{k}", data=tabs[k])
    return path
