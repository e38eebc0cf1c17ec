"""Post-processing of result files: NaN cleanup + 3D power-deposition bins.

Counterpart of the reference's utilities/bin.py and fix_NaN.py (which run
nested TensorFlow map_fn loops over every bin).  Here the deposition is a
single vectorized histogram: each trajectory segment's d_power lands in the
bin containing its midpoint - an O(N) scatter-add instead of the
reference's O(N * nx * ny * nz) masked reduction.
"""

from __future__ import annotations

import glob

import numpy as np

from graph_framework_tpu.io.output import ResultFile


def fix_nan(path, spike_threshold=2.0):
    """Scrub NaNs and kamp noise spikes in a result file in place
    (utilities/fix_NaN.py): NaN -> 0, and a step-to-step kamp jump larger
    than ``spike_threshold`` zeroes the earlier sample."""
    import h5py
    with h5py.File(path, "r+") as h:
        if "kamp" not in h:
            return
        k = h["kamp"][...]
        k = np.where(np.isnan(k), 0.0, k)
        jump = np.abs(k[1:] - k[:-1])
        k[:-1] = np.where(jump > spike_threshold, 0.0, k[:-1])
        h["kamp"][...] = k


def bin_power_3d(paths, *, num=(64, 64, 128),
                 lo=(-3.0, -3.0, -3.0), hi=(3.0, 3.0, 3.0)):
    """Accumulate d_power into a 3D cartesian grid over all result files
    (utilities/bin.py).  Returns (bins, (x_edges, y_edges, z_edges))."""
    edges = [np.linspace(lo[d], hi[d], num[d] + 1) for d in range(3)]
    bins = np.zeros(num)
    if isinstance(paths, str):
        paths = sorted(glob.glob(paths))
    for path in paths:
        with ResultFile(path, mode="r") as f:
            nt = f.num_steps
            xs = np.stack([f.read_step(i, ["x"])["x"] for i in range(nt)])
            ys = np.stack([f.read_step(i, ["y"])["y"] for i in range(nt)])
            zs = np.stack([f.read_step(i, ["z"])["z"] for i in range(nt)])
            dp = np.stack([f.read_step(i, ["d_power"])["d_power"]
                           for i in range(nt)])
        # deposit each segment's absorbed power at the segment midpoint
        mx = 0.5 * (xs[1:] + xs[:-1]).ravel()
        my = 0.5 * (ys[1:] + ys[:-1]).ravel()
        mz = 0.5 * (zs[1:] + zs[:-1]).ravel()
        w = dp[1:].ravel()
        h, _ = np.histogramdd(
            np.stack([mx, my, mz], axis=-1), bins=edges, weights=w)
        bins += h
    return bins, tuple(edges)


def save_bins(path, bins, edges):
    """Write the bins file (bins.nc layout of utilities/bin.py)."""
    import h5py
    with h5py.File(path, "w") as h:
        h.create_dataset("bins", data=bins)
        h.create_dataset("xbins", data=edges[0])
        h.create_dataset("ybins", data=edges[1])
        h.create_dataset("zbins", data=edges[2])
