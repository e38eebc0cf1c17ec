"""Result files: time-series of per-ray variables, with async writes.

TPU-native counterpart of ``output::result_file``/``data_set`` and the
double-buffered writer thread (reference: graph_framework/output.hpp:32-472,
solver.hpp:418-424).  The reference writes NetCDF with dimensions
(time=unlimited, num_rays, ray_dim) where ray_dim=2 holds re/im for complex
scalars; we write the same layout in NetCDF4's underlying HDF5 container
via h5py (datasets resizable along time, complex stored as a trailing
re/im axis), so files interoperate with any NetCDF4/HDF5 reader.

The async writer mirrors the reference's overlap of NetCDF writes with
device compute: ``write_step`` hands the device arrays to a worker thread;
jax arrays are fetched to host inside the worker, so dispatch of the next
step is never blocked on I/O.
"""

from __future__ import annotations

import queue
import threading
from typing import Dict, Optional, Sequence

import h5py
import numpy as np


class ResultFile:
    """A time-series result file (output.hpp:32-158).

    Mode "w" creates; "r+" reopens an existing file to append variables
    (the absorption phase reopens the trace output, output.hpp:73-82).
    """

    def __init__(self, path, num_rays: Optional[int] = None, mode="w"):
        self.path = str(path)
        self._h = h5py.File(self.path, mode)
        if num_rays is None:
            num_rays = int(self._h.attrs.get("num_rays", 0)) or None
            if num_rays is None:
                for ds in self._h.values():
                    num_rays = ds.shape[1]
                    break
        else:
            self._h.attrs["num_rays"] = num_rays
        self.num_rays = num_rays
        self._lock = threading.Lock()

    # -- define mode -------------------------------------------------------
    def create_variable(self, name: str, complex_valued=False):
        """(data_set::create_variable, output.hpp:260-273): a resizable
        (time, num_rays[, 2]) dataset."""
        if name in self._h:
            return
        shape = (0, self.num_rays) + ((2,) if complex_valued else ())
        maxshape = (None,) + shape[1:]
        self._h.create_dataset(name, shape=shape, maxshape=maxshape,
                               dtype="f8", chunks=(1,) + shape[1:])

    def variables(self):
        return list(self._h.keys())

    # -- read/write --------------------------------------------------------
    def write_step(self, index: int, values: Dict[str, np.ndarray]):
        """Write one time row for each named variable (strided
        nc_put_vara, output.hpp:353-400)."""
        with self._lock:
            for name, val in values.items():
                ds = self._h[name]
                val = np.asarray(val)
                if np.iscomplexobj(val):
                    val = np.stack([val.real, val.imag], axis=-1)
                if ds.shape[0] <= index:
                    ds.resize(index + 1, axis=0)
                ds[index] = val
            self._h.flush()

    def read_step(self, index: int, names: Sequence[str],
                  complex_valued=False) -> Dict[str, np.ndarray]:
        """Read one time row (the absorption phase's per-timestep read,
        absorption.hpp:465-483)."""
        out = {}
        with self._lock:
            for name in names:
                a = np.asarray(self._h[name][index])
                if a.ndim == 2 and a.shape[-1] == 2 and complex_valued:
                    a = a[..., 0] + 1j * a[..., 1]
                out[name] = a
        return out

    @property
    def num_steps(self):
        # max over variables: freshly-appended variables (e.g. kamp before
        # the absorption pass fills it) still have zero rows.
        sizes = [ds.shape[0] for ds in self._h.values()]
        return max(sizes) if sizes else 0

    def close(self):
        with self._lock:
            self._h.close()

    def __enter__(self):
        return self

    def __exit__(self, *exc):
        self.close()


class AsyncWriter:
    """Single worker thread draining a write queue (the reference's
    detached writer thread + work.wait() handshake, solver.hpp:418-424).

    Device arrays are converted to numpy *in the worker*, so the producer
    thread only enqueues references and returns immediately; JAX transfers
    overlap with subsequent dispatched compute.
    """

    def __init__(self, file: ResultFile, max_pending: int = 2):
        self.file = file
        self._q = queue.Queue(maxsize=max_pending)
        self._err = None
        self._thread = threading.Thread(target=self._run, daemon=True)
        self._thread.start()

    def _run(self):
        while True:
            item = self._q.get()
            if item is None:
                return
            index, values = item
            try:
                self.file.write_step(
                    index, {k: np.asarray(v) for k, v in values.items()})
            except Exception as e:          # surfaced on close()
                self._err = e

    def write_step(self, index: int, values: Dict):
        if self._err:
            raise self._err
        self._q.put((index, dict(values)))

    def close(self):
        self._q.put(None)
        self._thread.join()
        if self._err:
            raise self._err


def state_row(state, residual=None):
    """Map a RayState (+ optional residual) to the reference's output
    variable names (solver.hpp:352-360)."""
    row = {"time": state.t, "w": state.w, "x": state.x, "y": state.y,
           "z": state.z, "kx": state.kx, "ky": state.ky, "kz": state.kz}
    if residual is not None:
        row["residual"] = residual
    return row
