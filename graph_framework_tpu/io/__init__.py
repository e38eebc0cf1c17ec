"""Result-file I/O (NetCDF4/HDF5), async trajectory writing, checkpoints."""

from graph_framework_tpu.io.output import ResultFile, AsyncWriter  # noqa: F401
from graph_framework_tpu.io.checkpoint import (  # noqa: F401
    save_ray_state, restore_ray_state, latest_step)
