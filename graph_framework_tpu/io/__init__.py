"""Result-file I/O (NetCDF4/HDF5) and async trajectory writing."""

from graph_framework_tpu.io.output import ResultFile, AsyncWriter  # noqa: F401
