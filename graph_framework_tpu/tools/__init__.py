"""Input-generation tooling (counterpart of the reference's utilities/).

The reference generates its spline-coefficient equilibrium files with
Mathematica notebooks (utilities/BiCubicSplines.nb, Efit_gold_data.nb);
:mod:`make_splines` replaces that upstream step with a pure-numpy generator
writing the same file format that :func:`models.efit.make_efit` reads.
"""

from graph_framework_tpu.tools.make_splines import (
    cubic_spline_coeffs, bicubic_spline_coeffs, write_efit_file,
    write_vmec_file)

__all__ = ["cubic_spline_coeffs", "bicubic_spline_coeffs",
           "write_efit_file", "write_vmec_file"]
