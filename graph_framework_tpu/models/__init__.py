"""Physics models: equilibria, dispersion relations, ray equations."""

from graph_framework_tpu.models.equilibrium import (  # noqa: F401
    Equilibrium,
    NoMagneticField,
    Slab,
    SlabDensity,
    SlabField,
    GaussianDensity,
    make_no_magnetic_field,
    make_slab,
    make_slab_density,
    make_slab_field,
    make_gaussian_density,
)
from graph_framework_tpu.models.efit import EfitEquilibrium, make_efit  # noqa: F401
from graph_framework_tpu.models.vmec import VmecEquilibrium, make_vmec  # noqa: F401
