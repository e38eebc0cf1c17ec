"""Physical constants shared by the dispersion functions.

Values match the reference's ``dispersion::physics`` base class
(reference: graph_framework/dispersion.hpp:489-503) so that trajectories are
bit-comparable across frameworks.

The framework works in the reference's normalized units
(graph_framework/dispersion.hpp "Normalization" docs): frequencies are scaled
by the speed of light (omega' = omega/c, units 1/m), time is scaled to
t' = t*c (units m), so phase and group velocities are dimensionless fractions
of c.
"""

import math

#: Vacuum permittivity [F/m] (dispersion.hpp:493).
EPSILON0 = 8.8541878138e-12

#: Vacuum permeability [H/m] (dispersion.hpp:495).
MU0 = math.pi * 4.0e-7

#: Fundamental charge [C] (dispersion.hpp:497).
Q = 1.602176634e-19

#: Electron mass [kg] (dispersion.hpp:499).
ME = 9.1093837015e-31

#: Speed of light [m/s], derived exactly as the reference does
#: (dispersion.hpp:501: c = 1/sqrt(epsilon0*mu0)).
C = 1.0 / math.sqrt(EPSILON0 * MU0)

#: Default ion (deuteron) mass [kg] used by all analytic equilibria
#: (equilibrium.hpp slab/no_magnetic_field constructors: 3.34449469E-27).
MI_DEUTERIUM = 3.34449469e-27


def plasma_frequency_squared(n, q, m):
    """Normalized plasma frequency squared: wp'^2 = n q^2 / (eps0 m c^2).

    Matches ``dispersion::build_plasma_frequency``
    (dispersion.hpp:324-333): the reference returns n*q*q/(epsilon0*m*c*c),
    i.e. (wp/c)^2 in 1/m^2.
    """
    return n * q * q / (EPSILON0 * m * C * C)


def cyclotron_frequency(q, b, m):
    """Normalized cyclotron frequency: wc' = q B / (m c).

    Matches ``dispersion::build_cyclotron_frequency`` (dispersion.hpp:346-353).
    Note electrons pass a *negative* charge.
    """
    return q * b / (m * C)
