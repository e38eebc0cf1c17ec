"""Low-level numeric building blocks (tables, splines, special functions)."""

from graph_framework_tpu.ops.tables import (  # noqa: F401
    table_index_1d,
    piecewise_1d,
    piecewise_2d,
    index_1d,
)
from graph_framework_tpu.ops.spline import (  # noqa: F401
    spline_1d,
    eval_cubic_1d,
    eval_bicubic_2d,
)
from graph_framework_tpu.ops.compensated import (  # noqa: F401
    CompCarry,
    init_comp_carry,
    comp_state_f64,
    compensated_stepper,
)
