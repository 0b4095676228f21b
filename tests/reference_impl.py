"""Differential-test oracle — re-exported from the package's NumPy backend.

The scalar-loop spec implementation lives in
`frenetix_tpu.planner.numpy_backend` (the reference's dual-backend design:
the slow readable implementation doubles as a selectable debugging backend);
tests import it from here for historical reasons.
"""
from frenetix_tpu.planner.numpy_backend import *  # noqa: F401,F403
from frenetix_tpu.planner.numpy_backend import (  # noqa: F401
    _EPS, check_feasibility_single, cost_terms_single, interpolate_angle,
    make_valid_orientation, poly_eval, quartic_coeffs_solve,
    quintic_coeffs_solve, seg_index, simpson_scipy_like, squared_jerk_integral,
    frenet_to_cartesian_point,
)
