"""Risk & harm assessment: batched injury-probability models, collision
probabilities, and ethical risk aggregation."""

from frenetix_tpu.risk.harm import (  # noqa: F401
    DEFAULT_HARM_COEFFS, ObstacleMeta, obstacle_mass, obstacle_protection,
)
from frenetix_tpu.risk.costs import DEFAULT_RISK_MODES, trajectory_risks  # noqa: F401
