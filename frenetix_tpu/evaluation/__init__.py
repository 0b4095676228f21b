"""Post-hoc evaluation: criticality metrics + simulation evaluation driver."""

from frenetix_tpu.evaluation.metrics import CRITICALITY_METRICS, Measures  # noqa: F401
from frenetix_tpu.evaluation.evaluate import evaluate_simulation  # noqa: F401
