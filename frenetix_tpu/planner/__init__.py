"""The replanning cycle: fused candidate evaluation + host orchestration."""

from frenetix_tpu.planner.core import CycleContext, CycleResult, evaluate_cycle  # noqa: F401
