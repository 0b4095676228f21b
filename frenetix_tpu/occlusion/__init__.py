"""Occlusion-aware planning: phantom agents in occluded regions."""

from frenetix_tpu.occlusion.occlusion_module import (  # noqa: F401
    OcclusionModule,
    PhantomThresholds,
    external_occlusion_costs,
    phantom_safety_mask,
)
