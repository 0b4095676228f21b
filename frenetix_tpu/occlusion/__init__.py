"""Occlusion-aware planning: phantom agents in occluded regions."""

from frenetix_tpu.occlusion.occlusion_module import (  # noqa: F401
    OcclusionModule,
    PhantomThresholds,
    phantom_safety_mask,
)
