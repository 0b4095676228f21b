"""Occlusion-aware planning: phantom agents in occluded regions."""

from frenetix_tpu.occlusion.occlusion_module import OcclusionModule  # noqa: F401
