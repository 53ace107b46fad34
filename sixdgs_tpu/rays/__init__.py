"""Ellipsoid-surface ray engine ("explore model" stage of 6DGS)."""

from sixdgs_tpu.rays.engine import Rays, generate_rays

__all__ = ["Rays", "generate_rays"]
