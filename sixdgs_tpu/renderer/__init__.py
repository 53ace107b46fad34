"""Public differentiable render API.

Mirrors the reference renderer contract
(/root/reference/gaussian_renderer/__init__.py:18-100): returns the rendered
image, the screen-space gradient receptacle, the visibility filter and
per-Gaussian radii. TPU-side everything is one jitted function; depth sorting,
projection and compositing are fused by XLA.
"""

from __future__ import annotations

from typing import Optional

import jax.numpy as jnp

from sixdgs_tpu.ops.rasterizer import rasterize_scan
from sixdgs_tpu.ops.rasterizer.projection import project_scene


def render(
    viewpoint_camera,
    scene,
    bg_color: jnp.ndarray,
    scaling_modifier: float = 1.0,
    override_color: Optional[jnp.ndarray] = None,
    sh_degree: Optional[int] = None,
    means2d_offset: Optional[jnp.ndarray] = None,
    chunk: int = 256,
    rasterizer: str = "scan",
    **tile_kwargs,
):
    """Render a GaussianScene from a Camera.

    Args:
        viewpoint_camera: scene.cameras.Camera (host struct with matrices).
        scene: GaussianScene pytree.
        bg_color: [3] background.
        scaling_modifier: global scale multiplier.
        override_color: optional [C, 3] precomputed colors.
        sh_degree: active SH degree (static; defaults to scene.max_sh_degree).
        means2d_offset: optional [C, 2] zeros used as the screen-space gradient
            receptacle (reference screenspace_points trick).
        chunk: compositing chunk size (memory/speed knob).

    Returns:
        dict(render=[3,H,W], viewspace_points=means2d_offset or None,
             visibility_filter=[C] bool, radii=[C] int32)
    """
    proj = project_scene(
        scene,
        viewpoint_camera,
        scaling_modifier=scaling_modifier,
        override_color=override_color,
        sh_degree=sh_degree,
        means2d_offset=means2d_offset,
    )
    if rasterizer == "tiled":
        from sixdgs_tpu.ops.rasterizer.tiles import rasterize_tiled

        image = rasterize_tiled(
            proj, viewpoint_camera.width, viewpoint_camera.height, bg_color,
            **tile_kwargs,
        )
    else:
        image = rasterize_scan(
            proj, viewpoint_camera.width, viewpoint_camera.height, bg_color,
            chunk=chunk,
        )
    return {
        "render": image,
        "viewspace_points": means2d_offset,
        "visibility_filter": proj.radii > 0,
        "radii": proj.radii,
    }
