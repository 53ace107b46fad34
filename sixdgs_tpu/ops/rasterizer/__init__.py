"""Differentiable 3DGS rasterizer for TPU.

Replaces the diff-gaussian-rasterization CUDA submodule (interface
reconstructed from the call site /root/reference/gaussian_renderer/__init__.py:36-93;
projection math cross-checked against the in-tree pure-torch EWA reference
/root/reference/pose_estimation/ellipsoid_splatting.py:26-142).

Three layers:
  * projection.py — EWA projection of 3D Gaussians to screen-space
    (means2D, conic, radii, depth, SH color), vmapped jnp.
  * compositing.py — exact depth-sorted front-to-back alpha compositing as a
    chunked lax.scan (differentiable via autodiff + remat). Golden model and
    default training path.
  * tiles.py / pallas kernels — tile-binned fast path.
"""

from sixdgs_tpu.ops.rasterizer.projection import project_gaussians, ProjectedGaussians
from sixdgs_tpu.ops.rasterizer.compositing import rasterize_scan


def resolve_rasterizer(name: str = "auto") -> str:
    """'auto' -> the Pallas kernels on TPU, the XLA tiled path elsewhere."""
    if name != "auto":
        return name
    import jax

    return "pallas" if jax.default_backend() in ("tpu", "axon") else "tiled"


__all__ = ["project_gaussians", "ProjectedGaussians", "rasterize_scan",
           "resolve_rasterizer"]
