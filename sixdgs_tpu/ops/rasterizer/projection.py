"""EWA projection of 3D Gaussians to screen space.

Implements the projection stage of the 3DGS rasterizer: world->camera
transform, perspective EWA Jacobian, 2D covariance with the 0.3-pixel
low-pass, conic + radius, pixel-space means, and per-Gaussian SH color.

Math parity references (no CUDA in-tree; reconstructed from):
  * /root/reference/pose_estimation/ellipsoid_splatting.py:30-101 (Jacobian,
    1.3*tan_fov frustum clamping, +0.3 low-pass diagonal),
  * call-site contract /root/reference/gaussian_renderer/__init__.py:36-100
    (radii > 0 visibility, screen-space means gradient receptacle).

Everything is a single fused batch of [P]-shaped array ops — XLA maps it onto
the VPU/MXU without any per-Gaussian loop.
"""

from __future__ import annotations

from typing import NamedTuple, Optional

import jax.numpy as jnp

from sixdgs_tpu.ops.sh import sh_to_color
from sixdgs_tpu.ops.transforms import build_covariance

# The CUDA rasterizer culls at view-space depth 0.2 (forward.cu in_frustum).
NEAR_CULL = 0.2
LOW_PASS = 0.3


class ProjectedGaussians(NamedTuple):
    means2d: jnp.ndarray  # [P, 2] pixel coords
    depths: jnp.ndarray  # [P] view-space z
    conics: jnp.ndarray  # [P, 3] inverse 2D covariance (xx, xy, yy)
    radii: jnp.ndarray  # [P] int32 screen radius (0 = culled)
    colors: jnp.ndarray  # [P, 3]
    opacities: jnp.ndarray  # [P]


def project_gaussians(
    means3d: jnp.ndarray,
    cov3d: jnp.ndarray,
    opacities: jnp.ndarray,
    view: jnp.ndarray,
    full_proj: jnp.ndarray,
    camera_center: jnp.ndarray,
    width: int,
    height: int,
    tan_fovx: float,
    tan_fovy: float,
    sh: Optional[jnp.ndarray] = None,
    sh_degree: int = 0,
    colors_precomp: Optional[jnp.ndarray] = None,
    active: Optional[jnp.ndarray] = None,
) -> ProjectedGaussians:
    """Project Gaussians to screen space.

    Args:
        means3d: [P, 3] world-space centers.
        cov3d: [P, 3, 3] world-space covariance.
        opacities: [P] or [P, 1] activated opacity.
        view: [4, 4] world->camera.
        full_proj: [4, 4] proj @ view.
        camera_center: [3] world-space camera position.
        width/height: image size (static).
        tan_fovx/tan_fovy: tangents of half FoV (static floats).
        sh: [P, n_coeffs, 3] SH coefficients (used if colors_precomp is None).
        sh_degree: active SH degree (static int).
        colors_precomp: [P, 3] precomputed colors (overrides SH).
        active: [P] bool validity mask of padded scenes.

    Returns:
        ProjectedGaussians with radii == 0 for culled entries.
    """
    P = means3d.shape[0]
    focal_x = width / (2.0 * tan_fovx)
    focal_y = height / (2.0 * tan_fovy)

    ones = jnp.ones((P, 1), means3d.dtype)
    hom = jnp.concatenate([means3d, ones], axis=-1)  # [P, 4]
    t = hom @ view.T  # [P, 4] view-space
    tz = t[:, 2]
    in_front = tz > NEAR_CULL

    # frustum-clamped view coords feeding the Jacobian
    safe_tz = jnp.where(jnp.abs(tz) < 1e-6, 1e-6, tz)
    limx, limy = 1.3 * tan_fovx, 1.3 * tan_fovy
    txz = jnp.clip(t[:, 0] / safe_tz, -limx, limx) * safe_tz
    tyz = jnp.clip(t[:, 1] / safe_tz, -limy, limy) * safe_tz
    z2 = jnp.square(safe_tz)

    # EWA Jacobian (2x3) and T = J @ W
    zeros = jnp.zeros_like(tz)
    J = jnp.stack(
        [
            jnp.stack([focal_x / safe_tz, zeros, -(focal_x * txz) / z2], axis=-1),
            jnp.stack([zeros, focal_y / safe_tz, -(focal_y * tyz) / z2], axis=-1),
        ],
        axis=-2,
    )  # [P, 2, 3]
    W = view[:3, :3]
    T = J @ W[None]  # [P, 2, 3]
    cov2d = T @ cov3d @ jnp.swapaxes(T, -1, -2)  # [P, 2, 2]
    cov2d = cov2d + LOW_PASS * jnp.eye(2, dtype=cov2d.dtype)

    a = cov2d[:, 0, 0]
    b = cov2d[:, 0, 1]
    c = cov2d[:, 1, 1]
    det = a * c - b * b
    det_valid = det > 0.0
    safe_det = jnp.where(det_valid, det, 1.0)
    conics = jnp.stack([c / safe_det, -b / safe_det, a / safe_det], axis=-1)

    mid = 0.5 * (a + c)
    lambda1 = mid + jnp.sqrt(jnp.maximum(0.1, mid * mid - det))
    radius = jnp.ceil(3.0 * jnp.sqrt(lambda1))

    # pixel centers: ndc -> ((ndc + 1) * size - 1) / 2 (CUDA ndc2Pix)
    p_hom = hom @ full_proj.T
    p_w = 1.0 / (p_hom[:, 3] + 1e-7)
    ndc = p_hom[:, :3] * p_w[:, None]
    means2d = jnp.stack(
        [
            ((ndc[:, 0] + 1.0) * width - 1.0) * 0.5,
            ((ndc[:, 1] + 1.0) * height - 1.0) * 0.5,
        ],
        axis=-1,
    )

    # visibility: in frustum, positive-definite cov, overlapping the screen
    on_screen = (
        (means2d[:, 0] + radius > 0)
        & (means2d[:, 0] - radius < width)
        & (means2d[:, 1] + radius > 0)
        & (means2d[:, 1] - radius < height)
    )
    visible = in_front & det_valid & on_screen
    if active is not None:
        visible = visible & active
    radii = jnp.where(visible, radius, 0.0).astype(jnp.int32)

    if colors_precomp is not None:
        colors = colors_precomp
    else:
        assert sh is not None
        dirs = means3d - camera_center[None]
        dirs = dirs / jnp.maximum(
            jnp.linalg.norm(dirs, axis=-1, keepdims=True), 1e-12
        )
        # sh layout [P, n_coeffs, 3] -> eval over channel-last
        colors = sh_to_color(sh_degree, jnp.swapaxes(sh, -1, -2), dirs)

    opac = opacities.reshape(P)
    # sanitize culled entries: degenerate projections (behind camera, singular
    # cov, diverged params) can carry NaN/Inf means/conics; zero opacity alone
    # does not stop NaN propagation through alpha = opac * exp(power)
    safe2d = jnp.where(visible[:, None], means2d, 0.0)
    safe2d = jnp.where(jnp.isfinite(safe2d), safe2d, 0.0)
    safe_con = jnp.where(visible[:, None], conics, jnp.asarray([[1.0, 0.0, 1.0]]))
    safe_con = jnp.where(jnp.isfinite(safe_con), safe_con, 1.0)
    safe_col = jnp.where(jnp.isfinite(colors), colors, 0.0)
    safe_opac = jnp.where(visible & jnp.isfinite(opac), opac, 0.0)
    return ProjectedGaussians(
        means2d=safe2d,
        depths=tz,
        conics=safe_con,
        radii=radii,
        colors=safe_col,
        opacities=safe_opac,
    )


def project_scene(scene, camera, scaling_modifier: float = 1.0,
                  override_color: Optional[jnp.ndarray] = None,
                  sh_degree: Optional[int] = None,
                  means2d_offset: Optional[jnp.ndarray] = None) -> ProjectedGaussians:
    """Project a GaussianScene through a Camera.

    ``means2d_offset`` is the zero-valued gradient receptacle mirroring the
    reference's screenspace_points trick (gaussian_renderer/__init__.py:26-30):
    grads w.r.t. it are the screen-space position gradients that drive
    densification.
    """
    import math

    deg = scene.max_sh_degree if sh_degree is None else sh_degree
    cov3d = build_covariance(scene.get_scaling, scene.rotation, scaling_modifier)
    proj = project_gaussians(
        scene.xyz,
        cov3d,
        scene.get_opacity,
        jnp.asarray(camera.view),
        jnp.asarray(camera.full_proj),
        jnp.asarray(camera.camera_center),
        camera.width,
        camera.height,
        math.tan(camera.FoVx * 0.5),
        math.tan(camera.FoVy * 0.5),
        sh=None if override_color is not None else scene.get_features,
        sh_degree=deg,
        colors_precomp=override_color,
        active=scene.active,
    )
    if means2d_offset is not None:
        proj = proj._replace(means2d=proj.means2d + means2d_offset)
    return proj
