"""Weighted least-squares line intersection and pose assembly helpers.

Parity with /root/reference/pose_estimation/line_intersection.py:
  * line_intersection_wls == compute_line_intersection_impl2 (:75-154):
    projector normal equations (sum w (I - d d^T)) p = sum w (I - d d^T) o,
    det < 1e-7 -> NaN sentinel. Ours adds an optional validity mask so it is
    jittable under fixed-size padding, and solves the 3x3 system in closed
    form (adjugate) — branch-free, no host sync.
  * exclude_negatives (:29-34), make_rotation_mat (:236-257).

All functions are jit/vmap friendly.
"""

from __future__ import annotations

import jax.numpy as jnp


def line_intersection_wls(points, directions, weights=None, mask=None,
                          det_eps: float = 1.0e-7):
    """LS intersection of N lines (origin o_i, unit direction d_i).

    Args:
        points: [N, 3] origins.
        directions: [N, 3] unit directions.
        weights: optional [N] weights.
        mask: optional [N] bool; padded entries contribute nothing.
        det_eps: singular guard threshold (reference: 1e-7).

    Returns:
        [3] intersection, NaN-filled when the normal matrix is singular
        (reference behavior, line_intersection.py:139-142).
    """
    d = directions
    eye = jnp.eye(3, dtype=points.dtype)
    projs = eye[None] - d[:, :, None] * d[:, None, :]  # [N,3,3]
    w = jnp.ones(points.shape[0], dtype=points.dtype)
    if weights is not None:
        w = w * weights
    if mask is not None:
        w = w * mask.astype(points.dtype)
    pw = projs * w[:, None, None]
    R = jnp.sum(pw, axis=0)  # [3,3]
    q = jnp.sum(pw @ points[:, :, None], axis=0)[:, 0]  # [3]

    # explicit triple-product determinant: jnp.linalg.det lowers to LU with
    # reduced-precision matmuls on TPU, which breaks the det<1e-7 singular
    # guard for exactly-parallel bundles (caught on hardware); elementwise
    # VPU ops keep full f32.
    detR = jnp.dot(R[0], jnp.cross(R[1], R[2]))
    # closed-form 3x3 solve via adjugate (guarded against /0)
    safe_det = jnp.where(jnp.abs(detR) < 1e-30, 1.0, detR)
    adj = jnp.stack(
        [
            jnp.cross(R[:, 1], R[:, 2]),
            jnp.cross(R[:, 2], R[:, 0]),
            jnp.cross(R[:, 0], R[:, 1]),
        ],
        axis=0,
    )  # rows of adjugate^T ... adj[i] = cross of columns
    p = (adj @ q) / safe_det
    nan3 = jnp.full((3,), jnp.nan, dtype=points.dtype)
    return jnp.where(detR < det_eps, nan3, p)


def exclude_negatives(camera_center, points, directions):
    """1.0 where the solved center lies in front of the ray origin along the
    ray (line_intersection.py:29-34), else 0.0."""
    v = camera_center[None, :] - points
    dproj = jnp.sum(v * directions, axis=-1)
    return (dproj > 0).astype(points.dtype)


def make_rotation_mat(direction, up):
    """World->camera rotation from a view direction and an up hint via
    Gram-Schmidt (line_intersection.py:236-257). Rows are (x, y, z=direction)
    camera axes expressed in world coordinates."""
    xaxis = jnp.cross(up, direction)
    xaxis = xaxis / jnp.linalg.norm(xaxis, axis=-1, keepdims=True)
    yaxis = jnp.cross(direction, xaxis)
    yaxis = yaxis / jnp.linalg.norm(yaxis, axis=-1, keepdims=True)
    return jnp.stack([xaxis, yaxis, direction], axis=-2)
