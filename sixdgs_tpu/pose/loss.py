"""Distance-based ray score loss.

Parity with /root/reference/pose_estimation/distance_based_loss.py:
  * target score per ray = 1 - tanh(d_perp), d_perp = distance from the GT
    camera center to the ray, with the closest point clamped to the origin
    when the camera is behind it (:22-37),
  * zeroed for rays behind the camera image plane via the sign of the
    projection onto the camera z-axis (:39-58),
  * scaled so the target sums to the number of (masked) image patches
    (:221-230),
  * loss = MSE(pred, target) (:275-283).

The point-distance score and the pixel-projection "is_inside" map are
computed by the reference but do not feed the final target
(combined_score = target_score, :221); we replicate the used path and expose
the auxiliary ones for completeness.

Padding: target of invalid rays is 0 and both the normalization sum and the
MSE mean run over valid rays only (the reference has no padding).
"""

from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp


class TargetScores(NamedTuple):
    target: jnp.ndarray  # [N] scaled target (combined_score)
    target_raw: jnp.ndarray  # [N] unscaled 1 - tanh(d_perp) with sign mask
    target_with_distance: jnp.ndarray  # [N] auxiliary (x point-distance score)


def target_ray_scores(
    c2w: jnp.ndarray,
    rays_ori: jnp.ndarray,
    rays_dir: jnp.ndarray,
    rays_valid: jnp.ndarray,
    n_patches: jnp.ndarray,
    tanh_denominator: float = 1.0,
) -> TargetScores:
    """Construct the regression target (best_one_to_one_rays_selector, :5-144)."""
    gt_pos = c2w[:3, 3]
    to_cam = gt_pos[None, :] - rays_ori  # [N, 3]
    proj_len = jnp.sum(to_cam * rays_dir, axis=-1, keepdims=True)
    closest = jnp.where(proj_len < 0, rays_ori, rays_ori + proj_len * rays_dir)
    dist = jnp.linalg.norm(closest - gt_pos[None, :], axis=-1)
    target = 1.0 - jnp.tanh(dist / tanh_denominator)

    cam_z = c2w[:3, 2]
    cam_proj = jnp.sum((rays_ori - gt_pos[None, :]) * cam_z[None, :], axis=-1)
    # (sign + 1) / 2: 1 in front, 0 behind (:49-58). 0/0 -> NaN in the
    # reference too; guard to 0 for exact zeros.
    sign = jnp.where(cam_proj == 0, 0.0, (jnp.sign(cam_proj) + 1.0) * 0.5)
    target = target * sign
    target = jnp.where(rays_valid, target, 0.0)

    point_dist = jnp.linalg.norm(to_cam, axis=-1)
    point_score = 1.0 - jnp.tanh(point_dist / tanh_denominator)
    target_with_distance = target * point_score

    denom = jnp.sum(target)
    scale = n_patches.astype(target.dtype) / denom  # (:225-230)
    return TargetScores(
        target=target * scale,
        target_raw=target,
        target_with_distance=target_with_distance,
    )


def distance_score_loss(
    pred_scores: jnp.ndarray,
    c2w: jnp.ndarray,
    rays_ori: jnp.ndarray,
    rays_dir: jnp.ndarray,
    rays_valid: jnp.ndarray,
    n_patches: jnp.ndarray,
):
    """MSE against the scaled target over valid rays.

    Returns (loss, target) like DistanceBasedScoreLoss.forward (:169-283).
    """
    tgt = target_ray_scores(c2w, rays_ori, rays_dir, rays_valid, n_patches)
    target = jnp.where(rays_valid, tgt.target, 0.0)
    diff = jnp.square(pred_scores - target)
    n_valid = jnp.maximum(jnp.sum(rays_valid.astype(diff.dtype)), 1.0)
    loss = jnp.sum(jnp.where(rays_valid, diff, 0.0)) / n_valid
    return loss, target


def cam_up_loss(model_up: jnp.ndarray, cam_up: jnp.ndarray) -> jnp.ndarray:
    """-0.5 cos_sim + 0.5 (pose_estimation/train.py:168-171)."""
    mu = model_up / jnp.maximum(jnp.linalg.norm(model_up), 1e-12)
    cu = cam_up / jnp.maximum(jnp.linalg.norm(cam_up), 1e-12)
    return -0.5 * jnp.sum(mu * cu) + 0.5
