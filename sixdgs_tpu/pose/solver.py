"""Pose solver: top-k rays -> dedup -> LS intersection -> rotation assembly.

Parity with /root/reference/pose_estimation/test.py:85-218, including the
behavioral quirks that shape the reported metrics:
  * the duplicate-origin filter replicates torch.isin(...).any(dim=1)'s
    COORDINATE-level membership semantics, not a strict row-unique test
    (:157-162),
  * the LS solve is UNWEIGHTED even though weights are computed (:169-179 —
    the weights argument is commented out), and is re-run unchanged after the
    negative-ray exclusion (only the watch-direction weights change),
  * singular rotation (det < 1e-7) -> identity (:194-196),
  * any NaN in the pose -> identity 4x4 (:216-218).

Fully jittable: the reference's per-image host logic becomes one XLA program
(the <=50 ms/image budget comes from this + the jitted scorer).
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp

from sixdgs_tpu.ops.lines import exclude_negatives, line_intersection_wls, make_rotation_mat


class PoseSolution(NamedTuple):
    c2w: jnp.ndarray  # [4, 4]
    center: jnp.ndarray  # [3]
    watch_dir: jnp.ndarray  # [3]
    topk_idx: jnp.ndarray  # [k]
    topk_weights: jnp.ndarray  # [k] (post-dedup, pre-normalization values)


@functools.partial(jax.jit, static_argnames=("k",))
def solve_pose(
    scores: jnp.ndarray,
    rays_ori: jnp.ndarray,
    rays_dir: jnp.ndarray,
    cam_up: jnp.ndarray,
    rays_valid: jnp.ndarray,
    k: int = 100,
) -> PoseSolution:
    """Assemble a c2w pose from per-ray scores.

    Args:
        scores: [N] per-ray scores.
        rays_ori/rays_dir: [N, 3].
        cam_up: [3] predicted camera up (unit).
        rays_valid: [N] bool.
        k: top-k rays to use (reference: 100, test.py:91).
    """
    masked_scores = jnp.where(rays_valid, scores, -jnp.inf)
    weights, idx = jax.lax.top_k(masked_scores, k)
    ori = rays_ori[idx]
    dirs = rays_dir[idx]

    # duplicate-origin filter with the reference's exact (buggy-loose)
    # semantics (test.py:157-162): torch.isin(rays_ori[idx],
    # unique_once_rows, assume_unique=True).any(dim=1). Because the inputs are
    # NOT unique, torch's sort-based isin marks a coordinate True iff it has
    # an equal at a LATER flattened position of the query, or an equal
    # anywhere in the unique-row coordinate pool; a ray survives if any of
    # its 3 origin coordinates is marked. Verified bit-exact vs the imported
    # reference logic in tests/test_pose_modules.py. Replicated because it
    # shapes the reported pose metrics (SURVEY §7.3(5)).
    finite = jnp.isfinite(weights)
    same = jnp.all(jnp.abs(ori[:, None, :] - ori[None, :, :]) == 0.0, axis=-1)
    counts = jnp.sum(jnp.where(finite[None, :], same, False), axis=-1)
    single = (counts == 1) & finite
    flat = ori.reshape(-1)  # [k*3] query coords, flattened row-major
    kf = flat.shape[0]
    flat_finite = jnp.repeat(finite, 3, total_repeat_length=kf)
    pos = jnp.arange(kf)
    eq = (flat[:, None] == flat[None, :]) & flat_finite[None, :]
    later_dup = jnp.any(eq & (pos[None, :] > pos[:, None]), axis=1)
    pool_valid = jnp.repeat(single, 3, total_repeat_length=kf)
    in_pool = jnp.any(eq & pool_valid[None, :], axis=1)
    keep = jnp.any((later_dup | in_pool).reshape(-1, 3), axis=1) & finite

    w = jnp.where(keep, weights, 0.0)
    w = w / jnp.sum(w)
    center = line_intersection_wls(ori, dirs, mask=keep)  # unweighted (quirk)
    w = w * exclude_negatives(center, ori, dirs)
    w = w / jnp.sum(w)
    center = line_intersection_wls(ori, dirs, mask=keep)  # re-solve, unchanged

    watch_dir = jnp.sum(dirs * w[:, None], axis=0)
    watch_dir = watch_dir / jnp.linalg.norm(watch_dir)

    R_w2c = make_rotation_mat(-watch_dir, cam_up)
    det = jnp.dot(R_w2c[0], jnp.cross(R_w2c[1], R_w2c[2]))
    R_w2c = jnp.where(det < 1e-7, jnp.eye(3, dtype=R_w2c.dtype), R_w2c)
    # rows orthonormal by construction -> inverse == transpose
    R_c2w = R_w2c.T

    c2w = jnp.eye(4, dtype=scores.dtype)
    c2w = c2w.at[:3, :3].set(R_c2w)
    c2w = c2w.at[:3, 3].set(center)
    c2w = jnp.where(jnp.any(jnp.isnan(c2w)), jnp.eye(4, dtype=scores.dtype), c2w)
    return PoseSolution(c2w=c2w, center=center, watch_dir=watch_dir,
                        topk_idx=idx, topk_weights=jnp.where(keep, weights, 0.0))


def inv3x3(R: jnp.ndarray) -> jnp.ndarray:
    """Adjugate inverse with triple-product det (full f32 on TPU)."""
    det = jnp.dot(R[0], jnp.cross(R[1], R[2]))
    adj = jnp.stack(
        [jnp.cross(R[:, 1], R[:, 2]), jnp.cross(R[:, 2], R[:, 0]),
         jnp.cross(R[:, 0], R[:, 1])], axis=0,
    )
    return adj / det


def translation_error(t_gt: jnp.ndarray, t_pred: jnp.ndarray) -> jnp.ndarray:
    """(error_computation.py:3-4)"""
    return jnp.linalg.norm(t_gt - t_pred)


def angular_error_deg(R_gt: jnp.ndarray, R_est: jnp.ndarray) -> jnp.ndarray:
    """arccos((tr(R_gt R_est^-1) - 1)/2) in degrees (error_computation.py:6-8)."""
    cos_angle = (jnp.trace(R_gt @ inv3x3(R_est)) - 1.0) / 2.0
    return jnp.rad2deg(jnp.arccos(jnp.clip(cos_angle, -1.0, 1.0)))
