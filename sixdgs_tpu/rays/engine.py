"""Ray generation from Gaussian ellipsoid surfaces (fixed ray budget).

Behavior parity with /root/reference/pose_estimation/sampling.py:127-267 and
quadricell.py:322-386:
  1. drop degraded ellipsoids (ring count >= target),
  2. pick <= 1000 random valid ellipsoids,
  3. estimate normals from the selected centers (20-NN PCA),
  4. quadricell surface points, rotated into world by the Gaussian rotation,
  5. hemisphere mask: keep points with normal . (R p) > 0,
  6. "isocell" direction mode: ray direction = normalize(R p) (radial),
     origin = R p + center (quadricell.py:369-384),
  7. per-ray RGB: SH evaluated at viewdir = -ray_dir with the parent
     Gaussian's coefficients (sampling.py:236-251, 116-124).

Local-frame note: the reference stacks rings along scale axis 0 but places it
in the LOCAL Z slot before rotating (quadricell.py:100-106,311-317), i.e. the
sampled surface is the ellipsoid with semi-axes (s1, s2, s0) along local
(x, y, z). We replicate exactly.

TPU re-design: every stage is fixed-shape; the ragged mask/compact step
becomes a random-priority argsort into a static N_RAYS budget with a validity
mask that downstream attention uses to exclude padded rays.
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp

from sixdgs_tpu.ops.sh import sh_to_color
from sixdgs_tpu.rays.normals import estimate_normals
from sixdgs_tpu.rays.quadricell import mask_degraded_ellipsoids, quadricell_points


class Rays(NamedTuple):
    ori: jnp.ndarray  # [N, 3]
    dir: jnp.ndarray  # [N, 3]
    rgb: jnp.ndarray  # [N, 3]
    valid: jnp.ndarray  # [N] bool
    gaussian_idx: jnp.ndarray  # [N] int32 parent Gaussian (scene index)


@functools.partial(
    jax.jit,
    static_argnames=(
        "sh_degree", "target_points", "max_ellipsoids", "ray_budget",
        "k_neighbors", "r_max", "p_max",
    ),
)
def generate_rays(
    xyz: jnp.ndarray,
    scaling: jnp.ndarray,
    rotation_mat: jnp.ndarray,
    features: jnp.ndarray,
    active: jnp.ndarray,
    key: jax.Array,
    *,
    sh_degree: int,
    target_points: int = 50,
    max_ellipsoids: int = 1000,
    ray_budget: int = 32768,
    k_neighbors: int = 20,
    r_max: int = 50,
    p_max: int = 32,
) -> Rays:
    """Generate rays from a (padded) Gaussian scene.

    Args:
        xyz: [C, 3]; scaling: [C, 3] activated scales; rotation_mat: [C, 3, 3];
        features: [C, n_coeffs, 3] SH; active: [C] bool; key: PRNG key.
    """
    C = xyz.shape[0]
    k_sel, k_sub = jax.random.split(key)

    valid = active & mask_degraded_ellipsoids(
        scaling[:, 0], scaling[:, 1], scaling[:, 2], target_points
    )
    # random subset of <= max_ellipsoids valid ellipsoids (sampling.py:145-149)
    priority = jax.random.uniform(k_sel, (C,)) + (~valid).astype(jnp.float32) * 1e9
    sel = jnp.argsort(priority)[:max_ellipsoids]  # [E]
    e_valid = valid[sel]
    centers = xyz[sel]
    scales = scaling[sel]
    rots = rotation_mat[sel]

    normals = estimate_normals(centers, k_neighbors, valid=e_valid)

    grid = quadricell_points(
        scales[:, 0], scales[:, 1], scales[:, 2],
        target_points=target_points, r_max=r_max, p_max=p_max,
    )
    E = sel.shape[0]
    pts = grid.points.reshape(E, -1, 3)  # [E, S, 3] local
    slot_valid = grid.valid.reshape(E, -1) & e_valid[:, None]

    world_pts = jnp.einsum("eij,esj->esi", rots, pts)  # rotated, not translated
    hemi = jnp.einsum("ei,esi->es", normals, world_pts) > 0  # quadricell.py:332-341
    slot_valid = slot_valid & hemi

    dirs = world_pts / jnp.maximum(
        jnp.linalg.norm(world_pts, axis=-1, keepdims=True), 1e-12
    )
    oris = world_pts + centers[:, None, :]

    # compact to the static ray budget: random subset when over budget
    flat_valid = slot_valid.reshape(-1)
    n_slots = flat_valid.shape[0]
    pri = jax.random.uniform(k_sub, (n_slots,)) + (~flat_valid).astype(jnp.float32) * 1e9
    order = jnp.argsort(pri)[:ray_budget]
    out_valid = flat_valid[order]

    e_idx = order // pts.shape[1]  # which selected ellipsoid
    ray_ori = oris.reshape(-1, 3)[order]
    ray_dir = dirs.reshape(-1, 3)[order]
    gaussian_idx = sel[e_idx]

    # per-ray color: SH of the parent gaussian at viewdir = -dir
    sh = features[gaussian_idx]  # [N, n_coeffs, 3]
    rgb = sh_to_color(sh_degree, jnp.swapaxes(sh, -1, -2), -ray_dir)

    return Rays(
        ori=jnp.where(out_valid[:, None], ray_ori, 0.0),
        dir=jnp.where(out_valid[:, None], ray_dir, 0.0),
        rgb=jnp.where(out_valid[:, None], rgb, 0.0),
        valid=out_valid,
        gaussian_idx=jnp.where(out_valid, gaussian_idx, -1).astype(jnp.int32),
    )


def generate_rays_from_scene(scene, key, cfg=None, sh_degree=None, **overrides):
    """Convenience wrapper over a GaussianScene (pose_estimation explore_model,
    pretrain_eval_attention.py:163-169)."""
    from sixdgs_tpu.utils.config import PoseEstimationConfig

    cfg = cfg or PoseEstimationConfig()
    kwargs = dict(
        sh_degree=scene.max_sh_degree if sh_degree is None else sh_degree,
        target_points=cfg.quadricell_targets,
        max_ellipsoids=cfg.max_ellipsoids,
        ray_budget=cfg.ray_budget,
        k_neighbors=cfg.knn_normals,
    )
    kwargs.update(overrides)
    return generate_rays(
        scene.xyz,
        scene.get_scaling,
        scene.get_rotation_mat(),
        scene.get_features,
        scene.active,
        key,
        **kwargs,
    )
