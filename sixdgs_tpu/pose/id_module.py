"""Identification module: compose backbone + ray MLP + attention + up head.

Functional counterpart of /root/reference/pose_estimation/identification_module.py:
``run_attention`` (:77-92) -> score_image; ``test_image`` (:117-133) ->
score_image + top-k in the solver.

The reference shuffles rays with randperm per forward (:103-107); with the
full softmax over all rays the permutation changes only the ordering, and
both prediction and loss target are permuted consistently, so scores are
permutation-equivariant — we skip the shuffle (the ray subsampling path it
enables, rays_to_test != -1, is unused in the reference's main flow).
"""

from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp

from sixdgs_tpu.pose.backbone import backbone_features
from sixdgs_tpu.pose.modules import attention_scores, cam_up_apply, ray_mlp_apply
from sixdgs_tpu.rays.engine import Rays


class ScoreOutput(NamedTuple):
    scores: jnp.ndarray  # [N_rays] per-ray score (sum over masked patches)
    attention: jnp.ndarray  # [256, N_rays] ([0,0] placeholder in fused mode)
    patch_mask: jnp.ndarray  # [256] bool
    cam_up: jnp.ndarray  # [3] unit predicted camera up
    n_patches: jnp.ndarray  # scalar: number of masked patches


def score_image(dino_params, id_params, img, mask, rays: Rays,
                fused_attention: bool = False,
                backbone: str = "dino") -> ScoreOutput:
    """Score every ray against one image.

    Args:
        dino_params: frozen backbone params (DINOv2 or SuperPoint).
        id_params: dict(ray_mlp, attention, cam_up).
        img: [H, W, 3] float in [0, 1].
        mask: [H, W] foreground mask.
        rays: Rays pytree (padded; rays.valid excludes padding).
        fused_attention: use the Pallas streaming kernel — the [256 x N_rays]
            attention matrix never touches HBM; differentiable (custom-VJP
            streaming backward), so it also serves large-ray-count training.
        backbone: "dino" | "superpoint" (backbone_type in the reference's
            IdentificationModule ctor, identification_module.py:11-15).
    """
    feats_pe, patch_mask, fmap = backbone_features(dino_params, img, mask,
                                                   backbone=backbone)
    ray_feats = ray_mlp_apply(id_params["ray_mlp"], rays.ori, rays.dir, rays.rgb)
    if fused_attention:
        from sixdgs_tpu.ops.attention_kernel import fused_ray_scores

        n = rays.ori.shape[0]
        block = 2048 if n % 2048 == 0 else n
        scores = fused_ray_scores(
            id_params, feats_pe, ray_feats, patch_mask, rays.valid, block=block
        )
        attn = jnp.zeros((0, 0), feats_pe.dtype)
    else:
        attn = attention_scores(id_params["attention"], feats_pe, ray_feats, rays.valid)
        # per-ray score = sum over *masked* patches (identification_module.py:82;
        # the reference gathers masked rows before attention, we mask the sum)
        scores = jnp.sum(attn * patch_mask[:, None], axis=0)
    cam_up = cam_up_apply(id_params["cam_up"], fmap)
    cam_up = cam_up / jnp.maximum(jnp.linalg.norm(cam_up), 1e-12)
    return ScoreOutput(
        scores=scores,
        attention=attn,
        patch_mask=patch_mask,
        cam_up=cam_up,
        n_patches=jnp.sum(patch_mask.astype(jnp.int32)),
    )


def compute_image_features(dino_params, img, mask, backbone: str = "dino"):
    """Backbone features for caching: (feats_pe [G*G, D+14], patch_mask
    [G*G], fmap [D, G, G]). The backbone is frozen during id-module training
    (pose_estimation/train.py:36-40), so these are constants per camera — the
    reference recomputes them on every one of the 32 accumulation steps; we
    compute them once per camera."""
    return backbone_features(dino_params, img, mask, backbone=backbone)


def score_image_cached(id_params, feats_pe, patch_mask, fmap, rays: Rays) -> ScoreOutput:
    """score_image with precomputed backbone features."""
    ray_feats = ray_mlp_apply(id_params["ray_mlp"], rays.ori, rays.dir, rays.rgb)
    attn = attention_scores(id_params["attention"], feats_pe, ray_feats, rays.valid)
    scores = jnp.sum(attn * patch_mask[:, None], axis=0)
    cam_up = cam_up_apply(id_params["cam_up"], fmap)
    cam_up = cam_up / jnp.maximum(jnp.linalg.norm(cam_up), 1e-12)
    return ScoreOutput(
        scores=scores,
        attention=attn,
        patch_mask=patch_mask,
        cam_up=cam_up,
        n_patches=jnp.sum(patch_mask.astype(jnp.int32)),
    )
