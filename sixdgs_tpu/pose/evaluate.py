"""Pose-estimation evaluation loop.

Parity with /root/reference/pose_estimation/test.py:23-323: per-image score ->
top-100 -> dedup -> LS solve -> rotation assembly -> translation/angular
errors; the eval-with-loss_fn mode replaces predictions with target scores
(the reference's training-time "validation" quirk, :111-142) and reports
recall@100 and the average score loss.

The reference round-trips through host logic per image; here score+solve+error
is ONE jitted function — this is where the <=50 ms/image target is won.
"""

from __future__ import annotations

import functools
import time
from typing import List

import numpy as np
import jax
import jax.numpy as jnp

from sixdgs_tpu.pose.id_module import score_image
from sixdgs_tpu.pose.loss import distance_score_loss
from sixdgs_tpu.pose.solver import angular_error_deg, solve_pose, translation_error
from sixdgs_tpu.pose.trainer import prepare_image_mask
from sixdgs_tpu.rays.engine import Rays


@functools.partial(jax.jit, static_argnames=("k", "use_target_scores",
                                             "fused_attention", "backbone"))
def eval_image(
    dino_params,
    id_params,
    img: jnp.ndarray,
    mask: jnp.ndarray,
    gt_c2w: jnp.ndarray,
    rays: Rays,
    k: int = 100,
    use_target_scores: bool = False,
    fused_attention: bool = False,
    backbone: str = "dino",
):
    """Score, solve and compare one image against ground truth."""
    out = score_image(dino_params, id_params, img, mask, rays,
                      fused_attention=fused_attention, backbone=backbone)
    loss_score, target = distance_score_loss(
        out.scores, gt_c2w, rays.ori, rays.dir, rays.valid, out.n_patches
    )
    # recall@k: overlap between top-k predicted and top-k target rays (:122-124)
    pred_top = jax.lax.top_k(jnp.where(rays.valid, out.scores, -jnp.inf), k)[1]
    tgt_top = jax.lax.top_k(jnp.where(rays.valid, target, -jnp.inf), k)[1]
    recall = jnp.mean(
        jnp.any(pred_top[:, None] == tgt_top[None, :], axis=-1).astype(jnp.float32)
    )
    scores = target if use_target_scores else out.scores
    sol = solve_pose(scores, rays.ori, rays.dir, out.cam_up, rays.valid, k=k)
    t_err = translation_error(gt_c2w[:3, 3], sol.c2w[:3, 3])
    a_err = angular_error_deg(gt_c2w[:3, :3], sol.c2w[:3, :3])
    return {
        "c2w": sol.c2w,
        "translation_error": t_err,
        "angular_error": a_err,
        "loss_score": loss_score,
        "recall": recall,
        "mean_weight": jnp.mean(sol.topk_weights),
    }


def test_pose_estimation(
    cam_infos: List,
    dino_params,
    id_params,
    rays: Rays,
    model_up,
    sequence_id: str = "",
    category_id: str = "",
    use_target_scores: bool = False,
    k: int = 100,
    backbone: str = "dino",
):
    """Evaluate a list of CameraInfo (reference signature analogue).

    Returns (results, avg_translation_error, avg_angular_error,
    avg_loss_score, avg_recall) like test.py:323.
    """
    results = []
    t_errs, a_errs, losses, recalls = [], [], [], []
    start = time.time()
    for img_idx, info in enumerate(cam_infos):
        img, mask = prepare_image_mask(info)
        out = eval_image(
            dino_params, id_params, jnp.asarray(img), jnp.asarray(mask),
            jnp.asarray(info.c2w()), rays, k=k, use_target_scores=use_target_scores,
            backbone=backbone,
        )
        out = jax.device_get(out)
        t_errs.append(float(out["translation_error"]))
        a_errs.append(float(out["angular_error"]))
        losses.append(float(out["loss_score"]))
        recalls.append(float(out["recall"]))
        results.append(
            {
                "sequence_id": sequence_id,
                "category_name": category_id,
                "frame_id": img_idx,
                "loss": float(out["mean_weight"]),
                "scores_loss": float(out["loss_score"]),
                "recall": float(out["recall"]),
                "total_optimization_time_in_ms": 0.0,
                "pred_c2w": np.asarray(out["c2w"]).tolist(),
                "gt_c2w": info.c2w().tolist(),
            }
        )
    total = time.time() - start
    n = max(len(cam_infos), 1)
    return (
        results,
        float(np.mean(t_errs)) if t_errs else float("nan"),
        float(np.mean(a_errs)) if a_errs else float("nan"),
        float(np.mean(losses)) if losses else float("nan"),
        float(np.mean(recalls)) if recalls else float("nan"),
        total / n,
    )
