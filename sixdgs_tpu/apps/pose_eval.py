"""Pose-estimation driver (parity with /root/reference/pretrain_eval_attention.py
and /root/reference/pose_estimation/{opt,file_utils}.py).

Scans an experiment directory of trained 3DGS models (``<prefix><scene>_<uuid>``
dirs with ``cfg_args`` + ``point_cloud/iteration_N/point_cloud.ply``), trains
the identification module per scene, evaluates pose estimation on the test
split, and dumps a JSON results list.

Usage:
    python -m sixdgs_tpu.apps.pose_eval --exp_path <dir> --out_path out.json
        [--data_type tankstemple|mip360|blender|cambridge_landmark|all]
        [--dino_weights dinov2_vits14.pth|.npz]
"""

from __future__ import annotations

import argparse
import json
import os
import traceback

import numpy as np
import jax
import jax.numpy as jnp

from sixdgs_tpu.scene.dataset_loader import load_data
from sixdgs_tpu.scene.gaussians import load_ply
from sixdgs_tpu.utils.config import PoseEstimationConfig, dotdict, read_cfg_args
from sixdgs_tpu.utils.metrics_writer import MetricsWriter

PREFIXES = {
    "blender": "synthetic_",
    "mip360": "mip_360_",
    "tankstemple": "tt_",
    "cambridge_landmark": "cl_",
    "all": "",
}


def get_highest_valid_checkpoint(root_dir: str) -> str:
    """Largest point_cloud/iteration_*/point_cloud.ply (file_utils.py:19-43)."""
    ckpt_dir = os.path.join(root_dir, "point_cloud")
    if not os.path.isdir(ckpt_dir):
        return ""
    best, best_path = -1, ""
    for name in sorted(os.listdir(ckpt_dir), reverse=True):
        parts = name.split("_")
        if parts[0] != "iteration":
            continue
        try:
            val = int(parts[1])
        except ValueError:
            continue
        path = os.path.join(ckpt_dir, name, "point_cloud.ply")
        if os.path.exists(path) and val > best:
            best, best_path = val, path
    return best_path


def parse_exp_dir(exp_dir: str, prefix: str):
    """Scan experiment dirs keyed by scene id (file_utils.py:46-72)."""
    out = {}
    for name in sorted(os.listdir(exp_dir)):
        path = os.path.join(exp_dir, name)
        if not (os.path.isdir(path) and name.startswith(prefix)):
            continue
        parts = name.split("_")
        sequence_id = parts[-1]
        category_name = "_".join(parts[:-1])
        ckpt = get_highest_valid_checkpoint(path)
        if not ckpt:
            print(f"Object {sequence_id} of category {category_name} skipped: "
                  "no valid checkpoint")
            continue
        out[sequence_id] = {
            "exp_dir_filepath": path,
            "checkpoint_filepath": ckpt,
            "sequence_id": sequence_id,
            "category_name": category_name,
        }
    return out


def pretrain_single_object(
    checkpoint_filepath: str,
    checkpoint_args: dotdict,
    exp_dir_filepath: str,
    object_id: str,
    category_name: str,
    dino_params,
    cfg: PoseEstimationConfig,
    seed: int = 55176280,
    backbone: str = "dino",
):
    """Train + evaluate one scene (pretrain_eval_attention.py:31-154)."""
    from sixdgs_tpu.pose.evaluate import test_pose_estimation
    from sixdgs_tpu.pose.modules import init_id_module
    from sixdgs_tpu.pose.trainer import PoseTrainer, model_up_from_cameras
    from sixdgs_tpu.rays.engine import generate_rays_from_scene

    print("data_path:", checkpoint_args.source_path)
    scene = load_ply(checkpoint_filepath, max_sh_degree=checkpoint_args.sh_degree)
    scene_info = load_data(checkpoint_args)

    feature_dim, grid = (256, 28) if backbone == "superpoint" else (384, 16)
    id_params = init_id_module(jax.random.key(seed), feature_dim=feature_dim,
                               grid=grid)
    ckpt_path = os.path.join(exp_dir_filepath, "id_module.npz")
    trainer = PoseTrainer(
        dino_params, id_params, scene, scene_info.train_cameras, cfg, seed=seed,
        backbone=backbone,
    )
    start_iterations = 0
    if os.path.exists(ckpt_path):
        # full resume: params + Adafactor state + running_loss, the reference
        # id_module.th semantics (pretrain_eval_attention.py:66-71)
        print("Checkpoint already exists, resuming (or skipping training)")
        start_iterations = trainer.restore_checkpoint(ckpt_path)
    writer = MetricsWriter(exp_dir_filepath, filename="pose_metrics.jsonl")

    def cb(it, aux, tr):
        writer.scalar("train/loss", aux["loss"], it)
        writer.scalar("train/loss_score", aux["loss_score"], it)
        writer.scalar("train/cam_up", aux["cam_up"], it)
        print(f"[{it}] loss: {aux['loss']:.5f}")

    if start_iterations < cfg.n_iterations:
        trainer.run(start_iteration=start_iterations, callback=cb,
                    test_cam_infos=scene_info.test_cameras, writer=writer)
        trainer.save_checkpoint(ckpt_path, epoch=cfg.n_iterations)
    id_params = trainer.id_params

    print("Training complete, starting testing phase...")
    rays = generate_rays_from_scene(scene, jax.random.key(seed + 1), cfg)
    model_up = jnp.asarray(model_up_from_cameras(scene_info.train_cameras))

    print("Testing overfit performances (target scores)...")
    (_, ov_t, ov_a, ov_s, ov_r, _) = test_pose_estimation(
        scene_info.test_cameras, dino_params, id_params, rays, model_up,
        sequence_id=object_id, category_id=category_name, use_target_scores=True,
        k=cfg.rays_to_output, backbone=backbone,
    )
    print("Overfit AVG translation error:", ov_t)
    print("Overfit AVG angular error:", ov_a)

    print("Testing performances on same points...")
    (results, t_err, a_err, s_loss, recall, t_img) = test_pose_estimation(
        scene_info.test_cameras, dino_params, id_params, rays, model_up,
        sequence_id=object_id, category_id=category_name, k=cfg.rays_to_output,
        backbone=backbone,
    )
    print("Test AVG translation error:", t_err)
    print("Test AVG angular error:", a_err)
    print("Test recall:", recall)
    print("Time per element:", t_img)
    writer.close()
    return results


def main(argv=None):
    parser = argparse.ArgumentParser(description="sixdgs_tpu pose evaluation")
    parser.add_argument("--exp_path", type=str, required=True)
    parser.add_argument("--out_path", type=str, required=True)
    parser.add_argument(
        "--data_type", type=str, default="all", choices=list(PREFIXES.keys())
    )
    parser.add_argument("--dino_weights", type=str, default=None,
                        help="converted DINOv2-S/14 weights (.npz or torch .pth); "
                        "random init if absent (no-egress container)")
    parser.add_argument("--backbone", type=str, default="dino",
                        choices=["dino", "superpoint"],
                        help="image backbone (backbone_type in the reference "
                        "IdentificationModule; superpoint = 28x28 grid, "
                        "256-dim descriptors)")
    parser.add_argument("--superpoint_weights", type=str, default=None,
                        help="converted superpoint_v1 weights (.npz)")
    parser.add_argument("--n_iterations", type=int, default=1500)
    parser.add_argument("--ray_budget", type=int, default=32768)
    parser.add_argument("--batch", type=int, default=32)
    parser.add_argument("--platform", type=str, default=None,
                        choices=["cpu", "tpu", "axon"])
    args = parser.parse_args(argv)
    if args.platform:
        jax.config.update("jax_platforms", args.platform)

    from sixdgs_tpu.pose import dino

    if args.backbone == "superpoint":
        from sixdgs_tpu.pose import superpoint as sp_mod

        if args.superpoint_weights:
            import numpy as _np

            flat = dict(_np.load(args.superpoint_weights))
            dino_params = {
                name: {"w": jnp.asarray(flat[f"{name}.w"]),
                       "b": jnp.asarray(flat[f"{name}.b"])}
                for name in set(k.rsplit(".", 1)[0] for k in flat)
            }
        else:
            dino_params = sp_mod.init_params(jax.random.key(71170))
    else:
        dino_params = dino.load_params(args.dino_weights,
                                       key=jax.random.key(71170))
    cfg = PoseEstimationConfig(
        n_iterations=args.n_iterations,
        ray_budget=args.ray_budget,
        gradient_accumulation_steps=args.batch,
    )

    out_abs = os.path.abspath(args.out_path)
    os.makedirs(os.path.dirname(out_abs), exist_ok=True)
    results = []
    experiments = parse_exp_dir(args.exp_path, PREFIXES[args.data_type])
    for exp in experiments.values():
        checkpoint_args = dotdict(read_cfg_args(exp["exp_dir_filepath"]))
        try:
            results.extend(
                pretrain_single_object(
                    exp["checkpoint_filepath"],
                    checkpoint_args,
                    exp["exp_dir_filepath"],
                    exp["sequence_id"],
                    exp["category_name"],
                    dino_params,
                    cfg,
                    backbone=args.backbone,
                )
            )
        except RuntimeError:
            traceback.print_exc()
    print("Saving results")
    with open(out_abs, "w") as fh:
        json.dump(results, fh)


if __name__ == "__main__":
    main()
