"""Pose-recovery accuracy experiment from PREDICTED scores (artifact).

Trains the identification module (small trainable ViT backbone, synthetic GT
gaussian scene) and tracks translation/angular error + recall@100 of poses
solved from the module's OWN predictions (never use_target_scores) against
the untrained baseline and the target-score solve — the paper's headline
capability (/root/reference/pretrain_eval_attention.py:200-248, test.py:85-142)
demonstrated end-to-end without pretrained DINOv2 weights (unavailable in
this zero-egress container).

The CI-scale version of this lives in
tests/test_pose_e2e.py::test_pose_recovery_from_predicted_scores; this tool
runs it longer and records the trajectory. Prints one JSON line.

Usage: python tools/pose_accuracy_experiment.py [--iterations 600] [--cpu]
"""

import argparse
import json
import os
import sys
import time

_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
for p in (_ROOT, os.path.join(_ROOT, "tests")):
    if p not in sys.path:
        sys.path.insert(0, p)


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--iterations", type=int, default=600)
    ap.add_argument("--chunk_iters", type=int, default=100)
    ap.add_argument("--cpu", action="store_true",
                    help="force the CPU backend")
    ap.add_argument("--ray_budget", type=int, default=8192)
    args = ap.parse_args(argv)

    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp

    from test_pose_e2e import make_camera_infos, make_gt_scene

    from sixdgs_tpu.pose import dino
    from sixdgs_tpu.pose.evaluate import test_pose_estimation as run_pose_eval
    from sixdgs_tpu.pose.modules import init_id_module
    from sixdgs_tpu.pose.trainer import PoseTrainer, model_up_from_cameras
    from sixdgs_tpu.utils.config import PoseEstimationConfig

    scene = make_gt_scene()
    infos = make_camera_infos(scene)
    cfg = PoseEstimationConfig(
        gradient_accumulation_steps=8, ray_budget=args.ray_budget,
        max_ellipsoids=300,
    )
    dparams = dino.init_params(jax.random.key(1), embed_dim=64, depth=2)
    iparams = init_id_module(jax.random.key(2), feature_dim=64)
    model_up = jnp.asarray(model_up_from_cameras(infos))

    trainer = PoseTrainer(dparams, iparams, scene, infos, cfg, seed=1)
    trainer._regen_rays()
    rays = trainer.rays

    def eval_pred(params):
        _, t_err, a_err, loss, recall, _ = run_pose_eval(
            infos, dparams, params, rays, model_up, use_target_scores=False)
        return float(t_err), float(a_err), float(recall)

    _, t_tgt, a_tgt, *_ = run_pose_eval(
        infos, dparams, iparams, rays, model_up, use_target_scores=True)
    t0, a0, r0 = eval_pred(iparams)
    print(f"target-score solve: t_err={float(t_tgt):.3f} "
          f"a_err={float(a_tgt):.1f}")
    print(f"untrained: t_err={t0:.3f} a_err={a0:.1f} recall={r0:.3f}")

    traj = []
    start = time.time()
    it = 0
    while it < args.iterations:
        n = min(args.chunk_iters, args.iterations - it)
        trainer.run(n_iterations=it + n, start_iteration=it, validate_every=0)
        it += n
        t, a, r = eval_pred(trainer.id_params)
        traj.append({"iter": it, "t_err": round(t, 4), "a_err": round(a, 2),
                     "recall": round(r, 4)})
        print(f"iter {it} ({time.time()-start:.0f}s): t_err={t:.3f} "
              f"a_err={a:.1f} recall={r:.3f}")

    final = traj[-1]
    print(json.dumps({
        "metric": "pose_recovery_predicted_scores",
        "value": final["t_err"],
        "unit": "translation_error_scene_units",
        "angular_error_deg": final["a_err"],
        "recall_at_100": final["recall"],
        "untrained": {"t_err": round(t0, 3), "a_err": round(a0, 1),
                      "recall": round(r0, 4)},
        "target_score_solve_t_err": round(float(t_tgt), 3),
        "iterations": args.iterations,
        "trajectory": traj,
    }))


if __name__ == "__main__":
    main()
