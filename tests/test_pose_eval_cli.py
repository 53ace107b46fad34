"""End-to-end pose_eval driver test: scan experiment dir -> train id module ->
evaluate -> JSON results (tiny budgets; full-architecture random DINO)."""

import json
import os

import numpy as np

from tests.test_scene_io import make_blender_dataset
from sixdgs_tpu.apps import pose_eval, train_gs


def test_pose_eval_driver(tmp_path):
    root = str(tmp_path / "chair")
    os.makedirs(root)
    make_blender_dataset(root, n_train=3, n_test=2, size=24)
    from sixdgs_tpu.scene.ply_io import store_point_cloud_ply

    rng = np.random.default_rng(0)
    store_point_cloud_ply(
        os.path.join(root, "points3d.ply"),
        rng.normal(size=(150, 3)),
        rng.integers(0, 255, size=(150, 3)),
    )
    exp_root = str(tmp_path / "output")
    model_path = os.path.join(exp_root, "synthetic_chair_0001")
    train_gs.main(
        [
            "--source_path", root,
            "--model_path", model_path,
            "--eval", "--white_background",
            "--iterations", "4",
            "--densify_from_iter", "100",
            "--test_iterations", "-1",
            "--save_iterations", "4",
            "--quiet", "--chunk", "64",
            "--capacity_bucket", "256",
        ]
    )

    out_json = str(tmp_path / "pose_results.json")
    pose_eval.main(
        [
            "--exp_path", exp_root,
            "--out_path", out_json,
            "--data_type", "blender",
            "--n_iterations", "2",
            "--batch", "2",
            "--ray_budget", "1024",
        ]
    )
    with open(out_json) as fh:
        results = json.load(fh)
    assert len(results) == 2  # two test cameras
    rec = results[0]
    assert rec["category_name"] == "synthetic_chair"
    assert np.asarray(rec["pred_c2w"]).shape == (4, 4)
    assert np.isfinite(rec["scores_loss"])
    # checkpoint written and resumable (skip-training path)
    assert os.path.exists(os.path.join(model_path, "id_module.npz"))
    pose_eval.main(
        [
            "--exp_path", exp_root,
            "--out_path", out_json,
            "--data_type", "blender",
            "--n_iterations", "2",
            "--batch", "2",
            "--ray_budget", "1024",
        ]
    )
