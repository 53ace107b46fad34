"""End-to-end CLI test: train -> render -> metrics on a tiny Blender dataset."""

import json
import os

import numpy as np

from tests.test_scene_io import make_blender_dataset
from sixdgs_tpu.apps import train_gs, render as render_app, metrics as metrics_app


def test_train_render_metrics_pipeline(tmp_path):
    root = str(tmp_path / "lego")
    os.makedirs(root)
    make_blender_dataset(root, n_train=3, n_test=2, size=24)
    # pre-seed a small init cloud so the loader doesn't generate its 100k
    # random-point default (too slow for CI)
    from sixdgs_tpu.scene.ply_io import store_point_cloud_ply

    rng = np.random.default_rng(0)
    store_point_cloud_ply(
        os.path.join(root, "points3d.ply"),
        rng.normal(size=(200, 3)),
        rng.integers(0, 255, size=(200, 3)),
    )
    model_path = str(tmp_path / "out")

    out = train_gs.main(
        [
            "--source_path", root,
            "--model_path", model_path,
            "--eval",
            "--white_background",
            "--iterations", "8",
            "--densify_from_iter", "100",
            "--test_iterations", "8",
            "--save_iterations", "8",
            "--quiet",
            "--chunk", "64",
            "--log_every", "4",
            "--capacity_bucket", "256",
        ]
    )
    ply = os.path.join(model_path, "point_cloud", "iteration_8", "point_cloud.ply")
    assert os.path.exists(ply)
    assert os.path.exists(os.path.join(model_path, "cfg_args"))
    assert os.path.exists(os.path.join(model_path, "cameras.json"))
    assert os.path.exists(os.path.join(model_path, "metrics.jsonl"))

    # cfg_args is readable by our safe parser
    from sixdgs_tpu.utils.config import read_cfg_args

    cfg = read_cfg_args(model_path)
    assert cfg["sh_degree"] == 3 and cfg["white_background"] is True

    render_app.main(["--model_path", model_path, "--iteration", "8", "--chunk", "64"])
    renders = os.listdir(os.path.join(model_path, "test", "ours_8", "renders"))
    assert len(renders) == 2

    metrics_app.main(["--model_paths", model_path])
    with open(os.path.join(model_path, "results.json")) as fh:
        results = json.load(fh)
    assert "test/ours_8" in results
    assert np.isfinite(results["test/ours_8"]["PSNR"])


def test_quality_workflow_tool(tmp_path):
    """tools/quality_workflow.py end-to-end at micro scale: GT scene ->
    dataset -> train -> render -> metrics -> JSON summary."""
    import sys

    sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
    from tools.quality_workflow import main as quality_main

    out = quality_main([
        "--workdir", str(tmp_path / "qw"),
        "--iterations", "8",
        "--size", "32",
        "--n_train", "3",
        "--n_test", "2",
        "--n_gt", "60",
        "--rasterizer", "tiled",
        "--chunk", "64",
    ])
    assert out["metric"] == "quality_workflow_psnr"
    assert np.isfinite(out["value"]) and out["value"] > 0
    assert 0 <= out["ssim"] <= 1


def test_detect_anomaly_flag(tmp_path):
    """--detect_anomaly maps to jax_debug_nans (the reference's
    torch.autograd.set_detect_anomaly analogue, train.py:310,330): a healthy
    2-iteration run must complete without a spurious NaN raise, and the
    config must actually be armed during the run."""
    import jax

    root = str(tmp_path / "scene")
    os.makedirs(root)
    make_blender_dataset(root, n_train=2, n_test=1, size=24)
    from sixdgs_tpu.scene.ply_io import store_point_cloud_ply

    rng = np.random.default_rng(1)
    store_point_cloud_ply(
        os.path.join(root, "points3d.ply"),
        rng.normal(size=(100, 3)),
        rng.integers(0, 255, size=(100, 3)),
    )
    try:
        train_gs.main([
            "--source_path", root,
            "--model_path", str(tmp_path / "out"),
            "--iterations", "2",
            "--densify_from_iter", "100",
            "--test_iterations", "2",
            "--save_iterations", "2",
            "--quiet",
            "--chunk", "64",
            "--capacity_bucket", "256",
            "--detect_anomaly",
        ])
        assert jax.config.jax_debug_nans
    finally:
        jax.config.update("jax_debug_nans", False)
