"""Orchestrator CLIs: full_eval (train->render->metrics sweep) and convert
(COLMAP SfM command chain, exercised against a stub binary)."""

import json
import os
import stat

import numpy as np
import pytest

from tests.test_scene_io import make_blender_dataset


def test_full_eval_single_scene(tmp_path):
    """full_eval over a one-scene T&T root: trains at a tiny horizon, saves
    the final iterate, renders, and aggregates metrics — the reference's
    os.system chain (/root/reference/full_eval.py:15-123) as one process."""
    from sixdgs_tpu.apps import full_eval
    from sixdgs_tpu.scene.ply_io import store_point_cloud_ply

    tat_root = tmp_path / "tat"
    scene_root = str(tat_root / "truck")  # one of TANKS_AND_TEMPLES
    os.makedirs(scene_root)
    make_blender_dataset(scene_root, n_train=3, n_test=2, size=24)
    rng = np.random.default_rng(0)
    store_point_cloud_ply(
        os.path.join(scene_root, "points3d.ply"),
        rng.normal(size=(150, 3)),
        rng.integers(0, 255, size=(150, 3)),
    )
    out_path = str(tmp_path / "eval")
    full_eval.main([
        "--tanksandtemples", str(tat_root),
        "--output_path", out_path,
        "--iterations", "8",
    ])
    model_path = os.path.join(out_path, "truck")
    assert os.path.exists(os.path.join(
        model_path, "point_cloud", "iteration_8", "point_cloud.ply"))
    with open(os.path.join(model_path, "results.json")) as fh:
        results = json.load(fh)
    assert "test/ours_8" in results
    assert np.isfinite(results["test/ours_8"]["PSNR"])


def test_convert_command_chain(tmp_path):
    """convert.py must drive the same COLMAP stage sequence as the reference
    (/root/reference/convert.py:17-124): feature_extractor -> exhaustive
    matcher -> mapper -> image_undistorter, then move sparse/0 artifacts.
    The binary is stubbed with a script that logs its argv and fabricates
    the outputs each stage is expected to produce."""
    from sixdgs_tpu.apps import convert as convert_app

    src = tmp_path / "scene"
    (src / "input").mkdir(parents=True)
    (src / "input" / "0.jpg").write_bytes(b"fake")
    log = tmp_path / "colmap_calls.log"

    stub = tmp_path / "colmap"
    stub.write_text(f"""#!/bin/bash
echo "$@" >> {log}
# fabricate per-stage outputs
case "$1" in
  mapper)
    mkdir -p {src}/distorted/sparse/0
    touch {src}/distorted/sparse/0/cameras.bin
    touch {src}/distorted/sparse/0/images.bin
    touch {src}/distorted/sparse/0/points3D.bin
    ;;
  image_undistorter)
    mkdir -p {src}/sparse {src}/images
    touch {src}/sparse/cameras.bin
    touch {src}/sparse/images.bin
    touch {src}/sparse/points3D.bin
    ;;
esac
exit 0
""")
    stub.chmod(stub.stat().st_mode | stat.S_IEXEC)

    convert_app.main([
        "--source_path", str(src),
        "--colmap_executable", str(stub),
        "--no_gpu",
    ])

    calls = log.read_text().strip().splitlines()
    stages = [c.split()[0] for c in calls]
    assert stages == ["feature_extractor", "exhaustive_matcher", "mapper",
                      "image_undistorter"], stages
    # reference flags preserved (convert.py:31-76)
    assert "--ImageReader.camera_model OPENCV" in calls[0]
    assert "--SiftExtraction.use_gpu 0" in calls[0]
    assert "--Mapper.ba_global_function_tolerance=0.000001" in calls[2]
    assert "--output_type COLMAP" in calls[3]
    # sparse/0 layout produced (files moved like convert.py:86-97)
    assert os.path.exists(os.path.join(src, "sparse", "0", "cameras.bin"))


def test_convert_missing_binary_message(tmp_path):
    from sixdgs_tpu.apps import convert as convert_app

    src = tmp_path / "scene"
    (src / "input").mkdir(parents=True)
    with pytest.raises(SystemExit):
        convert_app.main([
            "--source_path", str(src),
            "--colmap_executable", str(tmp_path / "definitely_missing"),
        ])
