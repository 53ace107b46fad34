"""Full pose-stage artifact on hardware (VERDICT r3 #4).

Runs the paper's main flow end-to-end on the chip through the REAL driver:
build a renderable synthetic scene (the quality-workflow generator), train a
3DGS model with apps.train_gs, then run apps.pose_eval at the production
configuration — 1500 id-module iterations with ray renewal every 10, grad
accumulation batch 32, the 32k ray budget, reference seeds — including BOTH
eval passes (target + predicted scores) and the per-image timing the
reference prints (/root/reference/pose_estimation/test.py:45,304-311;
pretrain_eval_attention.py:31-154).

Writes docs/artifacts/pose_stage_r4.json: per-backbone wall clocks, the
driver's printed averages, and the results list the driver dumps.

Usage:
  PYTHONPATH=/root/.axon_site:/root/repo python tools/pose_stage_artifact.py \
      [--workdir /tmp/sixdgs_pose_stage] [--backbones dino,superpoint]
      [--gs_iterations 3000] [--size 400] [--n_iterations 1500]
"""

import argparse
import contextlib
import io
import json
import os
import re
import shutil
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
from quality_workflow import gt_scene, write_dataset  # noqa: E402


class _Tee(io.TextIOBase):
    def __init__(self, base):
        self.base = base
        self.buf = []

    def write(self, s):
        self.base.write(s)
        self.buf.append(s)
        return len(s)

    def flush(self):
        self.base.flush()


def _grab(pattern, text, cast=float):
    m = re.search(pattern, text)
    return cast(m.group(1)) if m else None


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--workdir", default="/tmp/sixdgs_pose_stage")
    ap.add_argument("--backbones", default="dino,superpoint")
    ap.add_argument("--gs_iterations", type=int, default=3000)
    ap.add_argument("--size", type=int, default=400)
    ap.add_argument("--n_gt", type=int, default=20000)
    ap.add_argument("--n_train", type=int, default=24)
    ap.add_argument("--n_test", type=int, default=8)
    ap.add_argument("--n_iterations", type=int, default=1500)
    ap.add_argument("--ray_budget", type=int, default=32768)
    ap.add_argument("--batch", type=int, default=32)
    ap.add_argument("--out", default="docs/artifacts/pose_stage_r4.json")
    ap.add_argument("--keep", action="store_true",
                    help="reuse an existing workdir (skip scene+3DGS build)")
    args = ap.parse_args(argv)

    import jax.numpy as jnp

    from sixdgs_tpu.apps import pose_eval, train_gs
    from sixdgs_tpu.scene.cameras import camera_list_from_infos
    from sixdgs_tpu.scene.dataset_loader import load_data
    from sixdgs_tpu.scene.ply_io import store_point_cloud_ply
    from sixdgs_tpu.train.gs_trainer import render_eval

    root = os.path.join(args.workdir, "scene")
    exp_root = os.path.join(args.workdir, "output")
    model_path = os.path.join(exp_root, "synthetic_scene_0001")
    artifact = {"config": vars(args).copy(), "stages": {}}

    have_model = args.keep and os.path.isdir(
        os.path.join(model_path, "point_cloud"))
    if not have_model:
        if os.path.isdir(args.workdir):
            shutil.rmtree(args.workdir)
        os.makedirs(root, exist_ok=True)
        write_dataset(root, args.n_train, args.n_test, args.size, 3.2)
        gt, gt_arrs = gt_scene(args.n_gt, logscale_shift=-0.6)
        rng = np.random.default_rng(11)
        pts = gt_arrs["xyz"] + rng.normal(scale=0.05,
                                          size=gt_arrs["xyz"].shape)
        store_point_cloud_ply(os.path.join(root, "points3d.ply"), pts,
                              rng.uniform(80, 180, size=pts.shape))

        class LoaderArgs:
            source_path = root
            images = None
            eval = True
            white_background = False

        info = load_data(LoaderArgs())
        from PIL import Image

        t0 = time.time()
        for ci in info.train_cameras + info.test_cameras:
            cam = camera_list_from_infos([ci])[0]
            img = np.asarray(jnp.clip(
                render_eval(gt, cam, jnp.zeros(3), 3, 256, "auto"), 0, 1))
            Image.fromarray((img.transpose(1, 2, 0) * 255).round().astype(
                np.uint8)).save(ci.image_path)
        artifact["stages"]["gt_render_s"] = round(time.time() - t0, 1)

        t0 = time.time()
        train_gs.main([
            "--source_path", root,
            "--model_path", model_path,
            "--eval",
            "--iterations", str(args.gs_iterations),
            "--test_iterations", str(args.gs_iterations),
            "--save_iterations", str(args.gs_iterations),
            "--quiet",
        ])
        artifact["stages"]["gs_train_s"] = round(time.time() - t0, 1)

    for backbone in args.backbones.split(","):
        ckpt = os.path.join(model_path, "id_module.npz")
        if os.path.exists(ckpt):
            os.remove(ckpt)  # feature-dim-specific; fresh per backbone
        out_json = os.path.join(args.workdir, f"pose_results_{backbone}.json")
        tee = _Tee(sys.stdout)
        t0 = time.time()
        with contextlib.redirect_stdout(tee):
            pose_eval.main([
                "--exp_path", exp_root,
                "--out_path", out_json,
                "--data_type", "blender",
                "--backbone", backbone,
                "--n_iterations", str(args.n_iterations),
                "--ray_budget", str(args.ray_budget),
                "--batch", str(args.batch),
            ])
        wall = time.time() - t0
        text = "".join(tee.buf)
        with open(out_json) as fh:
            results = json.load(fh)
        artifact[backbone] = {
            "wall_s": round(wall, 1),
            "n_results": len(results),
            "overfit_t_err": _grab(
                r"Overfit AVG translation error: ([\d.eE+-]+)", text),
            "overfit_a_err": _grab(
                r"Overfit AVG angular error: ([\d.eE+-]+)", text),
            "test_t_err": _grab(
                r"Test AVG translation error: ([\d.eE+-]+)", text),
            "test_a_err": _grab(
                r"Test AVG angular error: ([\d.eE+-]+)", text),
            "test_recall": _grab(r"Test recall: ([\d.eE+-]+)", text),
            "time_per_image_s": _grab(r"Time per element: ([\d.eE+-]+)", text),
            "results": results,
        }
        print(f"[artifact] {backbone}: wall {wall:.1f}s, "
              f"t_err {artifact[backbone]['test_t_err']}, "
              f"a_err {artifact[backbone]['test_a_err']}, "
              f"t/img {artifact[backbone]['time_per_image_s']}")

    os.makedirs(os.path.dirname(args.out), exist_ok=True)
    with open(args.out, "w") as fh:
        json.dump(artifact, fh, indent=1)
    print("[artifact] wrote", args.out)


if __name__ == "__main__":
    main()
