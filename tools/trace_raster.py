"""Capture an XLA device trace of the rasterizer fwd+bwd and dump per-op stats."""

import glob
import gzip
import json
import os
import sys

import numpy as np
import jax
import jax.numpy as jnp


def main():
    which = sys.argv[1] if len(sys.argv) > 1 else "pallas"
    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    from tools.profile_raster import make_scene
    from sixdgs_tpu.scene.cameras import make_synthetic_camera
    from sixdgs_tpu.train.gs_trainer import camera_arrays, _render_params
    from sixdgs_tpu.ops.ssim import dssim_l1_loss

    W, H, P = 1232, 816, 131072
    scene = make_scene(P)
    cam = make_synthetic_camera(W, H, 0.9, 0.65, np.eye(3), np.zeros(3))
    gt = jnp.asarray(np.random.default_rng(1).uniform(size=(3, H, W)), jnp.float32)
    ca = camera_arrays(cam)._replace(gt_image=gt)
    params = scene.params()
    active = scene.active
    zeros2d = jnp.zeros((scene.capacity, 2))

    def loss(params, z):
        img, _ = _render_params(params, active, ca, W, H, 3, jnp.zeros(3), z,
                                256, which)
        l, _ = dssim_l1_loss(img, gt, 0.2)
        return l

    g = jax.jit(jax.value_and_grad(loss, argnums=(0, 1)))
    out = g(params, zeros2d)
    jax.block_until_ready(out)

    logdir = f"/tmp/trace_{which}"
    os.system(f"rm -rf {logdir}")
    with jax.profiler.trace(logdir):
        for _ in range(3):
            out = g(params, zeros2d)
        jax.block_until_ready(out)

    # find the xplane file
    files = glob.glob(f"{logdir}/**/*.xplane.pb", recursive=True)
    print("xplane files:", files)
    if not files:
        return
    from tensorboard_plugin_profile.convert import raw_to_tool_data as rd

    for tool in ("framework_op_stats", "hlo_op_stats", "op_profile"):
        try:
            data, _ = rd.xspace_to_tool_data(files, tool, {})
            out_path = f"/tmp/{which}_{tool}.out"
            if isinstance(data, bytes):
                with open(out_path, "wb") as f:
                    f.write(data)
            else:
                with open(out_path, "w") as f:
                    f.write(str(data))
            print("wrote", out_path)
        except Exception as e:
            print(tool, "failed:", type(e).__name__, e)


if __name__ == "__main__":
    main()
