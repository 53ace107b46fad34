"""Headline benchmark: single-image 6DoF pose estimation latency on one chip.

Measures the full jitted test_image path — DINOv2-S/14 forward + ray-MLP over
the full ray budget + patches x rays attention scoring + top-100 solve +
pose assembly (the reference's per-image eval loop,
/root/reference/pose_estimation/test.py:46-218, which it times at
test.py:304-311). North-star target: <= 50 ms/image on one TPU v5e
(BASELINE.md). Prints ONE JSON line.
"""

import json
import time

import numpy as np
import jax
import jax.numpy as jnp


def main():
    from sixdgs_tpu.pose import dino
    from sixdgs_tpu.pose.evaluate import eval_image
    from sixdgs_tpu.pose.modules import init_id_module
    from sixdgs_tpu.rays.engine import Rays

    n_rays = 32768  # reference default scene scale is ~25k rays (SURVEY §3.3)
    rng = np.random.default_rng(0)
    dino_params = dino.init_params(jax.random.key(0))
    id_params = init_id_module(jax.random.key(1))
    ori = rng.normal(size=(n_rays, 3)).astype(np.float32)
    d = rng.normal(size=(n_rays, 3)).astype(np.float32)
    d /= np.linalg.norm(d, axis=-1, keepdims=True)
    rays = Rays(
        ori=jnp.asarray(ori),
        dir=jnp.asarray(d),
        rgb=jnp.asarray(rng.uniform(size=(n_rays, 3)).astype(np.float32)),
        valid=jnp.asarray(np.ones(n_rays, bool)),
        gaussian_idx=jnp.zeros(n_rays, jnp.int32),
    )
    img = jnp.asarray(rng.uniform(size=(800, 800, 3)).astype(np.float32))
    mask = jnp.asarray(np.ones((800, 800), bool))
    c2w = jnp.asarray(np.eye(4, dtype=np.float32))

    def timed(fused):
        def run():
            return eval_image(dino_params, id_params, img, mask, c2w, rays,
                              fused_attention=fused)

        out = run()
        jax.block_until_ready(out)  # compile
        n_iter = 20
        t0 = time.perf_counter()
        for _ in range(n_iter):
            out = run()
        jax.block_until_ready(out)
        return (time.perf_counter() - t0) / n_iter * 1000.0

    ms = timed(False)
    try:
        ms_fused = timed(True)
        ms = min(ms, ms_fused)
    except Exception:
        pass  # Pallas path unavailable on this backend

    target_ms = 50.0
    print(
        json.dumps(
            {
                "metric": "pose_estimation_latency",
                "value": round(ms, 3),
                "unit": "ms/image",
                "vs_baseline": round(target_ms / ms, 3),
            }
        )
    )


if __name__ == "__main__":
    main()
