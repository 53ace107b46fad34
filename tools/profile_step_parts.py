"""Chained timing of the NON-raster train-step parts at Mip-360 scale.

The per-stage raster breakdown (tools/profile_raster.py) covers binning +
kernels; the step total also carries projection fwd+bwd, the photometric
loss fwd+bwd, Adam, densify-stat accumulation, and the binning_saturation
telemetry (which re-derives bounds + a top_k every step). This tool times
each in isolation so the "other" bucket of the step budget is attributable.

Usage: PYTHONPATH=/root/.axon_site:/root/repo python tools/profile_step_parts.py
"""

import sys

import numpy as np
import jax
import jax.numpy as jnp

sys.path.insert(0, ".")
from tools.tputime import chained_ms, seq_dep  # noqa: E402

P, W, H = 131072, 1232, 816


def make_inputs():
    from sixdgs_tpu.scene.cameras import make_synthetic_camera
    from sixdgs_tpu.scene.gaussians import from_arrays
    from sixdgs_tpu.train.gs_trainer import camera_arrays

    rng = np.random.default_rng(0)
    arrs = {
        "xyz": (rng.normal(size=(P, 3)) * 2.0 + [0, 0, 6]).astype(np.float32),
        "features_dc": rng.normal(size=(P, 1, 3)).astype(np.float32) * 0.3,
        "features_rest": np.zeros((P, 15, 3), np.float32),
        "opacity": rng.uniform(-2, 2, size=(P, 1)).astype(np.float32),
        "scaling": rng.uniform(-5.2, -3.0, size=(P, 3)).astype(np.float32),
        "rotation": rng.normal(size=(P, 4)).astype(np.float32),
    }
    scene = from_arrays(arrs, max_sh_degree=3, capacity=P)
    cam = make_synthetic_camera(W, H, 0.9, 0.65, np.eye(3), np.zeros(3))
    return scene, camera_arrays(cam)


def main():
    # the ops package re-exports the ssim FUNCTION under the same name, so
    # plain "import ... as" would bind that attribute, not the module
    import sixdgs_tpu.ops.ssim  # noqa: F401
    ssim_mod = sys.modules["sixdgs_tpu.ops.ssim"]
    from sixdgs_tpu.ops.rasterizer.projection import project_gaussians
    from sixdgs_tpu.ops.rasterizer.tiles import binning_saturation
    from sixdgs_tpu.ops.transforms import covariance_planes
    from sixdgs_tpu.train.optim import adam_init, adam_update

    scene, ca = make_inputs()
    params = scene.params()
    active = scene.active
    rng = np.random.default_rng(1)

    # ---------------- projection fwd+bwd (value_and_grad of a reduction)
    @jax.jit
    def proj_fb(params):
        def f(params):
            scaling = jnp.exp(params["scaling"])
            cov3d = covariance_planes(scaling, params["rotation"])
            opacity = jax.nn.sigmoid(params["opacity"]) * active[:, None]
            sh = jnp.concatenate(
                [params["features_dc"], params["features_rest"]], axis=1)
            proj = project_gaussians(
                params["xyz"], cov3d, opacity, ca.view, ca.full_proj,
                ca.camera_center, W, H, ca.tan_fovx, ca.tan_fovy,
                sh=sh, sh_degree=3, active=active)
            return (jnp.sum(proj.means2d * 1e-6) + jnp.sum(proj.colors * 1e-6)
                    + jnp.sum(proj.conics * 1e-6) + jnp.sum(proj.opacities)
                    * 1e-6), proj
        (val, proj), g = jax.value_and_grad(f, has_aux=True)(params)
        return val, proj, g

    val, proj, g = jax.block_until_ready(proj_fb(params))

    def step_proj(c):
        params, acc = c
        val, _, _ = proj_fb(params)
        return ({k: seq_dep(v, val) for k, v in params.items()}, val)

    print(f"projection fwd+bwd: "
          f"{chained_ms(jax.jit(step_proj), (params, jnp.float32(0))):7.2f} ms",
          flush=True)

    # ---------------- photometric loss fwd+bwd, both blur methods
    img = jnp.asarray(rng.uniform(size=(3, H, W)).astype(np.float32))
    gt = jnp.asarray(rng.uniform(size=(3, H, W)).astype(np.float32))
    for method, blur in ssim_mod._BLUR_METHODS.items():
        orig = ssim_mod._blur
        ssim_mod._blur = blur

        @jax.jit
        def loss_fb(img):
            def f(img):
                loss, _ = ssim_mod.dssim_l1_loss(img, gt, 0.2)
                return loss
            return jax.value_and_grad(f)(img)

        jax.block_until_ready(loss_fb(img))

        def step_loss(c):
            img, acc = c
            val, dimg = loss_fb(img)
            return (seq_dep(img, val), val)

        print(f"dssim_l1 fwd+bwd [{method:7s}]: "
              f"{chained_ms(jax.jit(step_loss), (img, jnp.float32(0))):7.2f}"
              " ms", flush=True)
        ssim_mod._blur = orig

    # ---------------- Adam update (all 6 param groups, donated)
    adam = adam_init(params)
    lrs = {k: jnp.float32(1e-3) for k in params}
    grads = {k: v * 1e-4 for k, v in params.items()}

    @jax.jit
    def adam_step(c):
        params, adam, acc = c
        new_p, new_a = adam_update(params, grads, adam, lrs)
        return (new_p, new_a, acc + new_p["xyz"][0, 0] * 0)

    print(f"adam update: "
          f"{chained_ms(adam_step, (params, adam, jnp.float32(0))):7.2f} ms",
          flush=True)

    # ---------------- Adam on 2-D flattened leaves (layout hypothesis:
    # [P, 15, 3]-shaped leaves may carry minor-dim tile padding that
    # inflates pure-elementwise traffic; [P, 45] cannot)
    params2 = {k: v.reshape(P, -1) for k, v in params.items()}
    adam2 = adam_init(params2)
    grads2 = {k: v * 1e-4 for k, v in params2.items()}

    @jax.jit
    def adam_step2(c):
        params, adam, acc = c
        new_p, new_a = adam_update(params, grads2, adam, lrs)
        return (new_p, new_a, acc + new_p["xyz"][0, 0] * 0)

    print(f"adam update (2-D leaves): "
          f"{chained_ms(adam_step2, (params2, adam2, jnp.float32(0))):7.2f}"
          " ms", flush=True)

    # ---------------- binning_saturation telemetry (per-step cost)
    means2d = jax.lax.stop_gradient(proj.means2d)
    radii_f = proj.radii.astype(jnp.float32)
    vis = proj.radii > 0
    nx, ny = -(-W // 16), -(-H // 16)

    @jax.jit
    def sat_step(c):
        m2d, acc = c
        sat = binning_saturation(m2d, radii_f, vis, nx, ny, 16, 16,
                                 overflow_k=256, t_max_big=1024,
                                 mid_k=4096, t_max_mid=64)
        return (seq_dep(m2d, sat["total_area"]), sat["total_area"])

    print(f"binning_saturation telemetry: "
          f"{chained_ms(sat_step, (means2d, jnp.float32(0))):7.2f} ms",
          flush=True)


if __name__ == "__main__":
    main()
