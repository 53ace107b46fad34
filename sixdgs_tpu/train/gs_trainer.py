"""3DGS training: jitted step + host-event densification.

Loop parity with /root/reference/train.py:29-191: random camera order without
replacement, L1+DSSIM loss, per-group Adam with scheduled xyz lr, SH degree
warmup every 1000 iters, densify/prune every 100 in [500, 15000), opacity
reset every 3000, PLY snapshots.

TPU re-design: the hot step is ONE jitted function over fixed-capacity pytrees
(state donated, so Adam runs in-place in HBM); densification is a host event
that repacks arrays into a fresh capacity bucket (recompile only on bucket
growth); densification statistics are carried inside the jitted state instead
of torch-side .grad inspection.
"""

from __future__ import annotations

import functools
import math
import os
from typing import Dict, NamedTuple, Optional

import numpy as np
import jax
import jax.numpy as jnp
from flax import struct

from sixdgs_tpu.ops.rasterizer import rasterize_scan
from sixdgs_tpu.ops.rasterizer.projection import project_gaussians
from sixdgs_tpu.ops.ssim import dssim_l1_loss, psnr, l1_loss
from sixdgs_tpu.ops.transforms import covariance_planes, inverse_sigmoid
from sixdgs_tpu.scene.gaussians import (
    GaussianScene,
    PARAM_NAMES,
    from_arrays,
    round_capacity,
)
from sixdgs_tpu.train.optim import AdamState, adam_init, adam_update, expon_lr
from sixdgs_tpu.train import densify as densify_mod
from sixdgs_tpu.utils.config import ModelConfig, OptimizationConfig


class CameraArrays(NamedTuple):
    view: jnp.ndarray  # [4, 4]
    full_proj: jnp.ndarray  # [4, 4]
    camera_center: jnp.ndarray  # [3]
    tan_fovx: jnp.ndarray  # scalar
    tan_fovy: jnp.ndarray  # scalar
    gt_image: jnp.ndarray  # [3, H, W]


def camera_arrays(cam) -> CameraArrays:
    return CameraArrays(
        view=jnp.asarray(cam.view),
        full_proj=jnp.asarray(cam.full_proj),
        camera_center=jnp.asarray(cam.camera_center),
        tan_fovx=jnp.asarray(math.tan(cam.FoVx * 0.5), jnp.float32),
        tan_fovy=jnp.asarray(math.tan(cam.FoVy * 0.5), jnp.float32),
        gt_image=jnp.asarray(cam.image),
    )


@struct.dataclass
class GSTrainState:
    scene: GaussianScene
    adam: AdamState
    xyz_grad_accum: jnp.ndarray  # [C]
    denom: jnp.ndarray  # [C]
    max_radii2d: jnp.ndarray  # [C]


def init_train_state(scene: GaussianScene) -> GSTrainState:
    cap = scene.capacity
    return GSTrainState(
        scene=scene,
        adam=adam_init(scene.params()),
        xyz_grad_accum=jnp.zeros(cap),
        denom=jnp.zeros(cap),
        max_radii2d=jnp.zeros(cap, jnp.int32),
    )


# (t_max, mid_k, t_max_mid, overflow_k, t_max_big): per-gaussian tile-slot
# budgets of the binning tiers — tune per scene/resolution guided by the
# binning_* saturation telemetry in the train metrics
DEFAULT_TIERS = (16, 4096, 64, 256, 1024)

# widening caps: (t_max, mid_k, t_max_mid, overflow_k, t_max_big)
_TIER_CAPS = (128, 16384, 256, 1024, 4096)


def widen_tiers(tiers, dropped_main, dropped_mid, dropped_big):
    """Pick the next tier widening from per-tier truncation telemetry.

    Returns the widened 5-tuple, or None if every truncating tier is at its
    cap. Targets the tier that actually DROPPED the most area — the round-3
    policy only ever widened the mid tier, so a main- or giant-tier-starved
    scene plateaued at ~20% truncation with the mid tier maxed out (observed
    in the round-4 at-scale run). The CUDA reference's binning is uncapped
    (it sizes buffers from the exact emitted count per frame); widening
    converges to it one retrace at a time."""
    t_max, mid_k, t_max_mid, ov_k, t_big = tiers
    by_drop = sorted(
        (("main", dropped_main), ("mid", dropped_mid), ("big", dropped_big)),
        key=lambda kv: -kv[1])
    for name, dropped in by_drop:
        if dropped <= 0:
            continue
        if name == "main" and t_max < _TIER_CAPS[0]:
            return (t_max * 2, mid_k, t_max_mid, ov_k, t_big)
        if name == "mid":
            if t_max_mid < _TIER_CAPS[2]:
                return (t_max, mid_k, t_max_mid * 2, ov_k, t_big)
            if mid_k < _TIER_CAPS[1]:
                return (t_max, mid_k * 2, t_max_mid, ov_k, t_big)
        if name == "big":
            if t_big < _TIER_CAPS[4]:
                return (t_max, mid_k, t_max_mid, ov_k, t_big * 2)
            if ov_k < _TIER_CAPS[3]:
                return (t_max, mid_k, t_max_mid, ov_k * 2, t_big)
    return None


def narrow_tiers(tiers, narrow_demand, n_points):
    """Halve the main-tier slot budget when the scene no longer needs it.

    `narrow_demand` is the binning telemetry's count of visible gaussians
    whose tile footprint exceeds t_max // 2 — i.e. everything that would
    need an overflow tier after halving. Narrowing is safe (provably no new
    main-tier truncation) when all of them fit in the mid+giant tables; the
    0.31 occupancy bar mirrors the nc_pairs shrink hysteresis so a halving
    and the widening trigger (tier spill / truncation > threshold) cannot
    ping-pong. The key-slot count P*t_max + mid_k*t_max_mid + ov_k*t_max_big
    is dominated by the main block at trained-scene scale (131k x 16 = 2.1M
    of 2.62M at the Mip-360 bench), and the u32 key sort / fused-key build /
    segment starts are ~linear in it — each halving is worth ~1.5-3 ms/step.
    Returns the narrowed 5-tuple, or None if narrowing is not worthwhile.
    """
    t_max, mid_k, t_max_mid, ov_k, t_big = tiers
    new_t = t_max // 2
    if new_t < 4:
        return None  # floor: keep tiny footprints out of the tier tables
    if new_t > t_max_mid:
        return None  # displaced gaussians would out-size the mid budget
    if n_points * new_t < (1 << 18):
        return None  # saved slots would not pay for the retrace
    if narrow_demand >= 0.31 * (mid_k + ov_k):
        return None
    return (new_t, mid_k, t_max_mid, ov_k, t_big)


def _render_params(params, active, cam: CameraArrays, width, height, sh_degree,
                   bg, means2d_offset, chunk, rasterizer: str = "auto",
                   tiers: tuple = DEFAULT_TIERS, nc_pairs: int = 0,
                   with_stats: bool = False):
    from sixdgs_tpu.ops.rasterizer import resolve_rasterizer

    rasterizer = resolve_rasterizer(rasterizer)
    t_max, mid_k, t_max_mid, overflow_k, t_max_big = tiers
    scaling = jnp.exp(params["scaling"])
    cov3d = covariance_planes(scaling, params["rotation"])
    opacity = jax.nn.sigmoid(params["opacity"]) * active[:, None]
    sh = jnp.concatenate([params["features_dc"], params["features_rest"]], axis=1)
    proj = project_gaussians(
        params["xyz"], cov3d, opacity,
        cam.view, cam.full_proj, cam.camera_center,
        width, height, cam.tan_fovx, cam.tan_fovy,
        sh=sh, sh_degree=sh_degree, active=active,
    )
    proj = proj._replace(means2d=proj.means2d + means2d_offset)
    stats = None
    if rasterizer in ("pallas", "pallas_interpret"):
        from sixdgs_tpu.ops.rasterizer.pallas_tiles import rasterize_pallas

        img = rasterize_pallas(proj, width, height, bg, t_max=t_max,
                               mid_k=mid_k, t_max_mid=t_max_mid,
                               overflow_k=overflow_k, t_max_big=t_max_big,
                               nc_pairs=nc_pairs, return_stats=with_stats,
                               interpret=(rasterizer == "pallas_interpret"))
        if with_stats:
            img, stats = img
    elif rasterizer == "tiled":
        from sixdgs_tpu.ops.rasterizer.tiles import rasterize_tiled

        img = rasterize_tiled(proj, width, height, bg, t_max=t_max,
                              mid_k=mid_k, t_max_mid=t_max_mid,
                              overflow_k=overflow_k, t_max_big=t_max_big)
    else:
        img = rasterize_scan(proj, width, height, bg, chunk=chunk)
    if with_stats:
        return img, proj, stats
    return img, proj


@functools.partial(
    jax.jit,
    static_argnames=("width", "height", "sh_degree", "chunk", "lambda_dssim",
                     "rasterizer", "tiers", "nc_pairs", "with_telemetry"),
    donate_argnames=("state",),
)
def train_step(
    state: GSTrainState,
    cam: CameraArrays,
    bg: jnp.ndarray,
    lrs: Dict[str, jnp.ndarray],
    *,
    width: int,
    height: int,
    sh_degree: int,
    chunk: int = 256,
    lambda_dssim: float = 0.2,
    rasterizer: str = "auto",
    tiers: tuple = DEFAULT_TIERS,
    nc_pairs: int = 0,
    with_telemetry: bool = True,
):
    """One training iteration (render + loss + backward + Adam + densify stats)."""
    active = state.scene.active
    params = state.scene.params()
    zeros2d = jnp.zeros((state.scene.capacity, 2))

    from sixdgs_tpu.ops.rasterizer import resolve_rasterizer

    # exact in-graph nc-budget telemetry is free on the pallas path (the
    # rasterizer computes it anyway); only materialized on telemetry iters
    want_stats = (with_telemetry
                  and resolve_rasterizer(rasterizer) in (
                      "pallas", "pallas_interpret"))

    def loss_fn(params, means2d_offset):
        out = _render_params(
            params, active, cam, width, height, sh_degree, bg, means2d_offset,
            chunk, rasterizer, tiers, nc_pairs, with_stats=want_stats,
        )
        img, proj = out[0], out[1]
        stats = out[2] if want_stats else None
        loss, ll1 = dssim_l1_loss(img, cam.gt_image, lambda_dssim)
        return loss, (ll1, proj.radii, img,
                      jax.lax.stop_gradient(proj.means2d), stats)

    (loss, (ll1, radii, img, means2d, nc_stats)), (grads, g2d) = (
        jax.value_and_grad(loss_fn, argnums=(0, 1), has_aux=True)
    )(params, zeros2d)

    new_params, new_adam = adam_update(params, grads, state.adam, lrs)
    new_scene = state.scene.with_params(new_params)

    # densification stats (train.py:153-161): norm of the screen-space position
    # gradient in NDC units (grad_pix * 0.5*size), accumulated over visible.
    visible = radii > 0
    g_ndc = g2d * jnp.asarray([[0.5 * width, 0.5 * height]])
    gnorm = jnp.linalg.norm(g_ndc, axis=-1)
    new_state = GSTrainState(
        scene=new_scene,
        adam=new_adam,
        xyz_grad_accum=state.xyz_grad_accum + jnp.where(visible, gnorm, 0.0),
        denom=state.denom + visible.astype(state.denom.dtype),
        max_radii2d=jnp.maximum(state.max_radii2d, radii),
    )
    metrics = {"loss": loss, "l1": ll1, "psnr": psnr(jnp.clip(img, 0, 1),
                                                     jnp.clip(cam.gt_image, 0, 1))}
    from sixdgs_tpu.ops.rasterizer import resolve_rasterizer

    if with_telemetry and resolve_rasterizer(rasterizer) in (
            "tiled", "pallas", "pallas_interpret"):
        # static-cap truncation telemetry: the CUDA reference's binning is
        # uncapped, so surface any coverage the two-tier budgets dropped.
        # ~1.7 ms/step on v5e at P=131k, but only CONSUMED on adaptation
        # and logging iterations — the run loop samples it (with_telemetry
        # is static, so this is a separate compiled variant, not a branch)
        from sixdgs_tpu.ops.rasterizer.tiles import binning_saturation

        t_max, mid_k, t_max_mid, overflow_k, t_max_big = tiers
        sat = binning_saturation(
            means2d, radii.astype(means2d.dtype), visible,
            -(-width // 16), -(-height // 16), 16, t_max,
            overflow_k=overflow_k, t_max_big=t_max_big,
            mid_k=mid_k, t_max_mid=t_max_mid,
        )
        metrics.update({f"binning_{k}": v for k, v in sat.items()})
    if nc_stats is not None:
        # EXACT post-cull budget telemetry from the rasterizer itself:
        # nc_demand = aligned compact slots this frame wants (the widening
        # signal), grad_dropped = 1 when the raster grads were zeroed
        metrics.update({f"binning_{k}": v for k, v in nc_stats.items()})
    return new_state, metrics


@functools.partial(jax.jit, donate_argnames=("state",))
def reset_opacity(state: GSTrainState) -> GSTrainState:
    """Clamp opacities to <= 0.01 and zero the opacity Adam state
    (gaussian_model.py:335-340 + replace_tensor_to_optimizer)."""
    scene = state.scene
    op = jax.nn.sigmoid(scene.opacity)
    # clamp below: sigmoid underflow to exactly 0 would give log(0) = -inf
    new_raw = inverse_sigmoid(jnp.clip(op, 1e-7, 0.01))
    new_raw = jnp.where(scene.active[:, None], new_raw, scene.opacity)
    params = scene.params()
    params["opacity"] = new_raw
    m = dict(state.adam.m)
    v = dict(state.adam.v)
    m["opacity"] = jnp.zeros_like(m["opacity"])
    v["opacity"] = jnp.zeros_like(v["opacity"])
    return GSTrainState(
        scene=scene.with_params(params),
        adam=AdamState(m=m, v=v, step=state.adam.step),
        xyz_grad_accum=state.xyz_grad_accum,
        denom=state.denom,
        max_radii2d=state.max_radii2d,
    )


def densify_event(
    state: GSTrainState,
    *,
    max_grad: float,
    min_opacity: float,
    extent: float,
    max_screen_size: Optional[int],
    percent_dense: float,
    rng: np.random.Generator,
    capacity_bucket: int = 16384,
) -> GSTrainState:
    """Host-side densify/prune; repacks into a (possibly new) capacity bucket."""
    scene = state.scene
    n = int(np.asarray(scene.num_active()))
    mask = np.asarray(scene.active)
    params = {k: np.asarray(getattr(scene, k))[mask] for k in PARAM_NAMES}
    m = {k: np.asarray(state.adam.m[k])[mask] for k in PARAM_NAMES}
    v = {k: np.asarray(state.adam.v[k])[mask] for k in PARAM_NAMES}
    accum = np.asarray(state.xyz_grad_accum)[mask]
    denom = np.asarray(state.denom)[mask]
    max_radii = np.asarray(state.max_radii2d)[mask].astype(np.float64)
    with np.errstate(divide="ignore", invalid="ignore"):
        grads = np.nan_to_num(accum / denom, nan=0.0)

    params, m, v, max_radii = densify_mod.densify_and_prune(
        params, m, v, grads, max_radii,
        max_grad=max_grad, min_opacity=min_opacity, extent=extent,
        max_screen_size=max_screen_size, percent_dense=percent_dense, rng=rng,
    )
    n_new = params["xyz"].shape[0]
    cap = round_capacity(n_new, capacity_bucket)
    new_scene = from_arrays(params, scene.max_sh_degree, capacity=cap)

    def pad_state(d):
        out = {}
        for k, arr in d.items():
            buf = np.zeros((cap,) + arr.shape[1:], np.float32)
            buf[:n_new] = arr
            out[k] = jnp.asarray(buf)
        return out

    # densification_postfix resets stats (gaussian_model.py:535-537); reference
    # keeps max_radii2D through clone/split via prune gathers, then train.py
    # refreshes it from fresh renders — we keep the pruned values.
    radii_buf = np.zeros(cap, np.int32)
    radii_buf[:n_new] = max_radii[:n_new].astype(np.int32)
    return GSTrainState(
        scene=new_scene,
        adam=AdamState(m=pad_state(m), v=pad_state(v), step=state.adam.step),
        xyz_grad_accum=jnp.zeros(cap),
        denom=jnp.zeros(cap),
        max_radii2d=jnp.asarray(radii_buf),
    )


def xyz_lr(opt: OptimizationConfig, spatial_lr_scale: float, step: int) -> float:
    return expon_lr(
        step,
        opt.position_lr_init * spatial_lr_scale,
        opt.position_lr_final * spatial_lr_scale,
        lr_delay_mult=opt.position_lr_delay_mult,
        max_steps=opt.position_lr_max_steps,
    )


def lr_dict(opt: OptimizationConfig, spatial_lr_scale: float, step: int):
    return {
        "xyz": jnp.asarray(xyz_lr(opt, spatial_lr_scale, step), jnp.float32),
        "features_dc": jnp.asarray(opt.feature_lr, jnp.float32),
        "features_rest": jnp.asarray(opt.feature_lr / 20.0, jnp.float32),
        "opacity": jnp.asarray(opt.opacity_lr, jnp.float32),
        "scaling": jnp.asarray(opt.scaling_lr, jnp.float32),
        "rotation": jnp.asarray(opt.rotation_lr, jnp.float32),
    }


def render_gui_camera(scene: GaussianScene, gui_cam, bg: jnp.ndarray,
                      sh_degree: int, scaling_modifier: float = 1.0,
                      rasterizer: str = "auto") -> jnp.ndarray:
    """Render a network-GUI camera (matrices only, no gt image)."""
    import math as _math

    ca = CameraArrays(
        view=jnp.asarray(gui_cam.view),
        full_proj=jnp.asarray(gui_cam.full_proj),
        camera_center=jnp.asarray(gui_cam.camera_center),
        tan_fovx=jnp.asarray(_math.tan(gui_cam.FoVx * 0.5), jnp.float32),
        tan_fovy=jnp.asarray(_math.tan(gui_cam.FoVy * 0.5), jnp.float32),
        gt_image=jnp.zeros((3, 1, 1)),
    )
    scaling = jnp.exp(scene.scaling) * scaling_modifier
    params = dict(scene.params())
    params["scaling"] = jnp.log(scaling)
    img, _ = _render_params(
        params, scene.active, ca, gui_cam.width, gui_cam.height, sh_degree, bg,
        jnp.zeros((scene.capacity, 2)), 256, rasterizer,
    )
    return img


def render_eval(scene: GaussianScene, cam, bg: jnp.ndarray, sh_degree: int,
                chunk: int = 256, rasterizer: str = "auto",
                tiers: tuple = DEFAULT_TIERS) -> jnp.ndarray:
    """Inference render of a host Camera (for eval loops)."""
    ca = camera_arrays(cam)
    img, _ = _render_params(
        scene.params(), scene.active, ca, cam.width, cam.height, sh_degree, bg,
        jnp.zeros((scene.capacity, 2)), chunk, rasterizer, tiers,
    )
    return img


class GSTrainer:
    """Orchestrates the training loop (host side)."""

    def __init__(self, model_cfg: ModelConfig, opt_cfg: OptimizationConfig,
                 scene_info, train_cams, test_cams, seed: int = 0,
                 capacity_bucket: int = 16384):
        from sixdgs_tpu.scene.gaussians import create_from_pcd

        self.model_cfg = model_cfg
        self.opt = opt_cfg
        self.scene_info = scene_info
        self.train_cams = train_cams
        self.test_cams = test_cams
        self.capacity_bucket = capacity_bucket
        self.spatial_lr_scale = float(scene_info.nerf_normalization["radius"])
        self.cameras_extent = self.spatial_lr_scale
        n_pts = scene_info.point_cloud.points.shape[0]
        scene = create_from_pcd(
            scene_info.point_cloud, model_cfg.sh_degree,
            capacity=round_capacity(n_pts, capacity_bucket),
        )
        self.state = init_train_state(scene)
        self.rng = np.random.default_rng(seed)
        self.active_sh_degree = 0
        self.bg = jnp.asarray(
            [1.0, 1.0, 1.0] if model_cfg.white_background else [0.0, 0.0, 0.0]
        )
        self._viewpoint_stack = []
        self._cam_arrays = {}

    def _next_camera(self):
        if not self._viewpoint_stack:
            self._viewpoint_stack = list(self.train_cams)
        idx = self.rng.integers(len(self._viewpoint_stack))
        return self._viewpoint_stack.pop(int(idx))

    def _camera_arrays(self, cam) -> CameraArrays:
        """Device-cached CameraArrays: the reference re-uploads each image to
        the GPU every step (train.py:108-111); here each camera's arrays are
        staged to HBM once and reused (~2 MB/camera at 1080p-class inputs).

        The cache holds a reference to the camera object itself, so an id()
        can never be recycled to alias a different (GC'd) camera, and a
        rebuilt camera list simply misses and re-stages."""
        key = id(cam)
        hit = self._cam_arrays.get(key)
        if hit is not None and hit[0] is cam:
            return hit[1]
        ca = camera_arrays(cam)
        self._cam_arrays[key] = (cam, ca)
        return ca

    def save_checkpoint(self, path: str, iteration: int) -> None:
        from sixdgs_tpu.train.checkpoint import save_train_state

        save_train_state(path, self.state, iteration, self.active_sh_degree)

    def restore_checkpoint(self, path: str) -> int:
        from sixdgs_tpu.train.checkpoint import load_train_state

        self.state, iteration, self.active_sh_degree = load_train_state(path)
        return iteration

    def run(self, iterations: Optional[int] = None, log_every: int = 50,
            save_iterations=(), model_path: Optional[str] = None,
            callback=None, chunk: int = 256, rasterizer: str = "auto",
            checkpoint_iterations=(), first_iteration: int = 1,
            pre_step=None, tiers: tuple = DEFAULT_TIERS,
            adapt_tiers_every: int = 500, adapt_drop_threshold: float = 0.01):
        opt = self.opt
        iterations = iterations or opt.iterations
        nc_pairs = 0  # 0 = rasterizer default; adaptively widened below
        for it in range(first_iteration, iterations + 1):
            if pre_step is not None:
                pre_step(it, self)
            if it % 1000 == 0 and self.active_sh_degree < self.state.scene.max_sh_degree:
                self.active_sh_degree += 1
            cam = self._next_camera()
            # only the xyz lr is scheduled; reuse the device-resident constants
            if not hasattr(self, "_const_lrs"):
                self._const_lrs = lr_dict(opt, self.spatial_lr_scale, it)
            lrs = dict(
                self._const_lrs,
                xyz=jnp.asarray(xyz_lr(opt, self.spatial_lr_scale, it),
                                jnp.float32),
            )
            # telemetry is only CONSUMED on adaptation/logging/final iters;
            # skipping it elsewhere saves ~1.7 ms/step (one extra compiled
            # variant, paid once per budget config)
            need_telemetry = (
                it == iterations
                or (adapt_tiers_every and it % adapt_tiers_every == 0)
                or (callback is not None and it % log_every == 0)
            )
            self.state, metrics = train_step(
                self.state,
                self._camera_arrays(cam),
                self.bg,
                lrs,
                width=cam.width,
                height=cam.height,
                sh_degree=self.active_sh_degree,
                chunk=chunk,
                lambda_dssim=opt.lambda_dssim,
                rasterizer=rasterizer,
                tiers=tiers,
                nc_pairs=nc_pairs,
                with_telemetry=bool(need_telemetry),
            )
            if callback is not None and (it % log_every == 0 or it == iterations):
                callback(it, jax.device_get(metrics), self)
            if (adapt_tiers_every and it % adapt_tiers_every == 0
                    and ("binning_real_pairs" in metrics
                         or "binning_nc_demand" in metrics)):
                # compact-pair budget: the aligned layout drops trailing
                # tiles (and the backward drops that step's gradients) when
                # the frame's demand exceeds nc — widen BEFORE saturation.
                # binning_nc_demand is the rasterizer's EXACT post-cull
                # aligned demand (pallas path); the pre-cull real_pairs
                # bound is the fallback for the tiled path.
                from sixdgs_tpu.ops.rasterizer.pallas_tiles import DEFAULT_NC

                real = int(jax.device_get(metrics.get(
                    "binning_nc_demand", metrics.get("binning_real_pairs"))))
                effective = nc_pairs or DEFAULT_NC
                if real > 0.9 * effective:
                    nc_pairs = effective * 2
                    while real > 0.9 * nc_pairs:  # catch up in one retrace
                        nc_pairs *= 2
                    print(f"[{it}] compact-pair demand {real} > 90% of "
                          f"{effective}: widening nc_pairs -> {nc_pairs}")
                elif real * 3.2 < effective and effective > (1 << 18):
                    # every per-pair glue cost (key sort slice, compact
                    # gather, backward routing sort + cumsum) scales with the
                    # static budget; shrink when the telemetry (an UPPER
                    # bound on real emission) says most of it is sentinel
                    # slack. Hysteresis: shrink only when the 1.6x-margin
                    # budget would at least HALVE (occupancy < 31%), widen
                    # again at >90% — each retrace must pay for itself over
                    # the tunnel's 30s+ compile cost.
                    from sixdgs_tpu.ops.rasterizer.pallas_tiles import KB

                    nc_pairs = max(-(-int(real * 1.6) // KB) * KB, 1 << 18)
                    print(f"[{it}] compact pairs {real} < 31% of "
                          f"{effective}: shrinking nc_pairs -> {nc_pairs}")
            if (adapt_tiers_every and it % adapt_tiers_every == 0
                    and "binning_total_area" in metrics):
                # adaptive binning: widen the mid tier when the static caps
                # truncate more than adapt_drop_threshold of tile coverage
                # (the CUDA reference's binning is uncapped; this converges
                # to it at the cost of a retrace per widening)
                m = jax.device_get({k: metrics[k] for k in (
                    "binning_dropped_main", "binning_dropped_mid",
                    "binning_dropped_big", "binning_total_area")})
                total = max(float(m["binning_total_area"]), 1.0)
                d_main = float(m["binning_dropped_main"])
                d_mid = float(m["binning_dropped_mid"])
                d_big = float(m["binning_dropped_big"])
                ratio = (d_main + d_mid + d_big) / total
                if ratio > adapt_drop_threshold:
                    new_tiers = widen_tiers(tiers, d_main, d_mid, d_big)
                    if new_tiers is not None:
                        print(f"[{it}] binning truncation {ratio:.1%} > "
                              f"{adapt_drop_threshold:.0%}: widening tiers "
                              f"{tiers} -> {new_tiers}")
                        tiers = new_tiers
                elif "binning_narrow_demand" in metrics:
                    # nothing truncating: try the other direction — halve the
                    # main slot budget when everything that would overflow it
                    # fits comfortably in the tier tables (see narrow_tiers)
                    demand = int(jax.device_get(
                        metrics["binning_narrow_demand"]))
                    new_tiers = narrow_tiers(
                        tiers, demand, int(self.state.scene.capacity))
                    if new_tiers is not None:
                        print(f"[{it}] main-tier demand {demand} fits tiers: "
                              f"narrowing t_max {tiers} -> {new_tiers}")
                        tiers = new_tiers
            # SAVE BEFORE the densify/opacity-reset block, like the reference
            # (train.py:148-150 precedes :153-179) — otherwise a save
            # iteration that coincides with opacity_reset_interval persists
            # the freshly reset (near-transparent) opacities.
            # Known parity delta: the reference saves before optimizer.step()
            # (train.py:182-184) while the jitted train_step fuses the Adam
            # update, so PLYs at save_iterations carry a ONE-iteration
            # parameter offset vs the reference artifact (immaterial to
            # metrics; bit-level artifact parity would need a pre-update
            # param snapshot plumbed out of train_step)
            if it in save_iterations and model_path:
                path = os.path.join(
                    model_path, "point_cloud", f"iteration_{it}", "point_cloud.ply"
                )
                self.state.scene.save_ply(path)
            if it < opt.densify_until_iter:
                if it > opt.densify_from_iter and it % opt.densification_interval == 0:
                    size_threshold = 20 if it > opt.opacity_reset_interval else None
                    self.state = densify_event(
                        self.state,
                        max_grad=opt.densify_grad_threshold,
                        min_opacity=0.005,
                        extent=self.cameras_extent,
                        max_screen_size=size_threshold,
                        percent_dense=opt.percent_dense,
                        rng=self.rng,
                        capacity_bucket=self.capacity_bucket,
                    )
                if it % opt.opacity_reset_interval == 0 or (
                    self.model_cfg.white_background and it == opt.densify_from_iter
                ):
                    self.state = reset_opacity(self.state)
            if it in checkpoint_iterations and model_path:
                self.save_checkpoint(os.path.join(model_path, f"chkpnt{it}.npz"), it)
        return self.state

    def eval_psnr(self, cams=None, chunk: int = 256):
        cams = cams if cams is not None else self.test_cams
        vals, l1s = [], []
        for cam in cams:
            img = render_eval(self.state.scene, cam, self.bg, self.active_sh_degree, chunk)
            img = jnp.clip(img, 0.0, 1.0)
            gt = jnp.clip(jnp.asarray(cam.image), 0.0, 1.0)
            vals.append(float(psnr(img, gt)))
            l1s.append(float(l1_loss(img, gt)))
        return float(np.mean(vals)), float(np.mean(l1s))
