"""Sharded pose training step: DP over images x SP over rays.

Sharding layout (scaling-book style: annotate in/out shardings, let XLA insert
the collectives over ICI):

  * batch images/masks/c2w: sharded on mesh axis "data" (batch dim),
  * rays (ori/dir/rgb/valid/gaussian_idx): sharded on "rays" (ray dim) — the
    ray-MLP rows and the [256, N_rays] attention logits are computed on the
    owning shard; the softmax over the ray axis and the per-ray score
    normalization cross shards via XLA-inserted all-reduces (ring on ICI),
  * id-module / DINO params and optimizer state: replicated; the gradient
    mean over the data axis becomes a psum at the reduction XLA already emits.

The same jitted step runs single-chip when the mesh has one device.
"""

from __future__ import annotations

import functools

import jax
import optax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from sixdgs_tpu.pose.trainer import (
    FeatureBatch,
    PoseBatch,
    batch_loss,
    batch_loss_cached,
)
from sixdgs_tpu.rays.engine import Rays


def pose_shardings(mesh: Mesh):
    """(batch_sharding, rays_sharding, replicated) NamedSharding pytrees."""
    batch = PoseBatch(
        images=NamedSharding(mesh, P("data", None, None, None)),
        masks=NamedSharding(mesh, P("data", None, None)),
        c2w=NamedSharding(mesh, P("data", None, None)),
    )
    rays = Rays(
        ori=NamedSharding(mesh, P("rays", None)),
        dir=NamedSharding(mesh, P("rays", None)),
        rgb=NamedSharding(mesh, P("rays", None)),
        valid=NamedSharding(mesh, P("rays")),
        gaussian_idx=NamedSharding(mesh, P("rays")),
    )
    replicated = NamedSharding(mesh, P())
    return batch, rays, replicated


def shard_pose_inputs(mesh: Mesh, batch: PoseBatch, rays: Rays):
    """Place host arrays onto the mesh with the training layout."""
    bs, rs, _ = pose_shardings(mesh)
    batch = jax.tree.map(jax.device_put, batch, bs)
    rays = jax.tree.map(jax.device_put, rays, rs)
    return batch, rays


def make_sharded_pose_step(mesh: Mesh, optimizer: optax.GradientTransformation):
    """Build the jitted multi-chip train step.

    Returns step(id_params, opt_state, dino_params, batch, rays, model_up)
    -> (id_params, opt_state, aux).
    """
    batch_s, rays_s, rep = pose_shardings(mesh)

    def step(id_params, opt_state, dino_params, batch, rays, model_up):
        (loss, aux), grads = jax.value_and_grad(batch_loss, has_aux=True)(
            id_params, dino_params, batch, rays, model_up
        )
        grads = jax.tree.map(lambda g: jax.numpy.where(jax.numpy.isfinite(g), g, 0.0), grads)
        updates, opt_state = optimizer.update(grads, opt_state, id_params)
        id_params = optax.apply_updates(id_params, updates)
        return id_params, opt_state, aux

    # jit built ONCE: a bare NamedSharding is a valid prefix-pytree for whole
    # subtrees, so no per-call tree introspection (or re-wrap) is needed
    return jax.jit(
        step,
        in_shardings=(rep, rep, rep, batch_s, rays_s, rep),
        out_shardings=(rep, rep, rep),
        donate_argnums=(0, 1),
    )


def make_sharded_pose_step_cached(mesh: Mesh, optimizer: optax.GradientTransformation):
    """Cached-feature variant: FeatureBatch sharded on "data", rays on "rays"."""
    _, rays_s, rep = pose_shardings(mesh)
    fb_s = FeatureBatch(
        feats_pe=NamedSharding(mesh, P("data", None, None)),
        patch_mask=NamedSharding(mesh, P("data", None)),
        fmap=NamedSharding(mesh, P("data", None, None, None)),
        c2w=NamedSharding(mesh, P("data", None, None)),
    )
    def step(id_params, opt_state, fbatch, rays, model_up):
        (loss, aux), grads = jax.value_and_grad(batch_loss_cached, has_aux=True)(
            id_params, fbatch, rays, model_up
        )
        grads = jax.tree.map(
            lambda g: jax.numpy.where(jax.numpy.isfinite(g), g, 0.0), grads
        )
        updates, opt_state = optimizer.update(grads, opt_state, id_params)
        id_params = optax.apply_updates(id_params, updates)
        return id_params, opt_state, aux

    return jax.jit(
        step,
        in_shardings=(rep, rep, fb_s, rays_s, rep),
        out_shardings=(rep, rep, rep),
        donate_argnums=(0, 1),
    )


def shard_feature_inputs(mesh: Mesh, fbatch: FeatureBatch, rays: Rays):
    fb_s = FeatureBatch(
        feats_pe=NamedSharding(mesh, P("data", None, None)),
        patch_mask=NamedSharding(mesh, P("data", None)),
        fmap=NamedSharding(mesh, P("data", None, None, None)),
        c2w=NamedSharding(mesh, P("data", None, None)),
    )
    _, rays_s, _ = pose_shardings(mesh)
    return (
        jax.tree.map(jax.device_put, fbatch, fb_s),
        jax.tree.map(jax.device_put, rays, rays_s),
    )


# --------------------------------------------------- sharded 3DGS rendering


def make_sharded_render(mesh: Mesh, width: int, height: int, sh_degree: int,
                        chunk: int = 256):
    """Gaussian-parallel projection + pixel-parallel compositing.

    Scene arrays are sharded over the "gaussians" axis for projection; the
    projected per-Gaussian records are all-gathered (small) and each device
    composites its slice of image rows — the TPU analogue of the CUDA tile
    rasterizer's block scheduling, with XLA emitting the gather on ICI.
    """
    from sixdgs_tpu.train.gs_trainer import CameraArrays, _render_params

    gax = mesh.axis_names[0]
    scene_sharding = {
        "xyz": NamedSharding(mesh, P(gax, None)),
        "features_dc": NamedSharding(mesh, P(gax, None, None)),
        "features_rest": NamedSharding(mesh, P(gax, None, None)),
        "opacity": NamedSharding(mesh, P(gax, None)),
        "scaling": NamedSharding(mesh, P(gax, None)),
        "rotation": NamedSharding(mesh, P(gax, None)),
    }
    active_sharding = NamedSharding(mesh, P(gax))
    out_sharding = NamedSharding(mesh, P(None, gax, None))  # rows sharded

    @functools.partial(
        jax.jit,
        in_shardings=(scene_sharding, active_sharding, None, None),
        out_shardings=out_sharding,
    )
    def render(params, active, cam: CameraArrays, bg):
        img, _ = _render_params(
            params, active, cam, width, height, sh_degree, bg,
            jax.numpy.zeros((params["xyz"].shape[0], 2)), chunk,
        )
        return img

    return render
