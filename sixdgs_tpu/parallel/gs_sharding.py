"""Data-parallel 3DGS training: a batch of cameras sharded over the mesh.

The reference trains one camera per iteration on one GPU
(/root/reference/train.py:99-122). The TPU-native scale-out renders B cameras
per step with the batch sharded on the mesh's "data" axis: parameters and
optimizer state stay replicated, each device renders its local cameras, and
the gradient mean over the camera axis becomes the all-reduce XLA already
emits over ICI (scaling-book recipe: annotate shardings, let the compiler
insert collectives).

Densification statistics keep reference semantics: a B-camera step is the
statistical equivalent of B reference iterations, so the screen-space
gradient accumulator receives the SUM over cameras of per-camera gradient
norms (per-camera means2d offsets are vmapped so the norms are taken before
any cross-camera reduction), the denominator the per-camera visibility
counts, and max radii the max over cameras
(/root/reference/train.py:153-161, scene/gaussian_model.py:628-632).
"""

from __future__ import annotations

import functools
from typing import Dict

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from sixdgs_tpu.ops.ssim import dssim_l1_loss, psnr
from sixdgs_tpu.train.gs_trainer import (
    CameraArrays,
    DEFAULT_TIERS,
    GSTrainState,
    _render_params,
)
from sixdgs_tpu.train.optim import adam_update


def camera_batch_sharding(mesh: Mesh):
    """CameraArrays pytree of NamedShardings: batch dim on the "data" axis."""
    dax = "data" if "data" in mesh.axis_names else mesh.axis_names[0]
    return CameraArrays(
        view=NamedSharding(mesh, P(dax, None, None)),
        full_proj=NamedSharding(mesh, P(dax, None, None)),
        camera_center=NamedSharding(mesh, P(dax, None)),
        tan_fovx=NamedSharding(mesh, P(dax)),
        tan_fovy=NamedSharding(mesh, P(dax)),
        gt_image=NamedSharding(mesh, P(dax, None, None, None)),
    )


def stack_camera_batch(cams) -> CameraArrays:
    """Host Cameras -> batched CameraArrays (leading camera axis)."""
    from sixdgs_tpu.train.gs_trainer import camera_arrays

    arrs = [camera_arrays(c) for c in cams]
    return jax.tree.map(lambda *xs: jnp.stack(xs, axis=0), *arrs)


def make_sharded_gs_step(
    mesh: Mesh,
    *,
    width: int,
    height: int,
    sh_degree: int,
    chunk: int = 256,
    lambda_dssim: float = 0.2,
    rasterizer: str = "auto",
    tiers: tuple = DEFAULT_TIERS,
    nc_pairs: int = 0,
):
    """Build the jitted DP train step.

    Returns step(state, cams, bg, lrs) -> (state, metrics) where ``cams`` is
    a batched CameraArrays whose batch dim is divisible by the data-axis size.

    ``rasterizer="pallas"`` (the production fast path, or
    ``"pallas_interpret"`` for CPU-mesh tests) routes through an explicit
    shard_map: pallas_call has neither a batching nor an SPMD-partitioning
    rule, so the camera batch cannot ride the compiler's automatic
    propagation the way the pure-XLA tiled path does — each device instead
    scans its LOCAL cameras through the kernel renderer and the gradient
    all-reduce is an explicit psum over the data axis (numerically the same
    mean-gradient collective XLA emits for the tiled path).
    """
    resolved = rasterizer
    if rasterizer == "auto":
        from sixdgs_tpu.ops.rasterizer import resolve_rasterizer

        resolved = resolve_rasterizer(rasterizer)
    if resolved in ("pallas", "pallas_interpret"):
        return _make_shardmap_gs_step(
            mesh, width=width, height=height, sh_degree=sh_degree,
            chunk=chunk, lambda_dssim=lambda_dssim, rasterizer=resolved,
            tiers=tiers, nc_pairs=nc_pairs,
        )
    cam_s = camera_batch_sharding(mesh)
    rep = NamedSharding(mesh, P())

    def step(state: GSTrainState, cams: CameraArrays, bg: jnp.ndarray,
             lrs: Dict[str, jnp.ndarray]):
        active = state.scene.active
        params = state.scene.params()
        B = cams.view.shape[0]
        zeros2d = jnp.zeros((B, state.scene.capacity, 2))

        def loss_fn(params, zeros2d):
            def one(cam, z2d):
                img, proj = _render_params(
                    params, active, cam, width, height, sh_degree, bg, z2d,
                    chunk, rasterizer, tiers,
                )
                loss, ll1 = dssim_l1_loss(img, cam.gt_image, lambda_dssim)
                p = psnr(jnp.clip(img, 0, 1), jnp.clip(cam.gt_image, 0, 1))
                return loss, (ll1, proj.radii, p)

            losses, aux = jax.vmap(one, in_axes=(0, 0))(cams, zeros2d)
            return jnp.mean(losses), aux

        (loss, (ll1s, radiis, psnrs)), (grads, g2d) = jax.value_and_grad(
            loss_fn, argnums=(0, 1), has_aux=True
        )(params, zeros2d)

        new_params, new_adam = adam_update(params, grads, state.adam, lrs)
        new_scene = state.scene.with_params(new_params)

        # per-camera NDC gradient norms, summed over the batch; undo the 1/B
        # of the loss mean so one B-camera step accumulates like B reference
        # iterations
        visible = radiis > 0  # [B, C]
        g_ndc = g2d * B * jnp.asarray([[[0.5 * width, 0.5 * height]]])
        gnorm = jnp.linalg.norm(g_ndc, axis=-1)  # [B, C]
        new_state = GSTrainState(
            scene=new_scene,
            adam=new_adam,
            xyz_grad_accum=state.xyz_grad_accum
            + jnp.sum(jnp.where(visible, gnorm, 0.0), axis=0),
            denom=state.denom + jnp.sum(visible, axis=0).astype(state.denom.dtype),
            max_radii2d=jnp.maximum(state.max_radii2d, jnp.max(radiis, axis=0)),
        )
        metrics = {"loss": loss, "l1": jnp.mean(ll1s), "psnr": jnp.mean(psnrs)}
        return new_state, metrics

    return jax.jit(
        step,
        in_shardings=(rep, cam_s, rep, rep),
        out_shardings=(rep, rep),
        donate_argnums=(0,),
    )


def _make_shardmap_gs_step(
    mesh: Mesh,
    *,
    width: int,
    height: int,
    sh_degree: int,
    chunk: int,
    lambda_dssim: float,
    rasterizer: str,
    tiers: tuple = DEFAULT_TIERS,
    nc_pairs: int = 0,
):
    """DP step over the Pallas rasterizer via explicit shard_map.

    Params/optimizer state replicated; cameras sharded on the data axis;
    inside the map each device lax.maps its local cameras through
    ``_render_params`` (the kernels see ONE camera at a time — no pallas
    batching rule needed), contributes sum(loss)/B to the global mean, and
    the loss/grad psum over the data axis is the DP all-reduce.
    Densification statistics keep the same B-reference-iterations semantics
    as the tiled path (sum of per-camera gradient norms / visibility counts,
    max radii)."""
    dax = "data" if "data" in mesh.axis_names else mesh.axis_names[0]
    cam_spec = CameraArrays(
        view=P(dax, None, None),
        full_proj=P(dax, None, None),
        camera_center=P(dax, None),
        tan_fovx=P(dax),
        tan_fovy=P(dax),
        gt_image=P(dax, None, None, None),
    )
    rep = NamedSharding(mesh, P())
    cam_s = camera_batch_sharding(mesh)

    def step(state: GSTrainState, cams: CameraArrays, bg: jnp.ndarray,
             lrs: Dict[str, jnp.ndarray]):
        active = state.scene.active
        params = state.scene.params()
        B = cams.view.shape[0]
        capacity = state.scene.capacity

        def local_fn(params, active, cams_l, bg):
            bl = cams_l.view.shape[0]
            zeros2d = jnp.zeros((bl, capacity, 2))

            def loss_fn(params, zeros2d):
                def one(xz):
                    cam, z2d = xz
                    img, proj = _render_params(
                        params, active, cam, width, height, sh_degree, bg,
                        z2d, chunk, rasterizer, tiers, nc_pairs,
                    )
                    loss, ll1 = dssim_l1_loss(img, cam.gt_image, lambda_dssim)
                    p = psnr(jnp.clip(img, 0, 1), jnp.clip(cam.gt_image, 0, 1))
                    return loss, (ll1, proj.radii, p)

                losses, aux = jax.lax.map(one, (cams_l, zeros2d))
                return jnp.sum(losses) / B, aux

            (loss_l, (ll1s, radiis, psnrs)), (grads, g2d) = jax.value_and_grad(
                loss_fn, argnums=(0, 1), has_aux=True
            )(params, zeros2d)

            loss = jax.lax.psum(loss_l, dax)
            grads = jax.lax.psum(grads, dax)
            visible = radiis > 0  # [bl, C]
            g_ndc = g2d * B * jnp.asarray([[[0.5 * width, 0.5 * height]]])
            gnorm = jnp.linalg.norm(g_ndc, axis=-1)
            accum = jax.lax.psum(
                jnp.sum(jnp.where(visible, gnorm, 0.0), axis=0), dax)
            denom = jax.lax.psum(jnp.sum(visible, axis=0), dax)
            radmax = jax.lax.pmax(jnp.max(radiis, axis=0), dax)
            l1 = jax.lax.psum(jnp.sum(ll1s), dax) / B
            pm = jax.lax.psum(jnp.sum(psnrs), dax) / B
            return loss, grads, accum, denom, radmax, l1, pm

        loss, grads, accum, denom, radmax, l1, pm = jax.shard_map(
            local_fn,
            mesh=mesh,
            in_specs=(P(), P(), cam_spec, P()),
            out_specs=P(),
            check_vma=False,  # custom-VJP kernels defeat replication tracking
        )(params, active, cams, bg)

        new_params, new_adam = adam_update(params, grads, state.adam, lrs)
        new_state = GSTrainState(
            scene=state.scene.with_params(new_params),
            adam=new_adam,
            xyz_grad_accum=state.xyz_grad_accum + accum,
            denom=state.denom + denom.astype(state.denom.dtype),
            max_radii2d=jnp.maximum(state.max_radii2d, radmax),
        )
        metrics = {"loss": loss, "l1": l1, "psnr": pm}
        return new_state, metrics

    return jax.jit(
        step,
        in_shardings=(rep, cam_s, rep, rep),
        out_shardings=(rep, rep),
        donate_argnums=(0,),
    )


def shard_camera_batch(mesh: Mesh, cams: CameraArrays) -> CameraArrays:
    """Place a batched CameraArrays onto the mesh's data axis."""
    return jax.tree.map(jax.device_put, cams, camera_batch_sharding(mesh))
