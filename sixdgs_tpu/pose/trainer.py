"""ID-module training.

Parity with /root/reference/pose_estimation/train.py:16-317: 1500 iterations,
32 images per step, Adafactor with HF default hyperparameters (relative step
sizes min(1e-2, 1/sqrt(t)), parameter-scale multiplication), rays regenerated
every 10 iterations, distance-based score loss + 0.1 * camera-up cosine loss,
NaN steps skipped, frozen DINO backbone.

TPU re-design: the reference's sequential gradient-accumulation loop of 32
single-image forward/backward passes becomes ONE jitted step over an image
batch axis (vmapped model + mean loss == mean of per-image gradients), which
is also the data-parallel axis for multi-chip sharding (parallel/pose_sharding).
"""

from __future__ import annotations

import functools
from typing import NamedTuple, Optional

import numpy as np
import jax
import jax.numpy as jnp
import optax

from sixdgs_tpu.pose.id_module import compute_image_features, score_image
from sixdgs_tpu.pose.loss import cam_up_loss, distance_score_loss
from sixdgs_tpu.rays.engine import Rays
from sixdgs_tpu.utils.config import PoseEstimationConfig


class PoseBatch(NamedTuple):
    images: jnp.ndarray  # [B, H, W, 3] float in [0,1]
    masks: jnp.ndarray  # [B, H, W] bool
    c2w: jnp.ndarray  # [B, 4, 4]


class FeatureBatch(NamedTuple):
    """Precomputed frozen-backbone features (cache-friendly training)."""

    feats_pe: jnp.ndarray  # [B, 256, D+14]
    patch_mask: jnp.ndarray  # [B, 256] bool
    fmap: jnp.ndarray  # [B, D, 16, 16]
    c2w: jnp.ndarray  # [B, 4, 4]


def make_adafactor() -> optax.GradientTransformation:
    """HF-default Adafactor (transformers.optimization.Adafactor with lr=None):
    relative step min(1e-2, 1/sqrt(t)), scale_parameter=True, no momentum."""
    schedule = lambda step: jnp.minimum(1e-2, 1.0 / jnp.sqrt(step.astype(jnp.float32) + 1.0))
    return optax.adafactor(
        learning_rate=schedule,
        multiply_by_parameter_scale=True,
        clipping_threshold=1.0,
        decay_rate=0.8,
        eps=1e-30,
    )


def batch_loss(id_params, dino_params, batch: PoseBatch, rays: Rays,
               model_up: jnp.ndarray, backbone: str = "dino"):
    """Mean loss over the image batch, NaN-skipping like train.py:176-177."""

    def per_image(img, mask, c2w):
        out = score_image(dino_params, id_params, img, mask, rays,
                          backbone=backbone)
        loss_score, target = distance_score_loss(
            out.scores, c2w, rays.ori, rays.dir, rays.valid, out.n_patches
        )
        up = cam_up_loss(model_up, out.cam_up)
        return loss_score + 0.1 * up, (loss_score, up)

    losses, (score_losses, up_losses) = jax.vmap(
        per_image, in_axes=(0, 0, 0)
    )(batch.images, batch.masks, batch.c2w)
    ok = jnp.isfinite(losses)
    n_ok = jnp.maximum(jnp.sum(ok.astype(losses.dtype)), 1.0)
    total = jnp.sum(jnp.where(ok, losses, 0.0)) / n_ok
    aux = {
        "loss": total,
        "loss_score": jnp.sum(jnp.where(ok, score_losses, 0.0)) / n_ok,
        "cam_up": jnp.sum(jnp.where(ok, up_losses, 0.0)) / n_ok,
        "n_nan": jnp.sum((~ok).astype(jnp.int32)),
    }
    return total, aux


def batch_loss_cached(id_params, fbatch: FeatureBatch, rays: Rays,
                      model_up: jnp.ndarray):
    """batch_loss over precomputed backbone features."""
    from sixdgs_tpu.pose.id_module import score_image_cached

    def per_image(feats_pe, patch_mask, fmap, c2w):
        out = score_image_cached(id_params, feats_pe, patch_mask, fmap, rays)
        loss_score, _ = distance_score_loss(
            out.scores, c2w, rays.ori, rays.dir, rays.valid, out.n_patches
        )
        up = cam_up_loss(model_up, out.cam_up)
        return loss_score + 0.1 * up, (loss_score, up)

    losses, (score_losses, up_losses) = jax.vmap(per_image)(
        fbatch.feats_pe, fbatch.patch_mask, fbatch.fmap, fbatch.c2w
    )
    ok = jnp.isfinite(losses)
    n_ok = jnp.maximum(jnp.sum(ok.astype(losses.dtype)), 1.0)
    total = jnp.sum(jnp.where(ok, losses, 0.0)) / n_ok
    aux = {
        "loss": total,
        "loss_score": jnp.sum(jnp.where(ok, score_losses, 0.0)) / n_ok,
        "cam_up": jnp.sum(jnp.where(ok, up_losses, 0.0)) / n_ok,
        "n_nan": jnp.sum((~ok).astype(jnp.int32)),
    }
    return total, aux


@functools.partial(jax.jit, static_argnames=("optimizer", "backbone"),
                   donate_argnames=("id_params", "opt_state"))
def pose_train_step(id_params, opt_state, dino_params, batch: PoseBatch,
                    rays: Rays, model_up: jnp.ndarray, *, optimizer,
                    backbone: str = "dino"):
    (loss, aux), grads = jax.value_and_grad(batch_loss, has_aux=True)(
        id_params, dino_params, batch, rays, model_up, backbone
    )
    # zero NaN/inf gradients (a NaN image is skipped by the masked mean; this
    # guards pathological batches entirely NaN)
    grads = jax.tree.map(lambda g: jnp.where(jnp.isfinite(g), g, 0.0), grads)
    updates, opt_state = optimizer.update(grads, opt_state, id_params)
    id_params = optax.apply_updates(id_params, updates)
    return id_params, opt_state, aux


@functools.partial(jax.jit, static_argnames=("optimizer",), donate_argnames=("id_params", "opt_state"))
def pose_train_step_cached(id_params, opt_state, fbatch: FeatureBatch,
                           rays: Rays, model_up: jnp.ndarray, *, optimizer):
    (loss, aux), grads = jax.value_and_grad(batch_loss_cached, has_aux=True)(
        id_params, fbatch, rays, model_up
    )
    grads = jax.tree.map(lambda g: jnp.where(jnp.isfinite(g), g, 0.0), grads)
    updates, opt_state = optimizer.update(grads, opt_state, id_params)
    id_params = optax.apply_updates(id_params, updates)
    return id_params, opt_state, aux


def model_up_from_cameras(cam_infos) -> np.ndarray:
    """Mean of train-camera R[:, 1] (pretrain_eval_attention.py:91-98)."""
    ups = np.asarray([c.R[:3, 1] for c in cam_infos], np.float32)
    return ups.mean(axis=0)


def prepare_image_mask(cam_info, target_hw=None):
    """Image (alpha-composited to white if RGBA) + mask (alpha > 0.3 or full)
    (pose_estimation/train.py:108-121)."""
    arr = cam_info.image_array().astype(np.float32) / 255.0
    if arr.ndim == 3 and arr.shape[-1] == 4:
        mask = arr[..., -1] > 0.3
        img = arr[..., :3] * arr[..., -1:] + (1.0 - arr[..., -1:])
    else:
        img = arr[..., :3] if arr.ndim == 3 else np.repeat(arr[..., None], 3, -1)
        mask = np.ones(img.shape[:2], bool)
    return img.astype(np.float32), mask


class PoseTrainer:
    """Host orchestration of id-module training."""

    def __init__(self, dino_params, id_params, scene, train_cam_infos,
                 cfg: Optional[PoseEstimationConfig] = None, seed: int = 55176280,
                 cache_features: bool = True, backbone: str = "dino"):
        self.cfg = cfg or PoseEstimationConfig()
        self.backbone = backbone
        self.dino_params = dino_params
        # own a copy: pose_train_step donates id_params buffers, which would
        # invalidate the caller's arrays
        self.id_params = jax.tree.map(jnp.array, id_params)
        id_params = self.id_params
        self.scene = scene
        self.train_cam_infos = train_cam_infos
        self.optimizer = make_adafactor()
        self.opt_state = self.optimizer.init(id_params)
        self.rng = np.random.default_rng(seed)
        self.key = jax.random.key(seed)
        self.model_up = jnp.asarray(model_up_from_cameras(train_cam_infos))
        self.rays: Optional[Rays] = None
        self.running_loss = 0.0
        # host-side cache of composited images/masks
        self._img_cache = [prepare_image_mask(c) for c in train_cam_infos]
        # frozen-backbone feature cache: the reference recomputes DINO features
        # on every accumulation step (train.py:146); they are constants per
        # camera while the backbone is locked, so compute once.
        self.cache_features = cache_features
        self._feat_cache = None
        if cache_features:
            feat_fn = jax.jit(
                lambda img, mask: compute_image_features(dino_params, img, mask,
                                                         backbone=backbone)
            )
            feats = [
                jax.device_get(feat_fn(jnp.asarray(img), jnp.asarray(mask)))
                for img, mask in self._img_cache
            ]
            # kept ON DEVICE and gathered with jnp.take in _sample_batch:
            # host-side fancy-indexing re-uploaded ~30 MB/iteration through
            # the tunnel, which both throttled the step and leaked host RAM
            # in the axon transfer path (a 1500-iter two-backbone run was
            # OOM-killed at 130 GB RSS, 2026-08-19)
            self._feat_cache = (
                jnp.asarray(np.stack([f[0] for f in feats])),
                jnp.asarray(np.stack([f[1] for f in feats])),
                jnp.asarray(np.stack([f[2] for f in feats])),
            )

    def _regen_rays(self):
        from sixdgs_tpu.rays.engine import generate_rays_from_scene

        self.key, sub = jax.random.split(self.key)
        self.rays = generate_rays_from_scene(self.scene, sub, self.cfg)

    def _sample_batch(self):
        B = self.cfg.gradient_accumulation_steps
        idx = self.rng.integers(0, len(self.train_cam_infos), size=B)
        c2ws = np.stack([self.train_cam_infos[i].c2w() for i in idx])
        if self.cache_features:
            fp, pm, fm = self._feat_cache
            idx_d = jnp.asarray(idx, jnp.int32)  # only idx+c2w cross the wire
            return FeatureBatch(
                feats_pe=jnp.take(fp, idx_d, axis=0),
                patch_mask=jnp.take(pm, idx_d, axis=0),
                fmap=jnp.take(fm, idx_d, axis=0),
                c2w=jnp.asarray(c2ws),
            )
        imgs = np.stack([self._img_cache[i][0] for i in idx])
        masks = np.stack([self._img_cache[i][1] for i in idx])
        return PoseBatch(
            images=jnp.asarray(imgs), masks=jnp.asarray(masks), c2w=jnp.asarray(c2ws)
        )

    def run(self, n_iterations: Optional[int] = None, start_iteration: int = 0,
            callback=None, log_every: int = 20, test_cam_infos=None,
            writer=None, validate_every: Optional[int] = None):
        """Train; every ``validate_every`` (cfg.val_every_n_iterations) steps,
        evaluate train + test cameras in target-score mode and log val
        translation/angular/recall — the reference's in-training validation
        (/root/reference/pose_estimation/train.py:214-303, where loss_fn is
        passed so the solver runs on ground-truth scores, test.py:137-142)."""
        cfg = self.cfg
        n_iterations = n_iterations if n_iterations is not None else cfg.n_iterations
        validate_every = (validate_every if validate_every is not None
                          else cfg.val_every_n_iterations)
        for it in range(start_iteration, n_iterations):
            if it % cfg.renewal_every_n_iterations == 0 or self.rays is None:
                self._regen_rays()
            batch = self._sample_batch()
            if self.cache_features:
                self.id_params, self.opt_state, aux = pose_train_step_cached(
                    self.id_params, self.opt_state, batch, self.rays,
                    self.model_up, optimizer=self.optimizer,
                )
            else:
                self.id_params, self.opt_state, aux = pose_train_step(
                    self.id_params, self.opt_state, self.dino_params, batch,
                    self.rays, self.model_up, optimizer=self.optimizer,
                    backbone=self.backbone,
                )
            self.running_loss += float(aux["loss"])
            if callback is not None and (it % log_every == log_every - 1):
                callback(it, jax.device_get(aux), self)
            if writer is not None and (it % log_every == log_every - 1):
                a = jax.device_get(aux)
                writer.scalar("id_module/loss", float(a["loss"]), it)
                writer.scalar("id_module/loss_score", float(a["loss_score"]), it)
                writer.scalar("id_module/cam_up_loss", float(a["cam_up"]), it)
            if validate_every and (it % validate_every == validate_every - 1):
                self.validate(it, test_cam_infos=test_cam_infos, writer=writer)
        return self.id_params

    def validate(self, iteration: int, test_cam_infos=None, writer=None,
                 max_images: Optional[int] = None):
        """train.py:214-303 analogue: target-score solve on train/test views."""
        from sixdgs_tpu.pose.evaluate import test_pose_estimation

        out = {}
        splits = [("train_imgs", self.train_cam_infos)]
        if test_cam_infos:
            splits.append(("validation_imgs", test_cam_infos))
        for tag, infos in splits:
            infos = infos[:max_images] if max_images else infos
            _, t_err, a_err, loss_score, recall, _ = test_pose_estimation(
                infos, self.dino_params, self.id_params, self.rays,
                self.model_up, use_target_scores=True,
                k=self.cfg.rays_to_output, backbone=self.backbone,
            )
            out[tag] = {"translation_error": t_err, "angular_error": a_err,
                        "loss_score": loss_score, "recall": recall}
            if writer is not None:
                writer.scalar(f"{tag}/translation_error", t_err, iteration)
                writer.scalar(f"{tag}/angular_error", a_err, iteration)
                writer.scalar(f"{tag}/recall", recall, iteration)
                writer.scalar(f"{tag}/loss_score", loss_score, iteration)
        return out

    @staticmethod
    def _key_name(k) -> str:
        for attr in ("key", "idx", "name"):  # DictKey / SequenceKey / GetAttrKey
            if hasattr(k, attr):
                return str(getattr(k, attr))
        return str(k)

    @classmethod
    def _flat_tree(cls, tree, prefix: str):
        flat = {}
        for keypath, leaf in jax.tree_util.tree_flatten_with_path(tree)[0]:
            name = "/".join(cls._key_name(k) for k in keypath)
            flat[prefix + name] = np.asarray(leaf)
        return flat

    @classmethod
    def _unflat_tree(cls, data, template, prefix: str):
        leaves, treedef = jax.tree_util.tree_flatten_with_path(template)
        new_leaves = []
        for keypath, leaf in leaves:
            name = "/".join(cls._key_name(k) for k in keypath)
            new_leaves.append(jnp.asarray(data[prefix + name]))
        return jax.tree_util.tree_unflatten(treedef, new_leaves)

    def save_checkpoint(self, path: str, epoch: int) -> None:
        """Full-state npz checkpoint — the id_module.th analogue with the
        reference's exact contents {epoch, model state, optimizer state,
        running_loss} (/root/reference/pose_estimation/train.py:309-317)."""
        flat = self._flat_tree(self.id_params, "param:")
        flat.update(self._flat_tree(self.opt_state, "opt:"))
        flat["epoch"] = np.asarray(epoch)
        flat["running_loss"] = np.asarray(self.running_loss, np.float64)
        np.savez(path, **flat)

    def restore_checkpoint(self, path: str) -> int:
        """Resume params + Adafactor state + running_loss; returns epoch."""
        data = np.load(path)
        self.id_params = self._unflat_tree(data, self.id_params, "param:")
        if any(k.startswith("opt:") for k in data.files):
            self.opt_state = self._unflat_tree(data, self.opt_state, "opt:")
        self.running_loss = float(data["running_loss"]) if "running_loss" in data.files else 0.0
        return int(data["epoch"])

    @staticmethod
    def load_checkpoint(path: str, template_params):
        """Params-only load (inference path)."""
        data = np.load(path)
        params = PoseTrainer._unflat_tree(data, template_params, "param:")
        return params, int(data["epoch"])
