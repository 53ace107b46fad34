"""Backbone wrapper: preprocessing, DINO features, positional encoding, mask.

Parity with /root/reference/pose_estimation/backbone.py:34-139:
  * image: resize shorter side to 256 (bicubic, antialias) -> center-crop 224
    -> ImageNet normalize (:52-62),
  * mask: resize 256 (bilinear) -> crop 224 -> resize to the 16x16 patch grid
    -> threshold 0.1 (:63-77,87),
  * 14-dim 2D positional encoding: raw xy + sin/cos at 3 octaves (:116-139),
  * features: DINOv2 x_norm_patchtokens reshaped to 16x16x384 (:89-94).

Fixed-shape re-design: the reference gathers the masked patch subset
(variable length, :111); we keep all 256 patches and return the boolean patch
mask — downstream attention multiplies rows by the mask instead of gathering.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp

IMAGENET_MEAN = (0.485, 0.456, 0.406)
IMAGENET_STD = (0.229, 0.224, 0.225)
RESIZE = 256
CROP = 224
PATCH_GRID = 16  # 224 / 14 (DINOv2)
PATCH_GRID_SP = 28  # 224 / 8 (SuperPoint stride-8 descriptors)
NUM_PATCHES = PATCH_GRID * PATCH_GRID
PE_DIM = 14
FEATURE_DIM = 384
FEATURE_DIM_SP = 256


def _resize_shorter(img: jnp.ndarray, target: int, method: str) -> jnp.ndarray:
    """img [H, W, C] -> shorter side == target, aspect kept (host-static dims)."""
    h, w = img.shape[0], img.shape[1]
    if h < w:
        nh, nw = target, max(1, round(target * w / h))
    else:
        nh, nw = max(1, round(target * h / w)), target
    return jax.image.resize(img, (nh, nw, img.shape[2]), method, antialias=True)


def _center_crop(img: jnp.ndarray, size: int) -> jnp.ndarray:
    h, w = img.shape[0], img.shape[1]
    top = (h - size) // 2
    left = (w - size) // 2
    return img[top : top + size, left : left + size]


def preprocess_image(img: jnp.ndarray) -> jnp.ndarray:
    """[H, W, 3] in [0,1] -> normalized [3, 224, 224]."""
    x = _resize_shorter(img, RESIZE, "bicubic")
    x = _center_crop(x, CROP)
    mean = jnp.asarray(IMAGENET_MEAN, x.dtype)
    std = jnp.asarray(IMAGENET_STD, x.dtype)
    x = (x - mean) / std
    return jnp.transpose(x, (2, 0, 1))


def preprocess_mask(mask: jnp.ndarray, grid: int = PATCH_GRID) -> jnp.ndarray:
    """[H, W] bool/float -> [grid, grid] bool patch mask (threshold 0.1)."""
    m = mask.astype(jnp.float32)[..., None]
    m = _resize_shorter(m, RESIZE, "bilinear")
    m = _center_crop(m, CROP)
    m = jax.image.resize(m, (grid, grid, 1), "bilinear", antialias=True)
    return m[..., 0] > 0.1


@functools.lru_cache(maxsize=4)
def _position_encoding_np(grid: int, freqs: int):
    import numpy as np

    lin = np.linspace(-1.0, 1.0, grid, dtype=np.float32)
    yy, xx = np.meshgrid(lin, lin, indexing="ij")
    positions = np.stack([yy, xx], axis=-1).reshape(-1, 2)  # [N, 2]
    bands = 2.0 ** np.arange(freqs, dtype=np.float32)
    pts = (positions[..., None] * bands).reshape(positions.shape[0], -1)  # [N, 2F]
    return np.concatenate([positions, np.sin(pts), np.cos(pts)], axis=-1)  # [N, 2+4F]


def image_position_encoding(grid: int = PATCH_GRID, freqs: int = 3) -> jnp.ndarray:
    """[grid*grid, 14] positional encoding (backbone.py:116-139)."""
    return jnp.asarray(_position_encoding_np(grid, freqs))


def backbone_features(
    dino_params,
    img: jnp.ndarray,
    mask: jnp.ndarray,
    backbone: str = "dino",
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Full backbone forward.

    Args:
        dino_params: backbone param pytree (DINOv2 or SuperPoint — the
            reference selects with backbone_type, backbone.py:14-22; both
            share the identical resize-256/crop-224/ImageNet preprocessing).
        img: [H, W, 3] float image in [0, 1].
        mask: [H, W] foreground mask.
        backbone: "dino" (16x16 grid, 384-dim) or "superpoint"
            (28x28 grid, 256-dim L2-normalized descriptors).

    Returns:
        (features_with_pe [G*G, D+14], patch_mask [G*G] bool,
         feature_map [D, G, G]).
    """
    norm_img = preprocess_image(img)
    if backbone == "superpoint":
        from sixdgs_tpu.pose import superpoint as sp

        grid = PATCH_GRID_SP
        feats = sp.forward_features(dino_params, norm_img)["x_norm_patchtokens"]
    else:
        from sixdgs_tpu.pose import dino

        grid = PATCH_GRID
        feats = dino.forward_features(dino_params, norm_img)["x_norm_patchtokens"]
    patch_mask = preprocess_mask(mask, grid).reshape(-1)
    pe = image_position_encoding(grid).astype(feats.dtype)
    feats_pe = jnp.concatenate([feats, pe], axis=-1)  # [G*G, D+14]
    fmap = feats.reshape(grid, grid, feats.shape[-1]).transpose(2, 0, 1)
    return feats_pe, patch_mask, fmap
