"""Trainable pose modules: ray featurizer, cross-attention scorer, camera-up
head. Plain param-dict pytrees with torch-compatible initializers.

Parity references:
  * RayPreprocessor (/root/reference/pose_estimation/ray_preprocessor.py:11-46):
    PE(pos 8, view 8, rgb 6) -> 141-dim input; Linear 141->512->512, skip
    concat, 653->512->384; ReLU between.
  * MultiHeadAttention (/root/reference/pose_estimation/our_multihead_attention.py:45-79):
    single head, Q: 398->384 (img feat + 14 PE), K: 384->384, xavier-uniform
    weights / zero bias, scores = softmax(QK^T / sqrt(384)) over rays.
  * CameraDirectionPredictor (/root/reference/pose_estimation/camera_direction_network.py:7-90):
    3x conv5x5 valid (16->4) + 1x conv4x4 valid (4->1), 384ch, then MLP
    384->256->3.
"""

from __future__ import annotations

import math
from typing import Dict

import jax
import jax.numpy as jnp

RAY_PE = {"pospe": 8, "viewpe": 8, "rgbpe": 6}
RAY_IN_DIM = 9 + 2 * 3 * (RAY_PE["pospe"] + RAY_PE["viewpe"] + RAY_PE["rgbpe"])  # 141
RAY_HIDDEN = 512
FEATURE_DIM = 384
IMG_FEAT_DIM = FEATURE_DIM + 14


def _torch_linear_init(key, fan_in, fan_out):
    """torch.nn.Linear default: kaiming-uniform(a=sqrt5) == U(+-1/sqrt(fan_in))."""
    k1, k2 = jax.random.split(key)
    bound = 1.0 / math.sqrt(fan_in)
    return {
        "w": jax.random.uniform(k1, (fan_in, fan_out), minval=-bound, maxval=bound),
        "b": jax.random.uniform(k2, (fan_out,), minval=-bound, maxval=bound),
    }


def _xavier_linear_init(key, fan_in, fan_out):
    bound = math.sqrt(6.0 / (fan_in + fan_out))
    return {
        "w": jax.random.uniform(key, (fan_in, fan_out), minval=-bound, maxval=bound),
        "b": jnp.zeros(fan_out),
    }


def _torch_conv_init(key, kh, kw, cin, cout):
    k1, k2 = jax.random.split(key)
    fan_in = kh * kw * cin
    bound = 1.0 / math.sqrt(fan_in)
    return {
        "w": jax.random.uniform(k1, (cout, cin, kh, kw), minval=-bound, maxval=bound),
        "b": jax.random.uniform(k2, (cout,), minval=-bound, maxval=bound),
    }


def positional_encoding(x: jnp.ndarray, freqs: int) -> jnp.ndarray:
    """sin/cos PE (ray_preprocessor.py:3-9)."""
    bands = 2.0 ** jnp.arange(freqs, dtype=x.dtype)
    pts = (x[..., None] * bands).reshape(*x.shape[:-1], freqs * x.shape[-1])
    return jnp.concatenate([jnp.sin(pts), jnp.cos(pts)], axis=-1)


# ----------------------------------------------------------------- ray MLP


def init_ray_mlp(key, fea_output: int = FEATURE_DIM, featureC: int = RAY_HIDDEN):
    ks = jax.random.split(key, 4)
    return {
        "l1": _torch_linear_init(ks[0], RAY_IN_DIM, featureC),
        "l2": _torch_linear_init(ks[1], featureC, featureC),
        "l3": _torch_linear_init(ks[2], featureC + RAY_IN_DIM, featureC),
        "l4": _torch_linear_init(ks[3], featureC, fea_output),
    }


def ray_mlp_apply(params, ori, direction, rgb):
    """[N,3]x3 -> [N, 384] ray features."""
    indata = [ori, direction, rgb,
              positional_encoding(ori, RAY_PE["pospe"]),
              positional_encoding(direction, RAY_PE["viewpe"]),
              positional_encoding(rgb, RAY_PE["rgbpe"])]
    x = jnp.concatenate(indata, axis=-1)
    h = jax.nn.relu(x @ params["l1"]["w"] + params["l1"]["b"])
    h = jax.nn.relu(h @ params["l2"]["w"] + params["l2"]["b"])
    h = jnp.concatenate([h, x], axis=-1)
    h = jax.nn.relu(h @ params["l3"]["w"] + params["l3"]["b"])
    return h @ params["l4"]["w"] + params["l4"]["b"]


# --------------------------------------------------------------- attention


def init_attention(key, ray_fea: int = FEATURE_DIM, img_fea: int = IMG_FEAT_DIM,
                   embed: int = FEATURE_DIM):
    k1, k2 = jax.random.split(key)
    return {
        "q": _xavier_linear_init(k1, img_fea, embed),
        "k": _xavier_linear_init(k2, ray_fea, embed),
    }


def attention_scores(params, img_features, ray_features, ray_valid):
    """softmax(QK^T/sqrt(d)) over rays, padded rays masked to -9e15
    (our_multihead_attention.py:4-12 masked_fill parity).

    Returns the [n_patches, n_rays] attention map.
    """
    q = img_features @ params["q"]["w"] + params["q"]["b"]
    k = ray_features @ params["k"]["w"] + params["k"]["b"]
    d = q.shape[-1]
    logits = jnp.einsum("pd,nd->pn", q, k) / math.sqrt(d)
    logits = jnp.where(ray_valid[None, :], logits, -9e15)
    return jax.nn.softmax(logits, axis=-1)


# ------------------------------------------------------------ camera-up head


def init_cam_up(key, channels: int = FEATURE_DIM, fea_output: int = 3,
                featureC: int = 256, grid: int = 16):
    """Grid 16 (DINO) reduces 16->4->1 so the MLP sees [channels]; grid 28
    (SuperPoint) reduces 28->16->13 so it sees [channels * 13 * 13] — the
    reference head computes in_mlpC = prod(final conv size) * channels
    (camera_direction_network.py:31-36)."""
    ks = jax.random.split(key, 6)
    s = grid - 3 * 4 - 3  # three valid 5x5 convs then one valid 4x4
    assert s >= 1, grid
    return {
        "conv1": [_torch_conv_init(ks[i], 5, 5, channels, channels) for i in range(3)],
        "conv2": [_torch_conv_init(ks[3], 4, 4, channels, channels)],
        "mlp1": _torch_linear_init(ks[4], channels * s * s, featureC),
        "mlp2": _torch_linear_init(ks[5], featureC, fea_output),
    }


def _conv_valid(x, p):
    """x [C, H, W], weight [O, I, kh, kw], VALID padding."""
    out = jax.lax.conv_general_dilated(
        x[None], p["w"], (1, 1), "VALID", dimension_numbers=("NCHW", "OIHW", "NCHW")
    )[0]
    return out + p["b"][:, None, None]


def cam_up_apply(params, feature_map):
    """[C, G, G] -> [3] unnormalized up direction (residual spatial dims are
    flattened C-major like the reference's conv2_output.view(B, -1))."""
    x = feature_map
    for p in params["conv1"]:
        x = jax.nn.relu(_conv_valid(x, p))
    for p in params["conv2"]:
        x = jax.nn.relu(_conv_valid(x, p))
    x = x.reshape(-1)  # [C * s * s]
    h = jax.nn.relu(x @ params["mlp1"]["w"] + params["mlp1"]["b"])
    return h @ params["mlp2"]["w"] + params["mlp2"]["b"]


# --------------------------------------------------------------- id module


def init_id_module(key, feature_dim: int = FEATURE_DIM, grid: int = 16) -> Dict:
    """feature_dim: backbone token dim (384 for DINOv2-S, 256 for SuperPoint;
    smaller in tests). grid: backbone patch grid (16 DINO / 28 SuperPoint)."""
    k1, k2, k3 = jax.random.split(key, 3)
    return {
        "ray_mlp": init_ray_mlp(k1, fea_output=feature_dim),
        "attention": init_attention(
            k2, ray_fea=feature_dim, img_fea=feature_dim + 14, embed=feature_dim
        ),
        "cam_up": init_cam_up(k3, channels=feature_dim, grid=grid),
    }
