"""DINOv2 ViT-S/14 in pure JAX.

JAX reimplementation of the frozen image backbone the reference pulls from
torch.hub (/root/reference/pose_estimation/backbone.py:14-16): ViT-S/14,
embed 384, depth 12, heads 6, MLP ratio 4, LayerScale, pre-norm blocks;
output of interest is ``x_norm_patchtokens`` (final-LayerNorm'd patch tokens).

Parameters are a plain dict pytree. ``convert_torch_state_dict`` maps a
downloaded torch.hub checkpoint into it (this container has no egress, so
tests run with ``init_params`` random weights; numerics are cross-checked
against an independently-built torch ViT in tests/test_dino.py).

TPU notes: attention/MLP are plain jnp matmuls (MXU); the whole forward is one
jittable function, batched via vmap. bf16-friendly: pass dtype=jnp.bfloat16.
"""

from __future__ import annotations

import math
from typing import Dict

import numpy as np
import jax
import jax.numpy as jnp

EMBED_DIM = 384
DEPTH = 12
NUM_HEADS = 6
PATCH = 14
MLP_RATIO = 4
LS_INIT = 1e-5  # LayerScale init


def init_params(key: jax.Array, embed_dim: int = EMBED_DIM, depth: int = DEPTH,
                num_patches: int = 256) -> Dict:
    """Deterministic random init with the right shapes (trunc-normal-ish)."""
    keys = jax.random.split(key, depth * 8 + 4)
    k = iter(keys)

    def lin(key, fan_in, fan_out):
        w = jax.random.normal(key, (fan_in, fan_out)) * (1.0 / math.sqrt(fan_in))
        return {"w": w, "b": jnp.zeros(fan_out)}

    hidden = embed_dim * MLP_RATIO
    params = {
        "patch_embed": {
            "w": jax.random.normal(next(k), (PATCH, PATCH, 3, embed_dim)) * 0.02,
            "b": jnp.zeros(embed_dim),
        },
        "cls_token": jax.random.normal(next(k), (1, embed_dim)) * 0.02,
        "pos_embed": jax.random.normal(next(k), (1 + num_patches, embed_dim)) * 0.02,
        "norm": {"scale": jnp.ones(embed_dim), "bias": jnp.zeros(embed_dim)},
        "blocks": [],
    }
    for _ in range(depth):
        params["blocks"].append(
            {
                "norm1": {"scale": jnp.ones(embed_dim), "bias": jnp.zeros(embed_dim)},
                "qkv": lin(next(k), embed_dim, 3 * embed_dim),
                "proj": lin(next(k), embed_dim, embed_dim),
                "ls1": LS_INIT * jnp.ones(embed_dim),
                "norm2": {"scale": jnp.ones(embed_dim), "bias": jnp.zeros(embed_dim)},
                "fc1": lin(next(k), embed_dim, hidden),
                "fc2": lin(next(k), hidden, embed_dim),
                "ls2": LS_INIT * jnp.ones(embed_dim),
            }
        )
    return params


def _layer_norm(x, p, eps=1e-6):
    mu = jnp.mean(x, axis=-1, keepdims=True)
    var = jnp.var(x, axis=-1, keepdims=True)
    return (x - mu) * jax.lax.rsqrt(var + eps) * p["scale"] + p["bias"]


def _attention(x, blk, num_heads=None):
    n, d = x.shape
    # ViT-S/14: 6 heads of 64; tiny test variants keep head_dim 64
    num_heads = num_heads or max(1, d // 64)
    head = d // num_heads
    qkv = x @ blk["qkv"]["w"] + blk["qkv"]["b"]  # [N, 3D]
    qkv = qkv.reshape(n, 3, num_heads, head).transpose(1, 2, 0, 3)  # [3, H, N, h]
    q, k, v = qkv[0], qkv[1], qkv[2]
    logits = jnp.einsum("hnd,hmd->hnm", q, k) / math.sqrt(head)
    attn = jax.nn.softmax(logits, axis=-1)
    out = jnp.einsum("hnm,hmd->hnd", attn, v)
    out = out.transpose(1, 0, 2).reshape(n, d)
    return out @ blk["proj"]["w"] + blk["proj"]["b"]


def _mlp(x, blk):
    h = jax.nn.gelu(x @ blk["fc1"]["w"] + blk["fc1"]["b"], approximate=False)
    return h @ blk["fc2"]["w"] + blk["fc2"]["b"]


def forward_features(params: Dict, img: jnp.ndarray) -> Dict[str, jnp.ndarray]:
    """DINOv2 forward for one image.

    Args:
        params: pytree from init_params / convert_torch_state_dict.
        img: [3, H, W] normalized image; H, W divisible by 14.

    Returns:
        dict with "x_norm_patchtokens" [n_patches, 384] and
        "x_norm_clstoken" [384].
    """
    c, h, w = img.shape
    gh, gw = h // PATCH, w // PATCH
    embed_dim = params["patch_embed"]["w"].shape[-1]
    # patch embed as a reshape+matmul (equivalent to stride-14 conv, MXU-friendly)
    x = img.reshape(c, gh, PATCH, gw, PATCH).transpose(1, 3, 2, 4, 0)  # [gh,gw,14,14,3]
    x = x.reshape(gh * gw, PATCH * PATCH * c)
    w_flat = params["patch_embed"]["w"].reshape(-1, embed_dim)
    # our weight layout is [ph, pw, c, d]; image patch layout is [ph, pw, c]
    x = x @ w_flat + params["patch_embed"]["b"]

    x = jnp.concatenate([params["cls_token"], x], axis=0)  # [1+N, D]
    x = x + interpolate_pos_embed(params["pos_embed"], gh, gw)
    for blk in params["blocks"]:
        x = x + blk["ls1"] * _attention(_layer_norm(x, blk["norm1"]), blk)
        x = x + blk["ls2"] * _mlp(_layer_norm(x, blk["norm2"]), blk)
    x = _layer_norm(x, params["norm"])
    return {"x_norm_clstoken": x[0], "x_norm_patchtokens": x[1:]}


def interpolate_pos_embed(pos_embed: jnp.ndarray, gh: int, gw: int) -> jnp.ndarray:
    """Bicubic-resample patch position embeddings to a gh x gw grid (DINOv2
    interpolates its 37x37 training grid at other resolutions)."""
    n = pos_embed.shape[0] - 1
    side = int(round(math.sqrt(n)))
    if side * side != n:
        raise ValueError(f"pos_embed grid not square: {n}")
    if (gh, gw) == (side, side):
        return pos_embed
    cls_pe = pos_embed[:1]
    patch_pe = pos_embed[1:].reshape(side, side, -1)
    resized = jax.image.resize(patch_pe, (gh, gw, patch_pe.shape[-1]), "bicubic")
    return jnp.concatenate([cls_pe, resized.reshape(gh * gw, -1)], axis=0)


def convert_torch_state_dict(state_dict) -> Dict:
    """Map a torch.hub dinov2_vits14 state_dict to our param pytree."""

    def arr(name):
        return jnp.asarray(np.asarray(state_dict[name].detach().cpu().numpy()
                                      if hasattr(state_dict[name], "detach")
                                      else state_dict[name]))

    params = {
        "patch_embed": {
            # torch conv weight [D, 3, 14, 14] -> [14, 14, 3, D]
            "w": jnp.transpose(arr("patch_embed.proj.weight"), (2, 3, 1, 0)),
            "b": arr("patch_embed.proj.bias"),
        },
        "cls_token": arr("cls_token").reshape(1, -1),
        "pos_embed": arr("pos_embed").reshape(-1, EMBED_DIM),
        "norm": {"scale": arr("norm.weight"), "bias": arr("norm.bias")},
        "blocks": [],
    }
    i = 0
    while f"blocks.{i}.norm1.weight" in state_dict:
        pre = f"blocks.{i}."
        params["blocks"].append(
            {
                "norm1": {"scale": arr(pre + "norm1.weight"), "bias": arr(pre + "norm1.bias")},
                "qkv": {"w": arr(pre + "attn.qkv.weight").T, "b": arr(pre + "attn.qkv.bias")},
                "proj": {"w": arr(pre + "attn.proj.weight").T, "b": arr(pre + "attn.proj.bias")},
                "ls1": arr(pre + "ls1.gamma"),
                "norm2": {"scale": arr(pre + "norm2.weight"), "bias": arr(pre + "norm2.bias")},
                "fc1": {"w": arr(pre + "mlp.fc1.weight").T, "b": arr(pre + "mlp.fc1.bias")},
                "fc2": {"w": arr(pre + "mlp.fc2.weight").T, "b": arr(pre + "mlp.fc2.bias")},
                "ls2": arr(pre + "ls2.gamma"),
            }
        )
        i += 1
    return params


def load_params(path_or_none: str | None, key: jax.Array | None = None) -> Dict:
    """Load converted weights from .npz / torch checkpoint, or random-init."""
    if path_or_none is None:
        return init_params(key if key is not None else jax.random.key(0))
    if path_or_none.endswith(".npz"):
        flat = dict(np.load(path_or_none))
        return unflatten_params(flat)
    import torch

    sd = torch.load(path_or_none, map_location="cpu")
    if isinstance(sd, dict) and "model" in sd:
        sd = sd["model"]
    return convert_torch_state_dict(sd)


def flatten_params(params: Dict) -> Dict[str, np.ndarray]:
    flat = {}
    flat["patch_embed.w"] = np.asarray(params["patch_embed"]["w"])
    flat["patch_embed.b"] = np.asarray(params["patch_embed"]["b"])
    flat["cls_token"] = np.asarray(params["cls_token"])
    flat["pos_embed"] = np.asarray(params["pos_embed"])
    flat["norm.scale"] = np.asarray(params["norm"]["scale"])
    flat["norm.bias"] = np.asarray(params["norm"]["bias"])
    for i, blk in enumerate(params["blocks"]):
        for name, sub in blk.items():
            if isinstance(sub, dict):
                for leaf, val in sub.items():
                    flat[f"blocks.{i}.{name}.{leaf}"] = np.asarray(val)
            else:
                flat[f"blocks.{i}.{name}"] = np.asarray(sub)
    return flat


def unflatten_params(flat: Dict[str, np.ndarray]) -> Dict:
    params = {
        "patch_embed": {"w": jnp.asarray(flat["patch_embed.w"]),
                        "b": jnp.asarray(flat["patch_embed.b"])},
        "cls_token": jnp.asarray(flat["cls_token"]),
        "pos_embed": jnp.asarray(flat["pos_embed"]),
        "norm": {"scale": jnp.asarray(flat["norm.scale"]),
                 "bias": jnp.asarray(flat["norm.bias"])},
        "blocks": [],
    }
    i = 0
    while f"blocks.{i}.ls1" in flat:
        pre = f"blocks.{i}."
        blk = {}
        for name in ("norm1", "qkv", "proj", "norm2", "fc1", "fc2"):
            keys = ("scale", "bias") if name.startswith("norm") else ("w", "b")
            blk[name] = {leaf: jnp.asarray(flat[pre + f"{name}.{leaf}"]) for leaf in keys}
        blk["ls1"] = jnp.asarray(flat[pre + "ls1"])
        blk["ls2"] = jnp.asarray(flat[pre + "ls2"])
        params["blocks"].append(blk)
        i += 1
    return params
