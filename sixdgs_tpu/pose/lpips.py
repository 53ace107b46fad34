"""LPIPS perceptual metric in JAX.

Counterpart of /root/reference/lpipsPyTorch/ (modules/lpips.py:8-36,
modules/networks.py): frozen VGG16 (or AlexNet) feature stages, per-channel
unit normalization, squared differences weighted by the LPIPS 1x1 linear
layers, spatial mean, sum over stages. Input images in [0, 1] are shifted by
the ImageNet scaling layer like the reference.

This container has no egress, so pretrained torchvision + LPIPS-linear
weights must be provided as a converted .npz (``convert_torch_lpips``
produces it from downloaded checkpoints). Without weights the metric is
architecturally correct but uncalibrated — callers treat LPIPS as
unavailable (metrics report null, matching apps/metrics.py).
"""

from __future__ import annotations

from typing import Dict, List

import numpy as np
import jax
import jax.numpy as jnp

# reference ScalingLayer constants (lpips)
_SHIFT = np.array([-0.030, -0.088, -0.188], np.float32)
_SCALE = np.array([0.458, 0.448, 0.450], np.float32)

VGG16_CFG: List = [64, 64, "M", 128, 128, "M", 256, 256, 256, "M",
                   512, 512, 512, "M", 512, 512, 512, "M"]
# indices (in conv order) after which features are tapped: relu1_2, relu2_2,
# relu3_3, relu4_3, relu5_3
VGG_TAPS = (1, 3, 6, 9, 12)
VGG_CHANNELS = (64, 128, 256, 512, 512)

ALEX_CHANNELS = (64, 192, 384, 256, 256)


def _conv(x, w, b, stride=1, padding=1):
    out = jax.lax.conv_general_dilated(
        x[None], w, (stride, stride),
        [(padding, padding), (padding, padding)],
        dimension_numbers=("NCHW", "OIHW", "NCHW"),
        precision=jax.lax.Precision.HIGHEST,  # metric fidelity on TPU
    )[0]
    return out + b[:, None, None]


def _maxpool(x, k=2, s=2):
    return jax.lax.reduce_window(
        x, -jnp.inf, jax.lax.max, (1, k, k), (1, s, s), "VALID"
    )


def vgg16_features(params: Dict, x: jnp.ndarray) -> List[jnp.ndarray]:
    """x: [3, H, W] -> list of tapped feature maps."""
    feats = []
    conv_i = 0
    for item in VGG16_CFG:
        if item == "M":
            x = _maxpool(x)
        else:
            x = jax.nn.relu(_conv(x, params[f"conv{conv_i}.w"], params[f"conv{conv_i}.b"]))
            if conv_i in VGG_TAPS:
                feats.append(x)
            conv_i += 1
    return feats


def alexnet_features(params: Dict, x: jnp.ndarray) -> List[jnp.ndarray]:
    feats = []
    x = jax.nn.relu(_conv(x, params["conv0.w"], params["conv0.b"], stride=4, padding=2))
    feats.append(x)
    x = _maxpool(x, 3, 2)
    x = jax.nn.relu(_conv(x, params["conv1.w"], params["conv1.b"], padding=2))
    feats.append(x)
    x = _maxpool(x, 3, 2)
    x = jax.nn.relu(_conv(x, params["conv2.w"], params["conv2.b"]))
    feats.append(x)
    x = jax.nn.relu(_conv(x, params["conv3.w"], params["conv3.b"]))
    feats.append(x)
    x = jax.nn.relu(_conv(x, params["conv4.w"], params["conv4.b"]))
    feats.append(x)
    return feats


def _normalize_channels(f, eps=1e-10):
    norm = jnp.sqrt(jnp.sum(jnp.square(f), axis=0, keepdims=True))
    return f / (norm + eps)


def lpips_distance(params: Dict, img1: jnp.ndarray, img2: jnp.ndarray,
                   net: str = "vgg") -> jnp.ndarray:
    """LPIPS between two [3, H, W] images in [0, 1]."""
    shift = jnp.asarray(_SHIFT)[:, None, None]
    scale = jnp.asarray(_SCALE)[:, None, None]
    # Reference quirk replicated: lpipsPyTorch z-scores the input DIRECTLY
    # (BaseNet.z_score, /root/reference/lpipsPyTorch/modules/networks.py:50-51)
    # with shift/scale constants designed for [-1,1], but metrics.py feeds it
    # [0,1] images with no 2x-1 rescale (/root/reference/metrics.py:76).
    def prep(x):
        return (x - shift) / scale

    feat_fn = vgg16_features if net == "vgg" else alexnet_features
    f1 = feat_fn(params, prep(img1))
    f2 = feat_fn(params, prep(img2))
    total = 0.0
    for i, (a, b) in enumerate(zip(f1, f2)):
        d = jnp.square(_normalize_channels(a) - _normalize_channels(b))  # [C,H,W]
        w = params[f"lin{i}.w"]  # [C]
        total = total + jnp.mean(jnp.sum(d * w[:, None, None], axis=0))
    return total


def init_params(key: jax.Array, net: str = "vgg") -> Dict:
    """Random (uncalibrated) weights with correct shapes."""
    params = {}
    ks = jax.random.split(key, 32)
    ki = 0
    if net == "vgg":
        cin = 3
        conv_i = 0
        for item in VGG16_CFG:
            if item == "M":
                continue
            params[f"conv{conv_i}.w"] = jax.random.normal(
                ks[ki % 32], (item, cin, 3, 3)) * (1.0 / np.sqrt(cin * 9))
            params[f"conv{conv_i}.b"] = jnp.zeros(item)
            cin = item
            conv_i += 1
            ki += 1
        channels = VGG_CHANNELS
    else:
        shapes = [(64, 3, 11, 11), (192, 64, 5, 5), (384, 192, 3, 3),
                  (256, 384, 3, 3), (256, 256, 3, 3)]
        for i, s in enumerate(shapes):
            fan = s[1] * s[2] * s[3]
            params[f"conv{i}.w"] = jax.random.normal(ks[ki % 32], s) / np.sqrt(fan)
            params[f"conv{i}.b"] = jnp.zeros(s[0])
            ki += 1
        channels = ALEX_CHANNELS
    for i, c in enumerate(channels):
        params[f"lin{i}.w"] = jnp.ones(c) / c
    return params


def convert_torch_lpips(vgg_state_dict, lin_state_dict, net: str = "vgg") -> Dict:
    """Convert torchvision VGG16/AlexNet conv weights + LPIPS linear weights.

    Accepts either the bare ``.features`` sub-dict (keys ``N.weight``) or a
    FULL torchvision checkpoint (keys ``features.N.weight`` +
    ``classifier.*`` — the classifier is ignored; only 4-dim conv weights in
    layer order are taken). ``lin_state_dict`` uses the richzhang naming
    ``lin{i}.model.1.weight`` (/root/reference/lpipsPyTorch/modules/utils.py
    downloads that file; its renamed in-memory form ``{i}.1.weight`` is also
    accepted)."""

    def arr(t):
        return jnp.asarray(t.detach().cpu().numpy() if hasattr(t, "detach") else t)

    def layer_index(key: str) -> int:
        for part in key.split("."):
            if part.isdigit():
                return int(part)
        raise ValueError(f"no layer index in key {key!r}")

    conv_keys = [
        k for k in vgg_state_dict
        if k.endswith("weight") and arr(vgg_state_dict[k]).ndim == 4
        and (k.startswith("features.") or "." not in k.rsplit(".weight", 1)[0])
    ]
    params = {}
    for conv_i, k in enumerate(sorted(conv_keys, key=layer_index)):
        params[f"conv{conv_i}.w"] = arr(vgg_state_dict[k])
        params[f"conv{conv_i}.b"] = arr(vgg_state_dict[k.replace("weight", "bias")])
    for i in range(5):
        for name in (f"lin{i}.model.1.weight", f"lins.{i}.model.1.weight",
                     f"{i}.1.weight"):
            if name in lin_state_dict:
                params[f"lin{i}.w"] = arr(lin_state_dict[name]).reshape(-1)
                break
        else:
            raise KeyError(f"LPIPS linear weight for stage {i} not found")
    return params


def save_params(path: str, params: Dict) -> None:
    np.savez(path, **{k: np.asarray(v) for k, v in params.items()})


def load_params(path: str) -> Dict:
    return {k: jnp.asarray(v) for k, v in np.load(path).items()}


def make_lpips(weights_path: str, net: str = "vgg"):
    """Callable lpips(img1, img2) from converted weights."""
    params = load_params(weights_path)
    return jax.jit(lambda a, b: lpips_distance(params, a, b, net=net))
