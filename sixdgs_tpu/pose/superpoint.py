"""SuperPoint descriptor backbone (alternative to DINOv2).

Parity with /root/reference/pose_estimation/superpoint.py:4-89: VGG-style
shared encoder + descriptor head, L2-normalized 256-dim descriptors at
stride 8; the first conv is widened to 3 input channels by weight expansion
(:58-63). Selected with backbone_type="superpoint" (28x28 grid at 224 input).

Weights come from a converted checkpoint (.npz via convert_torch_state_dict);
random init otherwise (no egress).
"""

from __future__ import annotations

from typing import Dict

import numpy as np
import jax
import jax.numpy as jnp

ENC = [(3, 64), (64, 64), (64, 64), (64, 64), (64, 128), (128, 128), (128, 128),
       (128, 128)]
NAMES = ["conv1a", "conv1b", "conv2a", "conv2b", "conv3a", "conv3b", "conv4a", "conv4b"]
FEATURE_DIM = 256


def init_params(key: jax.Array) -> Dict:
    ks = jax.random.split(key, len(NAMES) + 2)
    params = {}
    for k, name, (cin, cout) in zip(ks, NAMES, ENC):
        fan = cin * 9
        params[name] = {
            "w": jax.random.normal(k, (cout, cin, 3, 3)) / np.sqrt(fan),
            "b": jnp.zeros(cout),
        }
    params["convDa"] = {
        "w": jax.random.normal(ks[-2], (256, 128, 3, 3)) / np.sqrt(128 * 9),
        "b": jnp.zeros(256),
    }
    params["convDb"] = {
        "w": jax.random.normal(ks[-1], (256, 256, 1, 1)) / 16.0,
        "b": jnp.zeros(256),
    }
    return params


def _conv(x, p, padding=1):
    out = jax.lax.conv_general_dilated(
        x[None], p["w"], (1, 1), [(padding, padding)] * 2,
        dimension_numbers=("NCHW", "OIHW", "NCHW"),
    )[0]
    return out + p["b"][:, None, None]


def _pool(x):
    return jax.lax.reduce_window(x, -jnp.inf, jax.lax.max, (1, 2, 2), (1, 2, 2), "VALID")


def forward_features(params: Dict, img: jnp.ndarray) -> Dict[str, jnp.ndarray]:
    """img [3, H, W] -> {"x_norm_patchtokens": [H/8 * W/8, 256]}."""
    x = img
    x = jax.nn.relu(_conv(x, params["conv1a"]))
    x = jax.nn.relu(_conv(x, params["conv1b"]))
    x = _pool(x)
    x = jax.nn.relu(_conv(x, params["conv2a"]))
    x = jax.nn.relu(_conv(x, params["conv2b"]))
    x = _pool(x)
    x = jax.nn.relu(_conv(x, params["conv3a"]))
    x = jax.nn.relu(_conv(x, params["conv3b"]))
    x = _pool(x)
    x = jax.nn.relu(_conv(x, params["conv4a"]))
    x = jax.nn.relu(_conv(x, params["conv4b"]))
    cda = jax.nn.relu(_conv(x, params["convDa"]))
    desc = _conv(cda, params["convDb"], padding=0)
    desc = desc / jnp.linalg.norm(desc, axis=0, keepdims=True)
    c, h, w = desc.shape
    return {"x_norm_patchtokens": desc.transpose(1, 2, 0).reshape(h * w, c)}


def convert_torch_state_dict(state_dict) -> Dict:
    """Map a superpoint_v1.pth state dict; first conv expanded to 3 channels
    (reference increase_input_channels, superpoint.py:58-63)."""

    def arr(name):
        t = state_dict[name]
        return jnp.asarray(t.detach().cpu().numpy() if hasattr(t, "detach") else t)

    params = {}
    for name in NAMES + ["convDa", "convDb"]:
        w = arr(f"{name}.weight")
        if name == "conv1a" and w.shape[1] == 1:
            w = jnp.broadcast_to(w, (w.shape[0], 3, w.shape[2], w.shape[3]))
        params[name] = {"w": w, "b": arr(f"{name}.bias")}
    return params
