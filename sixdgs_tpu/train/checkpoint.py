"""Full training-state checkpoints (optimizer included).

Counterpart of the reference's ``torch.save((gaussians.capture(), iteration))``
-> ``chkpnt<iter>.pth`` and ``restore()`` (/root/reference/train.py:44-46,
186-191; /root/reference/scene/gaussian_model.py:89-123). Stored as a single
.npz of flat arrays — portable, mmap-friendly, no pickle.
"""

from __future__ import annotations

import os
from typing import Tuple

import numpy as np
import jax.numpy as jnp

from sixdgs_tpu.scene.gaussians import GaussianScene, PARAM_NAMES
from sixdgs_tpu.train.optim import AdamState
from sixdgs_tpu.train.gs_trainer import GSTrainState


def save_train_state(path: str, state: GSTrainState, iteration: int,
                     active_sh_degree: int) -> None:
    flat = {
        "iteration": np.asarray(iteration),
        "active_sh_degree": np.asarray(active_sh_degree),
        "max_sh_degree": np.asarray(state.scene.max_sh_degree),
        "active": np.asarray(state.scene.active),
        "xyz_grad_accum": np.asarray(state.xyz_grad_accum),
        "denom": np.asarray(state.denom),
        "max_radii2d": np.asarray(state.max_radii2d),
        "adam_step": np.asarray(state.adam.step),
    }
    for name in PARAM_NAMES:
        flat[f"param:{name}"] = np.asarray(getattr(state.scene, name))
        flat[f"adam_m:{name}"] = np.asarray(state.adam.m[name])
        flat[f"adam_v:{name}"] = np.asarray(state.adam.v[name])
    os.makedirs(os.path.dirname(os.path.abspath(path)), exist_ok=True)
    np.savez(path, **flat)


def load_train_state(path: str) -> Tuple[GSTrainState, int, int]:
    """Returns (state, iteration, active_sh_degree)."""
    data = np.load(path)
    params = {name: jnp.asarray(data[f"param:{name}"]) for name in PARAM_NAMES}
    scene = GaussianScene(
        active=jnp.asarray(data["active"]),
        max_sh_degree=int(data["max_sh_degree"]),
        **params,
    )
    adam = AdamState(
        m={name: jnp.asarray(data[f"adam_m:{name}"]) for name in PARAM_NAMES},
        v={name: jnp.asarray(data[f"adam_v:{name}"]) for name in PARAM_NAMES},
        step=jnp.asarray(data["adam_step"]),
    )
    state = GSTrainState(
        scene=scene,
        adam=adam,
        xyz_grad_accum=jnp.asarray(data["xyz_grad_accum"]),
        denom=jnp.asarray(data["denom"]),
        max_radii2d=jnp.asarray(data["max_radii2d"]),
    )
    return state, int(data["iteration"]), int(data["active_sh_degree"])
