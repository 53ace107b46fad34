"""Camera-up output augmentations (mostly-off options).

Parity with /root/reference/pose_estimation/cam_augmentations.py:5-51; the
default path is NONE (identification_module.py:11,26-36). Note the reference's
NormalizationReverser registers the MEAN as both buffers (":14"
``self.register_buffer("std", mean)``) — we implement the intended behavior
(std as std) and document the upstream bug.
"""

from __future__ import annotations

import enum

import jax.numpy as jnp


class OutputAugmentationTypes(enum.Enum):
    NONE = 1
    NORMAL = 2
    REVERSE_POS_ENC = 3


def make_normalization_reverser(targets: jnp.ndarray):
    """x -> x * std + mean over the target distribution."""
    flat = targets.reshape(-1, targets.shape[-1])
    mean = jnp.mean(flat, axis=0)
    std = jnp.std(flat, axis=0)

    def apply(x):
        return x * std + mean

    return apply


def make_reverse_pos_enc(augmentation_channels: int = 10):
    """Inverse positional-encoding aggregation (cam_augmentations.py:37-47,
    "second version")."""
    freq_bands = 2.0 ** jnp.arange(augmentation_channels, dtype=jnp.float32)
    frac = 1.0 / augmentation_channels

    def apply(x):
        xv = x.reshape(*x.shape[:-1], -1, augmentation_channels + 1)
        return frac * jnp.sum(
            jnp.arcsin(jnp.clip(xv[..., 1:], -1.0, 1.0)) / freq_bands
            + xv[..., 0, None],
            axis=-1,
        )

    return apply
