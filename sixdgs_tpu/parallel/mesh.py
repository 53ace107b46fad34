"""Device-mesh construction helpers."""

from __future__ import annotations

from typing import Optional, Sequence, Tuple

import numpy as np
import jax
from jax.sharding import Mesh


def _factor_2d(n: int) -> Tuple[int, int]:
    """Balanced two-axis factorization of n (prefers near-square)."""
    best = (1, n)
    for a in range(1, int(np.sqrt(n)) + 1):
        if n % a == 0:
            best = (a, n // a)
    return best


def make_mesh(
    n_devices: Optional[int] = None,
    axis_names: Sequence[str] = ("data", "rays"),
    shape: Optional[Tuple[int, ...]] = None,
    devices=None,
) -> Mesh:
    """Build a Mesh over available devices.

    Args:
        n_devices: use the first n devices (default: all).
        axis_names: mesh axis names; default ("data", "rays") for pose
            training (DP x SP).
        shape: explicit mesh shape; default balanced 2D factorization.
    """
    devs = list(devices if devices is not None else jax.devices())
    if n_devices is not None:
        devs = devs[:n_devices]
    n = len(devs)
    if shape is None:
        if len(axis_names) == 1:
            shape = (n,)
        elif len(axis_names) == 2:
            shape = _factor_2d(n)
        else:
            raise ValueError("provide shape for >2 axes")
    arr = np.asarray(devs).reshape(shape)
    return Mesh(arr, axis_names=tuple(axis_names))
