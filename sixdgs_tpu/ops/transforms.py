"""Quaternion / covariance builders for Gaussian ellipsoids.

Behavior parity with /root/reference/utils/general_utils.py:103-172 and
/root/reference/scene/gaussian_model.py:30-43, written as batched jnp
expressions (no in-place scatter writes; everything is a fused stack).
"""

from __future__ import annotations

import jax.numpy as jnp


def inverse_sigmoid(x: jnp.ndarray) -> jnp.ndarray:
    return jnp.log(x / (1.0 - x))


def quat_to_rotmat(q: jnp.ndarray) -> jnp.ndarray:
    """Unnormalized quaternion [..., 4] (w, x, y, z) -> rotation matrix [..., 3, 3].

    Matches reference ``build_rotation`` (general_utils.py:103-126), including
    the normalization of the input quaternion.
    """
    norm = jnp.sqrt(jnp.sum(q * q, axis=-1, keepdims=True))
    # guard: a zero/collapsed quaternion (e.g. a diverged padded gaussian)
    # must not poison the batch with NaNs
    q = q / jnp.maximum(norm, 1e-12)
    r, x, y, z = q[..., 0], q[..., 1], q[..., 2], q[..., 3]
    row0 = jnp.stack(
        [1 - 2 * (y * y + z * z), 2 * (x * y - r * z), 2 * (x * z + r * y)], axis=-1
    )
    row1 = jnp.stack(
        [2 * (x * y + r * z), 1 - 2 * (x * x + z * z), 2 * (y * z - r * x)], axis=-1
    )
    row2 = jnp.stack(
        [2 * (x * z - r * y), 2 * (y * z + r * x), 1 - 2 * (x * x + y * y)], axis=-1
    )
    return jnp.stack([row0, row1, row2], axis=-2)


def build_scaling_rotation(s: jnp.ndarray, q: jnp.ndarray) -> jnp.ndarray:
    """L = R @ diag(s): [..., 3, 3] (general_utils.py:151-160)."""
    R = quat_to_rotmat(q)
    return R * s[..., None, :]


def build_covariance(
    scaling: jnp.ndarray, q: jnp.ndarray, scaling_modifier: float | jnp.ndarray = 1.0
) -> jnp.ndarray:
    """Full 3x3 covariance Sigma = L L^T (gaussian_model.py:37-39)."""
    L = build_scaling_rotation(scaling_modifier * scaling, q)
    return L @ jnp.swapaxes(L, -1, -2)


def strip_symmetric(sym: jnp.ndarray) -> jnp.ndarray:
    """Upper-triangular 6-vector (xx, xy, xz, yy, yz, zz) of a symmetric 3x3
    (general_utils.py:74-87)."""
    return jnp.stack(
        [
            sym[..., 0, 0],
            sym[..., 0, 1],
            sym[..., 0, 2],
            sym[..., 1, 1],
            sym[..., 1, 2],
            sym[..., 2, 2],
        ],
        axis=-1,
    )


def quat_rotmat_planes(q: jnp.ndarray):
    """Rotation-matrix entries as nine [...] scalar planes.

    TPU layout note: the stacked [..., 3, 3] form of ``quat_to_rotmat`` puts
    a 3-wide axis in the minor (lane) dimension, so every downstream
    elementwise op runs at 3/128 lane utilization. Keeping each entry as its
    own [...]-shaped plane lets XLA iterate the full [P] space with full
    lanes. Same math, same normalization guard."""
    norm = jnp.sqrt(jnp.sum(q * q, axis=-1, keepdims=True))
    q = q / jnp.maximum(norm, 1e-12)
    r, x, y, z = q[..., 0], q[..., 1], q[..., 2], q[..., 3]
    return (
        (1 - 2 * (y * y + z * z), 2 * (x * y - r * z), 2 * (x * z + r * y)),
        (2 * (x * y + r * z), 1 - 2 * (x * x + z * z), 2 * (y * z - r * x)),
        (2 * (x * z - r * y), 2 * (y * z + r * x), 1 - 2 * (x * x + y * y)),
    )


def covariance_planes(
    scaling: jnp.ndarray, q: jnp.ndarray, scaling_modifier: float | jnp.ndarray = 1.0
):
    """Sigma = L L^T with L = R diag(s), as six [...] planes
    (xx, xy, xz, yy, yz, zz) — the plane-major form of ``build_covariance``
    (gaussian_model.py:37-39) used by the projection hot path."""
    R = quat_rotmat_planes(q)
    s = scaling_modifier * scaling
    s0, s1, s2 = s[..., 0], s[..., 1], s[..., 2]
    L = tuple(tuple(R[i][j] * (s0, s1, s2)[j] for j in range(3)) for i in range(3))

    def sig(i, j):
        return L[i][0] * L[j][0] + L[i][1] * L[j][1] + L[i][2] * L[j][2]

    return sig(0, 0), sig(0, 1), sig(0, 2), sig(1, 1), sig(1, 2), sig(2, 2)


def build_covariance_6(
    scaling: jnp.ndarray, q: jnp.ndarray, scaling_modifier: float | jnp.ndarray = 1.0
) -> jnp.ndarray:
    """Covariance as 6-vector, the rasterizer's packed form
    (gaussian_model.py:30-34)."""
    return jnp.stack(covariance_planes(scaling, q, scaling_modifier), axis=-1)


def unpack_covariance_6(cov6: jnp.ndarray) -> jnp.ndarray:
    """Inverse of strip_symmetric: 6-vector -> symmetric 3x3."""
    xx, xy, xz, yy, yz, zz = (cov6[..., i] for i in range(6))
    row0 = jnp.stack([xx, xy, xz], axis=-1)
    row1 = jnp.stack([xy, yy, yz], axis=-1)
    row2 = jnp.stack([xz, yz, zz], axis=-1)
    return jnp.stack([row0, row1, row2], axis=-2)


def build_a_mat(
    s: jnp.ndarray, q: jnp.ndarray, scaling_modifier: float | jnp.ndarray = 1.0
) -> jnp.ndarray:
    """A = R diag(1/s) R^T, the ellipsoid "A-matrix" (general_utils.py:163-172,
    gaussian_model.py:42-43)."""
    R = quat_to_rotmat(q)
    inv_s = 1.0 / (scaling_modifier * s)
    return (R * inv_s[..., None, :]) @ jnp.swapaxes(R, -1, -2)
