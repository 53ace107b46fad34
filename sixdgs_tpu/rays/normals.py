"""Point-cloud normal estimation via local PCA.

Behavior parity with /root/reference/pose_estimation/sampling.py:28-113:
20-NN (including the query point itself, as torch.topk over the raw cdist row
does), neighborhood covariance, smallest-eigenvector normal, and the
Tombari-style sign disambiguation (:37-59).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from sixdgs_tpu.ops.sym_eig import sym_eig_3x3


def disambiguate_vector_directions(df: jnp.ndarray, vecs: jnp.ndarray) -> jnp.ndarray:
    """Flip vecs to agree with the majority of neighborhood offsets
    (sampling.py:37-59). df: [N, K, 3]; vecs: [N, 3]."""
    K = df.shape[-2]
    proj = jnp.sum(vecs[:, None, :] * df, axis=-1)  # [N, K]
    n_pos = jnp.sum((proj > 0).astype(df.dtype), axis=-1, keepdims=True)
    flip = (n_pos < 0.5 * K).astype(df.dtype)
    return (1.0 - 2.0 * flip) * vecs


def estimate_normals(points: jnp.ndarray, k_neighbors: int = 20,
                     valid: jnp.ndarray | None = None) -> jnp.ndarray:
    """Normals for each point of a (possibly padded) point set.

    Args:
        points: [N, 3].
        k_neighbors: neighborhood size, including the point itself.
        valid: optional [N] bool; invalid points are pushed to infinity so they
            are never neighbors of valid ones.

    Returns:
        [N, 3] unit normals.
    """
    n = points.shape[0]
    pts = points
    if valid is not None:
        pts = jnp.where(valid[:, None], points, 1e12)
    d = (
        jnp.sum(jnp.square(pts), axis=-1)[:, None]
        + jnp.sum(jnp.square(pts), axis=-1)[None, :]
        - 2.0 * jnp.dot(pts, pts.T, precision=jax.lax.Precision.HIGHEST)
    )
    _, idx = jax.lax.top_k(-d, k_neighbors)  # includes self (distance 0)
    neigh = pts[idx]  # [N, K, 3]
    mean = jnp.mean(neigh, axis=-2, keepdims=True)
    centered = neigh - mean
    cov = jnp.einsum(
        "nki,nkj->nij", centered, centered, precision=jax.lax.Precision.HIGHEST
    )
    _, vecs = sym_eig_3x3(cov)
    normal = disambiguate_vector_directions(centered, vecs[:, :, 0])
    return normal / jnp.maximum(jnp.linalg.norm(normal, axis=-1, keepdims=True), 1e-12)
