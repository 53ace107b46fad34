"""Exact k-nearest-neighbor kernels (TPU-native simple-knn replacement).

The reference uses a CUDA Morton-sort approximate 3-NN
(/root/reference/submodules/simple-knn/simple_knn.cu:45-221, exposed as
``distCUDA2``) to initialize Gaussian scales, and a chunked torch.cdist+topk
20-NN for normal estimation (/root/reference/pose_estimation/sampling.py:62-113).

On TPU, an exact tiled pairwise-distance sweep maps straight onto the MXU
(the distance matrix is one rank-3 update: |x|^2 + |y|^2 - 2 x.y^T), so the
Morton approximation is unnecessary. We stream query chunks with lax.map to
bound memory at chunk x N.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp


def _pad_to_multiple(x: jnp.ndarray, multiple: int, fill: float):
    n = x.shape[0]
    pad = (-n) % multiple
    if pad:
        x = jnp.concatenate(
            [x, jnp.full((pad,) + x.shape[1:], fill, dtype=x.dtype)], axis=0
        )
    return x, n


@functools.partial(jax.jit, static_argnames=("k", "chunk"))
def _knn_sq_dists(points: jnp.ndarray, k: int, chunk: int):
    """[N,3] -> (sq_dists [N,k], indices [N,k]) of the k nearest OTHER points."""
    pts, n = _pad_to_multiple(points.astype(jnp.float32), chunk, jnp.inf)
    n_pad = pts.shape[0]
    sq_norms = jnp.sum(jnp.square(points.astype(jnp.float32)), axis=-1)  # [N]

    def one_chunk(start):
        q = jax.lax.dynamic_slice_in_dim(pts, start, chunk, axis=0)  # [C,3]
        qn = jnp.sum(jnp.square(q), axis=-1)  # [C]
        # [C, N] squared distances via MXU matmul. HIGHEST precision: on TPU the
        # default matmul runs bf16 passes, not enough for exact NN ordering.
        d = qn[:, None] + sq_norms[None, :] - 2.0 * jnp.dot(
            q, points.T.astype(jnp.float32), precision=jax.lax.Precision.HIGHEST
        )
        d = jnp.maximum(d, 0.0)
        # mask self-distance: the query row index == column index
        row_ids = start + jax.lax.broadcasted_iota(jnp.int32, (chunk, 1), 0)
        col_ids = jax.lax.broadcasted_iota(jnp.int32, (1, points.shape[0]), 1)
        d = jnp.where(row_ids == col_ids, jnp.inf, d)
        neg_top, idx = jax.lax.top_k(-d, k)
        return -neg_top, idx

    starts = jnp.arange(0, n_pad, chunk)
    dists, idx = jax.lax.map(one_chunk, starts)
    return dists.reshape(-1, k)[:n], idx.reshape(-1, k)[:n]


def mean_sq_dist_3nn(points, chunk: int = 1024) -> jnp.ndarray:
    """Mean squared distance to the 3 nearest neighbors per point.

    Drop-in for ``simple_knn._C.distCUDA2`` (used at
    /root/reference/scene/gaussian_model.py:203-205 to initialize scales),
    but exact instead of Morton-box approximate.
    """
    points = jnp.asarray(points)
    dists, _ = _knn_sq_dists(points, k=3, chunk=chunk)
    return jnp.mean(dists, axis=-1)


def knn_indices(points, k: int = 20, chunk: int = 1024):
    """Indices of the k nearest neighbors (excluding self) per point.

    Used by normal estimation; note the reference *includes* the query point
    itself in its 20-NN (torch.topk over the raw cdist row,
    sampling.py:77-80) — callers that want that behavior should prepend the
    query index.
    """
    points = jnp.asarray(points)
    _, idx = _knn_sq_dists(points, k=k, chunk=chunk)
    return idx
