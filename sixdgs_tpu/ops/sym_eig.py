"""Closed-form batched eigendecomposition of symmetric 3x3 matrices.

TPU-native replacement for the reference's PyTorch3D-derived solver
(/root/reference/pose_estimation/sym_eig_3x3.py:246-307): the reference needs
a branch-free closed form because torch.linalg.eigh is slow per-batch on GPU;
the same holds for XLA on TPU, where a trigonometric closed form stays fully
vectorized on the VPU.

Algorithm: the standard analytic method (see e.g. Smith 1961, "Eigenvalues of
a symmetric 3x3 matrix"): deflate the trace, compute eigenvalues from the
characteristic polynomial via the trigonometric form of Cardano, then recover
eigenvectors from cross products of the rows of (A - lam I), picking the most
numerically stable pair. Degenerate (repeated-eigenvalue / diagonal) cases are
handled branch-free with jnp.where fallbacks to an orthonormal completion.

Returns eigenvalues ascending and eigenvectors as COLUMNS, matching both
jnp.linalg.eigh and the reference's output convention.
"""

from __future__ import annotations

import jax.numpy as jnp

_EPS = 1e-12


def _orthonormal_complement(v: jnp.ndarray) -> jnp.ndarray:
    """A unit vector orthogonal to v[..., 3], branch-free."""
    # Choose helper axis that is least aligned with v.
    ax = jnp.zeros_like(v).at[..., 0].set(1.0)
    az = jnp.zeros_like(v).at[..., 2].set(1.0)
    helper = jnp.where((jnp.abs(v[..., 0]) > 0.9)[..., None], az, ax)
    w = jnp.cross(v, helper)
    return w / jnp.maximum(jnp.linalg.norm(w, axis=-1, keepdims=True), _EPS)


def _eigvec_for(A: jnp.ndarray, lam: jnp.ndarray) -> jnp.ndarray:
    """Eigenvector of A [..., 3, 3] for eigenvalue lam [...] via the
    cross-product of the two most independent rows of (A - lam I)."""
    B = A - lam[..., None, None] * jnp.eye(3, dtype=A.dtype)
    r0, r1, r2 = B[..., 0, :], B[..., 1, :], B[..., 2, :]
    c01 = jnp.cross(r0, r1)
    c02 = jnp.cross(r0, r2)
    c12 = jnp.cross(r1, r2)
    n01 = jnp.sum(c01 * c01, axis=-1)
    n02 = jnp.sum(c02 * c02, axis=-1)
    n12 = jnp.sum(c12 * c12, axis=-1)
    # pick the cross product with the largest norm
    best = jnp.where(
        (n01 >= n02)[..., None] & (n01 >= n12)[..., None],
        c01,
        jnp.where((n02 >= n12)[..., None], c02, c12),
    )
    nbest = jnp.maximum(n01, jnp.maximum(n02, n12))
    # Degenerate: (A - lam I) has rank <= 1 -> every row pair is parallel.
    # Fall back to any unit vector orthogonal to the largest row.
    rn0 = jnp.sum(r0 * r0, axis=-1)
    rn1 = jnp.sum(r1 * r1, axis=-1)
    rn2 = jnp.sum(r2 * r2, axis=-1)
    biggest_row = jnp.where(
        (rn0 >= rn1)[..., None] & (rn0 >= rn2)[..., None],
        r0,
        jnp.where((rn1 >= rn2)[..., None], r1, r2),
    )
    rn_max = jnp.maximum(rn0, jnp.maximum(rn1, rn2))
    safe_row = jnp.where(
        (rn_max > _EPS)[..., None],
        biggest_row / jnp.sqrt(jnp.maximum(rn_max, _EPS))[..., None],
        jnp.zeros_like(biggest_row).at[..., 2].set(1.0),
    )
    fallback = _orthonormal_complement(safe_row)
    v = jnp.where((nbest > _EPS)[..., None], best, fallback)
    return v / jnp.maximum(jnp.linalg.norm(v, axis=-1, keepdims=True), _EPS)


def sym_eig_3x3(A: jnp.ndarray, eigenvectors: bool = True):
    """Batched symmetric 3x3 eigendecomposition.

    Args:
        A: [..., 3, 3] symmetric matrices.
        eigenvectors: also compute eigenvectors.

    Returns:
        (eigvals [..., 3] ascending, eigvecs [..., 3, 3] with eigvecs[..., :, i]
        the i-th eigenvector) or just eigvals.
    """
    A = 0.5 * (A + jnp.swapaxes(A, -1, -2))
    q = jnp.trace(A, axis1=-2, axis2=-1) / 3.0
    B = A - q[..., None, None] * jnp.eye(3, dtype=A.dtype)
    p2 = jnp.sum(B * B, axis=(-2, -1)) / 6.0
    p = jnp.sqrt(jnp.maximum(p2, _EPS * _EPS))
    detB = jnp.linalg.det(B)
    r = detB / (2.0 * p**3)
    r = jnp.clip(r, -1.0, 1.0)
    phi = jnp.arccos(r) / 3.0
    # eigenvalues in ascending order
    lam2 = q + 2.0 * p * jnp.cos(phi)  # largest
    lam0 = q + 2.0 * p * jnp.cos(phi + 2.0 * jnp.pi / 3.0)  # smallest
    lam1 = 3.0 * q - lam0 - lam2
    # Near-isotropic matrices: p ~ 0 -> all eigenvalues = q.
    iso = p2 <= (_EPS * jnp.maximum(q * q, 1.0))
    lam0 = jnp.where(iso, q, lam0)
    lam1 = jnp.where(iso, q, lam1)
    lam2 = jnp.where(iso, q, lam2)
    eigvals = jnp.stack([lam0, lam1, lam2], axis=-1)

    if not eigenvectors:
        return eigvals

    v0 = _eigvec_for(A, lam0)
    v2 = _eigvec_for(A, lam2)
    # Enforce orthogonality: v2 <- v2 - (v2.v0) v0, then v1 = v2 x v0.
    v2 = v2 - jnp.sum(v2 * v0, axis=-1, keepdims=True) * v0
    v2n = jnp.linalg.norm(v2, axis=-1, keepdims=True)
    v2 = jnp.where(v2n > _EPS, v2 / jnp.maximum(v2n, _EPS), _orthonormal_complement(v0))
    v1 = jnp.cross(v2, v0)
    # Isotropic fallback: identity basis.
    eye = jnp.broadcast_to(jnp.eye(3, dtype=A.dtype), A.shape)
    vecs = jnp.stack([v0, v1, v2], axis=-1)  # columns
    vecs = jnp.where(iso[..., None, None], eye, vecs)
    return eigvals, vecs
