"""Depth-sorted front-to-back alpha compositing (exact, differentiable).

Semantics parity with the CUDA renderCUDA loop (diff-gaussian-rasterization,
reconstructed from the call-site contract gaussian_renderer/__init__.py:85-100):

  per pixel, over Gaussians sorted by view depth:
    power = -0.5 (A dx^2 + C dy^2) - B dx dy            (conic = [A, B, C])
    skip if power > 0
    alpha = min(0.99, opacity * exp(power)); skip if alpha < 1/255
    test_T = T * (1 - alpha); if test_T < 1e-4: stop (this Gaussian does NOT
    contribute — matches CUDA's `done` check ordering)
    C += color * alpha * T;  T = test_T
  out = C + T * bg

TPU re-design: instead of a per-pixel dynamic loop, we lax.scan over
depth-ordered Gaussian chunks. Within a chunk the sequential dependence is
expressed with cumulative products along the chunk axis (log-transmittance
cumsum), and the early-stop rule becomes a cummax mask — everything stays a
dense [chunk, H, W] VPU computation, differentiable by autodiff. jax.remat on
the scan body keeps backward memory at one chunk.

This is the golden model AND the default training path for small/medium
images; the tile-binned Pallas path (tiles.py) accelerates large renders.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from sixdgs_tpu.ops.rasterizer.projection import ProjectedGaussians

ALPHA_MIN = 1.0 / 255.0
ALPHA_MAX = 0.99
T_EPS = 1e-4


def _chunk_alphas(means2d, conics, opac, px, py):
    """Per-pixel alpha of a chunk of Gaussians: [K, H, W]."""
    dx = px[None] - means2d[:, 0][:, None, None]  # [K, H, W]
    dy = py[None] - means2d[:, 1][:, None, None]
    A = conics[:, 0][:, None, None]
    B = conics[:, 1][:, None, None]
    C = conics[:, 2][:, None, None]
    power = -0.5 * (A * dx * dx + C * dy * dy) - B * dx * dy
    alpha = jnp.minimum(ALPHA_MAX, opac[:, None, None] * jnp.exp(power))
    alpha = jnp.where(power > 0.0, 0.0, alpha)
    alpha = jnp.where(alpha < ALPHA_MIN, 0.0, alpha)
    return alpha


def rasterize_scan(
    proj: ProjectedGaussians,
    width: int,
    height: int,
    bg_color: jnp.ndarray,
    chunk: int = 256,
) -> jnp.ndarray:
    """Rasterize projected Gaussians to an image [3, H, W].

    Gaussians are depth-sorted internally; culled entries (radii == 0 or
    opacity 0) are no-ops. ``chunk`` bounds peak memory at [chunk, H, W].
    """
    P = proj.means2d.shape[0]
    pad = (-P) % chunk
    order = jnp.argsort(jnp.where(proj.radii > 0, proj.depths, jnp.inf))

    means2d = proj.means2d[order]
    conics = proj.conics[order]
    colors = proj.colors[order]
    opac = jnp.where(proj.radii[order] > 0, proj.opacities[order], 0.0)

    if pad:
        means2d = jnp.concatenate([means2d, jnp.zeros((pad, 2), means2d.dtype)])
        conics = jnp.concatenate([conics, jnp.zeros((pad, 3), conics.dtype)])
        colors = jnp.concatenate([colors, jnp.zeros((pad, 3), colors.dtype)])
        opac = jnp.concatenate([opac, jnp.zeros((pad,), opac.dtype)])

    n_chunks = (P + pad) // chunk
    means2d = means2d.reshape(n_chunks, chunk, 2)
    conics = conics.reshape(n_chunks, chunk, 3)
    colors = colors.reshape(n_chunks, chunk, 3)
    opac = opac.reshape(n_chunks, chunk)

    px = jnp.arange(width, dtype=means2d.dtype)[None, :].repeat(height, 0)
    py = jnp.arange(height, dtype=means2d.dtype)[:, None].repeat(width, 1)

    @functools.partial(jax.remat, policy=jax.checkpoint_policies.nothing_saveable)
    def body(carry, inputs):
        T, C, done = carry  # T: [H, W], C: [3, H, W], done: [H, W] bool
        m2d, con, col, op = inputs
        alpha = _chunk_alphas(m2d, con, op, px, py)  # [K, H, W]
        one_minus = 1.0 - alpha
        # transmittance BEFORE each gaussian in this chunk
        cum = jnp.cumprod(one_minus, axis=0)
        T_before = T[None] * jnp.concatenate(
            [jnp.ones_like(cum[:1]), cum[:-1]], axis=0
        )
        # early-stop: gaussian k is dead if any earlier (or this) gaussian
        # drove test_T = T*(1-alpha) below eps; CUDA marks the pixel done
        # permanently, so the flag is carried across chunks.
        test_T = T_before * one_minus
        dead = (
            jnp.cumsum((test_T < T_EPS).astype(jnp.int32), axis=0) > 0
        ) | done[None]
        w = jnp.where(dead, 0.0, alpha * T_before)  # [K, H, W]
        C = C + jnp.einsum("kc,khw->chw", col, w,
                           precision=jax.lax.Precision.HIGHEST)
        # transmittance only advances through live gaussians
        T_new = T * jnp.prod(jnp.where(dead, 1.0, one_minus), axis=0)
        return (T_new, C, dead[-1]), None

    T0 = jnp.ones((height, width), means2d.dtype)
    C0 = jnp.zeros((3, height, width), means2d.dtype)
    done0 = jnp.zeros((height, width), bool)
    (T, C, _), _ = jax.lax.scan(body, (T0, C0, done0), (means2d, conics, colors, opac))
    return C + T[None] * bg_color[:, None, None]


def rasterize_brute(proj: ProjectedGaussians, width: int, height: int,
                    bg_color: jnp.ndarray) -> jnp.ndarray:
    """Tiny-scene reference: single-chunk (exact) compositing, O(P*H*W) memory.
    Used as the golden model in tests."""
    return rasterize_scan(proj, width, height, bg_color, chunk=proj.means2d.shape[0])
