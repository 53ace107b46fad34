"""Fused patches x rays attention-score Pallas kernel (SURVEY §5.7).

Computes, in one kernel, what the reference materializes as a full
[N_patches, N_rays] attention matrix (our_multihead_attention.py:4-12 +
identification_module.py:82):

    K        = ray_feats @ Wk + bk                  (k-projection)
    logits   = Q K^T / sqrt(d), padded rays -> -9e15
    score_j  = sum_{p in patch_mask} softmax_row_p(logits)_j

Two streaming passes over ray blocks with online max/sum-exp stats kept in
VMEM scratch (flash-attention style, but the reduction axis is the ray axis
and the output is per-ray column sums): pass 0 accumulates per-patch
(max, sum-exp), pass 1 re-computes each logits block on the MXU and emits the
masked column sums. HBM traffic is ray_feats twice + O(N) outputs — the
[256 x N] logits never hit HBM.

Used on the inference path (pose eval / bench); training uses the jnp
formulation (same math) for autodiff.
"""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG = -9e15


def _kernel(q_ref, feats_ref, wk_ref, bk_ref, pmask_ref, valid_ref, out_ref,
            m_scr, s_scr):
    p = pl.program_id(0)
    b = pl.program_id(1)

    @pl.when((p == 0) & (b == 0))
    def _():
        m_scr[:] = jnp.full_like(m_scr, -jnp.inf)
        s_scr[:] = jnp.zeros_like(s_scr)

    k = (
        jnp.dot(feats_ref[:], wk_ref[:], preferred_element_type=jnp.float32)
        + bk_ref[:]
    )  # [B, d]
    d = q_ref.shape[-1]
    logits = jnp.dot(q_ref[:], k.T, preferred_element_type=jnp.float32) / math.sqrt(d)
    logits = jnp.where(valid_ref[:] > 0.0, logits, NEG)  # [P, B]

    @pl.when(p == 0)
    def _():
        m_old = m_scr[:]  # [P, 1]
        m_blk = jnp.max(logits, axis=1, keepdims=True)
        m_new = jnp.maximum(m_old, m_blk)
        s_scr[:] = s_scr[:] * jnp.exp(m_old - m_new) + jnp.sum(
            jnp.exp(logits - m_new), axis=1, keepdims=True
        )
        m_scr[:] = m_new
        out_ref[:] = jnp.zeros_like(out_ref)

    @pl.when(p == 1)
    def _():
        probs = jnp.exp(logits - m_scr[:]) / s_scr[:]  # [P, B]
        out_ref[:] = jnp.sum(probs * pmask_ref[:], axis=0, keepdims=True)  # [1, B]


@functools.partial(jax.jit, static_argnames=("block", "interpret"))
def attention_scores_fused(
    q: jnp.ndarray,
    ray_feats: jnp.ndarray,
    wk: jnp.ndarray,
    bk: jnp.ndarray,
    patch_mask: jnp.ndarray,
    ray_valid: jnp.ndarray,
    block: int = 2048,
    interpret: bool = False,
) -> jnp.ndarray:
    """Per-ray scores.

    Args:
        q: [P, d] projected image-patch queries (P multiple of 8).
        ray_feats: [N, d] ray features (N multiple of ``block``).
        wk/bk: k-projection weights [d, d], [d].
        patch_mask: [P] bool/float mask of image patches.
        ray_valid: [N] bool/float validity of rays.
        block: rays per kernel step.
        interpret: run in interpreter mode (CPU tests).

    Returns:
        [N] scores; padded rays get ~0.
    """
    P, d = q.shape
    N = ray_feats.shape[0]
    assert N % block == 0, (N, block)
    nb = N // block
    pmask = patch_mask.astype(jnp.float32).reshape(P, 1)
    valid = ray_valid.astype(jnp.float32).reshape(1, N)

    out = pl.pallas_call(
        _kernel,
        grid=(2, nb),
        in_specs=[
            pl.BlockSpec((P, d), lambda p, b: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((block, d), lambda p, b: (b, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((d, d), lambda p, b: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((d,), lambda p, b: (0,), memory_space=pltpu.VMEM),
            pl.BlockSpec((P, 1), lambda p, b: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, block), lambda p, b: (0, b), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, block), lambda p, b: (0, b), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((1, N), jnp.float32),
        scratch_shapes=[
            pltpu.VMEM((P, 1), jnp.float32),
            pltpu.VMEM((P, 1), jnp.float32),
        ],
        interpret=interpret,
    )(q.astype(jnp.float32), ray_feats.astype(jnp.float32),
      wk.astype(jnp.float32), bk.astype(jnp.float32), pmask, valid)
    return out[0]


def fused_ray_scores(id_params, img_feats_pe, ray_feats, patch_mask, ray_valid,
                     block: int = 2048, interpret: bool = False) -> jnp.ndarray:
    """Drop-in for the jnp scorer in id_module.score_image: applies the
    q-projection then the fused kernel."""
    att = id_params["attention"]
    q = img_feats_pe @ att["q"]["w"] + att["q"]["b"]
    return attention_scores_fused(
        q, ray_feats, att["k"]["w"], att["k"]["b"], patch_mask, ray_valid,
        block=block, interpret=interpret,
    )
