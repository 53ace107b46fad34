"""Fused patches x rays attention-score Pallas kernel (SURVEY §5.7).

Computes, in one kernel, what the reference materializes as a full
[N_patches, N_rays] attention matrix (our_multihead_attention.py:4-12 +
identification_module.py:82):

    K        = ray_feats @ Wk + bk                  (k-projection)
    logits   = Q K^T / sqrt(d), padded rays -> -9e15
    score_j  = sum_{p in patch_mask} softmax_row_p(logits)_j

The k-projection runs IN-KERNEL on every path. Round 4 tried hoisting it to
one XLA matmul on the inference path (a ~60% kernel-FLOP cut); round-5
chained timing showed that LOSES at scale — 131k rays, split3: 5.24 ms vs
the in-kernel trained forward's ~2 ms — because the kernel is HBM-bound,
not FLOP-bound, at production shapes: hoisting turns two [N, d] feats
streams into feats-read + K-write + 2x K-read (2x the traffic) plus an
extra dispatch. The projection MACs ride the same MXU passes the logits
already pay for. (BASELINE.md round-5 "hoisted-K" row.)

Two streaming passes over ray blocks with online max/sum-exp stats kept in
VMEM scratch (flash-attention style, but the reduction axis is the ray axis
and the output is per-ray column sums): pass 0 accumulates per-patch
(max, sum-exp), pass 1 re-computes each logits block on the MXU and emits the
masked column sums. HBM traffic is one [N, d] stream twice + O(N) outputs —
the [256 x N] logits never hit HBM.

DIFFERENTIABLE: ``attention_scores_fused`` carries a custom VJP whose
backward is a second streaming kernel (pass 0 accumulates the per-patch
softmax-jacobian row sums c_p = sum_j P_pj g_j; pass 1 recomputes each
probs block and emits dfeats while accumulating dq/dWk/dbk in VMEM), so
training at Mip-360 ray counts never materializes the [256 x N] logits
either. Forward stats (m, s) are saved as [P, 1] residuals. The TRAINED
path keeps the k-projection IN-KERNEL on both sides: a stored K residual
would be an [N, d] f32 buffer LARGER than the [P, N] logits at d=384,
forfeiting the tested streaming-memory property for a ~30% FLOP cut.

MXU precision modes (``mode``):
  * "f32"         — plain f32 matmuls (v5e MXU runs f32 at ~1/4 bf16 rate),
  * "bf16"        — operands cast to bf16, f32 accumulate (fastest; logit
                    abs error ~0.4% of magnitude),
  * "bf16_split3" — 3-pass hi/lo bf16 split (hi*hi + hi*lo + lo*hi,
                    ~2^-32 relative: f32-class accuracy at ~3/4 the f32
                    cost). DEFAULT.
"""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG = -9e15


def _split_bf16(x):
    hi = x.astype(jnp.bfloat16)
    lo = (x - hi.astype(jnp.float32)).astype(jnp.bfloat16)
    return hi, lo


def _dot(a, b, mode, dn=(((1,), (0,)), ((), ()))):
    """a @ b with f32 accumulation under the selected MXU mode."""
    f32 = jnp.float32
    if mode == "f32":
        # HIGHEST: TPU DEFAULT-precision f32 dots execute as one bf16 pass
        return jax.lax.dot_general(a, b, dn, preferred_element_type=f32,
                                   precision=jax.lax.Precision.HIGHEST)
    if mode == "bf16":
        return jax.lax.dot_general(
            a.astype(jnp.bfloat16), b.astype(jnp.bfloat16), dn,
            preferred_element_type=f32)
    a_hi, a_lo = _split_bf16(a)
    b_hi, b_lo = _split_bf16(b)
    return (jax.lax.dot_general(a_hi, b_hi, dn, preferred_element_type=f32)
            + jax.lax.dot_general(a_hi, b_lo, dn, preferred_element_type=f32)
            + jax.lax.dot_general(a_lo, b_hi, dn, preferred_element_type=f32))


_DN_TN = (((0,), (0,)), ((), ()))  # a^T @ b
_DN_NT = (((1,), (1,)), ((), ()))  # a @ b^T


def _softmax_colsums(mode, logits, pmask_ref, valid_ref, out_ref, m_ref,
                     s_ref, m_scr, s_scr, p, b):
    """Shared two-pass online-softmax column-sum body over one logits block
    (pass 0 accumulates per-patch max/sum-exp; pass 1 emits masked column
    sums and flushes the stats at the last block)."""
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
        out_ref[:] = jnp.sum(probs * pmask_ref[:], axis=0, keepdims=True)

        @pl.when(b == pl.num_programs(1) - 1)
        def _():
            m_ref[:] = m_scr[:]
            s_ref[:] = s_scr[:]


def _fwd_kernel_train(mode, q_ref, feats_ref, wk_ref, bk_ref, pmask_ref,
                      valid_ref, out_ref, m_ref, s_ref, m_scr, s_scr):
    """Forward (inference AND training): per-block in-kernel k-projection so
    no [N, d] K buffer is ever materialized — hoisting K doubles HBM traffic
    and measured slower (module docstring)."""
    p = pl.program_id(0)
    b = pl.program_id(1)

    @pl.when((p == 0) & (b == 0))
    def _():
        m_scr[:] = jnp.full_like(m_scr, -jnp.inf)
        s_scr[:] = jnp.zeros_like(s_scr)

    k = _dot(feats_ref[:], wk_ref[:], mode) + bk_ref[:]  # [B, d]
    d = q_ref.shape[-1]
    logits = _dot(q_ref[:], k, mode, _DN_NT) / math.sqrt(d)
    _softmax_colsums(mode, logits, pmask_ref, valid_ref, out_ref, m_ref,
                     s_ref, m_scr, s_scr, p, b)


def _bwd_kernel(mode, q_ref, feats_ref, wk_ref, bk_ref, pmask_ref, valid_ref,
                m_ref, s_ref, g_ref, dfeats_ref, dq_ref, dwk_ref, dbk_ref,
                c_scr, dq_scr, dwk_scr, dbk_scr):
    p = pl.program_id(0)
    b = pl.program_id(1)

    @pl.when((p == 0) & (b == 0))
    def _():
        c_scr[:] = jnp.zeros_like(c_scr)
        dq_scr[:] = jnp.zeros_like(dq_scr)
        dwk_scr[:] = jnp.zeros_like(dwk_scr)
        dbk_scr[:] = jnp.zeros_like(dbk_scr)

    # in-kernel k-projection (not a residual): storing K would cost an
    # [N, d] f32 buffer bigger than the [P, N] logits at d=384 (module
    # docstring)
    k = _dot(feats_ref[:], wk_ref[:], mode) + bk_ref[:]  # [B, d]
    d = q_ref.shape[-1]
    logits = _dot(q_ref[:], k, mode, _DN_NT) / math.sqrt(d)
    logits = jnp.where(valid_ref[:] > 0.0, logits, NEG)
    probs = jnp.exp(logits - m_ref[:]) / s_ref[:]  # [P, B]
    g = g_ref[:]  # [1, B] upstream score cotangents

    @pl.when(p == 0)
    def _():
        # c_p = sum_j P_pj g_j (full-row sum, accumulated over blocks)
        c_scr[:] = c_scr[:] + jnp.sum(probs * g, axis=1, keepdims=True)
        dfeats_ref[:] = jnp.zeros_like(dfeats_ref)

    @pl.when(p == 1)
    def _():
        # softmax-jacobian: dlogits_pj = pmask_p P_pj (g_j - c_p) / sqrt(d)
        dlog = pmask_ref[:] * probs * (g - c_scr[:]) * (1.0 / math.sqrt(d))
        dk = _dot(dlog, q_ref[:], mode, _DN_TN)  # [B, d]
        dfeats_ref[:] = _dot(dk, wk_ref[:], mode, _DN_NT)  # [B, d]
        dq_scr[:] = dq_scr[:] + _dot(dlog, k, mode)  # [P, d]
        dwk_scr[:] = dwk_scr[:] + _dot(feats_ref[:], dk, mode, _DN_TN)
        dbk_scr[:] = dbk_scr[:] + jnp.sum(dk, axis=0, keepdims=True)

        @pl.when(b == pl.num_programs(1) - 1)
        def _():
            dq_ref[:] = dq_scr[:]
            dwk_ref[:] = dwk_scr[:]
            dbk_ref[:] = dbk_scr[:]


def _fused_fwd_call_train(q, ray_feats, wk, bk, pmask, valid, block,
                          interpret, mode):
    """Training-path forward: in-kernel k-projection, no K buffer."""
    P, d = q.shape
    N = ray_feats.shape[0]
    nb = N // block
    out, m, s = pl.pallas_call(
        functools.partial(_fwd_kernel_train, mode),
        grid=(2, nb),
        in_specs=[
            pl.BlockSpec((P, d), lambda p, b: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((block, d), lambda p, b: (b, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((d, d), lambda p, b: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((d,), lambda p, b: (0,), memory_space=pltpu.VMEM),
            pl.BlockSpec((P, 1), lambda p, b: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, block), lambda p, b: (0, b), memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((1, block), lambda p, b: (0, b), memory_space=pltpu.VMEM),
            pl.BlockSpec((P, 1), lambda p, b: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((P, 1), lambda p, b: (0, 0), memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((1, N), jnp.float32),
            jax.ShapeDtypeStruct((P, 1), jnp.float32),
            jax.ShapeDtypeStruct((P, 1), jnp.float32),
        ),
        scratch_shapes=[
            pltpu.VMEM((P, 1), jnp.float32),
            pltpu.VMEM((P, 1), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )(q, ray_feats, wk, bk, pmask, valid)
    return out, m, s


@functools.partial(jax.custom_vjp, nondiff_argnums=(6, 7, 8))
def _fused_scores(q, ray_feats, wk, bk, pmask, valid, block, interpret, mode):
    # inference primal == trained forward: in-kernel k-projection. The r4
    # hoisted-K variant (XLA matmul + K-streaming kernel) measured SLOWER
    # (131k split3: 5.24 ms fwd vs 4.02 ms full fwd+bwd) — HBM-bound, and
    # hoisting doubles the [N, d] traffic (module docstring).
    out, _, _ = _fused_fwd_call_train(q, ray_feats, wk, bk, pmask, valid,
                                      block, interpret, mode)
    return out[0]


def _fused_scores_fwd(q, ray_feats, wk, bk, pmask, valid, block, interpret,
                      mode):
    # trained path: in-kernel projection on BOTH sides so peak temp stays
    # O(block) — a stored K residual would be an [N, d] f32 buffer LARGER
    # than the [P, N] logits the streaming design exists to avoid
    out, m, s = _fused_fwd_call_train(q, ray_feats, wk, bk, pmask, valid,
                                      block, interpret, mode)
    return out[0], (q, ray_feats, wk, bk, pmask, valid, m, s)


def _fused_scores_bwd(block, interpret, mode, res, g):
    q, ray_feats, wk, bk, pmask, valid, m, s = res
    P, d = q.shape
    N = ray_feats.shape[0]
    nb = N // block
    g2 = g.reshape(1, N).astype(jnp.float32)
    dfeats, dq, dwk, dbk = pl.pallas_call(
        functools.partial(_bwd_kernel, mode),
        grid=(2, nb),
        in_specs=[
            pl.BlockSpec((P, d), lambda p, b: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((block, d), lambda p, b: (b, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((d, d), lambda p, b: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((d,), lambda p, b: (0,), memory_space=pltpu.VMEM),
            pl.BlockSpec((P, 1), lambda p, b: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, block), lambda p, b: (0, b), memory_space=pltpu.VMEM),
            pl.BlockSpec((P, 1), lambda p, b: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((P, 1), lambda p, b: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, block), lambda p, b: (0, b), memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((block, d), lambda p, b: (b, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((P, d), lambda p, b: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((d, d), lambda p, b: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, d), lambda p, b: (0, 0), memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((N, d), jnp.float32),
            jax.ShapeDtypeStruct((P, d), jnp.float32),
            jax.ShapeDtypeStruct((d, d), jnp.float32),
            jax.ShapeDtypeStruct((1, d), jnp.float32),
        ),
        scratch_shapes=[
            pltpu.VMEM((P, 1), jnp.float32),
            pltpu.VMEM((P, d), jnp.float32),
            pltpu.VMEM((d, d), jnp.float32),
            pltpu.VMEM((1, d), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )(q, ray_feats, wk, bk, pmask, valid, m, s, g2)
    # pmask/valid are data masks, not differentiable inputs
    return dq, dfeats, dwk, dbk[0], None, None


_fused_scores.defvjp(_fused_scores_fwd, _fused_scores_bwd)


@functools.partial(jax.jit, static_argnames=("block", "interpret", "mode"))
def attention_scores_fused(
    q: jnp.ndarray,
    ray_feats: jnp.ndarray,
    wk: jnp.ndarray,
    bk: jnp.ndarray,
    patch_mask: jnp.ndarray,
    ray_valid: jnp.ndarray,
    block: int = 2048,
    interpret: bool = False,
    mode: str = "bf16_split3",
) -> jnp.ndarray:
    """Per-ray scores (differentiable — custom VJP streaming backward).

    Args:
        q: [P, d] projected image-patch queries (P multiple of 8).
        ray_feats: [N, d] ray features (N multiple of ``block``).
        wk/bk: k-projection weights [d, d], [d].
        patch_mask: [P] bool/float mask of image patches.
        ray_valid: [N] bool/float validity of rays.
        block: rays per kernel step.
        interpret: run in interpreter mode (CPU tests).
        mode: MXU precision — "f32" | "bf16" | "bf16_split3" (default).

    Returns:
        [N] scores; padded rays get ~0.
    """
    P, d = q.shape
    N = ray_feats.shape[0]
    assert N % block == 0, (N, block)
    pmask = patch_mask.astype(jnp.float32).reshape(P, 1)
    valid = ray_valid.astype(jnp.float32).reshape(1, N)
    return _fused_scores(
        q.astype(jnp.float32), ray_feats.astype(jnp.float32),
        wk.astype(jnp.float32), bk.astype(jnp.float32), pmask, valid,
        block, interpret, mode,
    )


def fused_ray_scores(id_params, img_feats_pe, ray_feats, patch_mask, ray_valid,
                     block: int = 2048, interpret: bool = False,
                     mode: str = "bf16_split3") -> jnp.ndarray:
    """Drop-in for the jnp scorer in id_module.score_image: applies the
    q-projection then the fused kernel (q-projection gradients chain through
    the kernel's dq)."""
    att = id_params["attention"]
    q = img_feats_pe @ att["q"]["w"] + att["q"]["b"]
    return attention_scores_fused(
        q, ray_feats, att["k"]["w"], att["k"]["b"], patch_mask, ray_valid,
        block=block, interpret=interpret, mode=mode,
    )
