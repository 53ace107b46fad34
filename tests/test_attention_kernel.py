"""Fused attention-score kernel vs the jnp formulation (interpret mode on CPU)."""

import numpy as np
import jax
import jax.numpy as jnp

from sixdgs_tpu.ops.attention_kernel import attention_scores_fused, fused_ray_scores
from sixdgs_tpu.pose.modules import attention_scores, init_attention


def reference_scores(q, k_feats, wk, bk, pmask, valid):
    k = k_feats @ wk + bk
    logits = q @ k.T / np.sqrt(q.shape[-1])
    logits = np.where(valid[None, :] > 0, logits, -9e15)
    probs = jax.nn.softmax(jnp.asarray(logits), axis=-1)
    return np.asarray(jnp.sum(probs * jnp.asarray(pmask)[:, None], axis=0))


class TestFusedAttention:
    def test_matches_reference(self):
        rng = np.random.default_rng(0)
        P, d, N = 256, 128, 1024
        q = rng.normal(size=(P, d)).astype(np.float32)
        feats = rng.normal(size=(N, d)).astype(np.float32)
        wk = rng.normal(size=(d, d)).astype(np.float32) * 0.05
        bk = rng.normal(size=(d,)).astype(np.float32) * 0.1
        pmask = (rng.uniform(size=P) > 0.3).astype(np.float32)
        valid = np.ones(N, np.float32)
        valid[N - 100 :] = 0.0
        ref = reference_scores(q, feats, wk, bk, pmask, valid)
        out = np.asarray(
            attention_scores_fused(
                jnp.asarray(q), jnp.asarray(feats), jnp.asarray(wk), jnp.asarray(bk),
                jnp.asarray(pmask), jnp.asarray(valid), block=256, interpret=True,
            )
        )
        np.testing.assert_allclose(out, ref, atol=1e-5, rtol=1e-4)
        np.testing.assert_allclose(out[N - 100 :], 0.0, atol=1e-12)
        np.testing.assert_allclose(out.sum(), pmask.sum(), rtol=1e-4)

    def test_matches_module_scorer(self):
        """End-to-end against pose.modules.attention_scores + patch-sum."""
        rng = np.random.default_rng(1)
        P, N, d = 256, 512, 64
        params = init_attention(jax.random.key(0), ray_fea=d, img_fea=d + 14, embed=d)
        img_feats = jnp.asarray(rng.normal(size=(P, d + 14)).astype(np.float32))
        ray_feats = jnp.asarray(rng.normal(size=(N, d)).astype(np.float32))
        valid = jnp.asarray(np.ones(N, bool))
        pmask = jnp.asarray((rng.uniform(size=P) > 0.5))
        attn = attention_scores({"q": params["q"], "k": params["k"]}, img_feats,
                                ray_feats, valid)
        ref = np.asarray(jnp.sum(attn * pmask[:, None].astype(attn.dtype), axis=0))
        out = np.asarray(
            fused_ray_scores({"attention": params}, img_feats, ray_feats, pmask,
                             valid, block=128, interpret=True)
        )
        np.testing.assert_allclose(out, ref, atol=1e-5, rtol=1e-4)
