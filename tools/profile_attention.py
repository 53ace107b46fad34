"""Honest (chained) characterization of the fused attention paths (VERDICT r5).

Compares, per precision mode and ray count:
  - inference primal (attention_scores_fused without grad — since the r5
    de-hoisting fix this is the same in-kernel-projection kernel as the
    trained forward, so the two columns should agree)
  - trained-path forward alone (in-kernel k-projection, O(block) temps —
    _fused_fwd_call_train)
  - fwd+bwd through the custom VJP (value_and_grad)
plus the full eval_image-equivalent score+solve latency at the Mip-360
stress budget. All timings via tools/tputime.py chained_call_ms.

Usage: PYTHONPATH=/root/.axon_site:/root/repo python tools/profile_attention.py
"""

import functools
import os
import sys

import numpy as np
import jax
import jax.numpy as jnp

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
from tputime import chained_call_ms  # noqa: E402

from sixdgs_tpu.ops import attention_kernel as AK  # noqa: E402


def main():
    P, d = 256, 384
    rng = np.random.default_rng(7)
    q = jnp.asarray(rng.normal(size=(P, d)).astype(np.float32))
    wk = jnp.asarray(rng.normal(size=(d, d)).astype(np.float32) / np.sqrt(d))
    bk = jnp.asarray(rng.normal(size=(d,)).astype(np.float32))
    pmask_f = jnp.ones((P, 1), jnp.float32)

    for N in (32768, 131072):
        feats = jnp.asarray(rng.normal(size=(N, d)).astype(np.float32))
        valid_f = jnp.ones((1, N), jnp.float32)
        pmask_b = jnp.ones(P, bool)
        valid_b = jnp.ones(N, bool)
        print(f"== N={N}")
        for mode in ("f32", "bf16_split3", "bf16"):
            infer = functools.partial(
                AK.attention_scores_fused, mode=mode)
            ms_inf = chained_call_ms(infer, q, feats, wk, bk, pmask_b,
                                     valid_b, chain_arg=1)

            def train_fwd(q_, feats_, wk_, bk_, _m=mode):
                out, m, s = AK._fused_fwd_call_train(
                    q_, feats_, wk_, bk_, pmask_f, valid_f, 2048, False, _m)
                return out

            ms_tf = chained_call_ms(train_fwd, q, feats, wk, bk, chain_arg=1)

            def fb(q_, feats_, wk_, bk_, _m=mode):
                def loss(a, b, c, e):
                    return jnp.sum(AK.attention_scores_fused(
                        a, b, c, e, pmask_b, valid_b, mode=_m))
                return jax.value_and_grad(loss, argnums=(0, 1, 2, 3))(
                    q_, feats_, wk_, bk_)

            ms_fb = chained_call_ms(fb, q, feats, wk, bk, chain_arg=1)
            print(f"  {mode:12s} infer_fwd {ms_inf:7.3f}  train_fwd "
                  f"{ms_tf:7.3f}  fwd+bwd {ms_fb:7.3f} ms")


if __name__ == "__main__":
    main()
