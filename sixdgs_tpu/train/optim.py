"""Per-group Adam matching torch.optim.Adam semantics.

The reference optimizes six parameter groups with individual learning rates
and eps=1e-15 (/root/reference/scene/gaussian_model.py:230-274). We implement
Adam directly on the params pytree (rather than optax) so densification's
"optimizer-state surgery" (gaussian_model.py:422-507) is a plain gather/concat
on (m, v) arrays.

torch parity: bias-corrected m_hat/v_hat, update = lr * m_hat/(sqrt(v_hat)+eps).
"""

from __future__ import annotations

from typing import Dict

import jax
import jax.numpy as jnp
from flax import struct

BETA1 = 0.9
BETA2 = 0.999
EPS = 1e-15


@struct.dataclass
class AdamState:
    m: Dict[str, jnp.ndarray]
    v: Dict[str, jnp.ndarray]
    step: jnp.ndarray  # scalar int32


def adam_init(params: Dict[str, jnp.ndarray]) -> AdamState:
    zeros = jax.tree.map(jnp.zeros_like, params)
    return AdamState(m=zeros, v=jax.tree.map(jnp.zeros_like, params),
                     step=jnp.zeros((), jnp.int32))


def adam_update(
    params: Dict[str, jnp.ndarray],
    grads: Dict[str, jnp.ndarray],
    state: AdamState,
    lrs: Dict[str, jnp.ndarray],
):
    """One Adam step with a per-group learning rate.

    ``lrs`` maps param name -> scalar lr (traced; the xyz lr follows the
    reference's exponential schedule, general_utils.py:32-71).
    """
    step = state.step + 1
    bc1 = 1.0 - BETA1 ** step.astype(jnp.float32)
    bc2 = 1.0 - BETA2 ** step.astype(jnp.float32)
    new_params, new_m, new_v = {}, {}, {}
    for name in params:
        g = grads[name]
        m = BETA1 * state.m[name] + (1.0 - BETA1) * g
        v = BETA2 * state.v[name] + (1.0 - BETA2) * jnp.square(g)
        m_hat = m / bc1
        v_hat = v / bc2
        new_params[name] = params[name] - lrs[name] * m_hat / (jnp.sqrt(v_hat) + EPS)
        new_m[name] = m
        new_v[name] = v
    return new_params, AdamState(m=new_m, v=new_v, step=step)


def expon_lr(step, lr_init: float, lr_final: float, lr_delay_steps: int = 0,
             lr_delay_mult: float = 1.0, max_steps: int = 1_000_000):
    """Log-linear lr schedule (general_utils.py:32-71), host or traced."""
    import numpy as np

    if lr_init == 0.0 and lr_final == 0.0:
        return 0.0
    if lr_delay_steps > 0:
        delay_rate = lr_delay_mult + (1 - lr_delay_mult) * np.sin(
            0.5 * np.pi * np.clip(step / lr_delay_steps, 0, 1)
        )
    else:
        delay_rate = 1.0
    t = np.clip(step / max_steps, 0, 1)
    log_lerp = np.exp(np.log(lr_init) * (1 - t) + np.log(lr_final) * t)
    return float(delay_rate * log_lerp) if np.ndim(step) == 0 else delay_rate * log_lerp
