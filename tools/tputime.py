"""Tunnel-proof TPU timing.

Over the axon tunnel, ``jax.block_until_ready`` can return before the device
work actually completes (whole 20-call loops of a ~6 ms kernel "finish" in
0.03 ms, and a later ``np.asarray`` fetch then stalls ~1 s flushing the real
executions). Two properties make a timing trustworthy here:

  1. CHAINING — each step's input depends on the previous step's output, so
     the device cannot reorder/overlap/skip anything;
  2. a HOST FETCH of (a tiny piece of) the final output inside the timed
     region — the only sync primitive observed to actually wait.

``chained_ms`` packages both. Every tool/bench number in this repo should go
through it (or through the donated-state train-step chaining, which has the
same two properties when the loss is fetched).
"""

import time

import jax
import numpy as np


def chained_ms(step, carry, n=20, warmup=3):
    """Average ms/step of ``carry = step(carry)`` with a hard host sync.

    ``step`` must be jitted and every timed computation must feed the carry
    (fold a cheap scalar of each output into one carry leaf). The first
    (smallest) leaf of the final carry is fetched to host inside the timed
    region; pick a scalar leaf to keep the fetch negligible.
    """
    for _ in range(warmup):
        carry = step(carry)
    _fetch(carry)
    t0 = time.perf_counter()
    for _ in range(n):
        carry = step(carry)
    _fetch(carry)
    return (time.perf_counter() - t0) / n * 1e3


def _fetch(carry):
    leaves = jax.tree_util.tree_leaves(carry)
    smallest = min(leaves, key=lambda x: getattr(x, "size", 1))
    np.asarray(smallest)


def chained_call_ms(fn, *args, n=20, warmup=3, chain_arg=0, repeats=3):
    """Chained + host-fetch timing of ``fn(*args)``.

    The ``chain_arg``-th argument (an array or pytree of arrays) carries the
    serializing data dependency: each iteration's value of that argument is
    the previous value plus an exact zero derived from the previous output,
    so the device cannot overlap or skip iterations, and the final output is
    host-fetched inside the timed region. Overhead: one elementwise add of
    the chained argument per step.

    The MIN over ``repeats`` timed regions is returned: tunnel jitter
    (host->device queue stalls of ~1 ms) is strictly additive, so the min
    is the noise-robust estimator — single regions produced occasional
    fwd > fwd+bwd inversions between back-to-back measurements."""
    import jax.numpy as jnp

    @jax.jit
    def step(carry):
        a, _ = carry
        call_args = list(args)
        call_args[chain_arg] = a
        out = fn(*call_args)
        leaves = jax.tree_util.tree_leaves(out)
        sm = min(leaves, key=lambda v: getattr(v, "size", 1))
        flat, tdef = jax.tree_util.tree_flatten(a)
        flat[0] = seq_dep(flat[0], sm)
        return tdef.unflatten(flat), sm.astype(jnp.float32).ravel()[0]

    carry0 = (args[chain_arg], jnp.float32(0.0))
    return min(chained_ms(step, carry0, n=n, warmup=warmup if r == 0 else 1)
               for r in range(max(repeats, 1)))


def seq_dep(x, out):
    """Fold a scalar of ``out`` into ``x`` with zero value change, creating
    the data dependency that serializes the next step on this one."""
    leaves = jax.tree_util.tree_leaves(out)
    smallest = min(leaves, key=lambda v: getattr(v, "size", 1))
    s = smallest.astype(jax.numpy.float32).ravel()[0]
    eps = (s - s).astype(x.dtype)  # exactly 0, but data-dependent on out
    return x + eps
