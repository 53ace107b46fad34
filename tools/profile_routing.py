"""Micro-benchmark of _gather_pairs_bwd routing variants at pair scale.

The backward of the compact row gather (pallas_tiles._gather_pairs_bwd) must
segment-sum the [9, NC] pair cotangents per gaussian without a scatter-add.
Variants measured here:

  A (current)  sort (gkey + 9 f32 payloads), cumsum [NC,9], boundary diffs
  B            sort (gkey, iota) -> perm; ROW gather d.T[perm]; same cumsum
  C            like B but gather on the minor axis d[:, perm] (no transpose)

B/C trade 9 payload planes through every merge pass for one u32 payload plus
one NC-row gather. Run on the real TPU: `PYTHONPATH=/root/.axon_site:. python
tools/profile_routing.py [NC]`.
"""

import sys
import time

import numpy as np
import jax
import jax.numpy as jnp


def timeit(fn, *args, n=20, warmup=3):
    for _ in range(warmup):
        jax.block_until_ready(fn(*args))
    t0 = time.perf_counter()
    for _ in range(n):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / n * 1e3


def main():
    nc = int(sys.argv[1]) if len(sys.argv) > 1 else 1 << 20
    P = 131072
    r = 9
    rng = np.random.default_rng(0)
    d = jnp.asarray(rng.normal(size=(r, nc)).astype(np.float32))
    gidx = jnp.asarray(rng.integers(0, P, size=nc).astype(np.int32))
    counts = np.bincount(np.asarray(gidx), minlength=P).astype(np.int32)
    ends_g = jnp.asarray(np.cumsum(counts).astype(np.int32))
    counts_g = jnp.asarray(counts)

    def boundaries(cum, r):
        cum0 = jnp.concatenate([jnp.zeros((1, r), cum.dtype), cum], axis=0)
        hi = cum0[jnp.minimum(ends_g, nc)]
        lo = cum0[jnp.minimum(ends_g - counts_g, nc)]
        return hi - lo

    @jax.jit
    def variant_a(d, gidx):
        out = jax.lax.sort((gidx,) + tuple(d[c] for c in range(r)), num_keys=1)
        cum = jnp.cumsum(jnp.stack(out[1:], axis=-1), axis=0)
        return boundaries(cum, r)

    @jax.jit
    def variant_b(d, gidx):
        rows = jnp.arange(nc, dtype=jnp.int32)
        _, perm = jax.lax.sort((gidx, rows), num_keys=1)
        ds = d.T[perm]  # [NC, 9] row gather
        cum = jnp.cumsum(ds, axis=0)
        return boundaries(cum, r)

    @jax.jit
    def variant_c(d, gidx):
        rows = jnp.arange(nc, dtype=jnp.int32)
        _, perm = jax.lax.sort((gidx, rows), num_keys=1)
        ds = d[:, perm]  # [9, NC] minor-axis gather
        cum = jnp.cumsum(ds, axis=1)
        return boundaries(cum.T, r)

    ra = variant_a(d, gidx)
    for name, fn in (("A sort9", variant_a), ("B permsort+rowgather", variant_b),
                     ("C permsort+colgather", variant_c)):
        out = fn(d, gidx)
        err = float(jnp.abs(out - ra).max())
        print(f"{name:24s} @ NC={nc}: {timeit(fn, d, gidx):7.2f} ms   "
              f"max|diff vs A| {err:.2e}", flush=True)


if __name__ == "__main__":
    main()
