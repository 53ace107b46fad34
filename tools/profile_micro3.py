"""Glue micro-benchmarks with chained device dependencies: iteration k's input
depends on iteration k-1's output, so timings can't hide behind async dispatch
or any tunnel-side caching."""

import time

import numpy as np
import jax
import jax.numpy as jnp


def timeit_chained(fn, n=10, warmup=2):
    """fn: scalar -> scalar (device). Chains c -> fn(c)."""
    c = jnp.float32(0.0)
    for _ in range(warmup):
        c = fn(c)
    jax.block_until_ready(c)
    t0 = time.perf_counter()
    for _ in range(n):
        c = fn(c)
    c = float(c)  # host read forces completion
    return (time.perf_counter() - t0) / n * 1e3


def main():
    rng = np.random.default_rng(0)
    P = 131072
    N = 2_359_296
    NA = N + 3927 * 128

    records = jnp.asarray(rng.normal(size=(P, 16)).astype(np.float32))
    idx = jnp.asarray(rng.integers(0, P, size=NA).astype(np.int32))
    pair_i32 = jnp.asarray(rng.integers(0, 3928, size=N).astype(np.int32))

    g1 = jax.jit(lambda c: ((records + c)[idx]).sum())
    print(f"gather [NA,16] ({NA*64/1e6:.0f} MB out): {timeit_chained(g1):7.2f} ms", flush=True)

    big = jnp.asarray(rng.normal(size=(NA, 16)).astype(np.float32))
    tr = jax.jit(lambda c: (big + c).T.sum())
    print(f"transpose [NA,16]->[16,NA]: {timeit_chained(tr):7.2f} ms", flush=True)

    srt = jax.jit(lambda c: jnp.argsort(pair_i32 + c.astype(jnp.int32),
                                        stable=True).sum().astype(jnp.float32))
    print(f"stable argsort {N} i32: {timeit_chained(srt):7.2f} ms", flush=True)

    perm = jnp.asarray(rng.permutation(N).astype(np.int32))
    sc = jax.jit(lambda c: jnp.zeros(N, jnp.int32).at[perm].set(
        jnp.arange(N, dtype=jnp.int32) + c.astype(jnp.int32)).sum().astype(jnp.float32))
    pass

    k_max, n_tiles = 512, 3927
    sorted_recs = jnp.asarray(rng.normal(size=(N, 9)).astype(np.float32))
    starts = jnp.sort(jnp.asarray(rng.integers(0, N, size=n_tiles + 1).astype(np.int32)))

    def window(c):
        x = sorted_recs + c
        counts = starts[1:] - starts[:-1]
        k = jnp.arange(k_max, dtype=jnp.int32)
        ii = starts[:-1][:, None] + k[None, :]
        valid = k[None, :] < counts[:, None]
        ii = jnp.minimum(ii, x.shape[0] - 1)
        w = jnp.where(valid[..., None], x[ii], 0.0)
        return w.sum()
    print(f"window gather ({n_tiles*k_max*36/1e6:.0f} MB): {timeit_chained(jax.jit(window)):7.2f} ms", flush=True)

    rep_in = jnp.asarray(rng.integers(0, 3927, size=NA // 128).astype(np.int32))
    rep = jax.jit(lambda c: jnp.repeat(rep_in + c.astype(jnp.int32), 128,
                                       total_repeat_length=NA).sum().astype(jnp.float32))
    print(f"repeat {NA//128}->{NA}: {timeit_chained(rep):7.2f} ms", flush=True)

    # elementwise baseline: how fast IS a simple big op through this harness
    ew = jax.jit(lambda c: (big * 1.0001 + c).sum())
    print(f"elementwise [NA,16] read+write (366 MB): {timeit_chained(ew):7.2f} ms", flush=True)


if __name__ == "__main__":
    main()
