"""Glue-op micro-benchmarks with per-call varying inputs (defeats any
repeated-execution caching through the axon tunnel)."""

import time

import numpy as np
import jax
import jax.numpy as jnp


def timeit_varying(fn, make_args, n=10, warmup=2):
    args = [make_args(k) for k in range(n + warmup)]
    for k in range(warmup):
        jax.block_until_ready(fn(*args[k]))
    t0 = time.perf_counter()
    outs = []
    for k in range(warmup, warmup + n):
        outs.append(fn(*args[k]))
    jax.block_until_ready(outs[-1])
    t = (time.perf_counter() - t0) / n * 1e3
    del outs
    return t


def main():
    rng = np.random.default_rng(0)
    P = 131072
    N = 2_359_296
    NA = N + 3927 * 128

    records = jnp.asarray(rng.normal(size=(P, 16)).astype(np.float32))
    idx = jnp.asarray(rng.integers(0, P, size=NA).astype(np.int32))
    pair_i32 = jnp.asarray(rng.integers(0, 3928, size=N).astype(np.int32))

    # vary a scalar that feeds the computation so each call is unique work
    def g_fn(r, i, c):
        return (r + c)[i]
    g1 = jax.jit(g_fn)
    print(f"gather [NA,16] rows ({NA*64/1e6:.0f} MB out): "
          f"{timeit_varying(g1, lambda k: (records, idx, jnp.float32(k))):7.2f} ms")

    big = jnp.asarray(rng.normal(size=(NA, 16)).astype(np.float32))
    tr = jax.jit(lambda x, c: (x + c).T)
    print(f"transpose [NA,16]->[16,NA]: "
          f"{timeit_varying(tr, lambda k: (big, jnp.float32(k))):7.2f} ms")

    srt = jax.jit(lambda x, c: jnp.argsort(x + c, stable=True))
    print(f"stable argsort {N} i32: "
          f"{timeit_varying(srt, lambda k: (pair_i32, jnp.int32(k))):7.2f} ms")

    def sortpair(x, c):
        iota = jnp.arange(x.shape[0], dtype=jnp.int32)
        return jax.lax.sort((x + c, iota), num_keys=1)
    print(f"lax.sort (k,iota) {N}: "
          f"{timeit_varying(jax.jit(sortpair), lambda k: (pair_i32, jnp.int32(k))):7.2f} ms")

    perm = jnp.asarray(rng.permutation(N).astype(np.int32))
    sc = jax.jit(lambda p, c: jnp.zeros(N, jnp.int32).at[p].set(
        jnp.arange(N, dtype=jnp.int32) + c))
    print(f"scatter-set inv perm {N}: "
          f"{timeit_varying(sc, lambda k: (perm, jnp.int32(k))):7.2f} ms")

    k_max, n_tiles = 512, 3927
    sorted_recs = jnp.asarray(rng.normal(size=(N, 9)).astype(np.float32))
    starts = jnp.sort(jnp.asarray(rng.integers(0, N, size=n_tiles + 1).astype(np.int32)))
    def window(x, st, c):
        x = x + c
        counts = st[1:] - st[:-1]
        k = jnp.arange(k_max, dtype=jnp.int32)
        ii = st[:-1][:, None] + k[None, :]
        valid = k[None, :] < counts[:, None]
        ii = jnp.minimum(ii, x.shape[0] - 1)
        return jnp.where(valid[..., None], x[ii], 0.0)
    print(f"window gather [n_tiles,512,9] ({n_tiles*k_max*36/1e6:.0f} MB): "
          f"{timeit_varying(jax.jit(window), lambda k: (sorted_recs, starts, jnp.float32(k))):7.2f} ms")

    rep = jax.jit(lambda t, c: jnp.repeat(t + c, 128, total_repeat_length=NA))
    t_chunk = jnp.asarray(rng.integers(0, 3927, size=NA // 128).astype(np.int32))
    print(f"repeat {NA//128}->NA: "
          f"{timeit_varying(rep, lambda k: (t_chunk, jnp.int32(k))):7.2f} ms")

    # _rect_pairs-like cost: broadcast arithmetic over [P,16] + [256,1024]
    x0 = jnp.asarray(rng.integers(0, 70, size=P).astype(np.int32))
    def rect(x0c, c):
        x0 = x0c + c
        p = jnp.arange(16, dtype=jnp.int32)
        tx = x0[:, None] + p[None, :] % 4
        ty = x0[:, None] + p[None, :] // 4
        return jnp.where((tx < 77) & (ty < 51), ty * 77 + tx, 3927)
    print(f"rect-pairs arith [P,16]: "
          f"{timeit_varying(jax.jit(rect), lambda k: (x0, jnp.int32(k))):7.2f} ms")


if __name__ == "__main__":
    main()
