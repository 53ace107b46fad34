"""Measure lax.sort cost vs payload count at pair scale, plus scatter+cummax
segment-table expansion (gather replacement candidates)."""

import time

import numpy as np
import jax
import jax.numpy as jnp


def timeit_chained(fn, n=10, warmup=2):
    c = jnp.float32(0.0)
    for _ in range(warmup):
        c = fn(c)
    jax.block_until_ready(c)
    t0 = time.perf_counter()
    for _ in range(n):
        c = fn(c)
    c = float(c)
    return (time.perf_counter() - t0) / n * 1e3


def main():
    rng = np.random.default_rng(0)
    N = 2_359_296
    keys1 = jnp.asarray(rng.integers(0, 3928, size=N).astype(np.int32))
    keys2 = jnp.asarray(rng.integers(0, 131072, size=N).astype(np.int32))
    planes = [jnp.asarray(rng.normal(size=N).astype(np.float32)) for _ in range(10)]

    for npl in (0, 4, 9, 10):
        def f(c, npl=npl):
            ops = (keys1, keys2 + c.astype(jnp.int32)) + tuple(planes[:npl])
            out = jax.lax.sort(ops, num_keys=2, is_stable=True)
            return sum(o.sum().astype(jnp.float32) for o in out[1:2]) + out[-1].sum().astype(jnp.float32)
        print(f"sort 2 keys + {npl} f32 payloads @ {N}: {timeit_chained(jax.jit(f)):7.2f} ms", flush=True)

    # single-key sort + 8 payloads (the bwd transform)
    perm = jnp.asarray(rng.permutation(N).astype(np.int32))
    def fb(c):
        ops = (perm,) + tuple(p + c for p in planes[:8])
        out = jax.lax.sort(ops, num_keys=1)
        return out[1].sum()
    print(f"sort 1 key + 8 f32 payloads @ {N}: {timeit_chained(jax.jit(fb)):7.2f} ms", flush=True)

    # scatter+cummax expansion of a 3928-entry table to N slots
    starts = jnp.sort(jnp.asarray(rng.integers(0, N, size=3928).astype(np.int32)))
    vals = jnp.asarray(np.sort(rng.integers(0, 1 << 22, size=3928)).astype(np.int32))
    def fc(c):
        arr = jnp.zeros(N, jnp.int32).at[starts].max(vals + c.astype(jnp.int32))
        return jax.lax.cummax(arr).sum().astype(jnp.float32)
    print(f"scatter(3928)+cummax @ {N}: {timeit_chained(jax.jit(fc)):7.2f} ms", flush=True)

    # broadcast-expand records to presort pairs (replaces repeat/gather)
    P, t_max = 131072, 16
    rec = jnp.asarray(rng.normal(size=(P, 9)).astype(np.float32))
    def fd(c):
        x = jnp.broadcast_to((rec + c)[:, None, :], (P, t_max, 9)).reshape(P * t_max, 9)
        return x.sum()
    print(f"broadcast-expand [P,9]->[P*16,9] (85 MB): {timeit_chained(jax.jit(fd)):7.2f} ms", flush=True)

    # plane stack: 16 x [N] -> [16, N]
    def fe(c):
        rows = [p + c for p in planes[:9]] + [jnp.zeros(N, jnp.float32)] * 7
        return jnp.stack(rows, 0).sum()
    print(f"stack 16 planes [16,N] (183 MB): {timeit_chained(jax.jit(fe)):7.2f} ms", flush=True)


if __name__ == "__main__":
    main()
