"""Microbench the compact-gather pair pipeline candidates vs the payload sort.

Measures (real TPU): key-only sort of all pair slots, compact slice + flat
row gather of records, backward gidx-keyed payload sort + cumsum segment-sum
— the pieces that would replace the 22 ms x2 payload sorts.
"""

import time

import numpy as np
import jax
import jax.numpy as jnp


def timeit(fn, *args, n=20, warmup=3):
    for _ in range(warmup):
        out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(n):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / n * 1e3


def main():
    rng = np.random.default_rng(0)
    P = 131072
    N = P * 16 + 4096 * 64 + 256 * 1024  # 2,621,440 slots
    NC = 1 << 20  # compact budget
    n_tiles = 3928
    gbits = 17

    # realistic keys: ~824k real pairs, rest sentinel
    real = 823_951
    tiles_r = np.sort(rng.integers(0, n_tiles - 1, size=real)).astype(np.int32)
    g_r = rng.integers(0, P, size=real).astype(np.int32)
    key_np = np.full(N, ((n_tiles) << gbits), np.int32)
    key_np[:real] = (tiles_r.astype(np.int64) << gbits | g_r).astype(np.int32)
    rng.shuffle(key_np)
    key = jnp.asarray(key_np)
    rec9 = jnp.asarray(rng.normal(size=(P, 9)).astype(np.float32))
    rec16 = jnp.asarray(rng.normal(size=(P, 16)).astype(np.float32))

    f = jax.jit(lambda k: jax.lax.sort((k,), num_keys=1)[0])
    print(f"key-only sort @ {N}: {timeit(f, key):7.2f} ms", flush=True)

    f2 = jax.jit(lambda k: jax.lax.sort(
        (k, jnp.arange(N, dtype=jnp.int32)), num_keys=1))
    print(f"key+iota sort @ {N}: {timeit(f2, key):7.2f} ms", flush=True)

    skey = jax.lax.sort((key,), num_keys=1)[0]
    gidx = jnp.asarray(
        (np.asarray(skey)[:NC] & ((1 << gbits) - 1)).astype(np.int32))

    g9 = jax.jit(lambda r, i: r[i])
    print(f"row gather [NC]<-[P,9] ({NC*9*4>>20} MB): "
          f"{timeit(g9, rec9, gidx):7.2f} ms", flush=True)
    g16 = jax.jit(lambda r, i: r[i])
    print(f"row gather [NC]<-[P,16] ({NC*16*4>>20} MB): "
          f"{timeit(g16, rec16, gidx):7.2f} ms", flush=True)

    tr = jax.jit(lambda x: x.T.copy())
    gat9 = rec9[gidx]
    print(f"transpose [NC,9]->[9,NC]: {timeit(tr, gat9):7.2f} ms", flush=True)

    # fwd all-in-one: key sort + slice + gather (+ pad cols to 16)
    def fwd(k, r):
        sk = jax.lax.sort((k,), num_keys=1)[0][:NC]
        gi = jax.lax.bitwise_and(sk, (1 << gbits) - 1)
        return sk, r[gi]
    jf = jax.jit(fwd)
    print(f"FWD key-sort+slice+gather16: {timeit(jf, key, rec16):7.2f} ms",
          flush=True)

    # bwd: sort (gidx key, 9 payload planes) @ NC, then cumsum + boundary diff
    dp = [jnp.asarray(rng.normal(size=NC).astype(np.float32))
          for _ in range(9)]
    starts_g = jnp.asarray(
        np.cumsum(rng.multinomial(real, np.ones(P) / P)).astype(np.int32))

    def bwd(gi, planes, sg):
        out = jax.lax.sort((gi,) + tuple(planes), num_keys=1)
        c = jnp.cumsum(jnp.stack(out[1:], axis=-1), axis=0)  # [NC, 9]
        hi = c[jnp.minimum(sg - 1, NC - 1)]
        lo = jnp.concatenate([jnp.zeros((1, 9), c.dtype), hi[:-1]], axis=0)
        return hi - lo
    jb = jax.jit(bwd)
    print(f"BWD gidx-sort9+cumsum+segdiff @ {NC}: "
          f"{timeit(jb, gidx, dp, starts_g):7.2f} ms", flush=True)

    # bwd alt: payload sort only
    jb2 = jax.jit(lambda gi, planes: jax.lax.sort((gi,) + tuple(planes),
                                                  num_keys=1))
    print(f"BWD gidx-sort9 only @ {NC}: {timeit(jb2, gidx, dp):7.2f} ms",
          flush=True)

    # smaller slot count variant: t_max=8 -> N2 slots
    N2 = P * 8 + 8192 * 32 + 4096 * 64 + 256 * 1024
    key2 = jnp.asarray(key_np[:N2])
    f3 = jax.jit(lambda k: jax.lax.sort((k,), num_keys=1)[0])
    print(f"key-only sort @ {N2}: {timeit(f3, key2):7.2f} ms", flush=True)


if __name__ == "__main__":
    main()
