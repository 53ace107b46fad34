"""Round-4 micro-benchmarks: inside the bwd routing stage + searchsorted.

Questions (real chip, chained timing — tools/tputime.py):
  1. The 8.27 ms "bwd gidx payload sort+route" stage: how much is the
     9-payload sort vs the [NC, 9] cumsum vs the 2x131k boundary row gather?
  2. Does a two-level (blocked) cumsum beat XLA's jnp.cumsum on [NC, 9]?
  3. Can the boundary gather be restructured (per-plane lane gathers vs
     row gathers of the stacked [NC+1, 9] table)?
  4. searchsorted(tiles_c, arange(n_tiles+1)): the scan_unrolled form costs
     ~20 rounds x 3928 SERIAL gather elements (~2.4 ms). A dense
     block-max compare + MXU column-sum + one boundary-block row gather
     computes the same starts with ~0.5k serialized fetches. Verify + time.

Run: PYTHONPATH=/root/.axon_site:. python tools/profile_glue5.py
"""

import sys

import numpy as np
import jax
import jax.numpy as jnp

sys.path.insert(0, "tools")
from tputime import chained_ms, seq_dep  # noqa: E402


def timeit(fn, *args, n=20, warmup=3):
    @jax.jit
    def step(carry):
        a0, _ = carry
        out = fn(a0, *args[1:])
        leaves = jax.tree_util.tree_leaves(out)
        sm = min(leaves, key=lambda v: v.size)
        return seq_dep(a0, sm), sm.astype(jnp.float32).ravel()[0]

    return chained_ms(step, (args[0], jnp.float32(0)), n=n, warmup=warmup)


def main():
    P = 131072
    NC = 1 << 20
    n_tiles = 77 * 51
    rng = np.random.default_rng(0)

    # production-shaped inputs: gidx piecewise-ascending per tile segment
    gidx_np = np.empty(NC, np.int32)
    for t in range(0, NC, 65536):
        end = min(t + 65536, NC)
        gidx_np[t:end] = np.sort(rng.integers(0, P, size=end - t))
    d9 = jnp.asarray(rng.normal(size=(9, NC)).astype(np.float32))
    gidx = jnp.asarray(gidx_np)
    counts = np.bincount(gidx_np, minlength=P).astype(np.int32)
    ends_g = jnp.asarray(np.cumsum(counts).astype(np.int32))
    counts_g = jnp.asarray(counts)
    v_real = jnp.int32(NC)

    # ---- 1. routing sub-parts -------------------------------------------
    @jax.jit
    def part_sort(d, gidx):
        rows = jnp.arange(NC, dtype=jnp.int32)
        gkey = jnp.where(rows < v_real, gidx, jnp.int32(P))
        out = jax.lax.sort((gkey,) + tuple(d[c] for c in range(9)),
                           num_keys=1)
        return out[1]  # force materialization of one payload

    @jax.jit
    def part_sort_cumsum(d, gidx):
        rows = jnp.arange(NC, dtype=jnp.int32)
        gkey = jnp.where(rows < v_real, gidx, jnp.int32(P))
        out = jax.lax.sort((gkey,) + tuple(d[c] for c in range(9)),
                           num_keys=1)
        cum = jnp.cumsum(jnp.stack(out[1:], axis=-1), axis=0)
        return cum[-1]

    @jax.jit
    def part_full(d, gidx):
        rows = jnp.arange(NC, dtype=jnp.int32)
        gkey = jnp.where(rows < v_real, gidx, jnp.int32(P))
        out = jax.lax.sort((gkey,) + tuple(d[c] for c in range(9)),
                           num_keys=1)
        cum = jnp.cumsum(jnp.stack(out[1:], axis=-1), axis=0)
        cum0 = jnp.concatenate([jnp.zeros((1, 9), cum.dtype), cum], axis=0)
        hi = cum0[jnp.minimum(ends_g, NC)]
        lo = cum0[jnp.minimum(ends_g - counts_g, NC)]
        return hi - lo

    ref = jax.block_until_ready(part_full(d9, gidx))
    print(f"{'route: sort only':34s}: {timeit(part_sort, d9, gidx):7.2f} ms",
          flush=True)
    print(f"{'route: sort+cumsum':34s}: "
          f"{timeit(part_sort_cumsum, d9, gidx):7.2f} ms", flush=True)
    print(f"{'route: sort+cumsum+gather (prod)':34s}: "
          f"{timeit(part_full, d9, gidx):7.2f} ms", flush=True)

    # ---- 2. blocked cumsum + boundary reconstruction ---------------------
    BK = 512  # rows per block

    @jax.jit
    def part_blocked(d, gidx):
        rows = jnp.arange(NC, dtype=jnp.int32)
        gkey = jnp.where(rows < v_real, gidx, jnp.int32(P))
        out = jax.lax.sort((gkey,) + tuple(d[c] for c in range(9)),
                           num_keys=1)
        ds = jnp.stack(out[1:], axis=-1)  # [NC, 9] sorted by gaussian
        blk = ds.reshape(NC // BK, BK, 9)
        bsum = blk.sum(axis=1)  # [NB, 9] one pass
        bpre = jnp.concatenate(
            [jnp.zeros((1, 9), ds.dtype),
             jnp.cumsum(bsum, axis=0)], axis=0)  # [NB+1, 9] exclusive
        # boundary value cum0[e] = bpre[e//BK] + sum(ds[e//BK*BK : e]):
        # gather the boundary block's rows once per endpoint and mask-sum
        def at(pos):
            b = pos // BK
            off = pos - b * BK
            rowsb = blk[b]  # [Q, BK, 9] row gather of whole blocks
            j = jnp.arange(BK, dtype=jnp.int32)[None, :, None]
            part = jnp.where(j < off[:, None, None], rowsb, 0.0).sum(axis=1)
            return bpre[b] + part

        e = jnp.minimum(ends_g, NC)
        s = jnp.minimum(ends_g - counts_g, NC)
        return at(e) - at(s)

    out_b = jax.block_until_ready(part_blocked(d9, gidx))
    err = float(jnp.abs(out_b - ref).max())
    print(f"{'route: sort+blocked-cumsum':34s}: "
          f"{timeit(part_blocked, d9, gidx):7.2f} ms  max|diff| {err:.1e}",
          flush=True)

    # ---- 3. boundary gather layout: per-plane lane gathers ---------------
    @jax.jit
    def part_full_lane(d, gidx):
        rows = jnp.arange(NC, dtype=jnp.int32)
        gkey = jnp.where(rows < v_real, gidx, jnp.int32(P))
        out = jax.lax.sort((gkey,) + tuple(d[c] for c in range(9)),
                           num_keys=1)
        e = jnp.minimum(ends_g, NC)
        s = jnp.minimum(ends_g - counts_g, NC)
        res = []
        for c in range(9):
            cum = jnp.cumsum(out[1 + c])
            cum0 = jnp.concatenate([jnp.zeros((1,), cum.dtype), cum])
            res.append(cum0[e] - cum0[s])
        return jnp.stack(res, axis=-1)

    out_l = jax.block_until_ready(part_full_lane(d9, gidx))
    err = float(jnp.abs(out_l - ref).max())
    print(f"{'route: per-plane 1-D cumsum+gather':34s}: "
          f"{timeit(part_full_lane, d9, gidx):7.2f} ms  max|diff| {err:.1e}",
          flush=True)

    # ---- 4. searchsorted: scan_unrolled vs dense block-max matmul --------
    tiles_np = np.sort(rng.integers(0, n_tiles, size=NC)).astype(np.int32)
    tiles_c = jnp.asarray(tiles_np)
    q = jnp.arange(n_tiles + 1, dtype=jnp.int32)

    ss1 = jax.jit(lambda tc: jnp.searchsorted(
        tc, q, method="scan_unrolled").astype(jnp.int32))
    ref_ss = np.asarray(jax.block_until_ready(ss1(tiles_c)))
    print(f"{'starts: searchsorted scan_unrolled':34s}: "
          f"{timeit(ss1, tiles_c):7.2f} ms", flush=True)

    BS = 128  # block width for the dense variant

    @jax.jit
    def ss_dense(tc):
        blk = tc.reshape(NC // BS, BS)  # [NB, BS]
        bmax = blk[:, -1]  # block maxima (sorted input)
        # full blocks strictly below each query: bmax[b] < t  ->  whole
        # block < t (sorted). [NB, Q] compare + MXU column-sum.
        lt = (bmax[:, None] < q[None, :]).astype(jnp.bfloat16)
        nfull = jax.lax.dot_general(
            jnp.ones((1, NC // BS), jnp.bfloat16), lt,
            (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)[0].astype(jnp.int32)
        # the boundary block is exactly block nfull (clamped); count its
        # elements < t with one row gather + compare-reduce
        b = jnp.minimum(nfull, NC // BS - 1)
        rowsb = blk[b]  # [Q, BS]
        part = (rowsb < q[:, None]).sum(axis=1).astype(jnp.int32)
        inside = nfull < NC // BS
        return jnp.where(inside, nfull * BS + part, NC)

    got = np.asarray(jax.block_until_ready(ss_dense(tiles_c)))
    assert (got == ref_ss).all(), (got[:8], ref_ss[:8])
    print(f"{'starts: dense block-max + matmul':34s}: "
          f"{timeit(ss_dense, tiles_c):7.2f} ms  (exact)", flush=True)


if __name__ == "__main__":
    main()
