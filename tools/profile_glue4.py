"""Round-4 micro-benchmarks for the remaining XLA glue in the raster step.

Questions this answers on the real chip (numbers recorded in BASELINE.md):
  1. What does the PRODUCTION _gather_pairs backward (perm-sort + row gather
     + cumsum + boundary diff) cost in context, vs the round-3 micro's 2.8x
     claim — and is the d.T[perm] row gather on a transposed operand the
     reason the train step didn't move?
  2. Compact row gather variants: [P,9] row gather + .T vs [P,16] row gather
     (transaction-efficiency identical, concat removed) vs plane-major lane
     gather records.T[:, gidx] (9 gathers from a 512 KB VMEM-resident table).
  3. Depth stage components: argsort, scatter-iota inverse vs sort inverse,
     record permute.
  4. u32 key-sort scaling with slot count (is the sort ~linear, i.e. does a
     slot-count cut pay proportionally?).
  5. searchsorted over the sorted compact tiles: one-shot scan_unrolled vs a
     two-level search (4096-entry VMEM subtable + short refine).

Run: PYTHONPATH=/root/.axon_site:. python tools/profile_glue4.py
"""

import sys

import numpy as np
import jax
import jax.numpy as jnp

sys.path.insert(0, "tools")
from tputime import chained_ms, seq_dep  # noqa: E402


def timeit(fn, *args, n=20, warmup=3):
    """Chained + host-fetch timing (see tools/tputime.py: plain
    block_until_ready loops can report dispatch time over the tunnel)."""

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

    # ---- production-shaped routing inputs: d [16, NC] plane-major from the
    # backward kernel, gidx piecewise-ascending (tile-major sort order)
    tile_of = np.sort(rng.integers(0, n_tiles, size=NC))
    gidx_np = np.empty(NC, np.int32)
    # within each tile segment ranks ascend: emulate with sorted samples
    start = 0
    for t in range(0, NC, 65536):  # coarse emulation: sorted blocks
        end = min(t + 65536, NC)
        gidx_np[t:end] = np.sort(rng.integers(0, P, size=end - t))
        start = end
    d16 = jnp.asarray(rng.normal(size=(16, NC)).astype(np.float32))
    d9 = d16[:9]
    gidx = jnp.asarray(gidx_np)
    counts = np.bincount(gidx_np, minlength=P).astype(np.int32)
    ends_g = jnp.asarray(np.cumsum(counts).astype(np.int32))
    counts_g = jnp.asarray(counts)
    v_real = jnp.int32(NC)

    def boundaries(cum0):
        hi = cum0[jnp.minimum(ends_g, NC)]
        lo = cum0[jnp.minimum(ends_g - counts_g, NC)]
        return hi - lo

    @jax.jit
    def route_prod(d, gidx):
        rows = jnp.arange(NC, dtype=jnp.int32)
        gkey = jnp.where(rows < v_real, gidx, jnp.int32(P))
        _, perm = jax.lax.sort((gkey, rows), num_keys=1)
        cum = jnp.cumsum(d.T[perm], axis=0)
        cum0 = jnp.concatenate([jnp.zeros((1, 9), cum.dtype), cum], axis=0)
        return boundaries(cum0)

    @jax.jit
    def route_pret(d, gidx):
        # materialize the transpose FIRST so the row gather reads contiguous
        # rows (no gather-of-strided-columns fusion)
        rows = jnp.arange(NC, dtype=jnp.int32)
        _, perm = jax.lax.sort((gidx, rows), num_keys=1)
        dT = jax.lax.optimization_barrier(d.T)
        cum = jnp.cumsum(dT[perm], axis=0)
        cum0 = jnp.concatenate([jnp.zeros((1, 9), cum.dtype), cum], axis=0)
        return boundaries(cum0)

    @jax.jit
    def route_lane(d, gidx):
        rows = jnp.arange(NC, dtype=jnp.int32)
        _, perm = jax.lax.sort((gidx, rows), num_keys=1)
        ds = d[:, perm]
        cum = jnp.cumsum(ds, axis=1)
        zero = jnp.zeros((9, 1), cum.dtype)
        cum0 = jnp.concatenate([zero, cum], axis=1)
        hi = cum0[:, jnp.minimum(ends_g, NC)]
        lo = cum0[:, jnp.minimum(ends_g - counts_g, NC)]
        return (hi - lo).T

    @jax.jit
    def route_sort9(d, gidx):
        out = jax.lax.sort((gidx,) + tuple(d[c] for c in range(9)), num_keys=1)
        cum = jnp.cumsum(jnp.stack(out[1:], axis=-1), axis=0)
        cum0 = jnp.concatenate([jnp.zeros((1, 9), cum.dtype), cum], axis=0)
        return boundaries(cum0)

    ref = route_sort9(d9, gidx)
    for name, fn, dd in (("route sort9 (r2)", route_sort9, d9),
                         ("route prod d.T[perm]", route_prod, d9),
                         ("route pre-T barrier", route_pret, d9),
                         ("route lane d[:,perm]", route_lane, d9)):
        out = fn(dd, gidx)
        err = float(jnp.abs(out - ref).max())
        print(f"{name:26s}: {timeit(fn, dd, gidx):7.2f} ms  "
              f"max|diff| {err:.1e}", flush=True)

    # ---- compact row gather variants
    rec9 = jnp.asarray(rng.normal(size=(P, 9)).astype(np.float32))
    rec16 = jnp.concatenate([rec9, jnp.zeros((P, 7), jnp.float32)], axis=1)
    rec_pm = jnp.asarray(np.ascontiguousarray(np.asarray(rec9).T))  # [9, P]
    gc = jnp.asarray(gidx_np)

    @jax.jit
    def gather_rows9(rec, gc):
        r = rec[gc].T
        return jnp.concatenate([r, jnp.zeros((7, NC), jnp.float32)], axis=0)

    @jax.jit
    def gather_rows16(rec, gc):
        return rec[gc].T

    @jax.jit
    def gather_lane(rec_pm, gc):
        r = rec_pm[:, gc]
        return jnp.concatenate([r, jnp.zeros((7, NC), jnp.float32)], axis=0)

    a = gather_rows9(rec9, gc)
    for name, fn, arg in (("gather rows [P,9]+.T+cat", gather_rows9, rec9),
                          ("gather rows [P,16]+.T", gather_rows16, rec16),
                          ("gather lanes [9,P][:,gc]", gather_lane, rec_pm)):
        out = fn(arg, gc)
        err = float(jnp.abs(out - a).max())
        print(f"{name:26s}: {timeit(fn, arg, gc):7.2f} ms  "
              f"max|diff| {err:.1e}", flush=True)

    # ---- depth stage components
    depths = jnp.asarray(rng.normal(size=P).astype(np.float32))

    argsort = jax.jit(lambda dep: jnp.argsort(dep))
    order = jax.block_until_ready(argsort(depths))
    print(f"{'depth argsort [P]':26s}: {timeit(argsort, depths):7.2f} ms",
          flush=True)

    @jax.jit
    def inv_scatter(order):
        iota = jnp.arange(P, dtype=order.dtype)
        return jnp.zeros(P, order.dtype).at[order].set(
            iota, unique_indices=True, indices_are_sorted=False)

    @jax.jit
    def inv_sort(order):
        iota = jnp.arange(P, dtype=jnp.int32)
        _, inv = jax.lax.sort((order.astype(jnp.int32), iota), num_keys=1)
        return inv

    ia = jax.block_until_ready(inv_scatter(order))
    ib = jax.block_until_ready(inv_sort(order))
    assert (np.asarray(ia) == np.asarray(ib)).all()
    print(f"{'inverse perm: scatter':26s}: {timeit(inv_scatter, order):7.2f} ms",
          flush=True)
    print(f"{'inverse perm: sort':26s}: {timeit(inv_sort, order):7.2f} ms",
          flush=True)

    permute = jax.jit(lambda rec, order: rec[order])
    jax.block_until_ready(permute(rec9, order))
    print(f"{'record permute [P,9]':26s}: {timeit(permute, rec9, order):7.2f} ms",
          flush=True)

    # ---- u32 key sort scaling
    for n in (1 << 19, 1 << 20, 1 << 21, 2621440):
        keys = jnp.asarray(rng.integers(0, 1 << 31, size=n, dtype=np.int64)
                           .astype(np.uint32))
        srt = jax.jit(lambda k: jax.lax.sort((k,), num_keys=1)[0])
        jax.block_until_ready(srt(keys))
        print(f"{'u32 keysort n=%d' % n:26s}: {timeit(srt, keys):7.2f} ms",
              flush=True)

    # ---- searchsorted variants over sorted compact tiles
    tiles_c = jnp.asarray(np.sort(rng.integers(0, n_tiles + 1, size=NC))
                          .astype(np.int32))
    q = jnp.arange(n_tiles + 1, dtype=jnp.int32)

    ss1 = jax.jit(lambda tc: jnp.searchsorted(tc, q, method="scan_unrolled")
                  .astype(jnp.int32))
    ref_ss = jax.block_until_ready(ss1(tiles_c))
    print(f"{'searchsorted scan_unrolled':26s}: {timeit(ss1, tiles_c):7.2f} ms",
          flush=True)

    SUB = 4096  # NC / SUB = 256-element refine windows

    @jax.jit
    def ss2(tc):
        stride = NC // SUB
        sub = tc[::stride]  # [SUB] VMEM-resident subtable
        coarse = jnp.searchsorted(sub, q, method="scan_unrolled")
        lo = jnp.maximum(coarse - 1, 0) * stride
        hi = jnp.minimum(coarse * stride, NC)
        # short binary refine: ceil(log2(stride)) rounds
        for _ in range(int(np.ceil(np.log2(stride)))):
            mid = (lo + hi) // 2
            v = tc[jnp.minimum(mid, NC - 1)]
            go_hi = (v < q) & (mid < hi)
            lo = jnp.where(go_hi, mid + 1, lo)
            hi = jnp.where(go_hi, hi, mid)
        return lo.astype(jnp.int32)

    out2 = jax.block_until_ready(ss2(tiles_c))
    err = int(jnp.abs(out2 - ref_ss).max())
    print(f"{'searchsorted two-level':26s}: {timeit(ss2, tiles_c):7.2f} ms  "
          f"max|diff| {err}", flush=True)


if __name__ == "__main__":
    main()
