"""Pallas tile-rasterizer kernels: forward + analytic backward.

The jnp tiled path (tiles.py) and the round-1 aligned-layout glue both drown
in XLA gathers: on TPU a 1D gather executes at ~7.5 ns/element and a row
gather of per-pair records costs 50-80 ms at Mip-360 scale. Sorts, by
contrast, are fast and payload-width-insensitive (2 keys + 10 f32 payloads of
2.36M elements: 9.4 ms — barely above the 8.8 ms key-only sort). So this path
contains NO large gathers:

  1. per-gaussian records are EXPANDED to pre-sort pair slots by broadcast +
     reshape (pure data formatting, ~150 GB/s; the VJP is a reshape-sum),
  2. ONE 2-key sort (tile major, depth-rank minor) carries the 9 record
     planes + the pre-sort index as payloads, producing per-tile depth-ordered
     contiguous segments directly (custom VJP: a second payload sort routes
     plane cotangents back to pre-sort order — scatter- and gather-free),
  3. the kernels stream each tile's COMPACT segment [starts[t], starts[t]+
     count) from the stacked [16, N] plane matrix; Mosaic lane-offset
     alignment is handled in-kernel by DMAing the KB-aligned enclosing chunks
     and masking the leading/trailing foreign lanes (adjacent tiles re-read
     one boundary chunk each; the backward read-merge-writes its first chunk
     so neighbours' gradients survive, relying on sequential grid execution —
     dimension_semantics "arbitrary").

Kernel structure per chunk of KB pairs — FULLY PARALLEL compositing (no
serial transmittance loop):
  1. vectorized alpha: [KB, 256] from field columns broadcast against the
     pixel vector (pure VPU),
  2. log-transmittance via sublane log-step cumsum of log(1-a): with
     Tplain = the plain running product, the CUDA stop test
     Tplain*(1-a) < 1e-4 is MONOTONE (once true it stays true, since every
     later Tplain <= the violating product), so the serial done-latch is
     exactly `cumsum(stop) > 0` and w_i = a_i * Tser_i * contribute_i where
     Tser only multiplies contributing factors — bit-faithful to the
     sequential replay, computed in O(log KB) shifted adds,
  3. color application / color gradients as MXU matmuls over the chunk.
HBM chunk fetches are double-buffered (next chunk's DMA issued before
computing the current one).

Backward math (standard 3DGS):
  C = sum_i c_i a_i T_i,  T_i = prod_{j<i}(1-a_j),  T_fin = prod_i(1-a_i)
  dL/da_i = <dC, c_i> T_i - <dC, C - A_i>/(1-a_i) - <dT> T_fin/(1-a_i)
  dL/dc_i = sum_pix dC * w_i
with A_i the inclusive prefix of color contributions; one front-to-back replay
recovers everything from the forward's final (C, T) residuals. The early-stop
rule (contribution only while T*(1-a) >= 1e-4, CUDA `done` ordering) replays
identically, so stopped gaussians get zero grads.

Record planes (rows of the [16, N] matrix; 9 live + 7 padding):
0:x 1:y 2:conA 3:conB 4:conC 5:r 6:g 7:b 8:opacity. Means are ABSOLUTE pixel
coordinates; each kernel instance subtracts its tile origin from rows 0-1
before the MXU transpose so the bf16x3 split keeps ~1e-6 px accuracy.

Replaces the diff-gaussian-rasterization CUDA submodule (interface
reconstructed from /root/reference/gaussian_renderer/__init__.py:36-93).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from sixdgs_tpu.ops.rasterizer.compositing import ALPHA_MAX, ALPHA_MIN, T_EPS
from sixdgs_tpu.ops.rasterizer.projection import ProjectedGaussians
from sixdgs_tpu.ops.rasterizer.tiles import RECORD, _make_pair_keys, _permute

COLS = 16  # padded record planes (sublane dim of the [16, N] matrix)
KB = 128  # pairs per DMA chunk (lane-dim tiling alignment)
TILE = 16
NPIX = TILE * TILE


def _cumsum_sublane(x):
    """Inclusive cumsum along axis 0 of [KB, N]: log2(KB) shifted adds
    (static slices — Mosaic lowers these as sublane shifts)."""
    kb = x.shape[0]
    s = 1
    while s < kb:
        x = x + jnp.concatenate(
            [jnp.zeros((s, x.shape[1]), x.dtype), x[:-s, :]], axis=0)
        s *= 2
    return x


def _cumprod_sublane(x):
    """Inclusive cumprod along axis 0 of [KB, N]: log2(KB) shifted multiplies
    (no log/exp roundtrip — same f32 error class as a sequential product)."""
    kb = x.shape[0]
    s = 1
    while s < kb:
        x = x * jnp.concatenate(
            [jnp.ones((s, x.shape[1]), x.dtype), x[:-s, :]], axis=0)
        s *= 2
    return x


def _excl(inc, fill):
    """Shift an inclusive scan down one row -> exclusive scan."""
    return jnp.concatenate(
        [jnp.full((1, inc.shape[1]), fill, inc.dtype), inc[:-1, :]], axis=0)


def _composite_chunk(alpha, Tser, Tpl):
    """Parallel replay of the sequential front-to-back compositing over one
    [KB, 256] alpha chunk given carries Tser (serial transmittance) and Tpl
    (plain running product), both [1, 256].

    The CUDA stop test Tplain*(1-a) < T_EPS is monotone in the row index
    (every later plain product <= the violating one), so the serial done
    latch is exactly cumsum(stop) > 0; Tser multiplies only contributing
    factors. Returns (w, Tser_i, contribute, new_Tser, new_Tpl)."""
    one_minus = 1.0 - alpha
    incP = _cumprod_sublane(one_minus)
    Tpl_i = Tpl * _excl(incP, 1.0)  # exclusive plain transmittance
    stop = (Tpl_i * one_minus < T_EPS).astype(jnp.float32)
    contribute = (_cumsum_sublane(stop) < 0.5).astype(jnp.float32)
    fser = one_minus * contribute + (1.0 - contribute)
    incS = _cumprod_sublane(fser)
    Tser_i = Tser * _excl(incS, 1.0)  # exclusive serial transmittance
    w = alpha * Tser_i * contribute
    return w, Tser_i, contribute, Tser * incS[-1:, :], Tpl * incP[-1:, :]


def _pixel_coords():
    """Tile-LOCAL pixel coords [1, 256]."""
    lin = jax.lax.broadcasted_iota(jnp.int32, (1, NPIX), 1)
    px = (lin % TILE).astype(jnp.float32)
    py = (lin // TILE).astype(jnp.float32)
    return px, py


def _transpose_matmul(x, out_rows):
    """[R, C] -> [C, R] via an MXU matmul with an identity (Mosaic-safe;
    lax.transpose of narrow tiles doesn't lower)."""
    c = x.shape[1]
    i = jax.lax.broadcasted_iota(jnp.int32, (out_rows, c), 0)
    j = jax.lax.broadcasted_iota(jnp.int32, (out_rows, c), 1)
    ident = (i == j).astype(jnp.float32)  # [C, C] when out_rows == c
    return jax.lax.dot_general(
        ident, x,
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST,
    )  # [out_rows, R]


def _chunk_alpha(buf, px, py, lo, hi):
    """Vectorized per-chunk alphas [KB, 256] + intermediates.

    buf: [KB, COLS] record rows for this chunk; valid lanes are [lo, hi)."""
    xs = buf[:, 0:1]
    ys = buf[:, 1:2]
    conA = buf[:, 2:3]
    conB = buf[:, 3:4]
    conC = buf[:, 4:5]
    opac = buf[:, 8:9]
    dx = px - xs  # [KB, 256]
    dy = py - ys
    power = -0.5 * (conA * dx * dx + conC * dy * dy) - conB * dx * dy
    g_raw = jnp.exp(power)
    alpha = jnp.minimum(ALPHA_MAX, opac * g_raw)
    k_ids = jax.lax.broadcasted_iota(jnp.int32, (KB, 1), 0)
    live = (power <= 0.0) & (alpha >= ALPHA_MIN) & (k_ids >= lo) & (k_ids < hi)
    alpha = jnp.where(live, alpha, 0.0)
    return alpha, g_raw, dx, dy, live


def _segment_bounds(start, count):
    """(base, lead, n_chunks) for a compact segment [start, start+count)."""
    base = pl.multiple_of((start // KB) * KB, KB)
    lead = start - base
    n_chunks = jnp.where(count > 0, pl.cdiv(lead + count, KB), 0)
    return base, lead, n_chunks


def _read_dma(records_hbm, tbuf, sem, base, ci, slot):
    """Async copy of the KB-aligned chunk ci of a segment into tbuf[slot]."""
    return pltpu.make_async_copy(
        records_hbm.at[:, pl.ds(pl.multiple_of(base + ci * KB, KB), KB)],
        tbuf.at[slot], sem.at[slot],
    )


def _first_chunk_prefetch(starts_ref, counts_ref, records_hbm, tbuf, sem, t,
                          base, n_chunks):
    """Cross-instance pipelining of each tile's FIRST chunk: tbuf slots 0/1
    stream within the instance; slots 2/3 (by tile parity) hold chunk 0,
    prefetched by the PREVIOUS grid instance so the per-tile DMA stall is
    hidden (instance 0 self-starts). Returns chunk 0's slot for this tile."""
    my0 = 2 + jax.lax.rem(t, 2)

    @pl.when((t == 0) & (n_chunks > 0))
    def _():
        _read_dma(records_hbm, tbuf, sem, base, 0, my0).start()

    @pl.when(t + 1 < pl.num_programs(0))
    def _():
        nstart = starts_ref[t + 1]
        ncount = counts_ref[t + 1]
        nbase, _, nn = _segment_bounds(nstart, ncount)

        @pl.when(nn > 0)
        def _():
            _read_dma(records_hbm, tbuf, sem, nbase, 0,
                      2 + jax.lax.rem(t + 1, 2)).start()

    return my0


def _fwd_kernel(starts_ref, counts_ref, nx_ref, records_hbm, color_ref,
                trans_ref, tbuf, sem):
    t = pl.program_id(0)
    start = starts_ref[t]
    count = counts_ref[t]
    base, lead, n_chunks = _segment_bounds(start, count)
    px, py = _pixel_coords()
    nx = nx_ref[0]
    ox = ((t % nx) * TILE).astype(jnp.float32)
    oy = ((t // nx) * TILE).astype(jnp.float32)

    def dma(ci, slot):
        return _read_dma(records_hbm, tbuf, sem, base, ci, slot)

    my0 = _first_chunk_prefetch(starts_ref, counts_ref, records_hbm, tbuf,
                                sem, t, base, n_chunks)

    def chunk_body(ci, carry):
        Tser, Tpl, C = carry  # [1, 256], [1, 256], [3, 256]
        slot = jnp.where(ci == 0, my0, jax.lax.rem(ci, 2))

        @pl.when(ci + 1 < n_chunks)
        def _():
            dma(ci + 1, jax.lax.rem(ci + 1, 2)).start()

        dma(ci, slot).wait()
        rid = jax.lax.broadcasted_iota(jnp.int32, (COLS, KB), 0)
        off = jnp.where(rid == 0, ox, 0.0) + jnp.where(rid == 1, oy, 0.0)
        buf = _transpose_matmul(tbuf[slot] - off, KB)  # [KB, COLS]
        lo = jnp.maximum(lead - ci * KB, 0)
        hi = lead + count - ci * KB
        alpha, _, _, _, _ = _chunk_alpha(buf, px, py, lo, hi)
        w, _, _, Tser, Tpl = _composite_chunk(alpha, Tser, Tpl)
        colors = buf[:, 5:8]  # [KB, 3]
        C = C + jax.lax.dot_general(
            colors, w,
            dimension_numbers=(((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST,
        )  # [3, 256]
        return Tser, Tpl, C

    T0 = jnp.ones((1, NPIX), jnp.float32)
    C0 = jnp.zeros((3, NPIX), jnp.float32)
    _, (T, _, C) = jax.lax.while_loop(
        lambda s: s[0] < n_chunks,
        lambda s: (s[0] + 1, chunk_body(s[0], s[1])),
        (0, (T0, jnp.ones((1, NPIX), jnp.float32), C0)),
    )
    color_ref[0] = C
    trans_ref[0] = T


def _bwd_kernel(starts_ref, counts_ref, nx_ref, records_hbm, color_ref,
                trans_ref, dcolor_ref, dtrans_ref, dpairs_hbm, tbuf, gbuf,
                obuf, sem, gsem, osem):
    t = pl.program_id(0)
    start = starts_ref[t]
    count = counts_ref[t]
    base, lead, n_chunks = _segment_bounds(start, count)
    px, py = _pixel_coords()
    nx = nx_ref[0]
    ox = ((t % nx) * TILE).astype(jnp.float32)
    oy = ((t // nx) * TILE).astype(jnp.float32)

    C_total = color_ref[0]  # [3, 256]
    T_fin = trans_ref[0]  # [1, 256]
    dC = dcolor_ref[0]  # [3, 256]
    dT = dtrans_ref[0]  # [1, 256]
    dCC = jnp.sum(dC * C_total, axis=0, keepdims=True)  # [1, 256]
    dTT = dT * T_fin  # [1, 256]

    def dma(ci, slot):
        return _read_dma(records_hbm, tbuf, sem, base, ci, slot)

    def dma_w(ci, gslot):
        return pltpu.make_async_copy(
            gbuf.at[gslot],
            dpairs_hbm.at[:, pl.ds(pl.multiple_of(base + ci * KB, KB), KB)],
            gsem.at[gslot],
        )

    my0 = _first_chunk_prefetch(starts_ref, counts_ref, records_hbm, tbuf,
                                sem, t, base, n_chunks)

    def chunk_body(ci, carry):
        Tser, Tpl, acc = carry  # transmittances, prefix of <dC, c_j> w_j
        slot = jnp.where(ci == 0, my0, jax.lax.rem(ci, 2))

        @pl.when(ci + 1 < n_chunks)
        def _():
            dma(ci + 1, jax.lax.rem(ci + 1, 2)).start()

        dma(ci, slot).wait()
        rid = jax.lax.broadcasted_iota(jnp.int32, (COLS, KB), 0)
        off = jnp.where(rid == 0, ox, 0.0) + jnp.where(rid == 1, oy, 0.0)
        buf = _transpose_matmul(tbuf[slot] - off, KB)  # [KB, COLS]
        lo = jnp.maximum(lead - ci * KB, 0)
        hi = lead + count - ci * KB
        alpha, g_raw, dx, dy, live = _chunk_alpha(buf, px, py, lo, hi)
        colors = buf[:, 5:8]  # [KB, 3]
        dbuf = jnp.dot(colors, dC, preferred_element_type=jnp.float32,
                       precision=jax.lax.Precision.HIGHEST)  # [KB, 256]

        w, Tser_i, contribute, Tser, Tpl = _composite_chunk(alpha, Tser, Tpl)
        # inclusive prefix of <dC, c_j> w_j, replayed in parallel
        acc_i = acc + _cumsum_sublane(dbuf * w)  # [KB, 256]
        one_minus = jnp.maximum(1.0 - alpha, 1e-6)
        da_all = dbuf * Tser_i - (dCC - acc_i) / one_minus - dTT / one_minus
        da_all = jnp.where((contribute > 0.0) & (alpha > 0.0), da_all, 0.0)
        acc = acc_i[-1:, :]

        # vectorized chain rule over the chunk
        opac = buf[:, 8:9]
        conA = buf[:, 2:3]
        conB = buf[:, 3:4]
        conC = buf[:, 4:5]
        clamped = (opac * g_raw) > ALPHA_MAX
        da_all = jnp.where(clamped | (~live), 0.0, da_all)
        dopac = jnp.sum(da_all * g_raw, axis=1, keepdims=True)  # [KB, 1]
        dpower = da_all * g_raw * opac
        dconA = jnp.sum(dpower * (-0.5 * dx * dx), axis=1, keepdims=True)
        dconB = jnp.sum(dpower * (-dx * dy), axis=1, keepdims=True)
        dconC = jnp.sum(dpower * (-0.5 * dy * dy), axis=1, keepdims=True)
        dpow_dx = dpower * (-(conA * dx + conB * dy))
        dpow_dy = dpower * (-(conC * dy + conB * dx))
        dmx = -jnp.sum(dpow_dx, axis=1, keepdims=True)
        dmy = -jnp.sum(dpow_dy, axis=1, keepdims=True)
        dcol = jax.lax.dot_general(
            w, dC,
            dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST,
        )  # [KB, 3]

        gvals = jnp.concatenate(
            [dmx, dmy, dconA, dconB, dconC, dcol, dopac,
             jnp.zeros((KB, COLS - 9), jnp.float32)],
            axis=1,
        )  # [KB, COLS]
        lane = jax.lax.broadcasted_iota(jnp.int32, (COLS, KB), 1)
        gnew = _transpose_matmul(gvals, COLS)  # [COLS, KB]
        # boundary chunk: lanes < lo belong to the PREVIOUS tile which already
        # wrote (and completed: it drains its writes before finishing) its
        # gradients here — read-merge-write (sequential grid)
        @pl.when(lo > 0)
        def _():
            pltpu.make_async_copy(
                dpairs_hbm.at[:, pl.ds(pl.multiple_of(base + ci * KB, KB), KB)],
                obuf, osem,
            ).start()
            pltpu.make_async_copy(
                dpairs_hbm.at[:, pl.ds(pl.multiple_of(base + ci * KB, KB), KB)],
                obuf, osem,
            ).wait()

        @pl.when(lo <= 0)
        def _():
            obuf[:] = jnp.zeros((COLS, KB), jnp.float32)

        # lazy double-buffered write-back: reclaim a gbuf slot only when the
        # write issued two chunks ago has drained (instead of stalling on
        # every chunk's write latency)
        gslot = jax.lax.rem(ci, 2)

        @pl.when(ci >= 2)
        def _():
            dma_w(ci - 2, gslot).wait()

        gbuf[gslot] = jnp.where(lane < lo, obuf[:], gnew)
        dma_w(ci, gslot).start()
        return Tser, Tpl, acc

    T0 = jnp.ones((1, NPIX), jnp.float32)
    acc0 = jnp.zeros((1, NPIX), jnp.float32)
    jax.lax.while_loop(
        lambda s: s[0] < n_chunks,
        lambda s: (s[0] + 1, chunk_body(s[0], s[1])),
        (0, (T0, jnp.ones((1, NPIX), jnp.float32), acc0)),
    )
    # drain outstanding gradient writes before the next instance reads its
    # boundary chunk
    @pl.when(n_chunks >= 2)
    def _():
        dma_w(n_chunks - 2, jax.lax.rem(n_chunks - 2, 2)).wait()

    @pl.when(n_chunks >= 1)
    def _():
        dma_w(n_chunks - 1, jax.lax.rem(n_chunks - 1, 2)).wait()


def pallas_composite_fwd(records: jnp.ndarray, starts: jnp.ndarray,
                         counts: jnp.ndarray, nx: int, ny: int,
                         interpret: bool = False):
    """records: [16, N] sorted record planes (compact per-tile segments);
    starts [n_tiles+1]; counts [n_tiles].
    Returns (color [n_tiles,3,256], trans [n_tiles,1,256])."""
    n_tiles = nx * ny
    color, trans = pl.pallas_call(
        _fwd_kernel,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=3,
            grid=(n_tiles,),
            in_specs=[pl.BlockSpec(memory_space=pl.ANY)],
            out_specs=(
                pl.BlockSpec((1, 3, NPIX), lambda t, *_: (t, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, 1, NPIX), lambda t, *_: (t, 0, 0),
                             memory_space=pltpu.VMEM),
            ),
            scratch_shapes=[
                # slots 0/1: in-instance streaming; 2/3: cross-instance
                # first-chunk prefetch (by tile parity)
                pltpu.VMEM((4, COLS, KB), jnp.float32),  # tbuf
                pltpu.SemaphoreType.DMA((4,)),
            ],
        ),
        compiler_params=pltpu.CompilerParams(
            # cross-instance first-chunk prefetch requires sequential grid
            # execution (single-core v5e runs it sequentially regardless)
            dimension_semantics=("arbitrary",)
        ),
        out_shape=(
            jax.ShapeDtypeStruct((n_tiles, 3, NPIX), jnp.float32),
            jax.ShapeDtypeStruct((n_tiles, 1, NPIX), jnp.float32),
        ),
        interpret=interpret,
    )(starts, counts, jnp.asarray([nx], jnp.int32), records)
    return color, trans


def pallas_composite_bwd(records, starts, counts, nx: int, ny: int, color,
                         trans, dcolor, dtrans, interpret: bool = False):
    """Per-pair gradients [16, N] (same compact layout as records).

    Boundary chunks are read-merge-written, so the grid must execute
    sequentially ("arbitrary" semantics — single-core v5e anyway)."""
    n_tiles = nx * ny
    n_pairs = records.shape[1]
    dpairs = pl.pallas_call(
        _bwd_kernel,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=3,
            grid=(n_tiles,),
            in_specs=[
                pl.BlockSpec(memory_space=pl.ANY),
                pl.BlockSpec((1, 3, NPIX), lambda t, *_: (t, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, 1, NPIX), lambda t, *_: (t, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, 3, NPIX), lambda t, *_: (t, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, 1, NPIX), lambda t, *_: (t, 0, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec(memory_space=pl.ANY),
            scratch_shapes=[
                pltpu.VMEM((4, COLS, KB), jnp.float32),  # tbuf (stream+prefetch)
                pltpu.VMEM((2, COLS, KB), jnp.float32),  # gbuf (lazy writes)
                pltpu.VMEM((COLS, KB), jnp.float32),  # obuf (RMW neighbour)
                pltpu.SemaphoreType.DMA((4,)),  # sem (reads)
                pltpu.SemaphoreType.DMA((2,)),  # gsem (writes)
                pltpu.SemaphoreType.DMA(()),  # osem (RMW read)
            ],
        ),
        out_shape=jax.ShapeDtypeStruct((COLS, n_pairs), jnp.float32),
        compiler_params=pltpu.CompilerParams(
            has_side_effects=True, dimension_semantics=("arbitrary",)
        ),
        interpret=interpret,
    )(starts, counts, jnp.asarray([nx], jnp.int32), records, color, trans,
      dcolor, dtrans)
    return dpairs


# ------------------------------------------------------------- full wrapper


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4, 5))
def _composite(records, starts, counts, nx, ny, interpret):
    return pallas_composite_fwd(records, starts, counts, nx, ny,
                                interpret=interpret)


def _composite_fwd(records, starts, counts, nx, ny, interpret):
    color, trans = pallas_composite_fwd(records, starts, counts, nx, ny,
                                        interpret=interpret)
    return (color, trans), (records, starts, counts, color, trans)


def _composite_bwd(nx, ny, interpret, res, grads):
    records, starts, counts, color, trans = res
    dcolor, dtrans = grads
    dpairs = pallas_composite_bwd(
        records, starts, counts, nx, ny, color, trans, dcolor, dtrans,
        interpret=interpret,
    )
    # lanes past the last valid pair were never written (uninitialized HBM)
    n_real = starts[-1]
    lane = jnp.arange(dpairs.shape[1], dtype=jnp.int32)
    dpairs = jnp.where((lane < n_real)[None, :], dpairs, 0.0)
    return dpairs, None, None


_composite.defvjp(_composite_fwd, _composite_bwd)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4))
def _sort_planes(tile_ids, pair_gidx, planes, n_tiles=1 << 30, P=1 << 30):
    """(tile major, depth minor) sort carrying the record planes (tuple of
    [N] f32) + pre-sort index. Uses ONE fused i32 key when n_tiles/P bit
    budgets allow (saves a payload permutation pass vs a 2-key sort).
    Returns (sorted_tiles, sorted_planes, pair_order)."""
    from sixdgs_tpu.ops.rasterizer.tiles import _fused_tile_key

    n = tile_ids.shape[0]
    iota = jnp.arange(n, dtype=jnp.int32)
    key, gbits = _fused_tile_key(tile_ids, pair_gidx, n_tiles, P)
    if key is not None:
        out = jax.lax.sort((key,) + tuple(planes) + (iota,), num_keys=1)
        sorted_tiles = jax.lax.shift_right_logical(out[0], gbits)
        return sorted_tiles, tuple(out[1:-1]), out[-1]
    out = jax.lax.sort((tile_ids, pair_gidx) + tuple(planes) + (iota,),
                       num_keys=2, is_stable=True)
    return out[0], tuple(out[2:-1]), out[-1]


def _sort_planes_fwd(tile_ids, pair_gidx, planes, n_tiles, P):
    res = _sort_planes(tile_ids, pair_gidx, planes, n_tiles, P)
    return res, res[2]  # pair_order


def _sort_planes_bwd(n_tiles, P, pair_order, grads):
    _, dplanes, _ = grads
    # route plane cotangents back to pre-sort order with ONE key-value sort
    # (out[perm[s]] = payload[s]); scatter- and gather-free
    out = jax.lax.sort((pair_order,) + tuple(dplanes), num_keys=1)
    return None, None, tuple(out[1:])


_sort_planes.defvjp(_sort_planes_fwd, _sort_planes_bwd)


def _expand_presort_planes(records, mid_idx, big_idx, t_max: int,
                           t_max_mid: int, t_max_big: int):
    """[P, 9] records -> tuple of 9 pre-sort pair planes
    [P*t_max + K2*t_max_mid + K*t_max_big].

    Broadcast + reshape only (differentiable; the VJP is a reshape-sum plus
    tiny tier-row scatter-adds) — replaces the per-pair row gather."""
    P = records.shape[0]
    K2 = mid_idx.shape[0]
    K = big_idx.shape[0]
    mid_records = records[mid_idx]  # [K2, 9] (tiny gather)
    big_records = records[big_idx]  # [K, 9] (tiny gather)
    planes = []
    for c in range(RECORD):
        main = jnp.broadcast_to(records[:, c][:, None], (P, t_max)).reshape(-1)
        mid = jnp.broadcast_to(
            mid_records[:, c][:, None], (K2, t_max_mid)).reshape(-1)
        big = jnp.broadcast_to(
            big_records[:, c][:, None], (K, t_max_big)).reshape(-1)
        planes.append(jnp.concatenate([main, mid, big]))
    return tuple(planes)


def rasterize_pallas(
    proj: ProjectedGaussians,
    width: int,
    height: int,
    bg_color: jnp.ndarray,
    t_max: int = 16,
    interpret: bool = False,
    overflow_k: int = 256,
    t_max_big: int = 1024,
    mid_k: int = 4096,
    t_max_mid: int = 64,
) -> jnp.ndarray:
    """Tile-binned rasterization via the Pallas kernels -> [3, H, W].

    Same three-tier binning as tiles.rasterize_tiled; compositing + backward
    run in the hand-written kernels (no k_max truncation)."""
    nx = -(-width // TILE)
    ny = -(-height // TILE)
    n_tiles = nx * ny

    visible = proj.radii > 0
    order = jnp.argsort(jnp.where(visible, proj.depths, jnp.inf))
    inv_gorder = jnp.argsort(order)
    opac_all = jnp.where(visible, proj.opacities, 0.0)
    P = proj.means2d.shape[0]
    overflow_k = min(overflow_k, P)
    mid_k = min(mid_k, max(P - overflow_k, 0))

    records = _permute(
        jnp.concatenate(
            [proj.means2d, proj.conics, proj.colors, opac_all[:, None]],
            axis=-1,
        ),
        order,
        inv_gorder,
    )  # depth-ordered [P, 9], scatter-free VJP

    means2d_sorted = jax.lax.stop_gradient(records[:, 0:2])
    radii_f = proj.radii[order].astype(jnp.float32)
    vis = visible[order]
    tile_ids, pair_gidx, mid_idx, mid_ok, big_idx, big_ok = _make_pair_keys(
        means2d_sorted, radii_f, vis, nx, ny, TILE, t_max,
        overflow_k=overflow_k, t_max_big=t_max_big,
        mid_k=mid_k, t_max_mid=t_max_mid,
    )
    del mid_ok, big_ok  # invalid tier rows carry the n_tiles sentinel already

    presort_planes = _expand_presort_planes(records, mid_idx, big_idx, t_max,
                                            t_max_mid, t_max_big)
    sorted_tiles, sorted_planes, _ = _sort_planes(
        tile_ids, pair_gidx, presort_planes, n_tiles, P
    )
    starts = jnp.searchsorted(
        sorted_tiles, jnp.arange(n_tiles + 1, dtype=jnp.int32)
    ).astype(jnp.int32)
    counts = starts[1:] - starts[:-1]

    # stack planes into the [16, N] matrix the kernels DMA from
    n_pairs = tile_ids.shape[0]
    zeros = jnp.zeros((COLS - RECORD, n_pairs), jnp.float32)
    records_t = jnp.concatenate(
        [jnp.stack(sorted_planes, axis=0), zeros], axis=0
    )  # [16, N]

    color, trans = _composite(records_t, starts, counts, nx, ny, interpret)
    out_tiles = color + trans * bg_color[None, :, None]  # [n_tiles, 3, 256]
    img = out_tiles.reshape(ny, nx, 3, TILE, TILE)
    img = img.transpose(2, 0, 3, 1, 4).reshape(3, ny * TILE, nx * TILE)
    return img[:, :height, :width]
