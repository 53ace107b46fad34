"""Pallas tile-rasterizer kernels: forward + analytic backward.

The jnp tiled path (tiles.py) leaves two structural costs on the table:
  * windowed row-gathers of 36-byte records run far below HBM bandwidth,
  * the compositing scan executes k_max slots for every tile.

Here each tile's pair segment is CONTIGUOUS in the sorted record array, so a
kernel instance (grid over tiles) streams its own segment with sequential DMA,
composites its 16x16 pixels with a while-loop that stops at the segment's true
length (no k_max truncation at all), and — in the backward — writes per-pair
gradients back to its own disjoint segment rows (no atomics, no scatter).

Kernel structure per chunk of KB pairs:
  1. vectorized alpha: [KB, 256] from field columns broadcast against the
     pixel vector (pure VPU),
  2. sequential compositing: fori over KB touching only [1, 256] rows
     (transmittance update + weight row store) — the only serial part,
  3. color application / color gradients as MXU matmuls over the chunk.

Backward math (standard 3DGS):
  C = sum_i c_i a_i T_i,  T_i = prod_{j<i}(1-a_j),  T_fin = prod_i(1-a_i)
  dL/da_i = <dC, c_i> T_i - <dC, C - A_i>/(1-a_i) - <dT> T_fin/(1-a_i)
  dL/dc_i = sum_pix dC * w_i
with A_i the inclusive prefix of color contributions; one front-to-back replay
recovers everything from the forward's final (C, T) residuals. The early-stop
rule (contribution only while T*(1-a) >= 1e-4, CUDA `done` ordering) replays
identically, so stopped gaussians get zero grads.

Record layout: transposed [16, N_aligned] f32 planes; per-tile segments are
KB-aligned (Mosaic lane-dim DMA offsets must be tiling-aligned).
Cols: 0:x 1:y 2:conA 3:conB 4:conC 5:r 6:g 7:b 8:opacity (9..15 padding);
means are stored relative to the owning tile's origin. Gradients use the same
layout.

Measured on one v5e at Mip-360 scale (100k gaussians, 1232x816): the
compositing kernels themselves are ~12 ms fwd; end-to-end
fwd 135 ms / fwd+bwd 353 ms, currently bounded by the jnp glue (pair sorts +
the 200 MB aligned-layout gathers and their gather-based transposes), not the
kernels. The jnp tiled path (tiles.py) with its smaller windowed layout is
244 ms fwd+bwd and remains the training default; this path has no k_max
truncation and is the base for future glue optimization (bf16 record planes,
fused binning).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from sixdgs_tpu.ops.rasterizer.compositing import ALPHA_MAX, ALPHA_MIN, T_EPS

COLS = 16  # padded record columns
KB = 128  # pairs per DMA chunk
SB = 8  # statically-unrolled compositing sub-block
TILE = 16
NPIX = TILE * TILE


def _pixel_coords(tile_idx, nx):
    """Tile-LOCAL pixel coords [1, 256]; records store means relative to the
    tile origin, keeping values small so the MXU transpose (bf16x3 split)
    stays exact to ~1e-6 of a pixel."""
    del tile_idx, nx
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


def _chunk_alpha(buf, px, py, remaining):
    """Vectorized per-chunk alphas [KB, 256] + intermediates.

    buf: [KB, COLS] record rows for this chunk."""
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
    live = (power <= 0.0) & (alpha >= ALPHA_MIN) & (k_ids < remaining)
    alpha = jnp.where(live, alpha, 0.0)
    return alpha, g_raw, dx, dy, live


def _fwd_kernel(astarts_ref, counts_ref, nx_ref, records_hbm, color_ref,
                trans_ref, tbuf, wbuf, abuf, sem):
    t = pl.program_id(0)
    start = astarts_ref[t]  # KB-aligned segment start
    count = counts_ref[t]  # true (unaligned) pair count
    px, py = _pixel_coords(t, nx_ref[0])
    n_chunks = pl.cdiv(count, KB)

    def chunk_body(ci, carry):
        T, C, done = carry  # [1, 256], [3, 256], [1, 256]
        pltpu.make_async_copy(
            records_hbm.at[:, pl.ds(pl.multiple_of(start + ci * KB, KB), KB)], tbuf, sem
        ).start()
        pltpu.make_async_copy(
            records_hbm.at[:, pl.ds(pl.multiple_of(start + ci * KB, KB), KB)], tbuf, sem
        ).wait()
        buf = _transpose_matmul(tbuf[:], KB)  # [KB, COLS]
        remaining = count - ci * KB
        wbuf[:] = jnp.zeros((KB, NPIX), jnp.float32)
        alpha, _, _, _, _ = _chunk_alpha(buf, px, py, remaining)
        abuf[:] = alpha  # row access needs a ref (Mosaic has no value dyn-slice)

        def sub_body(s, carry):
            # sub-blocks of SB gaussians: one dynamic slice per block, the
            # sequential compositing statically unrolled (dynamic sublane
            # access per row was the kernel's bottleneck)
            T, done = carry  # done carried as f32 (no i1 vector yields)
            off = s * SB
            a_blk = abuf[pl.ds(off, SB), :]  # [SB, 256]
            w_rows = []
            for i in range(SB):
                a = a_blk[i : i + 1, :]
                test_T = T * (1.0 - a)
                stop = test_T < T_EPS
                contribute = (done < 0.5) & (~stop)
                w_rows.append(jnp.where(contribute, a * T, 0.0))
                T = jnp.where(contribute, test_T, T)
                done = jnp.maximum(done, stop.astype(jnp.float32))
            wbuf[pl.ds(off, SB), :] = jnp.concatenate(w_rows, axis=0)
            return T, done

        trip = (jnp.minimum(KB, remaining) + SB - 1) // SB
        T, done = jax.lax.fori_loop(0, trip, sub_body, (T, done))
        colors = buf[:, 5:8]  # [KB, 3]
        C = C + jax.lax.dot_general(
            colors, wbuf[:],
            dimension_numbers=(((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST,
        )  # [3, 256]
        return T, C, done

    T0 = jnp.ones((1, NPIX), jnp.float32)
    C0 = jnp.zeros((3, NPIX), jnp.float32)
    done0 = jnp.zeros((1, NPIX), jnp.float32)
    _, (T, C, _) = jax.lax.while_loop(
        lambda s: s[0] < n_chunks,
        lambda s: (s[0] + 1, chunk_body(s[0], s[1])),
        (0, (T0, C0, done0)),
    )
    color_ref[0] = C
    trans_ref[0] = T


def _bwd_kernel(astarts_ref, counts_ref, nx_ref, records_hbm, color_ref,
                trans_ref, dcolor_ref, dtrans_ref, dpairs_hbm, tbuf, wbuf,
                dabuf, abuf, dbuf, gbuf, sem, gsem):
    t = pl.program_id(0)
    start = astarts_ref[t]  # KB-aligned segment start
    count = counts_ref[t]  # true pair count
    px, py = _pixel_coords(t, nx_ref[0])

    C_total = color_ref[0]  # [3, 256]
    T_fin = trans_ref[0]  # [1, 256]
    dC = dcolor_ref[0]  # [3, 256]
    dT = dtrans_ref[0]  # [1, 256]
    dCC = jnp.sum(dC * C_total, axis=0, keepdims=True)  # [1, 256]
    dTT = dT * T_fin  # [1, 256]

    n_chunks = pl.cdiv(count, KB)

    def chunk_body(ci, carry):
        T, acc, done = carry  # transmittance, prefix of <dC, c_j> w_j, done
        pltpu.make_async_copy(
            records_hbm.at[:, pl.ds(pl.multiple_of(start + ci * KB, KB), KB)], tbuf, sem
        ).start()
        pltpu.make_async_copy(
            records_hbm.at[:, pl.ds(pl.multiple_of(start + ci * KB, KB), KB)], tbuf, sem
        ).wait()
        buf = _transpose_matmul(tbuf[:], KB)  # [KB, COLS]
        remaining = count - ci * KB
        wbuf[:] = jnp.zeros((KB, NPIX), jnp.float32)
        dabuf[:] = jnp.zeros((KB, NPIX), jnp.float32)
        alpha, g_raw, dx, dy, live = _chunk_alpha(buf, px, py, remaining)
        abuf[:] = alpha
        colors = buf[:, 5:8]  # [KB, 3]
        dbuf[:] = jnp.dot(colors, dC, preferred_element_type=jnp.float32,
                          precision=jax.lax.Precision.HIGHEST)  # [KB, 256]

        def sub_body(s, carry):
            T, acc, done = carry  # done as f32 (no i1 vector yields)
            off = s * SB
            a_blk = abuf[pl.ds(off, SB), :]  # [SB, 256]
            d_blk = dbuf[pl.ds(off, SB), :]
            w_rows, da_rows = [], []
            for i in range(SB):
                a = a_blk[i : i + 1, :]
                test_T = T * (1.0 - a)
                stop = test_T < T_EPS
                contribute = (done < 0.5) & (~stop)
                w = jnp.where(contribute, a * T, 0.0)
                w_rows.append(w)
                d_row = d_blk[i : i + 1, :]
                acc = acc + d_row * w
                one_minus = jnp.maximum(1.0 - a, 1e-6)
                da = d_row * T - (dCC - acc) / one_minus - dTT / one_minus
                da_rows.append(jnp.where(contribute & (a > 0.0), da, 0.0))
                T = jnp.where(contribute, test_T, T)
                done = jnp.maximum(done, stop.astype(jnp.float32))
            wbuf[pl.ds(off, SB), :] = jnp.concatenate(w_rows, axis=0)
            dabuf[pl.ds(off, SB), :] = jnp.concatenate(da_rows, axis=0)
            return T, acc, done

        trip = (jnp.minimum(KB, remaining) + SB - 1) // SB
        T, acc, done = jax.lax.fori_loop(0, trip, sub_body, (T, acc, done))

        # vectorized chain rule over the chunk
        opac = buf[:, 8:9]
        conA = buf[:, 2:3]
        conB = buf[:, 3:4]
        conC = buf[:, 4:5]
        da_all = dabuf[:]  # [KB, 256]
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
            wbuf[:], dC,
            dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST,
        )  # [KB, 3]

        gvals = jnp.concatenate(
            [dmx, dmy, dconA, dconB, dconC, dcol, dopac,
             jnp.zeros((KB, COLS - 9), jnp.float32)],
            axis=1,
        )  # [KB, COLS]
        gbuf[:] = _transpose_matmul(gvals, COLS)  # [COLS, KB]
        pltpu.make_async_copy(
            gbuf, dpairs_hbm.at[:, pl.ds(pl.multiple_of(start + ci * KB, KB), KB)], gsem
        ).start()
        pltpu.make_async_copy(
            gbuf, dpairs_hbm.at[:, pl.ds(pl.multiple_of(start + ci * KB, KB), KB)], gsem
        ).wait()
        return T, acc, done

    T0 = jnp.ones((1, NPIX), jnp.float32)
    acc0 = jnp.zeros((1, NPIX), jnp.float32)
    done0 = jnp.zeros((1, NPIX), jnp.float32)
    jax.lax.while_loop(
        lambda s: s[0] < n_chunks,
        lambda s: (s[0] + 1, chunk_body(s[0], s[1])),
        (0, (T0, acc0, done0)),
    )


def pallas_composite_fwd(records: jnp.ndarray, astarts: jnp.ndarray,
                         counts: jnp.ndarray, nx: int, ny: int,
                         interpret: bool = False):
    """records: [16, N_aligned] transposed records in KB-aligned segments;
    astarts [n_tiles+1]; counts [n_tiles] true per-tile counts.
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
                pltpu.VMEM((COLS, KB), jnp.float32),  # tbuf
                pltpu.VMEM((KB, NPIX), jnp.float32),  # wbuf
                pltpu.VMEM((KB, NPIX), jnp.float32),  # abuf
                pltpu.SemaphoreType.DMA(()),
            ],
        ),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel",)
        ),
        out_shape=(
            jax.ShapeDtypeStruct((n_tiles, 3, NPIX), jnp.float32),
            jax.ShapeDtypeStruct((n_tiles, 1, NPIX), jnp.float32),
        ),
        interpret=interpret,
    )(astarts, counts, jnp.asarray([nx], jnp.int32), records)
    return color, trans


def pallas_composite_bwd(records, astarts, counts, nx: int, ny: int, color,
                         trans, dcolor, dtrans, interpret: bool = False):
    """Per-pair gradients [16, N_aligned] (same layout as records)."""
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
                pltpu.VMEM((COLS, KB), jnp.float32),  # tbuf
                pltpu.VMEM((KB, NPIX), jnp.float32),  # wbuf
                pltpu.VMEM((KB, NPIX), jnp.float32),  # dabuf
                pltpu.VMEM((KB, NPIX), jnp.float32),  # abuf
                pltpu.VMEM((KB, NPIX), jnp.float32),  # dbuf
                pltpu.VMEM((COLS, KB), jnp.float32),  # gbuf (transposed out)
                pltpu.SemaphoreType.DMA(()),
                pltpu.SemaphoreType.DMA(()),
            ],
        ),
        out_shape=jax.ShapeDtypeStruct((COLS, n_pairs), jnp.float32),
        compiler_params=pltpu.CompilerParams(
            has_side_effects=True, dimension_semantics=("parallel",)
        ),
        interpret=interpret,
    )(astarts, counts, jnp.asarray([nx], jnp.int32), records, color, trans,
      dcolor, dtrans)
    return dpairs


# ------------------------------------------------------------- full wrapper

import functools as _functools

from sixdgs_tpu.ops.rasterizer.projection import ProjectedGaussians
from sixdgs_tpu.ops.rasterizer.tiles import _bin_pairs, _invert_perm_payload


@_functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4, 5))
def _composite(records, astarts, counts, nx, ny, interpret):
    return pallas_composite_fwd(records, astarts, counts, nx, ny,
                                interpret=interpret)


def _composite_fwd(records, astarts, counts, nx, ny, interpret):
    color, trans = pallas_composite_fwd(records, astarts, counts, nx, ny,
                                        interpret=interpret)
    return (color, trans), (records, astarts, counts, color, trans)


def _composite_bwd(nx, ny, interpret, res, grads):
    records, astarts, counts, color, trans = res
    dcolor, dtrans = grads
    dpairs = pallas_composite_bwd(
        records, astarts, counts, nx, ny, color, trans, dcolor, dtrans,
        interpret=interpret,
    )
    # slots beyond each tile's chunk coverage are uninitialized HBM; the
    # aligned-gather transpose masks by true rank, so just null NaN-prone
    # regions via the same validity used there (handled downstream).
    return dpairs, None, None


_composite.defvjp(_composite_fwd, _composite_bwd)


@_functools.partial(jax.custom_vjp, nondiff_argnums=(6, 7))
def _aligned_gather(records, src_gidx, d_of_pair, pair_ok, big_idx, big_ok,
                    t_max, t_max_big):
    """records [P, 16] -> aligned pair layout [N_aligned, 16].

    src_gidx: per aligned slot, source gaussian (depth-order index).
    d_of_pair / pair_ok: per PRE-SORT pair (two-tier layout: P*t_max main +
    K*t_max_big overflow), its aligned slot and validity — used by the
    gather-based transpose (scatter-free except a K-row overflow add).
    """
    return records[src_gidx]


def _aligned_gather_fwd(records, src_gidx, d_of_pair, pair_ok, big_idx,
                        big_ok, t_max, t_max_big):
    return records[src_gidx], (
        d_of_pair, pair_ok, big_idx, big_ok, records.shape[0],
    )


def _aligned_gather_bwd(t_max, t_max_big, res, g):
    d_of_pair, pair_ok, big_idx, big_ok, P = res
    K = big_idx.shape[0]
    R = g.shape[-1]
    d_pair = jnp.where(pair_ok[:, None], g[d_of_pair], 0.0)  # [N_pairs, 16]
    n_main = P * t_max
    d_main = jnp.sum(d_pair[:n_main].reshape(P, t_max, R), axis=1)
    d_big = jnp.sum(d_pair[n_main:].reshape(K, t_max_big, R), axis=1)
    d_big = jnp.where(big_ok[:, None], d_big, 0.0)
    return d_main.at[big_idx].add(d_big), None, None, None, None, None


_aligned_gather.defvjp(_aligned_gather_fwd, _aligned_gather_bwd)


def rasterize_pallas(
    proj: ProjectedGaussians,
    width: int,
    height: int,
    bg_color: jnp.ndarray,
    t_max: int = 16,
    interpret: bool = False,
    overflow_k: int = 256,
    t_max_big: int = 1024,
) -> jnp.ndarray:
    """Tile-binned rasterization via the Pallas kernels -> [3, H, W].

    Same two-tier binning as tiles.rasterize_tiled; compositing + backward run
    in the hand-written kernels (no k_max truncation)."""
    nx = -(-width // TILE)
    ny = -(-height // TILE)

    visible = proj.radii > 0
    order = jnp.argsort(jnp.where(visible, proj.depths, jnp.inf))
    inv_gorder = jnp.argsort(order)
    opac_all = jnp.where(visible, proj.opacities, 0.0)
    P = proj.means2d.shape[0]
    from sixdgs_tpu.ops.rasterizer.tiles import _permute

    records = _permute(
        jnp.concatenate(
            [
                proj.means2d,
                proj.conics,
                proj.colors,
                opac_all[:, None],
                jnp.zeros((P, COLS - 9), proj.means2d.dtype),
            ],
            axis=-1,
        ),
        order,
        inv_gorder,
    )  # depth-ordered [P, 16], scatter-free VJP

    means2d_sorted = jax.lax.stop_gradient(records[:, 0:2])
    radii_f = proj.radii[order].astype(jnp.float32)
    vis = visible[order]
    overflow_k = min(overflow_k, P)
    (pair_order, sorted_tiles, starts, pair_rank,
     g_sorted, big_idx, big_ok) = _bin_pairs(
        means2d_sorted, radii_f, vis, nx, ny, TILE, t_max,
        overflow_k=overflow_k, t_max_big=t_max_big,
    )
    n_tiles = nx * ny
    n_pairs = pair_order.shape[0]

    # KB-aligned per-tile segments: Mosaic requires lane-dim DMA offsets to be
    # tiling-aligned, so each tile's segment starts at a multiple of KB.
    counts = (starts[1:] - starts[:-1]).astype(jnp.int32)
    acounts = ((counts + KB - 1) // KB) * KB
    astarts = jnp.concatenate(
        [jnp.zeros(1, jnp.int32), jnp.cumsum(acounts, dtype=jnp.int32)]
    )
    n_aligned = ((n_pairs + KB - 1) // KB) * KB + n_tiles * KB  # static bound

    d = jnp.arange(n_aligned, dtype=jnp.int32)
    # tile of each aligned slot: segments are KB-aligned, so resolve at chunk
    # granularity (n_aligned/KB elements) and expand by gather — a
    # full-resolution searchsorted over n_aligned slots costs ~300 ms and
    # jnp.repeat ~23 ms at Mip-360 scale; the chunk-table gather is ~2 ms
    chunk_astarts = astarts // KB  # [n_tiles + 1]
    c = jnp.arange(n_aligned // KB, dtype=jnp.int32)
    tile_of_chunk = jnp.clip(
        jnp.searchsorted(chunk_astarts, c, side="right") - 1, 0, n_tiles - 1
    ).astype(jnp.int32)
    tile_of_d = tile_of_chunk[d // KB]
    rank_d = d - astarts[tile_of_d]
    slot_ok = (rank_d >= 0) & (rank_d < counts[tile_of_d])
    src_pair = jnp.where(
        slot_ok, starts[tile_of_d] + rank_d, 0
    )  # sorted-pair index
    src_gidx = jnp.where(slot_ok, g_sorted[src_pair], 0)

    # transpose map: aligned destination of each PRE-SORT pair, via ONE
    # key-value sort carrying the sorted slot's destination as payload
    # (replaces inv_order + two 2.4M-row gathers)
    valid_sorted = sorted_tiles < n_tiles
    d_of_sorted = jnp.where(
        valid_sorted,
        astarts[jnp.minimum(sorted_tiles, n_tiles - 1)]
        + jnp.minimum(pair_rank, n_aligned - 1),
        -1,
    )
    d_signed = _invert_perm_payload(pair_order, d_of_sorted)
    pair_ok = d_signed >= 0
    d_of_pair = jnp.clip(d_signed, 0, n_aligned - 1)

    aligned = _aligned_gather(records, src_gidx, d_of_pair, pair_ok,
                              big_idx, big_ok, t_max, t_max_big)
    # zero invalid slots so uncovered padding can't contribute
    aligned = aligned * slot_ok[:, None].astype(aligned.dtype)
    # re-express means relative to the owning tile's origin: the kernel works
    # in tile-local pixels so the identity-matmul transpose can't lose pixel
    # precision on large absolute coordinates
    tile_ox = ((tile_of_d % nx) * TILE).astype(aligned.dtype)
    tile_oy = ((tile_of_d // nx) * TILE).astype(aligned.dtype)
    shift = jnp.stack([tile_ox, tile_oy], axis=-1) * slot_ok[:, None].astype(aligned.dtype)
    aligned = aligned.at[:, 0:2].add(-shift)
    records_t = aligned.T  # [16, n_aligned]
    color, trans = _composite(records_t, astarts, counts, nx, ny, interpret)
    out_tiles = color + trans * bg_color[None, :, None]  # [n_tiles, 3, 256]
    img = out_tiles.reshape(ny, nx, 3, TILE, TILE)
    img = img.transpose(2, 0, 3, 1, 4).reshape(3, ny * TILE, nx * TILE)
    return img[:, :height, :width]
