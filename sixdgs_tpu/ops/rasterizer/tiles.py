"""Tile-binned rasterization (the production path for large images).

TPU re-design of the CUDA tile rasterizer's binning (diff-gaussian-
rasterization; semantics reconstructed from the call-site contract):

  1. depth-sort the Gaussians (global argsort, one pass),
  2. each Gaussian emits up to T_MAX (tile, gaussian) pairs covering the tile
     rectangle of its screen-space radius (fixed-capacity, mask-padded),
  3. ONE stable sort of the pair tile-ids: because Gaussians are already
     depth-ordered and pair index = g * T_MAX + t is monotone in g, a stable
     sort by tile id yields per-tile depth-ordered segments — this replaces
     the CUDA (tile | depth) 64-bit radix sort,
  4. per-tile segment offsets via searchsorted; pair records are laid out into
     a dense [n_tiles, K_MAX] window,
  5. compositing: all tiles at once, scanned over K-blocks with the same
     cumprod/early-stop algebra as compositing.py (exact CUDA semantics).

Scatter-free backward: XLA turns a gather's VJP into a scatter-add, which is
catastrophically slow on TPU for multi-million-row index sets (measured ~18 s
per train step at Mip-360 scale). Both data movements here are bijections, so
their transposes are expressed as gathers via jax.custom_vjp:
  * the sort permutation — backward gathers by the inverse permutation,
  * the segment->window layout — backward gathers each pair's (tile, rank)
    window cell.
The only remaining reduction is the [P, T_MAX] -> [P] sum from the pair
broadcast, which XLA handles as a plain reduce.

Static caps (T_MAX tiles per Gaussian, K_MAX pairs per tile) replace dynamic
allocation; truncation only drops contributions the 1e-4 transmittance cutoff
would almost surely kill anyway.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from sixdgs_tpu.ops.rasterizer.compositing import ALPHA_MAX, ALPHA_MIN, T_EPS
from sixdgs_tpu.ops.rasterizer.projection import ProjectedGaussians

RECORD = 9  # means2d(2) conic(3) color(3) opacity(1)


# ----------------------------------------------------- scatter-free gathers


@jax.custom_vjp
def _permute(x, perm, inv_perm):
    return x[perm]


def _permute_fwd(x, perm, inv_perm):
    return x[perm], inv_perm


def _permute_bwd(inv_perm, g):
    return g[inv_perm], None, None


_permute.defvjp(_permute_fwd, _permute_bwd)


@functools.partial(jax.custom_vjp, nondiff_argnums=(7, 8, 9))
def _pair_gather(records, gidx_sorted, inv_order, mid_idx, mid_ok, big_idx,
                 big_ok, t_max, t_max_mid, t_max_big):
    """records[gidx_sorted]: fused broadcast-to-pairs + sort-permutation over
    the three-tier pair layout (P*t_max main + K2*t_max_mid mid +
    K*t_max_big giant slots).

    The transpose gathers by the inverse permutation and reduces the regular
    per-gaussian slot blocks — no scatter except the tiny tier-row adds.
    """
    return records[gidx_sorted]


def _pair_gather_fwd(records, gidx_sorted, inv_order, mid_idx, mid_ok,
                     big_idx, big_ok, t_max, t_max_mid, t_max_big):
    return records[gidx_sorted], (
        gidx_sorted, inv_order, mid_idx, mid_ok, big_idx, big_ok,
        records.shape[0],
    )


def _pair_gather_bwd(t_max, t_max_mid, t_max_big, res, g):
    gidx_sorted, inv_order, mid_idx, mid_ok, big_idx, big_ok, P = res
    K2 = mid_idx.shape[0]
    K = big_idx.shape[0]
    R = g.shape[-1]
    d_pair = g[inv_order]  # pre-sort pair order
    n_main = P * t_max
    n_mid = K2 * t_max_mid
    d_main = jnp.sum(d_pair[:n_main].reshape(P, t_max, R), axis=1)
    d_mid = jnp.sum(
        d_pair[n_main : n_main + n_mid].reshape(K2, t_max_mid, R), axis=1
    )
    d_big = jnp.sum(d_pair[n_main + n_mid :].reshape(K, t_max_big, R), axis=1)
    d_records = d_main.at[mid_idx].add(
        jnp.where(mid_ok[:, None], d_mid, 0.0)
    )
    d_records = d_records.at[big_idx].add(
        jnp.where(big_ok[:, None], d_big, 0.0)
    )  # tier-row scatter-adds (tiny)
    return d_records, None, None, None, None, None, None


_pair_gather.defvjp(_pair_gather_fwd, _pair_gather_bwd)


@functools.partial(jax.custom_vjp, nondiff_argnums=(4,))
def _window(x, starts, pair_tile, pair_rank, k_max):
    """[N_pairs, R] segments -> dense [n_tiles, k_max, R] window (zero-padded).

    starts: [n_tiles + 1] segment offsets into x.
    pair_tile/pair_rank: per-pair tile id and rank within its tile (used by
    the transpose; sentinel tile == n_tiles for invalid pairs).
    """
    n_tiles = starts.shape[0] - 1
    counts = starts[1:] - starts[:-1]
    k = jnp.arange(k_max, dtype=jnp.int32)
    idx = starts[:-1][:, None] + k[None, :]
    valid = k[None, :] < counts[:, None]
    idx = jnp.minimum(idx, x.shape[0] - 1)
    # flat 1D row gather: XLA lowers a [n_tiles, k_max] 2D-index gather ~7x
    # slower than the equivalent flat gather (measured 56 ms vs 8 ms for 72 MB)
    rows = x[idx.reshape(-1)].reshape(n_tiles, k_max, x.shape[-1])
    return jnp.where(valid[..., None], rows, 0.0)


def _window_fwd(x, starts, pair_tile, pair_rank, k_max):
    return _window(x, starts, pair_tile, pair_rank, k_max), (
        pair_tile, pair_rank, x.shape[0],
    )


def _window_bwd(k_max, res, g):
    pair_tile, pair_rank, n_pairs = res
    n_tiles = g.shape[0]
    ok = (pair_tile < n_tiles) & (pair_rank < k_max)
    t = jnp.where(ok, pair_tile, 0)
    r = jnp.where(ok, pair_rank, 0)
    flat = g.reshape(-1, g.shape[-1])  # flat row gather (see _window)
    dx = jnp.where(ok[:, None], flat[t * k_max + r], 0.0)
    return dx, None, None, None


_window.defvjp(_window_fwd, _window_bwd)


# ------------------------------------------------------------------ binning


def _emit_counts(x0, y0, x1, y1, valid, budget: int):
    """Exact number of (tile, gaussian) pairs ``_rect_pairs`` emits per
    gaussian: the centered sub-rect area capped to ``budget``, zero for empty
    rects (a rect fully clipped off-screen emits nothing — same as the CUDA
    getRect binning)."""
    rw = jnp.maximum(x1 - x0, 0)
    rh = jnp.maximum(y1 - y0, 0)
    max_w = jnp.minimum(rw, budget)
    max_h = jnp.maximum(jnp.minimum(rh, budget // jnp.maximum(max_w, 1)), 1)
    nv = jnp.where(valid & (rw > 0) & (rh > 0), max_w * max_h, 0)
    return nv, max_w, max_h


def _tile_min_quadratic(tx, ty, mx, my, conA, conB, conC, tile: int):
    """Exact min over tile (tx, ty)'s pixel rect of the conic quadratic
    Q(d) = 0.5*conA*dx^2 + conB*dx*dy + 0.5*conC*dy^2 (power = -Q).

    tx/ty: [G, S] tile coords; mx/my/con*: [G] per-gaussian. Pixel coords in
    the tile span [t*tile, t*tile + tile - 1]; the CONTINUOUS min over that
    box lower-bounds every integer pixel's Q, so a cull on it is
    conservative. PSD quadratic over a box: 0 if the mean lies inside, else
    the min lies on one of the four edges (1D quadratic, clamped vertex)."""
    ax = tx.astype(jnp.float32) * tile - mx[:, None]
    bx = ax + (tile - 1)
    ay = ty.astype(jnp.float32) * tile - my[:, None]
    by = ay + (tile - 1)
    cA = conA[:, None]
    cB = conB[:, None]
    cC = conC[:, None]

    def q(dx, dy):
        return 0.5 * cA * dx * dx + cB * dx * dy + 0.5 * cC * dy * dy

    def edge_x(dx):  # min over dy in [ay, by] at fixed dx
        dy = jnp.clip(-cB * dx / jnp.maximum(cC, 1e-12), ay, by)
        return q(dx, dy)

    def edge_y(dy):
        dx = jnp.clip(-cB * dy / jnp.maximum(cA, 1e-12), ax, bx)
        return q(dx, dy)

    inside = (ax <= 0.0) & (0.0 <= bx) & (ay <= 0.0) & (0.0 <= by)
    edge_min = jnp.minimum(
        jnp.minimum(edge_x(ax), edge_x(bx)),
        jnp.minimum(edge_y(ay), edge_y(by)),
    )
    return jnp.where(inside, 0.0, edge_min)


def _rect_pairs(x0, y0, x1, y1, cx, cy, valid, nx, ny, budget: int,
                cull=None, tile: int = 16):
    """(tile ids [G, budget], emitted counts [G]) of a centered sub-rect
    capped to ``budget`` tiles.

    Slots [0, counts[g]) of row g carry real tile ids (in-bounds by
    construction: the sub-rect is clipped inside [x0,x1)x[y0,y1) which is
    clipped to the tile grid); the rest carry the n_tiles sentinel.

    ``cull``: optional (mx, my, conA, conB, conC, qmax) per-gaussian arrays.
    The bounding rect (CUDA getRect semantics) over-emits tiles the ellipse
    never reaches at alpha >= 1/255; with cull given, slots whose exact
    tile-rect quadratic minimum exceeds qmax = log(opac/ALPHA_MIN) are
    dropped — SEMANTICS-PRESERVING (those pairs fail the kernel's live test
    on every pixel, so they contribute zero color and zero gradient), and
    every downstream cost (sort occupancy, compact gather, kernels, backward
    routing) shrinks with the surviving pair count."""
    nv, max_w, max_h = _emit_counts(x0, y0, x1, y1, valid, budget)
    sx0 = jnp.clip(cx - max_w // 2, x0, jnp.maximum(x1 - max_w, x0))
    sy0 = jnp.clip(cy - max_h // 2, y0, jnp.maximum(y1 - max_h, y0))
    p = jnp.arange(budget, dtype=jnp.int32)
    pw = p[None, :] % jnp.maximum(max_w, 1)[:, None]
    ph = p[None, :] // jnp.maximum(max_w, 1)[:, None]
    tx = sx0[:, None] + pw
    ty = sy0[:, None] + ph
    pair_valid = p[None, :] < nv[:, None]
    if cull is not None:
        mx, my, conA, conB, conC, qmax = cull
        qmin = _tile_min_quadratic(tx, ty, mx, my, conA, conB, conC, tile)
        # small margin: the kernel evaluates Q at integer pixels in f32; the
        # continuous min is a strict lower bound, the margin absorbs rounding
        pair_valid = pair_valid & (qmin <= qmax[:, None] + 1e-4)
        nv = jnp.sum(pair_valid, axis=1).astype(nv.dtype)
    n_tiles = nx * ny
    return jnp.where(pair_valid, ty * nx + tx, n_tiles), nv


def _rect_bounds(means2d, radii_f, nx: int, ny: int, tile: int):
    """Clipped tile-rect bounds + centers + area per gaussian."""
    x0 = jnp.clip(jnp.floor((means2d[:, 0] - radii_f) / tile), 0, nx).astype(jnp.int32)
    y0 = jnp.clip(jnp.floor((means2d[:, 1] - radii_f) / tile), 0, ny).astype(jnp.int32)
    x1 = jnp.clip(jnp.ceil((means2d[:, 0] + radii_f + 1) / tile), 0, nx).astype(jnp.int32)
    y1 = jnp.clip(jnp.ceil((means2d[:, 1] + radii_f + 1) / tile), 0, ny).astype(jnp.int32)
    cx = jnp.clip((means2d[:, 0] / tile).astype(jnp.int32), x0, jnp.maximum(x1 - 1, x0))
    cy = jnp.clip((means2d[:, 1] / tile).astype(jnp.int32), y0, jnp.maximum(y1 - 1, y0))
    area = jnp.maximum(x1 - x0, 0) * jnp.maximum(y1 - y0, 0)
    return x0, y0, x1, y1, cx, cy, area


def _select_tiers(area, vis, t_max: int, mid_k: int, overflow_k: int):
    """Pick the overflow tiers: top-(overflow_k) rects by area get the GIANT
    budget, the next mid_k get the MID budget. Returns
    (giant_idx, giant_ok, mid_idx, mid_ok, in_tier)."""
    is_big = vis & (area > t_max)
    score = jnp.where(is_big, area, -1)
    vals, idx = jax.lax.top_k(score, overflow_k + mid_k)
    ok = vals > 0
    giant_idx, giant_ok = idx[:overflow_k], ok[:overflow_k]
    mid_idx, mid_ok = idx[overflow_k:], ok[overflow_k:]
    in_tier = jnp.zeros(area.shape[0], bool).at[idx].set(ok)
    return giant_idx, giant_ok, mid_idx, mid_ok, in_tier


def binning_saturation(means2d, radii_f, vis, nx: int, ny: int, tile: int,
                       t_max: int, overflow_k: int = 256,
                       t_max_big: int = 1024, mid_k: int = 4096,
                       t_max_mid: int = 64):
    """Pairs dropped by the static binning caps (telemetry).

    The CUDA reference's binning is uncapped; these counters expose when the
    three-tier budgets truncate coverage so training can flag it. Returns a
    dict of scalars: dropped_main (tiles cut from untier'd gaussians),
    dropped_mid / dropped_big (tiles cut past the mid/giant budgets),
    overflow_spill (gaussians that needed a tier but both were full)."""
    P = means2d.shape[0]
    overflow_k = min(overflow_k, P)
    mid_k = min(mid_k, max(P - overflow_k, 0))
    *_, area = _rect_bounds(means2d, radii_f, nx, ny, tile)
    area = jnp.where(vis, area, 0)
    giant_idx, giant_ok, mid_idx, mid_ok, in_tier = _select_tiers(
        area, area > t_max, t_max, mid_k, overflow_k
    )
    dropped_main = jnp.sum(
        jnp.where(vis & ~in_tier, jnp.maximum(area - t_max, 0), 0)
    )
    dropped_mid = jnp.sum(
        jnp.where(mid_ok, jnp.maximum(area[mid_idx] - t_max_mid, 0), 0)
    )
    dropped_big = jnp.sum(
        jnp.where(giant_ok, jnp.maximum(area[giant_idx] - t_max_big, 0), 0)
    )
    overflow_spill = jnp.sum(((area > t_max) & ~in_tier).astype(jnp.int32))
    # how many gaussians would need an overflow tier if t_max halved —
    # the trainer's NARROWING signal (the main slot block P*t_max dominates
    # the key-slot count at trained-scene scale, and every per-slot glue
    # stage — fused keys, u32 sort, segment starts — scales with it)
    narrow_demand = jnp.sum((area > (t_max // 2)).astype(jnp.int32))
    # emitted pair count BEFORE conic culling (an upper bound on the
    # rasterizer's real emission — the cull drops 30-40% more; keeping the
    # bound here avoids materializing the [P, budget] slot grids a second
    # time per step, and over-widening nc_pairs is safe)
    x0, y0, x1, y1, *_ = _rect_bounds(means2d, radii_f, nx, ny, tile)
    main_n, _, _ = _emit_counts(x0, y0, x1, y1, vis & ~in_tier, t_max)
    mid_n, _, _ = _emit_counts(
        x0[mid_idx], y0[mid_idx], x1[mid_idx], y1[mid_idx], mid_ok, t_max_mid)
    big_n, _, _ = _emit_counts(
        x0[giant_idx], y0[giant_idx], x1[giant_idx], y1[giant_idx],
        giant_ok, t_max_big)
    real_pairs = jnp.sum(main_n) + jnp.sum(mid_n) + jnp.sum(big_n)
    return {
        "dropped_main": dropped_main,
        "dropped_mid": dropped_mid,
        "dropped_big": dropped_big,
        "overflow_spill": overflow_spill,
        "narrow_demand": narrow_demand,
        "total_area": jnp.sum(area),
        "real_pairs": real_pairs,
    }


def _make_pair_keys(means2d, radii_f, vis, nx: int, ny: int, tile: int,
                    t_max: int, overflow_k: int = 256, t_max_big: int = 1024,
                    mid_k: int = 4096, t_max_mid: int = 64,
                    conics=None, opac=None):
    """Pre-sort pair keys:
    (tile_ids, pair_gidx, mid_idx, mid_ok, giant_idx, giant_ok).

    Slot blocks: [P*t_max main | mid_k*t_max_mid mid | overflow_k*t_max_big
    giant]. tile_ids: tile of each pre-sort pair slot (n_tiles sentinel =
    invalid); pair_gidx: owning gaussian (depth rank) per slot — iota
    arithmetic for the regular block (jnp.repeat measured ~23 ms at this
    scale vs ~0 for iota math), tiny table gathers for the tier blocks. The
    mid tier (default 4096 x 64) exists because real trained scenes have
    thousands of gaussians covering 17-64 tiles: with only the giant tier,
    ~34%% of tile coverage was truncated on a 25k-gaussian trained scene.
    """
    P = means2d.shape[0]
    overflow_k = min(overflow_k, P)
    mid_k = min(mid_k, max(P - overflow_k, 0))
    x0, y0, x1, y1, cx, cy, area = _rect_bounds(means2d, radii_f, nx, ny, tile)

    giant_idx, giant_ok, mid_idx, mid_ok, in_tier = _select_tiers(
        area, vis & (area > t_max), t_max, mid_k, overflow_k
    )

    cull = cull_mid = cull_big = None
    if conics is not None:
        qmax = jnp.log(jnp.maximum(opac, 1e-12) / ALPHA_MIN)
        cull = (means2d[:, 0], means2d[:, 1], conics[:, 0], conics[:, 1],
                conics[:, 2], qmax)
        cull_mid = tuple(c[mid_idx] for c in cull)
        cull_big = tuple(c[giant_idx] for c in cull)
    main_ids, _ = _rect_pairs(
        x0, y0, x1, y1, cx, cy, vis & ~in_tier, nx, ny, t_max,
        cull=cull, tile=tile,
    )  # [P, t_max]
    mid_ids, _ = _rect_pairs(
        x0[mid_idx], y0[mid_idx], x1[mid_idx], y1[mid_idx],
        cx[mid_idx], cy[mid_idx], mid_ok, nx, ny, t_max_mid,
        cull=cull_mid, tile=tile,
    )  # [K2, t_max_mid]
    giant_ids, _ = _rect_pairs(
        x0[giant_idx], y0[giant_idx], x1[giant_idx], y1[giant_idx],
        cx[giant_idx], cy[giant_idx], giant_ok, nx, ny, t_max_big,
        cull=cull_big, tile=tile,
    )  # [K, t_max_big]

    tile_ids = jnp.concatenate(
        [main_ids.reshape(-1), mid_ids.reshape(-1), giant_ids.reshape(-1)]
    )
    n_main = P * t_max
    pair_gidx = jnp.concatenate(
        [
            jnp.arange(n_main, dtype=jnp.int32) // t_max,
            mid_idx.astype(jnp.int32)[
                jnp.arange(mid_k * t_max_mid, dtype=jnp.int32) // t_max_mid
            ],
            giant_idx.astype(jnp.int32)[
                jnp.arange(overflow_k * t_max_big, dtype=jnp.int32) // t_max_big
            ],
        ]
    )
    return tile_ids, pair_gidx, mid_idx, mid_ok, giant_idx, giant_ok


def _fused_pair_keys(means2d, radii_f, vis, nx: int, ny: int, tile: int,
                     t_max: int, overflow_k: int = 256, t_max_big: int = 1024,
                     mid_k: int = 4096, t_max_mid: int = 64,
                     conics=None, opac=None):
    """Pre-sort pair data for the compact-gather pipeline (pallas path).

    Returns (key, tile_ids, gidx, counts_g, gbits):
      * key: [N_slots] uint32 fused (tile << gbits) | depth-rank when the bit
        budget fits (tbits + gbits <= 32), else None;
      * tile_ids/gidx: the unfused [N_slots] i32 pair when key is None
        (2-key sort fallback), else None;
      * counts_g: [P] i32 exact emitted pair count per depth-ranked gaussian
        (the segment lengths of the backward gidx-sorted routing);
      * gbits: bits of the depth-rank field.

    Same three-tier budgets and emission set as ``_make_pair_keys``; the key
    carries (tile major, depth-rank minor) so ONE u32 radix-friendly sort
    replaces the CUDA (tile | depth) 64-bit radix sort
    (/root/reference/gaussian_renderer/__init__.py:36-93 call site).
    """
    P = means2d.shape[0]
    n_tiles = nx * ny
    overflow_k = min(overflow_k, P)
    mid_k = min(mid_k, max(P - overflow_k, 0))
    x0, y0, x1, y1, cx, cy, area = _rect_bounds(means2d, radii_f, nx, ny, tile)
    giant_idx, giant_ok, mid_idx, mid_ok, in_tier = _select_tiers(
        area, vis & (area > t_max), t_max, mid_k, overflow_k
    )
    cull = cull_mid = cull_big = None
    if conics is not None:
        # conic-precise tile culling (see _rect_pairs): qmax in Q units
        qmax = jnp.log(jnp.maximum(opac, 1e-12) / ALPHA_MIN)
        cull = (means2d[:, 0], means2d[:, 1], conics[:, 0], conics[:, 1],
                conics[:, 2], qmax)
        cull_mid = tuple(c[mid_idx] for c in cull)
        cull_big = tuple(c[giant_idx] for c in cull)
    main_ids, main_n = _rect_pairs(
        x0, y0, x1, y1, cx, cy, vis & ~in_tier, nx, ny, t_max,
        cull=cull, tile=tile)
    mid_ids, mid_n = _rect_pairs(
        x0[mid_idx], y0[mid_idx], x1[mid_idx], y1[mid_idx],
        cx[mid_idx], cy[mid_idx], mid_ok, nx, ny, t_max_mid,
        cull=cull_mid, tile=tile)
    big_ids, big_n = _rect_pairs(
        x0[giant_idx], y0[giant_idx], x1[giant_idx], y1[giant_idx],
        cx[giant_idx], cy[giant_idx], giant_ok, nx, ny, t_max_big,
        cull=cull_big, tile=tile)

    counts_g = (
        main_n.at[mid_idx].add(jnp.where(mid_ok, mid_n, 0))
        .at[giant_idx].add(jnp.where(giant_ok, big_n, 0))
    )  # tiered gaussians emit 0 in the main block, so add == set

    gbits = max(1, (P - 1).bit_length())
    tbits = max(1, n_tiles.bit_length())  # tile ids go up to the sentinel
    g_main = jax.lax.broadcasted_iota(jnp.int32, (P, t_max), 0)
    g_mid = jnp.broadcast_to(mid_idx[:, None], mid_ids.shape)
    g_big = jnp.broadcast_to(giant_idx[:, None], big_ids.shape)
    if tbits + gbits <= 32:
        def pack(ids, g):
            return (ids.astype(jnp.uint32) << gbits) | g.astype(jnp.uint32)

        key = jnp.concatenate([
            pack(main_ids, g_main).reshape(-1),
            pack(mid_ids, g_mid).reshape(-1),
            pack(big_ids, g_big).reshape(-1),
        ])
        return key, None, None, counts_g, gbits
    tile_ids = jnp.concatenate(
        [main_ids.reshape(-1), mid_ids.reshape(-1), big_ids.reshape(-1)])
    gidx = jnp.concatenate(
        [g_main.reshape(-1), g_mid.reshape(-1), g_big.reshape(-1)])
    return None, tile_ids, gidx, counts_g, gbits


def _bin_pairs(means2d, radii_f, vis, nx: int, ny: int, tile: int, t_max: int,
               overflow_k: int = 256, t_max_big: int = 1024,
               mid_k: int = 4096, t_max_mid: int = 64,
               conics=None, opac=None):
    """(tile, pair) assignment for depth-ordered gaussians; 3-tier budgets.

    Most gaussians cover few tiles and get ``t_max`` pair slots; the mid_k
    next-largest rects get ``t_max_mid``; the overflow_k largest get
    ``t_max_big`` — static shapes, and the CUDA reference's uncapped binning
    is matched for any practical scene (truncation is counted by
    ``binning_saturation``).

    Returns (pair_order, sorted_tiles, starts, pair_rank, gidx_sorted,
    mid_idx, mid_ok, big_idx, big_ok) — all index-space,
    differentiability-free. ``gidx_sorted`` maps SORTED pair slots to
    depth-ordered gaussian indices; use _invert_perm_payload(pair_order, ...)
    for pre-sort-indexed maps.
    """
    n_tiles = nx * ny
    tile_ids, pair_gidx, mid_idx, mid_ok, big_idx, big_ok = _make_pair_keys(
        means2d, radii_f, vis, nx, ny, tile, t_max,
        overflow_k=overflow_k, t_max_big=t_max_big,
        mid_k=mid_k, t_max_mid=t_max_mid, conics=conics, opac=opac,
    )
    n_pairs = tile_ids.shape[0]

    # ONE sort (tile major, gaussian depth rank minor) — the composed
    # (tile | depth) radix sort of the CUDA rasterizer without 64-bit keys.
    # Gaussians are depth-ordered, so pair_gidx IS the depth rank; two pairs
    # in the same tile never share a gaussian, so ties don't matter. When the
    # bit budget allows, both orders pack into ONE i32 key (saves a full
    # permutation pass on the payloads).
    iota = jnp.arange(n_pairs, dtype=jnp.int32)
    key, gbits = _fused_tile_key(tile_ids, pair_gidx, n_tiles,
                                 means2d.shape[0])
    if key is not None:
        sorted_key, pair_order = jax.lax.sort((key, iota), num_keys=1)
        sorted_tiles = jax.lax.shift_right_logical(sorted_key, gbits)
        gidx_sorted = jax.lax.bitwise_and(sorted_key, (1 << gbits) - 1)
    else:
        sorted_tiles, gidx_sorted, pair_order = jax.lax.sort(
            (tile_ids, pair_gidx, iota), num_keys=2, is_stable=True
        )
    starts = jnp.searchsorted(
        sorted_tiles, jnp.arange(n_tiles + 1, dtype=jnp.int32),
        method="scan_unrolled",
    ).astype(jnp.int32)
    pair_rank = jnp.arange(sorted_tiles.shape[0], dtype=jnp.int32) - starts[
        jnp.minimum(sorted_tiles, n_tiles - 1)
    ]
    pair_rank = jnp.where(sorted_tiles < n_tiles, pair_rank, jnp.int32(1 << 30))
    return (pair_order, sorted_tiles, starts, pair_rank,
            gidx_sorted, mid_idx, mid_ok, big_idx, big_ok)


def _fused_tile_key(tile_ids, pair_gidx, n_tiles: int, P: int):
    """Pack (tile major, depth-rank minor) into ONE i32 sort key when the
    bit budget allows (tile id <= n_tiles sentinel needs tbits, gaussian
    depth rank < P needs gbits). Returns (key, gbits), or (None, 0) when
    tbits + gbits > 31 (fall back to a 2-key stable sort)."""
    tbits = (n_tiles + 1).bit_length()
    gbits = max(1, (max(P - 1, 1)).bit_length())
    if tbits + gbits > 31:
        return None, 0
    return tile_ids * jnp.int32(1 << gbits) + pair_gidx, gbits


def _invert_perm_payload(perm: jnp.ndarray, payload: jnp.ndarray) -> jnp.ndarray:
    """out[perm[s]] = payload[s], scatter-free (one key-value sort).

    With payload = d_of_sorted this transposes a sorted-slot property onto
    pre-sort pair indices; with payload = iota it yields the inverse perm.
    """
    _, out = jax.lax.sort((perm, payload), num_keys=1)
    return out


def rasterize_tiled(
    proj: ProjectedGaussians,
    width: int,
    height: int,
    bg_color: jnp.ndarray,
    tile: int = 16,
    t_max: int = 16,
    k_max: int = 512,
    kb: int = 32,  # kept for API compat; per-slot scan no longer blocks
    overflow_k: int = 256,
    t_max_big: int = 1024,
    mid_k: int = 4096,
    t_max_mid: int = 64,
) -> jnp.ndarray:
    """Tile-binned rasterization -> [3, H, W]."""
    nx = -(-width // tile)
    ny = -(-height // tile)
    n_tiles = nx * ny
    k_max = min(k_max, proj.means2d.shape[0] * t_max)
    overflow_k = min(overflow_k, proj.means2d.shape[0])
    mid_k = min(mid_k, max(proj.means2d.shape[0] - overflow_k, 0))

    visible = proj.radii > 0
    order = jnp.argsort(jnp.where(visible, proj.depths, jnp.inf))
    # inverse permutation via a key sort of (order, iota) — measured ~1.8x
    # faster than the disjoint iota scatter on TPU (tools/profile_glue4.py)
    _iota = jnp.arange(order.shape[0], dtype=jnp.int32)
    _, inv_gorder = jax.lax.sort(
        (order.astype(jnp.int32), _iota), num_keys=1)

    # pack per-gaussian records then depth-permute ONCE (scatter-free VJP)
    opac_all = jnp.where(visible, proj.opacities, 0.0)
    records = _permute(
        jnp.concatenate(
            [proj.means2d, proj.conics, proj.colors, opac_all[:, None]], axis=-1
        ),
        order,
        inv_gorder,
    )  # [P, 9] depth-ordered
    means2d = jax.lax.stop_gradient(records[:, 0:2])
    radii_f = proj.radii[order].astype(means2d.dtype)
    vis = visible[order]

    rec_ng = jax.lax.stop_gradient(records)
    (pair_order, sorted_tiles, starts, pair_rank,
     gidx_sorted, mid_idx, mid_ok, big_idx, big_ok) = _bin_pairs(
        means2d, radii_f, vis, nx, ny, tile, t_max,
        overflow_k=overflow_k, t_max_big=t_max_big,
        mid_k=mid_k, t_max_mid=t_max_mid,
        conics=rec_ng[:, 2:5], opac=rec_ng[:, 8],
    )
    inv_order = _invert_perm_payload(
        pair_order, jnp.arange(pair_order.shape[0], dtype=jnp.int32)
    )
    sorted_records = _pair_gather(records, gidx_sorted, inv_order, mid_idx,
                                  mid_ok, big_idx, big_ok, t_max, t_max_mid,
                                  t_max_big)
    windowed = _window(sorted_records, starts, sorted_tiles, pair_rank, k_max)
    counts = starts[1:] - starts[:-1]
    # scan over depth slots: [k_max, n_tiles, 9]. A sequential per-slot scan
    # beats the cumprod/cumsum formulation by ~100x on TPU: the cumulative-op
    # VJPs lower to pathological code, while the scan transpose is clean
    # elementwise math (measured 8.9s -> 90ms at Mip-360 scale). Slots are
    # consumed SB_SCAN at a time with the inner dependence statically
    # unrolled, amortizing per-step scan overheads.
    SB_SCAN = 4
    k_pad = (-k_max) % SB_SCAN
    if k_pad:
        windowed = jnp.concatenate(
            [windowed, jnp.zeros((n_tiles, k_pad, RECORD), windowed.dtype)], axis=1
        )
    slots = windowed.reshape(n_tiles, -1, SB_SCAN, RECORD).swapaxes(0, 1)

    # absolute pixel coords per tile
    tiles_arange = jnp.arange(n_tiles, dtype=jnp.int32)
    lx = jnp.arange(tile, dtype=means2d.dtype)
    px = ((tiles_arange % nx) * tile)[:, None, None].astype(means2d.dtype) + lx[None, None, :]
    py = ((tiles_arange // nx) * tile)[:, None, None].astype(means2d.dtype) + lx[None, :, None]
    px = jnp.broadcast_to(px, (n_tiles, tile, tile))
    py = jnp.broadcast_to(py, (n_tiles, tile, tile))

    @functools.partial(jax.remat, policy=jax.checkpoint_policies.nothing_saveable)
    def body(carry, inputs):
        T, C, done = carry  # [T,t,t], [T,3,t,t], [T,t,t]
        recs, k0 = inputs  # [n_tiles, SB_SCAN, 9], base slot index
        # vectorized alpha for the sub-block
        op = jnp.where(
            (k0 + jnp.arange(SB_SCAN, dtype=jnp.int32))[None, :] < counts[:, None],
            recs[:, :, 8], 0.0,
        )  # [n_tiles, SB_SCAN]
        dx = px[:, None] - recs[:, :, 0][:, :, None, None]  # [T,SB,t,t]
        dy = py[:, None] - recs[:, :, 1][:, :, None, None]
        power = (
            -0.5 * (recs[:, :, 2][:, :, None, None] * dx * dx
                    + recs[:, :, 4][:, :, None, None] * dy * dy)
            - recs[:, :, 3][:, :, None, None] * dx * dy
        )
        alpha = jnp.minimum(ALPHA_MAX, op[:, :, None, None] * jnp.exp(power))
        alpha = jnp.where((power > 0.0) | (alpha < ALPHA_MIN), 0.0, alpha)
        # statically-unrolled sequential compositing over the sub-block
        for i in range(SB_SCAN):
            a = alpha[:, i]
            test_T = T * (1.0 - a)
            stop = test_T < T_EPS  # non-contributing (CUDA order)
            contribute = (~done) & (~stop)
            w = jnp.where(contribute, a * T, 0.0)  # [n_tiles, t, t]
            C = C + recs[:, i, 5:8][:, :, None, None] * w[:, None]
            T = jnp.where(contribute, test_T, T)
            done = done | stop
        return (T, C, done), None

    T0 = jnp.ones((n_tiles, tile, tile), means2d.dtype)
    C0 = jnp.zeros((n_tiles, 3, tile, tile), means2d.dtype)
    done0 = jnp.zeros((n_tiles, tile, tile), bool)
    (T, C, _), _ = jax.lax.scan(
        body, (T0, C0, done0),
        (slots, jnp.arange(0, k_max + k_pad, SB_SCAN, dtype=jnp.int32)),
    )
    out_tiles = C + T[:, None] * bg_color[None, :, None, None]

    img = out_tiles.reshape(ny, nx, 3, tile, tile)
    img = img.transpose(2, 0, 3, 1, 4).reshape(3, ny * tile, nx * tile)
    return img[:, :height, :width]
