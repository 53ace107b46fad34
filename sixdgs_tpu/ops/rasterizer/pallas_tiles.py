"""Pallas tile-rasterizer kernels: forward + analytic backward.

Compact-gather pipeline (v3). The CUDA reference sorts (tile | depth) 64-bit
keys with ONE radix sort and walks per-tile segments
(/root/reference/gaussian_renderer/__init__.py:36-93 call site; the submodule
CUDA is not vendored). Earlier TPU revisions carried all 9 record planes as
sort payloads, which made the XLA sort the dominant train-step cost (20 ms
forward + 21 ms backward at Mip-360 scale). This revision exploits that the
payload planes are pure per-gaussian broadcasts:

  1. build ONE fused u32 key per pre-sort pair slot:
     (tile_id << gbits) | depth_rank — gaussians are depth-sorted first, so
     the row index IS the depth rank and a single u32 sort yields per-tile
     depth-ordered segments (XLA lowers the payload-free sort to its fast
     path: ~3 ms for 2.6M keys vs ~22 ms with 10 payloads),
  2. slice the first ``nc_pairs`` sorted slots (valid pairs sort before the
     sentinel; the static budget is telemetry-guarded and auto-widened by the
     trainer) and reconstruct the pair records with ONE flat row gather
     records[key & mask], transposed once to the plane-major [16, NC]
     layout the kernels DMA (Mosaic slices the lane dim at 128-pair
     alignment and needs a multiple-of-8 sublane dim),
  3. the backward routes the [9, NC] pair cotangents to per-gaussian records
     with ONE gidx-keyed payload sort at compact (not slot) size, then a
     cumsum + segment-boundary diff — boundaries come from the EXACT emitted
     pair counts computed during binning, so no searchsorted over gaussians.

Kernel structure per chunk of KB pairs — FULLY PARALLEL compositing (no
serial transmittance loop), in a PIXELS-IN-SUBLANES / PAIRS-IN-LANES frame:
record planes stream as natural [1, KB] rows of the plane-major chunk and
broadcast against [NPIX, 1] pixel columns, so NO per-chunk transpose exists
anywhere (a 6-pass HIGHEST-precision MXU transpose per chunk previously cost
more than the whole compositing scan):
  1. vectorized alpha: [NPIX, KB] from record rows broadcast against the
     pixel columns (pure VPU),
  2. ONE log-domain lane-prefix scan of log(1-a) — a 2-pass hi/lo-bf16
     triangular MXU matmul — gives the plain transmittance; the CUDA stop
     test Tplain*(1-a) < 1e-4 is MONOTONE (once true it stays true, since
     every later plain product <= the violating one), so the done latch is
     the direct per-lane test — no cumsum matmul.
     Before the first stop the plain and serial transmittances coincide, so
     the contributing weights are w_i = a_i * Texcl_i * contribute_i and
     the serial log-carry is the inclusive prefix at the last contributing
     lane (a masked lane-min of values the scan already produced — the
     prefix is non-increasing). Semantically faithful to the sequential
     replay (same stop ordering; tree-reordered f32 products round
     differently, so values within rounding distance of T_EPS can flip the
     stop test),
  3. color application / color gradients as MXU matmuls over the chunk.
HBM chunk fetches stream through a RING-slot buffer (prefetch distance
RING-1 — the per-chunk compute is shorter than one HBM round-trip, so plain
double-buffering left the kernels DMA-latency-bound), the backward's
gradient writes drain lazily through a WRING-slot ring, and the FIRST chunk
of each tile is prefetched by the previous grid instance (sequential-grid
"arbitrary" semantics). NC is a KB multiple, so every KB-aligned chunk DMA
is in-bounds by construction (the round-2 advisor's partial-chunk overrun
cannot occur).

Backward math (standard 3DGS):
  C = sum_i c_i a_i T_i,  T_i = prod_{j<i}(1-a_j),  T_fin = prod_i(1-a_i)
  dL/da_i = <dC, c_i> T_i - <dC, C - A_i>/(1-a_i) - <dT> T_fin/(1-a_i)
  dL/dc_i = sum_pix dC * w_i
with A_i the inclusive prefix of color contributions; one front-to-back replay
recovers everything from the forward's final output. The background is
composited IN-KERNEL (out = C + T_fin*bg), which makes the VJP boundary the
final tile image: dC = d_out, dT = <d_out, bg>, and the two suppression terms
fold into S = <dC, C> + dT*T_fin = <d_out, out> — a per-pixel dot of the
upstream cotangent with the forward's own output, computed in-kernel. The
backward therefore streams exactly two per-tile inputs (d_out and the out
residual, both already in the kernel frame); NO XLA-side transpose, concat,
or color/trans plumbing exists anywhere on the image path. The early-stop
rule (contribution only while T*(1-a) >= 1e-4, CUDA `done` ordering) replays
identically, so stopped gaussians get zero grads.

Record planes (rows of the [16, NC] matrix; 9 live + 7 padding):
0:x 1:y 2:conA 3:conB 4:conC 5:r 6:g 7:b 8:opacity. Means are ABSOLUTE pixel
coordinates; each kernel instance subtracts its tile origin from the [1, KB]
mean rows (f32 throughout — no bf16 split is involved anymore).

Replaces the diff-gaussian-rasterization CUDA submodule (interface
reconstructed from /root/reference/gaussian_renderer/__init__.py:36-93).

REJECTED optimization (round 4, measured on HW — do not retry): moving the
per-pixel quadratic onto the MXU by expanding power(px, py) into tile-pixel
monomials (one [NPIX, 8] basis x [8, KB] split-bf16 coefficient matmul
replacing the dx/dy VPU passes). Numerically unsound: the monomial
coefficients scale with conA*xs^2 (xs = mean-to-tile-origin distance, large
for far-overlapping pairs), so individual products reach ~1e3-1e4 while
cancelling to |power| <= ~13 on contributing pixels — f32 accumulation error
~1e-3 per pair, compounding over deep segments to 0.05-0.58 image error vs
the interpreter (3 HW tests failed). The dx-form below is small-operand by
construction: A*dx^2 is only large where alpha is already ~0.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from sixdgs_tpu.ops.rasterizer.compositing import ALPHA_MAX, ALPHA_MIN, T_EPS
from sixdgs_tpu.ops.rasterizer.projection import ProjectedGaussians
from sixdgs_tpu.ops.rasterizer.tiles import RECORD, _fused_pair_keys, _permute

COLS = 16  # padded record planes (sublane dim must be a multiple of 8)
KB = 128  # pairs per DMA chunk (lane-dim tiling alignment; NC is a KB
# multiple). 256 measured SLOWER (the kernels are VPU/scan-compute-bound;
# per-chunk fixed costs are already hidden by the DMA pipelining).
TILE = 16
NPIX = TILE * TILE
DEFAULT_NC = 1 << 20  # default compact pair budget (auto-clamped / widened)


def _tri_mats(kb):
    """(strict-upper, inclusive-upper) triangular 0/1 bf16 [kb, kb] matrices.
    dot(x, triS)[p, i] = sum_{j<i} x[p, j]  (exclusive lane prefix)
    dot(x, triI)[p, i] = sum_{j<=i} x[p, j] (inclusive lane prefix)
    Built once per kernel instance (outside the chunk loop)."""
    i = jax.lax.broadcasted_iota(jnp.int32, (kb, kb), 0)
    j = jax.lax.broadcasted_iota(jnp.int32, (kb, kb), 1)
    return ((i < j).astype(jnp.bfloat16), (i <= j).astype(jnp.bfloat16))


def _split_bf16(x):
    """Exact-ish 2-term bf16 split of f32 (hi + lo reproduces ~16 mantissa
    bits; residual ~2^-16 relative — plenty for transmittance logs and
    gradient prefixes, at 2 MXU passes instead of HIGHEST's 6)."""
    hi = x.astype(jnp.bfloat16)
    lo = (x - hi.astype(jnp.float32)).astype(jnp.bfloat16)
    return hi, lo


_DN_NT = (((1,), (0,)), ((), ()))


def _matmul_scan(x, tri):
    """Lane prefix sums of [R, KB] with hi/lo-bf16 accuracy, ONE MXU dot.

    Lane-shift scans are REAL ops on TPU (cross-lane rotates, ~3 passes per
    log-step -> ~1 us/chunk); sublane shifts would be free but pairs live in
    lanes in this kernel frame. One [2R,KB]x[KB,KB] matmul against a 0/1
    triangular matrix does the whole scan on the MXU instead: the hi and lo
    split terms are STACKED along the output-row dim so Mosaic issues a
    single dot (same MXU tile count as two [R,KB] dots, half the per-dot
    fixed overhead) and the two halves are summed back in f32."""
    hi, lo = _split_bf16(x)
    r = x.shape[0]
    y = jax.lax.dot_general(jnp.concatenate([hi, lo], axis=0), tri, _DN_NT,
                            preferred_element_type=jnp.float32)
    return y[:r] + y[r:]


def _matmul_split3(a, b, dn=_DN_NT):
    """f32-accurate matmul (hi*hi + hi*lo + lo*hi; the dropped lo*lo term is
    ~2^-32 relative) as ONE MXU dot: the three split terms are stacked along
    the CONTRACTING dim, so the accumulation happens inside the MXU — same
    tile count as three separate bf16 dots (vs HIGHEST's 6), one third the
    per-dot fixed overhead."""
    ((ca,), (cb,)) = dn[0]
    a_hi, a_lo = _split_bf16(a)
    b_hi, b_lo = _split_bf16(b)
    A = jnp.concatenate([a_hi, a_lo, a_hi], axis=ca)
    B = jnp.concatenate([b_hi, b_hi, b_lo], axis=cb)
    return jax.lax.dot_general(A, B, dn, preferred_element_type=jnp.float32)


def _composite_chunk(alpha, LT, done, triS):
    """Parallel replay of the sequential front-to-back compositing over one
    [NPIX, KB] alpha chunk (pixels in sublanes, pairs in lanes) given carries
    LT (LOG serial transmittance) and done (early-stop latch), [NPIX, 1].

    The cumprod runs in log domain on the MXU: one_minus >= 1-ALPHA_MAX so
    log is well-conditioned; masked lanes contribute log(1) = 0. The CUDA
    stop test Tplain*(1-a) < T_EPS is MONOTONE in the pair index (the tested
    product equals the next lane's transmittance, and Texcl is
    non-increasing), so no cumsum latch is needed within the chunk: a lane
    contributes iff its OWN test passes and no earlier chunk stopped.
    (Rounding of the tree-reordered prefix can flip the test within ~1 ulp
    of T_EPS vs the serial replay — the same caveat as the reordered f32
    products, see module docstring; an earlier revision burned one [KB, KB]
    MXU pass per chunk on an exact 0/1 cumsum latch for those sub-rounding
    cases.) The serial carry is the INCLUSIVE log prefix at the last
    contributing lane — the prefix is non-increasing (every l <= 0), so
    that's a masked lane-min of values the scan already produced.
    Returns (w, Texcl, contribute, new_T, new_done)."""
    one_minus = 1.0 - alpha
    l = jnp.log(one_minus)  # 0.0 on masked lanes (alpha == 0)
    logT = LT + _matmul_scan(l, triS)  # exclusive log prefix
    Texcl = jnp.exp(logT)  # serial transmittance
    contribute = (Texcl * one_minus >= T_EPS) & (done < 0.5)
    w = jnp.where(contribute, alpha * Texcl, 0.0)
    incl = jnp.where(contribute, logT + l, jnp.inf)
    m = jnp.min(incl, axis=1, keepdims=True)
    new_LT = jnp.where(jnp.isinf(m), LT, m)  # no contributing lane -> keep
    new_done = jnp.where(contribute[:, -1:], done, 1.0)
    return w, Texcl, contribute, new_LT, new_done


def _pixel_cols():
    """Tile-LOCAL pixel coords as [NPIX, 1] sublane columns."""
    lin = jax.lax.broadcasted_iota(jnp.int32, (NPIX, 1), 0)
    px = (lin % TILE).astype(jnp.float32)
    py = (lin // TILE).astype(jnp.float32)
    return px, py


def _moment_basis():
    """[NPIX, 8] monomial basis (1, px, py, px^2, px*py, py^2, 0, 0).

    Every entry is an integer <= 225 — bf16-exact — so the MXU moment matmul
    splits only the gradient operand. The backward's six conic/mean
    gradients are linear combinations of the moments
    m_ab = sum_px s * px^a * py^b, so ONE [8-sublane x full-lane] matmul
    replaces seven per-pair pixel reductions."""
    lin = jax.lax.broadcasted_iota(jnp.int32, (NPIX, 8), 0)
    col = jax.lax.broadcasted_iota(jnp.int32, (NPIX, 8), 1)
    px = (lin % TILE).astype(jnp.float32)
    py = (lin // TILE).astype(jnp.float32)
    vals = [jnp.ones_like(px), px, py, px * px, px * py, py * py,
            jnp.zeros_like(px), jnp.zeros_like(px)]
    out = jnp.zeros((NPIX, 8), jnp.float32)
    for c, v in enumerate(vals):
        out = jnp.where(col == c, v, out)
    return out


def _chunk_alpha(buf, px, py, ox, oy, lo, hi):
    """Vectorized per-chunk alphas [NPIX, KB] + intermediates.

    buf: [16, KB] plane-major record rows for this chunk (absolute means;
    the tile origin is subtracted from the [1, KB] mean rows — record planes
    broadcast against the pixel columns with NO transpose). Valid lanes are
    [lo, hi)."""
    xs = buf[0:1, :] - ox  # [1, KB] tile-local
    ys = buf[1:2, :] - oy
    conA = buf[2:3, :]
    conB = buf[3:4, :]
    conC = buf[4:5, :]
    opac = buf[8:9, :]
    dx = px - xs  # [NPIX, KB]
    dy = py - ys
    power = -0.5 * (conA * dx * dx + conC * dy * dy) - conB * dx * dy
    g_raw = jnp.exp(power)
    alpha = jnp.minimum(ALPHA_MAX, opac * g_raw)
    k_ids = jax.lax.broadcasted_iota(jnp.int32, (1, KB), 1)
    live = (power <= 0.0) & (alpha >= ALPHA_MIN) & (k_ids >= lo) & (k_ids < hi)
    alpha = jnp.where(live, alpha, 0.0)
    return alpha, g_raw, live, opac


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


class _LazyWriteRing:
    """Cross-instance lazy HBM write ring.

    The per-instance write-drain (wait the last WRING writes before the
    instance ends) costs ~0.2-0.5 us of DMA-completion latency per grid
    instance — at Mip-360 scale segments average ~1.4 chunks, so nearly
    every chunk pays it. In the ALIGNED layout each HBM block has exactly
    one owner write, so cross-instance ordering is free and a write only
    needs waiting when its VMEM slot is next REUSED — usually several
    instances later, by which point it long completed.

    ``pend`` is SMEM scratch [WRING+1] int32 persisting across the
    sequential grid (same guarantee the parity prefetch / tailbuf rely on):
    pend[k] = HBM block id of the outstanding write in slot k (-1 = none),
    pend[WRING] = monotone write counter (slot = counter % WRING — block
    ids can skip on early exit, so they can't index the ring themselves).
    Instance 0 calls init(); every instance calls push() per block; the
    LAST instance drains."""

    def __init__(self, buf, sem, pend, dst_at):
        self.buf, self.sem, self.pend, self.dst_at = buf, sem, pend, dst_at

    def _copy(self, slot, block):
        return pltpu.make_async_copy(self.buf.at[slot], self.dst_at(block),
                                     self.sem.at[slot])

    def init(self, t):
        @pl.when(t == 0)
        def _():
            for k in range(WRING):
                self.pend[k] = -1
            self.pend[WRING] = 0

    def push(self, block, value):
        slot = jax.lax.rem(self.pend[WRING], WRING)

        @pl.when(self.pend[slot] >= 0)
        def _():
            self._copy(slot, self.pend[slot]).wait()

        self.buf[slot] = value
        self._copy(slot, block).start()
        self.pend[slot] = block
        self.pend[WRING] = self.pend[WRING] + 1

    def drain(self, t):
        @pl.when(t == pl.num_programs(0) - 1)
        def _():
            for k in range(WRING):
                @pl.when(self.pend[k] >= 0)
                def _(k=k):
                    self._copy(k, self.pend[k]).wait()


class _PairCopy:
    """Two async copies driven as one ring entry (records + Texcl chunks
    share the ring indices in the stored-transmittance backward)."""

    def __init__(self, *copies):
        self.copies = copies

    def start(self):
        for c in self.copies:
            c.start()

    def wait(self):
        for c in self.copies:
            c.wait()


RING = 4  # in-instance streaming read slots (prefetch distance 3)


def _first_chunk_prefetch(starts_ref, counts_ref, dma_at, t, base, n_chunks):
    """Cross-instance pipelining of each tile's FIRST chunk: tbuf slots
    0..RING-1 stream within the instance; slots RING/RING+1 (by tile parity)
    hold chunk 0, prefetched by the PREVIOUS grid instance so the per-tile
    DMA stall is hidden (instance 0 self-starts). ``dma_at(base, ci, slot)``
    builds the chunk copy (a _PairCopy when two streams share the ring).
    Returns chunk 0's slot for this tile."""
    my0 = RING + jax.lax.rem(t, 2)

    @pl.when((t == 0) & (n_chunks > 0))
    def _():
        dma_at(base, 0, my0).start()

    @pl.when(t + 1 < pl.num_programs(0))
    def _():
        nstart = starts_ref[t + 1]
        ncount = counts_ref[t + 1]
        nbase, _, nn = _segment_bounds(nstart, ncount)

        @pl.when(nn > 0)
        def _():
            dma_at(nbase, 0, RING + jax.lax.rem(t + 1, 2)).start()

    return my0


def _start_ring(dma, n_chunks):
    """Pre-issue chunks 1..RING-2 of the in-instance read ring (chunk 0 is
    handled by the cross-instance parity prefetch; the loop body keeps the
    ring full by issuing chunk ci+RING-1 while processing chunk ci — that
    slot, (ci-1) mod RING, was consumed in the previous iteration)."""
    for c in range(1, RING - 1):
        @pl.when(c < n_chunks)
        def _(c=c):
            dma(c, c).start()


def _ring_step(dma, ci, n_chunks, my0):
    """Issue the look-ahead chunk and wait for chunk ci; returns its slot."""
    @pl.when(ci + RING - 1 < n_chunks)
    def _():
        dma(ci + RING - 1, jax.lax.rem(ci + RING - 1, RING)).start()

    slot = jnp.where(ci == 0, my0, jax.lax.rem(ci, RING))
    dma(ci, slot).wait()
    return slot


def _drain_reads(dma, ci_exit, n_chunks):
    """Wait the read-ring DMAs still in flight after an early loop exit.

    After processing chunks [0, ci_exit) the issued-but-unconsumed reads are
    exactly [ci_exit, min(n_chunks, ci_exit + RING - 1)); ci_exit >= 1
    whenever anything was issued (the loop always runs once), so chunk 0's
    parity slot is never outstanding and slot = ci mod RING."""
    for k in range(RING - 1):
        @pl.when((ci_exit + k < n_chunks) & (ci_exit > 0))
        def _(k=k):
            c = ci_exit + k
            dma(c, jax.lax.rem(c, RING)).wait()


def _fwd_kernel(store_t, starts_ref, counts_ref, nx_ref, bg_ref, records_hbm,
                out_ref, *rest):
    if store_t:
        texcl_hbm, tbuf, sem, wbuf, wsem, wpend = rest
        tring = _LazyWriteRing(wbuf, wsem, wpend,
                               lambda blk: texcl_hbm.at[blk])
    else:
        tbuf, sem = rest
        tring = None
    t = pl.program_id(0)
    start = starts_ref[t]
    count = counts_ref[t]
    base, lead, n_chunks = _segment_bounds(start, count)
    px, py = _pixel_cols()
    nx = nx_ref[0]
    ox = ((t % nx) * TILE).astype(jnp.float32)
    oy = ((t // nx) * TILE).astype(jnp.float32)

    def dma_at(b, ci, slot):
        return _read_dma(records_hbm, tbuf, sem, b, ci, slot)

    def dma(ci, slot):
        return dma_at(base, ci, slot)

    if store_t:
        tring.init(t)
    my0 = _first_chunk_prefetch(starts_ref, counts_ref, dma_at, t, base,
                                n_chunks)
    _start_ring(dma, n_chunks)
    triS, _ = _tri_mats(KB)

    def chunk_body(ci, carry):
        LT, done, C = carry  # [NPIX, 1] log-T, [NPIX, 1], [NPIX, 3]
        slot = _ring_step(dma, ci, n_chunks, my0)
        buf = tbuf[slot]  # [16, KB] plane-major — no transpose needed
        lo = jnp.maximum(lead - ci * KB, 0)
        hi = lead + count - ci * KB
        alpha, _, _, _ = _chunk_alpha(buf, px, py, ox, oy, lo, hi)
        w, Texcl, _, LT, done = _composite_chunk(alpha, LT, done, triS)
        if store_t:
            # store the serial transmittance so the backward skips the
            # whole replay scan (4 of its 18 per-chunk MXU passes): the
            # kernels are per-chunk COMPUTE-bound (BASELINE round-4 shape
            # sweep), so the extra [NPIX, KB] f32 write (~0.16 us/chunk at
            # HBM peak vs ~1.5 us/chunk compute) rides the existing ring
            # slack through the cross-instance lazy ring. Values are the
            # f32 Texcl the backward replay would recompute — bitwise
            # identical gradients. Chunk ci owns texcl block base//KB + ci
            # (aligned layout: segments start at KB boundaries, one owner
            # tile per block).
            tring.push(base // KB + ci, Texcl)
        colors = buf[5:8, :]  # [3, KB]
        # 3-pass hi/lo-bf16 color accumulation (vs HIGHEST's 6): the dropped
        # lo*lo term is ~2^-16 relative, and sum(w) <= 1 bounds the absolute
        # image error at ~1.5e-5 — invisible against the reference's f32 FMA.
        # Accumulated PIXELS-IN-SUBLANES ([NPIX, 3]) so the final background
        # composite broadcasts T ([NPIX, 1]) along lanes for free.
        C = C + _matmul_split3(w, colors, (((1,), (1,)), ((), ())))
        return LT, done, C

    LT0 = jnp.zeros((NPIX, 1), jnp.float32)
    D0 = jnp.zeros((NPIX, 1), jnp.float32)
    C0 = jnp.zeros((NPIX, 3), jnp.float32)

    # EARLY TILE EXIT (CUDA all-threads-done break): once every pixel has
    # latched done, every later chunk's carries are frozen and contributions
    # zero — skipping them is bit-identical. Only the in-flight read ring
    # needs draining (and the stored-T backward stops at the SAME chunk —
    # its done recurrence sees the same stored values — so the unwritten
    # texcl blocks past ci_exit are never read).
    def loop_step(s):
        ci, carry, _ = s
        new = chunk_body(ci, carry)
        return ci + 1, new, jnp.all(new[1] > 0.5)

    ci_exit, (LT, _, C), _ = jax.lax.while_loop(
        lambda s: (s[0] < n_chunks) & jnp.logical_not(s[2]),
        loop_step,
        (0, (LT0, D0, C0), False),
    )
    _drain_reads(dma, ci_exit, n_chunks)
    if store_t:
        # lazy ring: outstanding Texcl writes are awaited when their slot
        # is next reused (usually instances later); only the LAST instance
        # drains. No zero-fill: the backward never reads past its own early
        # exit, which matches ci_exit.
        tring.drain(t)
    # background composited IN-KERNEL: the kernel's output IS the final tile
    # image, so the XLA side keeps no separate color/trans streams (and the
    # backward needs no dcolor/dtrans plumbing — see S = <d_out, out>)
    col = jax.lax.broadcasted_iota(jnp.int32, (NPIX, 3), 1)
    bgv = jnp.where(col == 0, bg_ref[0],
                    jnp.where(col == 1, bg_ref[1], bg_ref[2]))
    out_ref[0] = C + jnp.exp(LT) * bgv


WRING = 3  # lazy gradient write-back slots (hide 2 chunks of write latency)


def _bwd_kernel(aligned, stored, starts_ref, counts_ref, nx_ref, records_hbm,
                *rest):
    rest = list(rest)
    texcl_hbm = rest.pop(0) if stored else None
    dout_ref, out_ref, dpairs_hbm, tbuf = rest[:4]
    rest = rest[4:]
    t2buf = rest.pop(0) if stored else None
    gbuf, tailbuf, sem = rest[:3]
    rest = rest[3:]
    sem2 = rest.pop(0) if stored else None
    gsem = rest.pop(0)
    gpend = rest.pop(0) if aligned else None
    t = pl.program_id(0)
    start = starts_ref[t]
    count = counts_ref[t]
    base, lead, n_chunks = _segment_bounds(start, count)
    px, py = _pixel_cols()
    nx = nx_ref[0]
    ox = ((t % nx) * TILE).astype(jnp.float32)
    oy = ((t // nx) * TILE).astype(jnp.float32)

    # With the background composited in-kernel, the VJP boundary is the tile
    # image itself: dC = d_out, and BOTH suppression terms fold into
    # S = <dC, C> + dT*T = <d_out, C + bg*T> = <d_out, out> — one per-pixel
    # dot of the upstream cotangent with the forward's own output. So the
    # only streams the backward needs are d_out and out (both already in the
    # kernel's pixels-in-sublanes frame; no XLA-side transpose/concat exists
    # anywhere in the chain). dC as [NPIX, 1] columns makes dbuf a pure-VPU
    # broadcast sum (an earlier revision burned 3 MXU passes on a K=3 matmul
    # plus an identity-matmul transpose for S)
    dC_cols = dout_ref[0]  # [NPIX, 3]
    S = jnp.sum(dout_ref[0] * out_ref[0], axis=1, keepdims=True)  # [NPIX, 1]
    basis = _moment_basis()
    triS, triI = _tri_mats(KB)
    # MERGED moment+dcolor operand: the pixel-moment matmul (basis^T s,
    # hi/lo-stacked) and the color gradient (split3 dC^T w) both contract
    # over the NPIX sublane axis, so a block-diagonal left operand computes
    # BOTH in ONE MXU dot — the output column dims (8 and 3) pad to the same
    # 128 lanes either way, so the merged dot costs the padded MACs of the
    # two it replaces minus one dot's fixed overhead. Column blocks are
    # disjoint, so the results are exactly the separate dots'. Constant per
    # tile (dC is the tile's cotangent) — built once outside the chunk loop.
    basis_bf = basis.astype(jnp.bfloat16)  # integer entries: bf16-exact
    dC_hi, dC_lo = _split_bf16(dC_cols)
    zero8 = jnp.zeros((NPIX, 8), jnp.bfloat16)
    zero3 = jnp.zeros((NPIX, 3), jnp.bfloat16)
    A_merged = jnp.concatenate([
        jnp.concatenate([basis_bf, zero3], axis=1),
        jnp.concatenate([basis_bf, zero3], axis=1),
        jnp.concatenate([zero8, dC_hi], axis=1),
        jnp.concatenate([zero8, dC_hi], axis=1),
        jnp.concatenate([zero8, dC_lo], axis=1),
    ], axis=0)  # [5*NPIX, 11]

    def dma_at(b, ci, slot):
        rec = _read_dma(records_hbm, tbuf, sem, b, ci, slot)
        if not stored:
            return rec
        # Texcl chunks ride the SAME ring indices as the record chunks
        return _PairCopy(rec, pltpu.make_async_copy(
            texcl_hbm.at[b // KB + ci], t2buf.at[slot], sem2.at[slot]))

    def dma(ci, slot):
        return dma_at(base, ci, slot)

    def dma_w(ci, gslot):
        return pltpu.make_async_copy(
            gbuf.at[gslot],
            dpairs_hbm.at[:, pl.ds(pl.multiple_of(base + ci * KB, KB), KB)],
            gsem.at[gslot],
        )

    if aligned:
        # each KB block has ONE owner write (no straddled chunks), so the
        # gradient writes go through the cross-instance lazy ring instead of
        # draining at every instance end
        gring = _LazyWriteRing(
            gbuf, gsem, gpend,
            lambda blk: dpairs_hbm.at[:, pl.ds(pl.multiple_of(blk * KB, KB),
                                               KB)])
        gring.init(t)
    my0 = _first_chunk_prefetch(starts_ref, counts_ref, dma_at, t, base,
                                n_chunks)
    _start_ring(dma, n_chunks)

    def chunk_body(ci, carry):
        LT, done, acc = carry  # log-T, stop latch, <dC,c_j> w_j prefix
        slot = _ring_step(dma, ci, n_chunks, my0)
        buf = tbuf[slot]  # [16, KB] plane-major
        lo = jnp.maximum(lead - ci * KB, 0)
        hi = lead + count - ci * KB
        alpha, g_raw, live, opac = _chunk_alpha(buf, px, py, ox, oy, lo, hi)
        colors = buf[5:8, :]  # [3, KB]
        # dbuf[px, k] = <dC[px], colors[k]>: 3 VPU broadcast FMAs of
        # [NPIX, 1] x [1, KB] (no MXU)
        dbuf = (dC_cols[:, 0:1] * colors[0:1, :]
                + dC_cols[:, 1:2] * colors[1:2, :]
                + dC_cols[:, 2:3] * colors[2:3, :])  # [NPIX, KB]

        if stored:
            # transmittance REREAD, not replayed: Texcl is the forward's own
            # f32 store, so the per-chunk scan (4 MXU passes) disappears and
            # the contribute/done recurrence is the same pure-VPU test
            # _composite_chunk applies — gradients stay bitwise identical
            Texcl = t2buf[slot]  # [NPIX, KB]
            contribute = ((Texcl * (1.0 - alpha) >= T_EPS)
                          & (done < 0.5))
            w = jnp.where(contribute, alpha * Texcl, 0.0)
            done = jnp.where(contribute[:, -1:], done, 1.0)
        else:
            w, Texcl, contribute, LT, done = _composite_chunk(
                alpha, LT, done, triS)
        # inclusive prefix of <dC, c_j> w_j, replayed in parallel (2-pass
        # bf16-split MXU scan: ~2^-16 relative, ample for a gradient prefix)
        acc_i = acc + _matmul_scan(dbuf * w, triI)  # [NPIX, KB]
        one_minus = jnp.maximum(1.0 - alpha, 1e-6)
        # Texcl == the serial T_i on contributing lanes; masked elsewhere
        # (S = <dC,C> + dT*T folds the two suppression terms into one)
        da_all = dbuf * Texcl - (S - acc_i) / one_minus
        da_all = jnp.where(contribute & (alpha > 0.0), da_all, 0.0)
        acc = acc_i[:, -1:]

        # chain rule over the chunk. With s = da*g_raw and tile-local pixel
        # moments m_ab = sum_px s * px^a py^b (ONE MXU matmul against the
        # bf16-exact monomial basis), the six conic/mean gradients are:
        #   dconA = -0.5*opac*(m20 - 2 xs m10 + xs^2 m00)
        #   dconB =   -opac*(m11 - xs m01 - ys m10 + xs ys m00)
        #   dconC = -0.5*opac*(m02 - 2 ys m01 + ys^2 m00)
        #   dmx   =  opac*(conA*(m10 - xs m00) + conB*(m01 - ys m00))
        #   dmy   =  opac*(conC*(m01 - ys m00) + conB*(m10 - xs m00))
        #   dopac =  m00
        # — every per-pair reduction over pixels lands in one [8, KB] result,
        # and the remaining algebra is [1, KB] row arithmetic.
        clamped = (opac * g_raw) > ALPHA_MAX
        s = jnp.where(clamped | (~live), 0.0, da_all) * g_raw  # [NPIX, KB]
        m_hi, m_lo = _split_bf16(s)
        w_hi, w_lo = _split_bf16(w)
        # ONE block-diagonal dot: rows 0-7 = pixel moments basis^T(s_hi+s_lo),
        # rows 8-10 = split3 color gradient dC^T w (see A_merged above)
        mm = jax.lax.dot_general(
            A_merged,
            jnp.concatenate([m_hi, m_lo, w_hi, w_lo, w_hi], axis=0),
            (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)  # [11, KB]
        m00 = mm[0:1, :]
        m10 = mm[1:2, :]
        m01 = mm[2:3, :]
        m20 = mm[3:4, :]
        m11 = mm[4:5, :]
        m02 = mm[5:6, :]
        xs = buf[0:1, :] - ox
        ys = buf[1:2, :] - oy
        conA = buf[2:3, :]
        conB = buf[3:4, :]
        conC = buf[4:5, :]
        cx = m10 - xs * m00  # centered first moments
        cy = m01 - ys * m00
        dconA = -0.5 * opac * (m20 - 2.0 * xs * m10 + xs * xs * m00)
        dconB = -opac * (m11 - xs * m01 - ys * m10 + xs * ys * m00)
        dconC = -0.5 * opac * (m02 - 2.0 * ys * m01 + ys * ys * m00)
        dmx = opac * (conA * cx + conB * cy)
        dmy = opac * (conC * cy + conB * cx)
        dcol = mm[8:11, :]  # [3, KB]

        gnew = jnp.concatenate(
            [dmx, dmy, dconA, dconB, dconC, dcol, m00,
             jnp.zeros((COLS - RECORD, KB), jnp.float32)],
            axis=0,
        )  # [COLS, KB] — rows land in place, no transpose needed
        if aligned:
            # KB-aligned segment starts: no chunk straddles two tiles, so
            # there is no previous-tile tail to merge (lo == 0 always) and
            # the write rides the cross-instance lazy ring
            gring.push(base // KB + ci, gnew)
        else:
            lane = jax.lax.broadcasted_iota(jnp.int32, (COLS, KB), 1)
            # boundary chunk: lanes < lo belong to the PREVIOUS tile, whose
            # last chunk IS this KB-aligned chunk (lo > 0 implies the
            # previous non-empty tile ended inside it). The sequential grid
            # lets its merged values ride along in the tailbuf scratch — a
            # VMEM copy instead of an HBM read-modify-write round trip.
            merged = jnp.where(lane < lo, tailbuf[:], gnew)

            # in-instance write ring: reclaim a gbuf slot only when the
            # write issued WRING chunks ago has drained (instead of
            # stalling on every chunk's write latency)
            gslot = jax.lax.rem(ci, WRING)

            @pl.when(ci >= WRING)
            def _():
                dma_w(ci - WRING, gslot).wait()

            gbuf[gslot] = merged
            dma_w(ci, gslot).start()

            @pl.when(ci == n_chunks - 1)
            def _():
                tailbuf[:] = merged

        return LT, done, acc

    LT0 = jnp.zeros((NPIX, 1), jnp.float32)
    D0 = jnp.zeros((NPIX, 1), jnp.float32)
    acc0 = jnp.zeros((NPIX, 1), jnp.float32)

    # EARLY TILE EXIT (CUDA all-threads-done break): once every pixel has
    # latched done, every remaining pair's gradient row is provably zero
    # (contribute is false everywhere), so the compute loop stops and a
    # DMA-only loop streams zero chunks into the remaining slots — the write
    # ring's chunk indices stay contiguous across the two loops, so the
    # wait/issue recurrence and the final drain are unchanged.
    def loop_step(s):
        ci, carry, _ = s
        new = chunk_body(ci, carry)
        return ci + 1, new, jnp.all(new[1] > 0.5)

    ci_exit, _, _ = jax.lax.while_loop(
        lambda s: (s[0] < n_chunks) & jnp.logical_not(s[2]),
        loop_step,
        (0, (LT0, D0, acc0), False),
    )
    _drain_reads(dma, ci_exit, n_chunks)

    if aligned:
        def zero_body(ci, _):
            gring.push(base // KB + ci,
                       jnp.zeros((COLS, KB), jnp.float32))
            return 0

        jax.lax.fori_loop(ci_exit, n_chunks, zero_body, 0)
        # lazy ring: writes are awaited when their slot is reused; only the
        # final grid instance drains
        gring.drain(t)
    else:
        def zero_body(ci, _):
            gslot = jax.lax.rem(ci, WRING)

            @pl.when(ci >= WRING)
            def _():
                dma_w(ci - WRING, gslot).wait()

            # memset each slot only on its first zero-loop visit
            @pl.when(ci < ci_exit + WRING)
            def _():
                gbuf[gslot] = jnp.zeros((COLS, KB), jnp.float32)

            dma_w(ci, gslot).start()
            return 0

        jax.lax.fori_loop(ci_exit, n_chunks, zero_body, 0)

        @pl.when(ci_exit < n_chunks)
        def _():
            # the tile's last written chunk is now all-zero; the next
            # instance's boundary merge must see that
            tailbuf[:] = jnp.zeros((COLS, KB), jnp.float32)

        # drain outstanding gradient writes before the next instance reads
        # its boundary chunk
        for back in range(WRING, 0, -1):
            @pl.when(n_chunks >= back)
            def _(back=back):
                dma_w(n_chunks - back,
                      jax.lax.rem(n_chunks - back, WRING)).wait()


def pallas_composite_fwd(records: jnp.ndarray, starts: jnp.ndarray,
                         counts: jnp.ndarray, nx: int, ny: int,
                         bg: jnp.ndarray, interpret: bool = False,
                         store_t: bool = False):
    """records: [16, NC] sorted compact pair record planes (9 live rows;
    NC a KB multiple); starts [n_tiles+1]; counts [n_tiles]; bg [3].
    Returns the final composited tile images out [n_tiles, NPIX, 3]
    (pixels in sublanes — out = C + T*bg, background applied in-kernel).

    ``store_t``: also return the per-(pixel, pair) serial transmittance
    Texcl as [NC//KB, NPIX, KB] f32 chunk blocks, for the stored-T backward
    (requires the KB-aligned segment layout — one owner tile per block)."""
    n_tiles = nx * ny
    nc = records.shape[1]
    scratch = [
        # slots 0..RING-1: in-instance streaming ring (prefetch
        # distance RING-1); RING/RING+1: cross-instance first-chunk
        # prefetch (by tile parity)
        pltpu.VMEM((RING + 2, COLS, KB), jnp.float32),  # tbuf
        pltpu.SemaphoreType.DMA((RING + 2,)),
    ]
    out_specs = pl.BlockSpec((1, NPIX, 3), lambda t, *_: (t, 0, 0),
                             memory_space=pltpu.VMEM)
    out_shape = jax.ShapeDtypeStruct((n_tiles, NPIX, 3), jnp.float32)
    if store_t:
        scratch += [
            pltpu.VMEM((WRING, NPIX, KB), jnp.float32),  # wbuf (Texcl ring)
            pltpu.SemaphoreType.DMA((WRING,)),
            pltpu.SMEM((WRING + 1,), jnp.int32),  # wpend (lazy-ring state)
        ]
        out_specs = [out_specs, pl.BlockSpec(memory_space=pl.ANY)]
        out_shape = [out_shape,
                     jax.ShapeDtypeStruct((nc // KB, NPIX, KB), jnp.float32)]
    res = pl.pallas_call(
        functools.partial(_fwd_kernel, store_t),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=4,
            grid=(n_tiles,),
            in_specs=[pl.BlockSpec(memory_space=pl.ANY)],
            out_specs=out_specs,
            scratch_shapes=scratch,
        ),
        compiler_params=pltpu.CompilerParams(
            # cross-instance first-chunk prefetch requires sequential grid
            # execution (single-core v5e runs it sequentially regardless)
            dimension_semantics=("arbitrary",),
            has_side_effects=bool(store_t),
        ),
        out_shape=out_shape,
        interpret=interpret,
    )(starts, counts, jnp.asarray([nx], jnp.int32),
      jnp.asarray(bg, jnp.float32), records)
    return res


def pallas_composite_bwd(records, starts, counts, nx: int, ny: int, out,
                         dout, interpret: bool = False,
                         aligned: bool = False, texcl=None):
    """Per-pair gradients [16, NC] (same compact layout as records).

    ``out`` is the forward's own output (the residual), ``dout`` the
    upstream cotangent — both [n_tiles, NPIX, 3], already in the kernel's
    pixels-in-sublanes frame. S = <d_out, out> is computed in-kernel, so
    there is NO XLA-side aux construction at all.

    ``aligned``: promise that every tile segment starts at a KB boundary
    (the production layout since _align_compact) — no chunk straddles two
    tiles, so the boundary tail-merge is skipped entirely.

    Unaligned boundary chunks are merged through a persistent VMEM
    tail-carry (the previous tile's last merged chunk), so the grid must
    execute sequentially ("arbitrary" semantics — single-core v5e anyway)."""
    n_tiles = nx * ny
    nc = records.shape[1]
    stored = texcl is not None
    assert not stored or aligned, "stored-T backward requires aligned layout"
    in_specs = [pl.BlockSpec(memory_space=pl.ANY)]
    if stored:
        in_specs.append(pl.BlockSpec(memory_space=pl.ANY))  # texcl blocks
    in_specs += [
        pl.BlockSpec((1, NPIX, 3), lambda t, *_: (t, 0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, NPIX, 3), lambda t, *_: (t, 0, 0),
                     memory_space=pltpu.VMEM),
    ]
    scratch = [pltpu.VMEM((RING + 2, COLS, KB), jnp.float32)]  # tbuf
    if stored:
        scratch.append(pltpu.VMEM((RING + 2, NPIX, KB), jnp.float32))  # t2buf
    scratch += [
        pltpu.VMEM((WRING, COLS, KB), jnp.float32),  # gbuf
        pltpu.VMEM((COLS, KB), jnp.float32),  # tailbuf (boundary carry)
        pltpu.SemaphoreType.DMA((RING + 2,)),  # sem (reads)
    ]
    if stored:
        scratch.append(pltpu.SemaphoreType.DMA((RING + 2,)))  # sem2 (texcl)
    scratch.append(pltpu.SemaphoreType.DMA((WRING,)))  # gsem (writes)
    if aligned:
        scratch.append(pltpu.SMEM((WRING + 1,), jnp.int32))  # gpend (lazy)
    operands = [starts, counts, jnp.asarray([nx], jnp.int32), records]
    if stored:
        operands.append(texcl)
    operands += [dout, out]
    dpairs = pl.pallas_call(
        functools.partial(_bwd_kernel, aligned, stored),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=3,
            grid=(n_tiles,),
            in_specs=in_specs,
            out_specs=pl.BlockSpec(memory_space=pl.ANY),
            scratch_shapes=scratch,
        ),
        out_shape=jax.ShapeDtypeStruct((COLS, nc), jnp.float32),
        compiler_params=pltpu.CompilerParams(
            has_side_effects=True, dimension_semantics=("arbitrary",)
        ),
        interpret=interpret,
    )(*operands)
    return dpairs


ALIGN_CPB = 8  # output chunks relocated per align-kernel instance


def _align_kernel(chunk_tile_ref, starts_ref, starts_al_ref, gidx_hbm,
                  out_ref, vbuf, sem, *, n_tiles: int, sentinel: int,
                  nc: int):
    """Relocate compact pair indices into the KB-aligned segment layout.

    Instance g handles output chunks [g*CPB, (g+1)*CPB): for each, looks up
    its owning tile t (scalar-prefetched chunk->tile map), DMAs the KB run
    starting at starts[t] + (chunk_pos - starts_al[t]) from the UNALIGNED
    gidx array, masks lanes past the tile's real count to ``sentinel``
    (= P: sorts after every real gaussian in the backward routing and
    clamp-gathers a garbage record row the compositing masks out), and
    writes it at the aligned position. Pure data movement: ~nc*4 bytes
    read + written through VMEM."""
    g = pl.program_id(0)
    reads = []
    for j in range(ALIGN_CPB):
        c = g * ALIGN_CPB + j
        t = chunk_tile_ref[c]
        k = c * KB - starts_al_ref[t]  # offset within the aligned segment
        # clamp so the window read stays inside the 2KB-padded source buffer
        # (sentinel chunks compute src past the real total; masked below)
        src = jnp.clip(starts_ref[t] + k, 0, nc)
        # Mosaic DMAs slice the lane dim at 128 alignment only: read the
        # ALIGNED 2*KB window covering [src, src+KB) and rotate lanes by the
        # residue afterwards (tpu.dynamic_rotate takes a traced shift)
        base2 = pl.multiple_of((src // KB) * KB, KB)
        cp = pltpu.make_async_copy(
            gidx_hbm.at[:, pl.ds(base2, 2 * KB)], vbuf.at[j], sem.at[j])
        cp.start()
        reads.append((cp, t, k, src - (src // KB) * KB))
    lane = jax.lax.broadcasted_iota(jnp.int32, (1, KB), 1)
    for j, (cp, t, k, r) in enumerate(reads):
        cp.wait()
        # window[r + lane] == roll(window, 2KB - r)[lane] for lane < KB
        rolled = pltpu.roll(vbuf[j], 2 * KB - r, axis=1)[:, :KB]
        count_t = starts_ref[t + 1] - starts_ref[t]
        valid = (k + lane < count_t) & (t < n_tiles)
        out_ref[0, pl.ds(j * KB, KB)] = jnp.where(
            valid, rolled, jnp.int32(sentinel))[0]


def _align_compact(gidx_c, starts, starts_al, n_tiles: int, sentinel: int,
                   interpret: bool = False):
    """[nc] unaligned compact gaussian indices -> [nc] KB-aligned layout.

    ``starts``: real per-tile segment starts [n_tiles+1]; ``starts_al``: the
    KB-aligned starts (clamped to nc). Padding lanes and lanes beyond the
    aligned total carry ``sentinel``. nc must be a multiple of
    ALIGN_CPB*KB."""
    nc = gidx_c.shape[0]
    n_chunks = nc // KB
    assert n_chunks % ALIGN_CPB == 0, nc
    # chunk -> owning tile: t(c) = #{t' : starts_al[t'+1] <= c*KB}, i.e. the
    # first tile whose aligned end is past the chunk (n_tiles for chunks
    # beyond the aligned total). One exact 0/1 bf16 matmul (counts < 2^24).
    ends_chunks = (starts_al[1:] // KB).astype(jnp.int32)  # [n_tiles]
    cpos = jnp.arange(n_chunks, dtype=jnp.int32)
    le = (ends_chunks[:, None] <= cpos[None, :]).astype(jnp.bfloat16)
    chunk_tile = jax.lax.dot_general(
        jnp.ones((1, n_tiles), jnp.bfloat16), le, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )[0].astype(jnp.int32)
    # pad the source so the last chunk's aligned 2*KB window read never
    # leaves the buffer
    gidx_pad = jnp.concatenate(
        [gidx_c, jnp.zeros(2 * KB, gidx_c.dtype)])[None, :]  # [1, nc+2KB]
    out = pl.pallas_call(
        functools.partial(_align_kernel, n_tiles=n_tiles, sentinel=sentinel,
                          nc=nc),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=3,
            grid=(n_chunks // ALIGN_CPB,),
            in_specs=[pl.BlockSpec(memory_space=pl.ANY)],
            out_specs=pl.BlockSpec((1, ALIGN_CPB * KB), lambda g, *_: (0, g),
                                   memory_space=pltpu.VMEM),
            scratch_shapes=[
                pltpu.VMEM((ALIGN_CPB, 1, 2 * KB), jnp.int32),
                pltpu.SemaphoreType.DMA((ALIGN_CPB,)),
            ],
        ),
        out_shape=jax.ShapeDtypeStruct((1, nc), jnp.int32),
        interpret=interpret,
    )(chunk_tile, starts, starts_al, gidx_pad)
    return out[0]


def _aligned_starts(starts: jnp.ndarray, nc: int) -> jnp.ndarray:
    """KB-aligned per-tile segment starts (clamped to the nc budget) and the
    UNCLAMPED aligned total (for the gradient-drop truncation guard)."""
    counts = starts[1:] - starts[:-1]
    aligned = -(-counts // KB) * KB
    total_raw = jnp.sum(aligned)  # may exceed nc (truncation)
    starts_al = jnp.concatenate(
        [jnp.zeros(1, jnp.int32),
         jnp.cumsum(aligned).astype(jnp.int32)])
    return jnp.minimum(starts_al, nc), total_raw


def _segment_starts(tiles_c: jnp.ndarray, n_tiles: int) -> jnp.ndarray:
    """starts[t] = first index of tile t in the SORTED compact tile ids
    (== searchsorted(tiles_c, arange(n_tiles+1)), t = n_tiles giving the
    real-pair count, sentinels sorting last).

    searchsorted's scan_unrolled form costs ~log2(NC) rounds of [n_tiles+1]
    SERIAL gather elements from HBM (~1.8 ms at NC=1M). This dense form does
    one [NB, Q] block-max compare + an MXU column-sum (full blocks strictly
    below each query) + ONE row gather of each query's boundary block —
    ~1.3 ms, exact (tools/profile_glue5.py, chained timing)."""
    nc = tiles_c.shape[0]
    if nc == 0:
        return jnp.zeros(n_tiles + 1, jnp.int32)
    BS = 128  # nc is a KB=128 multiple by construction
    nb = nc // BS
    assert nb >= 1, f"nc={nc} must be a multiple of {BS}"
    blk = tiles_c.reshape(nb, BS)
    bmax = blk[:, -1]  # block maxima (input sorted)
    q = jnp.arange(n_tiles + 1, dtype=jnp.int32)
    lt = (bmax[:, None] < q[None, :]).astype(jnp.bfloat16)
    nfull = jax.lax.dot_general(
        jnp.ones((1, nb), jnp.bfloat16), lt, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )[0].astype(jnp.int32)  # 0/1 bf16 inputs, f32 accumulate: exact
    b = jnp.minimum(nfull, nb - 1)
    rowsb = blk[b]  # [Q, BS] boundary block of each query
    part = (rowsb < q[:, None]).sum(axis=1).astype(jnp.int32)
    inside = nfull < nb
    return jnp.where(inside, nfull * BS + part, nc).astype(jnp.int32)


# ------------------------------------------------------------- full wrapper


@functools.partial(jax.custom_vjp, nondiff_argnums=(4, 5, 6, 7))
def _composite(records, starts, counts, bg, nx, ny, interpret, aligned=False):
    return pallas_composite_fwd(records, starts, counts, nx, ny, bg,
                                interpret=interpret)


def _composite_fwd(records, starts, counts, bg, nx, ny, interpret,
                   aligned=False):
    if aligned:
        # aligned layout -> store the serial transmittance so the backward
        # skips its replay scan (fwd+bwd drop from 18 to 14 per-chunk MXU
        # passes; the store is bitwise what the replay recomputes). The
        # no-grad primal (_composite) never pays the store.
        out, texcl = pallas_composite_fwd(records, starts, counts, nx, ny,
                                          bg, interpret=interpret,
                                          store_t=True)
    else:
        out = pallas_composite_fwd(records, starts, counts, nx, ny, bg,
                                   interpret=interpret)
        texcl = None
    return out, (records, starts, counts, bg, out, texcl)


def _composite_bwd(nx, ny, interpret, aligned, res, dout):
    records, starts, counts, bg, out, texcl = res
    dpairs = pallas_composite_bwd(
        records, starts, counts, nx, ny, out, dout, interpret=interpret,
        aligned=aligned, texcl=texcl,
    )
    # lanes past the last valid pair were never written (uninitialized HBM)
    n_real = starts[-1]
    lane = jnp.arange(dpairs.shape[1], dtype=jnp.int32)
    dpairs = jnp.where((lane < n_real)[None, :], dpairs, 0.0)
    # bg is non-differentiable by contract (the reference CUDA rasterizer
    # returns no background gradient either)
    return dpairs, None, None, jnp.zeros_like(bg)


_composite.defvjp(_composite_fwd, _composite_bwd)


@jax.custom_vjp
def _gather_pairs(records, gidx_c, v_real, ends_g, counts_g):
    """records[gidx_c]: the ONE flat row gather that reconstructs the sorted
    compact pair records [NC, 9] from per-gaussian records [P, 9].

    The transpose is a per-gaussian segment sum over the pair cotangents —
    scatter-free: one gidx-keyed payload sort groups each gaussian's pairs
    contiguously, then a cumsum + boundary diff (boundaries from the EXACT
    emitted counts computed during binning) reduces the segments."""
    del v_real, ends_g, counts_g
    return records[gidx_c].T  # [9, NC] plane-major (padded to 16 by caller)


def _gather_pairs_fwd(records, gidx_c, v_real, ends_g, counts_g):
    return records[gidx_c].T, (
        gidx_c, v_real, ends_g, counts_g, records.shape[0])


def _gather_pairs_bwd(res, d):
    gidx_c, v_real, ends_g, counts_g, P = res
    r, nc = d.shape  # [9, NC] plane-major: each payload is a contiguous row
    rows = jnp.arange(nc, dtype=jnp.int32)
    # sentinel slots (>= v_real) carry a REAL gaussian index in the key low
    # bits; rebucket them past every segment so boundaries stay aligned
    gkey = jnp.where(rows < v_real, gidx_c, jnp.int32(P))
    # payload sort: drag the 9 f32 planes through the merge passes. The
    # round-3 "permutation sort + one row gather" variant measured 2.8x
    # faster under a broken timing harness and 3.3x SLOWER under honest
    # chained timing (tools/profile_glue4.py: 9.1 vs 30.4 ms — a random row
    # gather from a [NC, 9] HBM table costs ~20 ms; TPU gathers serialize,
    # so keeping the planes as sort payloads is the right trade at this
    # table size)
    out = jax.lax.sort((gkey,) + tuple(d[c] for c in range(r)), num_keys=1)
    # stacked [NC, 9] cumsum + row gathers. The "nine 1-D cumsums + 1-D
    # boundary gathers" variant measured 3.4 ms faster in ISOLATION
    # (tools/profile_glue5.py, 5.1 vs 8.5 ms) but cost +16 ms on the
    # COMPOSED train step (69.7 vs 53.6 ms, bisected 2026-08-19): inside the
    # full backward XLA schedules the nine dependent 1-D scans serially
    # against the surrounding work, where the single [NC, 9] scan + two row
    # gathers overlap fine. Isolated stage wins must be re-validated through
    # the composed step before shipping.
    cum = jnp.cumsum(jnp.stack(out[1:], axis=-1), axis=0)  # [NC, 9]
    cum0 = jnp.concatenate([jnp.zeros((1, r), cum.dtype), cum], axis=0)
    hi = cum0[jnp.minimum(ends_g, nc)]
    lo = cum0[jnp.minimum(ends_g - counts_g, nc)]
    d_rec = hi - lo
    # truncated step (emitted pairs > NC budget): the boundaries are invalid
    # — drop this step's gradients (the trainer widens nc_pairs on the
    # binning_real_pairs telemetry and retraces)
    d_rec = jnp.where(ends_g[-1] <= nc, d_rec, 0.0)
    return d_rec, None, None, None, None


_gather_pairs.defvjp(_gather_pairs_fwd, _gather_pairs_bwd)


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
    nc_pairs: int = 0,
    return_stats: bool = False,
):
    """Tile-binned rasterization via the Pallas kernels -> [3, H, W].

    Same three-tier binning as tiles.rasterize_tiled; ONE payload-free u32
    key sort + compact row gather builds the per-tile segments; compositing +
    backward run in the hand-written kernels (no k_max truncation).
    ``nc_pairs``: compact pair budget (0 = min(DEFAULT_NC, slot count));
    saturation is visible as ``real_pairs`` in ``binning_saturation``.

    Per-tile segments are CHUNK-ALIGNED in the compact layout (every
    segment starts at a KB boundary, via ``_align_compact``): with the
    unaligned dense layout nearly every KB chunk straddled two tiles at
    production scale (mean segment ~119 pairs at Mip-360 scale) and was
    processed TWICE by the compositing kernels — 7541 vs 5455 chunk
    processings measured at the bench scene, a 28% kernel-time tax. The
    padding costs ~nc*4 bytes of DMA in the align kernel and sentinel lanes
    the kernels already mask.

    ``return_stats``: also return exact in-graph budget telemetry
    {nc_demand (aligned slots the scene wants — the widening signal),
    nc_real (post-cull emitted pairs that survived the slice),
    grad_dropped (1 when this step's raster gradients were zeroed because
    the aligned demand overflowed nc)}."""
    nx = -(-width // TILE)
    ny = -(-height // TILE)
    n_tiles = nx * ny

    visible = proj.radii > 0
    order = jnp.argsort(jnp.where(visible, proj.depths, jnp.inf))
    # inverse permutation via a key sort of (order, iota): measured 1.97 ms
    # vs 3.50 ms for the disjoint iota scatter at P=131k (tools/
    # profile_glue4.py, chained timing — TPU scatters serialize even when
    # disjoint; the sort's merge passes pipeline)
    P_all = order.shape[0]
    iota = jnp.arange(P_all, dtype=jnp.int32)
    _, inv_gorder = jax.lax.sort(
        (order.astype(jnp.int32), iota), num_keys=1)
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
    rec_ng = jax.lax.stop_gradient(records)
    key, tile_ids, gidx_all, counts_g, gbits = _fused_pair_keys(
        means2d_sorted, radii_f, vis, nx, ny, TILE, t_max,
        overflow_k=overflow_k, t_max_big=t_max_big,
        mid_k=mid_k, t_max_mid=t_max_mid,
        conics=rec_ng[:, 2:5], opac=rec_ng[:, 8],
    )
    n_slots = P * t_max + mid_k * t_max_mid + overflow_k * t_max_big
    # nc is a multiple of the align kernel's instance granularity (and
    # thereby of KB); the slot padding below guarantees the slice fits
    ncb = ALIGN_CPB * KB
    nc = min(-(-(nc_pairs or DEFAULT_NC) // ncb) * ncb,
             -(-n_slots // ncb) * ncb)
    n_slots_pad = max(-(-n_slots // KB) * KB, nc)

    if key is not None:
        pad = n_slots_pad - n_slots
        if pad:
            sentinel = jnp.uint32(n_tiles) << gbits
            key = jnp.concatenate([key, jnp.full(pad, sentinel, jnp.uint32)])
        skey = jax.lax.sort((key,), num_keys=1)[0][:nc]
        gidx_c = jax.lax.bitwise_and(
            skey, jnp.uint32((1 << gbits) - 1)).astype(jnp.int32)
        tiles_c = jax.lax.shift_right_logical(
            skey, jnp.uint32(gbits)).astype(jnp.int32)
    else:
        pad = n_slots_pad - n_slots
        if pad:
            tile_ids = jnp.concatenate(
                [tile_ids, jnp.full(pad, n_tiles, jnp.int32)])
            gidx_all = jnp.concatenate([gidx_all, jnp.zeros(pad, jnp.int32)])
        tiles_s, gidx_s = jax.lax.sort((tile_ids, gidx_all), num_keys=2)
        tiles_c, gidx_c = tiles_s[:nc], gidx_s[:nc]

    starts = _segment_starts(tiles_c, n_tiles)
    # chunk-aligned layout: every tile segment starts at a KB boundary
    starts_al, al_total_raw = _aligned_starts(starts, nc)
    counts_k = jnp.minimum(starts[1:] - starts[:-1],
                           starts_al[1:] - starts_al[:-1])
    gidx_al = _align_compact(gidx_c, starts, starts_al, n_tiles, P,
                             interpret=interpret)
    ends_g = jnp.cumsum(counts_g).astype(jnp.int32)  # [P] inclusive
    # truncated aligned layout (demand > nc budget): trailing tiles were cut
    # — drop this step's raster gradients (the trainer widens nc from the
    # nc_demand telemetry and retraces), by tripping _gather_pairs_bwd's
    # existing ends_g[-1] <= nc guard. The clamped boundary gathers stay
    # in-bounds, and d_rec is zeroed before they matter.
    ends_g = jnp.where(al_total_raw <= nc, ends_g, jnp.int32(nc + 1))

    # padding lanes carry the P sentinel: the row gather clamps them to a
    # garbage record the kernels mask (hi bound), and the backward routing
    # sorts them past every real gaussian — so v_real is the whole buffer
    recs_c = _gather_pairs(records, gidx_al, jnp.int32(nc), ends_g, counts_g)
    records_t = jnp.concatenate(
        [recs_c, jnp.zeros((COLS - RECORD, nc), jnp.float32)], axis=0
    )  # [16, NC]; the concat VJP is a row slice

    out = _composite(records_t, starts_al, counts_k,
                     jnp.asarray(bg_color, jnp.float32), nx, ny, interpret,
                     True)
    # out [nt, NPIX, 3] is the FINAL tile image (bg composited in-kernel);
    # one relayout to [3, H, W] is the only XLA op left on the image path
    img = out.reshape(ny, nx, TILE, TILE, 3)
    img = img.transpose(4, 0, 2, 1, 3).reshape(3, ny * TILE, nx * TILE)
    img = img[:, :height, :width]
    if return_stats:
        stats = {
            "nc_demand": al_total_raw.astype(jnp.int32),
            "nc_real": starts[n_tiles],
            "grad_dropped": (al_total_raw > nc).astype(jnp.int32),
        }
        return img, stats
    return img
