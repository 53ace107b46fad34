"""Chunk-aligned compact segment layout (round 5).

Every per-tile pair segment starts at a KB boundary so no compositing chunk
straddles two tiles (the unaligned layout double-processed ~28% of chunks at
Mip-360 scale). These tests pin the relocation kernel and the budget
telemetry; end-to-end image/gradient parity is covered by
test_pallas_rasterizer.py which runs the whole pipeline through the aligned
path.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from sixdgs_tpu.ops.rasterizer.pallas_tiles import (
    ALIGN_CPB, KB, _align_compact, _aligned_starts,
)


def _np_reference(gidx, starts, nc, sentinel):
    """Straightforward numpy model of the aligned relocation."""
    counts = starts[1:] - starts[:-1]
    aligned = -(-counts // KB) * KB
    starts_al = np.minimum(
        np.concatenate([[0], np.cumsum(aligned)]), nc).astype(np.int32)
    out = np.full(nc, sentinel, np.int32)
    for t in range(len(counts)):
        n = min(counts[t], starts_al[t + 1] - starts_al[t])
        out[starts_al[t]:starts_al[t] + n] = gidx[starts[t]:starts[t] + n]
    return out, starts_al


def _run_case(counts, nc, P=1000, seed=0):
    """Build a synthetic sorted compact layout with the given per-tile
    counts, align it, and compare against the numpy model."""
    counts = np.asarray(counts, np.int32)
    n_tiles = len(counts)
    starts = np.concatenate([[0], np.cumsum(counts)]).astype(np.int32)
    assert starts[-1] <= nc
    rng = np.random.default_rng(seed)
    gidx = np.full(nc, -1, np.int32)
    gidx[:starts[-1]] = rng.integers(0, P, starts[-1])

    starts_j = jnp.asarray(starts)
    starts_al, total_raw = jax.jit(
        lambda s: _aligned_starts(s, nc))(starts_j)
    got = jax.jit(lambda g, s, sa: _align_compact(
        g, s, sa, n_tiles, P, interpret=True))(
        jnp.asarray(gidx), starts_j, starts_al)

    want, want_starts_al = _np_reference(gidx, starts, nc, P)
    np.testing.assert_array_equal(np.asarray(starts_al), want_starts_al)
    aligned = (-(-counts // KB) * KB).sum()
    assert int(total_raw) == aligned
    np.testing.assert_array_equal(np.asarray(got), want)
    return int(total_raw)


class TestAlignCompact:
    def test_basic_segments(self):
        # mix of sub-chunk, exact-chunk, and multi-chunk segments + empties
        _run_case([5, 0, 128, 129, 300, 0, 1, 127], nc=2048)

    def test_all_empty(self):
        total = _run_case([0] * 16, nc=1024)
        assert total == 0

    def test_exact_fill(self):
        # aligned demand exactly equals nc
        _run_case([128] * 8, nc=1024)

    def test_truncation_drops_trailing_tiles(self):
        # aligned demand (4*128 + 2*128 = 768... make it overflow nc=1024)
        counts = [100, 200, 300, 150, 90, 130]  # aligned: 128*(1+2+3+2+1+2)=1408
        nc = 1024
        n_tiles = len(counts)
        starts = np.concatenate([[0], np.cumsum(counts)]).astype(np.int32)
        starts_j = jnp.asarray(starts)
        starts_al, total_raw = jax.jit(
            lambda s: _aligned_starts(s, nc))(starts_j)
        assert int(total_raw) == 1408 and int(total_raw) > nc
        # clamped starts stay within the budget and are KB multiples
        sa = np.asarray(starts_al)
        assert sa.max() == nc and (sa % KB == 0).all()
        got = jax.jit(lambda g, s, sa_: _align_compact(
            g, s, sa_, n_tiles, 1000, interpret=True))(
            jnp.arange(1024, dtype=jnp.int32), starts_j, starts_al)
        # tiles that fit are relocated; the clamped kernel counts
        # min(count, aligned diff) govern what the compositor would read
        counts_k = np.minimum(np.diff(starts), np.diff(sa))
        for t in range(n_tiles):
            seg = np.asarray(got)[sa[t]:sa[t] + counts_k[t]]
            np.testing.assert_array_equal(
                seg, np.arange(starts[t], starts[t] + counts_k[t]))

    def test_nc_multiple_contract(self):
        assert 1024 % (ALIGN_CPB * KB) == 0

    @pytest.mark.parametrize("seed", [1, 2, 3])
    def test_randomized(self, seed):
        rng = np.random.default_rng(seed)
        counts = rng.integers(0, 260, 20)
        nc = int((-(-counts.sum() // 1024) * 1024) + 1024 * 4)
        _run_case(counts, nc=nc, seed=seed)


class TestRasterizerStats:
    def test_return_stats_contract(self):
        """rasterize_pallas(return_stats=True) reports exact aligned demand
        and the grad-drop flag on a tiny scene (interpret mode)."""
        from sixdgs_tpu.ops.rasterizer.pallas_tiles import rasterize_pallas
        from sixdgs_tpu.ops.rasterizer.projection import ProjectedGaussians

        P = 8
        rng = np.random.default_rng(0)
        proj = ProjectedGaussians(
            means2d=jnp.asarray(rng.uniform(4, 28, (P, 2)), jnp.float32),
            depths=jnp.asarray(rng.uniform(1, 5, P), jnp.float32),
            radii=jnp.full((P,), 3, jnp.int32),
            conics=jnp.tile(jnp.asarray([[0.5, 0.0, 0.5]], jnp.float32),
                            (P, 1)),
            colors=jnp.asarray(rng.uniform(0, 1, (P, 3)), jnp.float32),
            opacities=jnp.full((P,), 0.7, jnp.float32),
        )
        img, stats = rasterize_pallas(
            proj, 32, 32, jnp.zeros(3), interpret=True, return_stats=True)
        assert img.shape == (3, 32, 32)
        assert int(stats["grad_dropped"]) == 0
        real = int(stats["nc_real"])
        demand = int(stats["nc_demand"])
        assert 0 < real <= demand
        assert demand % KB == 0
