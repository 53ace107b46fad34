"""Binning key-builder equivalence: the payload-free fused-key path
(_fused_pair_keys, the Pallas pipeline's input) must emit exactly the same
(tile, gaussian) pair multiset as the reference-shaped _make_pair_keys, and
its per-gaussian emitted counts must match — those counts are the backward
routing's segment boundaries, so an off-by-one silently corrupts gradients."""

import numpy as np
import jax.numpy as jnp
import pytest

from sixdgs_tpu.ops.rasterizer.tiles import _fused_pair_keys, _make_pair_keys


def make_inputs(P, nx, ny, tile=16, seed=0, big=False):
    rng = np.random.default_rng(seed)
    W, H = nx * tile, ny * tile
    means = rng.uniform([-10, -10], [W + 10, H + 10], size=(P, 2))
    radii = rng.uniform(1.0, (220.0 if big else 40.0), size=P)
    vis = rng.uniform(size=P) > 0.15
    return (jnp.asarray(means, jnp.float32), jnp.asarray(radii, jnp.float32),
            jnp.asarray(vis))


def pair_multiset_from_make(means, radii, vis, nx, ny, n_tiles, t_max=16,
                            **kw):
    tile_ids, pair_gidx, *_ = _make_pair_keys(means, radii, vis, nx, ny, 16,
                                              t_max, **kw)
    t = np.asarray(tile_ids)
    g = np.asarray(pair_gidx)
    valid = t < n_tiles
    return np.sort(t[valid].astype(np.int64) * (1 << 32) + g[valid])


class TestFusedPairKeys:
    @pytest.mark.parametrize("seed,big", [(0, False), (1, True), (2, False)])
    def test_matches_make_pair_keys(self, seed, big):
        P, nx, ny = 500, 12, 9
        n_tiles = nx * ny
        means, radii, vis = make_inputs(P, nx, ny, seed=seed, big=big)
        kw = dict(overflow_k=16, t_max_big=256, mid_k=64, t_max_mid=32)

        key, tile_ids, gidx, counts_g, gbits = _fused_pair_keys(
            means, radii, vis, nx, ny, 16, 16, **kw)
        assert key is not None  # small problem: fused u32 fits
        k = np.asarray(key).astype(np.int64)
        t = k >> gbits
        g = k & ((1 << gbits) - 1)
        valid = t < n_tiles
        fused = np.sort(t[valid] * (1 << 32) + g[valid])

        ref = pair_multiset_from_make(means, radii, vis, nx, ny, n_tiles, **kw)
        np.testing.assert_array_equal(fused, ref)

        # counts_g = exact per-gaussian (depth-rank) emitted pair counts
        hist = np.bincount(g[valid], minlength=P)
        np.testing.assert_array_equal(np.asarray(counts_g), hist)

    def test_fallback_two_key_path(self):
        """When tile-bits + gaussian-bits exceed 32, the builder returns the
        unfused (tile_ids, gidx) pair for a 2-key sort; same multiset."""
        P = 1 << 16  # gbits 16
        nx = ny = 400  # n_tiles 160000 -> 18 bits; 16 + 18 > 32
        n_tiles = nx * ny
        means, radii, vis = make_inputs(P, nx, ny, seed=3)
        kw = dict(overflow_k=8, t_max_big=64, mid_k=32, t_max_mid=16)

        key, tile_ids, gidx, counts_g, gbits = _fused_pair_keys(
            means, radii, vis, nx, ny, 16, 4, **kw)
        assert key is None and tile_ids is not None
        t = np.asarray(tile_ids).astype(np.int64)
        g = np.asarray(gidx).astype(np.int64)
        valid = t < n_tiles
        fused = np.sort(t[valid] * (1 << 32) + g[valid])
        ref = pair_multiset_from_make(means, radii, vis, nx, ny, n_tiles,
                                      t_max=4, **kw)
        np.testing.assert_array_equal(fused, ref)
        hist = np.bincount(g[valid], minlength=P)
        np.testing.assert_array_equal(np.asarray(counts_g), hist)
