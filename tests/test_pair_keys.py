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


class TestConicCulling:
    def test_culling_reduces_pairs_preserving_coverage(self):
        """With conics/opacity given, _fused_pair_keys drops rect tiles the
        ellipse never reaches at alpha >= 1/255 — strictly fewer pairs, and
        every culled (tile, gaussian) pair's exact tile-rect quadratic min
        exceeds log(opac/ALPHA_MIN) (zero contribution on every pixel)."""
        from sixdgs_tpu.ops.rasterizer.compositing import ALPHA_MIN
        from sixdgs_tpu.ops.rasterizer.tiles import _tile_min_quadratic

        rng = np.random.default_rng(8)
        P, nx, ny = 400, 10, 8
        means, radii, vis = make_inputs(P, nx, ny, seed=8)
        # anisotropic conics (normalized from random SPD matrices) + opacities
        a = rng.uniform(0.01, 0.2, size=P)
        c = rng.uniform(0.01, 0.2, size=P)
        b = rng.uniform(-1, 1, size=P) * 0.9 * np.sqrt(a * c)
        conics = jnp.asarray(np.stack([a, b, c], -1), jnp.float32)
        opac = jnp.asarray(rng.uniform(0.01, 1.0, size=P), jnp.float32)

        kw = dict(overflow_k=16, t_max_big=256, mid_k=64, t_max_mid=32)
        key0, *_rest0 = _fused_pair_keys(means, radii, vis, nx, ny, 16, 16, **kw)
        key1, _, _, counts1, gbits = _fused_pair_keys(
            means, radii, vis, nx, ny, 16, 16, conics=conics, opac=opac, **kw)
        n_tiles = nx * ny

        def decode(key):
            k = np.asarray(key).astype(np.int64)
            t = k >> gbits
            g = k & ((1 << gbits) - 1)
            valid = t < n_tiles
            return set(zip(t[valid].tolist(), g[valid].tolist()))

        full, culled = decode(key0), decode(key1)
        assert culled < full  # strict subset, strictly fewer
        assert len(culled) == int(np.asarray(counts1).sum())
        # every dropped pair is genuinely unreachable at ALPHA_MIN
        dropped = np.asarray(sorted(full - culled), np.int64)
        t, g = dropped[:, 0], dropped[:, 1]
        qmin = np.asarray(_tile_min_quadratic(
            jnp.asarray((t % nx)[None, :].T % nx).reshape(-1, 1).astype(jnp.int32),
            jnp.asarray((t // nx)).reshape(-1, 1).astype(jnp.int32),
            jnp.asarray(np.asarray(means)[g, 0]),
            jnp.asarray(np.asarray(means)[g, 1]),
            conics[g, 0], conics[g, 1], conics[g, 2], 16,
        )).reshape(-1)
        qmax = np.log(np.asarray(opac)[g] / ALPHA_MIN)
        assert np.all(qmin > qmax), (qmin.max(), qmax.min())


class TestTileMinQuadratic:
    def test_lower_bounds_every_pixel(self):
        """The continuous box min must lower-bound the quadratic at every
        integer pixel of the tile (conservativeness = the cull can never
        drop a contributing pair), and must be tight: equal to the brute
        grid min when the minimizing pixel is a box corner/edge point."""
        from sixdgs_tpu.ops.rasterizer.tiles import _tile_min_quadratic

        rng = np.random.default_rng(12)
        G, tile = 200, 16
        a = rng.uniform(0.005, 0.5, size=G)
        c = rng.uniform(0.005, 0.5, size=G)
        b = rng.uniform(-1, 1, size=G) * 0.95 * np.sqrt(a * c)
        mx = rng.uniform(-40, 70, size=G).astype(np.float32)
        my = rng.uniform(-40, 70, size=G).astype(np.float32)
        tx = rng.integers(0, 4, size=G)
        ty = rng.integers(0, 4, size=G)

        qmin = np.asarray(_tile_min_quadratic(
            jnp.asarray(tx[:, None], jnp.int32), jnp.asarray(ty[:, None], jnp.int32),
            jnp.asarray(mx), jnp.asarray(my),
            jnp.asarray(a, jnp.float32), jnp.asarray(b, jnp.float32),
            jnp.asarray(c, jnp.float32), tile)).reshape(-1)

        px = np.arange(tile)
        for g in range(G):
            X, Y = np.meshgrid(tx[g] * tile + px, ty[g] * tile + px)
            dx = X.astype(np.float64) - mx[g]
            dy = Y.astype(np.float64) - my[g]
            qgrid = 0.5 * a[g] * dx * dx + b[g] * dx * dy + 0.5 * c[g] * dy * dy
            brute = qgrid.min()
            assert qmin[g] <= brute + 1e-3 * max(1.0, abs(brute)), (g, qmin[g], brute)
