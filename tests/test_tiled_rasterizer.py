"""Tiled rasterizer parity with the exact compositing golden model."""

import math

import numpy as np
import jax
import jax.numpy as jnp

from sixdgs_tpu.ops.rasterizer import project_gaussians
from sixdgs_tpu.ops.rasterizer.compositing import rasterize_brute
from sixdgs_tpu.ops.rasterizer.tiles import rasterize_tiled
from sixdgs_tpu.ops.transforms import build_covariance
from sixdgs_tpu.scene.cameras import make_synthetic_camera


def random_proj(n=200, width=80, height=64, seed=0, spread=1.0):
    rng = np.random.default_rng(seed)
    cam = make_synthetic_camera(width, height, 0.9, 0.8, np.eye(3), np.zeros(3))
    means = (rng.normal(size=(n, 3)) * spread + [0, 0, 5]).astype(np.float32)
    scales = np.exp(rng.normal(size=(n, 3)) * 0.4 - 1.8).astype(np.float32)
    quats = rng.normal(size=(n, 4)).astype(np.float32)
    opac = rng.uniform(0.1, 0.95, size=n).astype(np.float32)
    colors = rng.uniform(size=(n, 3)).astype(np.float32)
    proj = project_gaussians(
        jnp.asarray(means),
        build_covariance(jnp.asarray(scales), jnp.asarray(quats)),
        jnp.asarray(opac),
        jnp.asarray(cam.view),
        jnp.asarray(cam.full_proj),
        jnp.asarray(cam.camera_center),
        width, height, math.tan(0.9 / 2), math.tan(0.8 / 2),
        colors_precomp=jnp.asarray(colors),
    )
    return proj, width, height


class TestTiledParity:
    def test_matches_brute(self):
        proj, W, H = random_proj()
        bg = jnp.asarray([1.0, 0.5, 0.0])
        ref = np.asarray(rasterize_brute(proj, W, H, bg))
        img = np.asarray(rasterize_tiled(proj, W, H, bg, t_max=64, k_max=256, kb=16))
        np.testing.assert_allclose(img, ref, atol=2e-5)

    def test_matches_brute_dense(self):
        """Many overlapping gaussians exercising the early-stop path."""
        proj, W, H = random_proj(n=400, spread=0.25, seed=1)
        bg = jnp.zeros(3)
        ref = np.asarray(rasterize_brute(proj, W, H, bg))
        img = np.asarray(rasterize_tiled(proj, W, H, bg, t_max=64, k_max=512, kb=32))
        np.testing.assert_allclose(img, ref, atol=2e-5)

    def test_non_multiple_of_tile(self):
        proj, W, H = random_proj(n=100, width=70, height=45, seed=2)
        bg = jnp.ones(3)
        ref = np.asarray(rasterize_brute(proj, W, H, bg))
        img = np.asarray(rasterize_tiled(proj, W, H, bg, t_max=64, k_max=256, kb=16))
        assert img.shape == (3, 45, 70)
        np.testing.assert_allclose(img, ref, atol=2e-5)

    def test_gradients_match_brute(self):
        rng = np.random.default_rng(3)
        W = H = 32
        cam = make_synthetic_camera(W, H, 0.9, 0.9, np.eye(3), np.zeros(3))
        n = 20
        means = (rng.normal(size=(n, 3)) * 0.5 + [0, 0, 4]).astype(np.float32)
        scales = np.full((n, 3), 0.2, np.float32)
        quats = np.tile(np.array([[1, 0, 0, 0]], np.float32), (n, 1))
        opac = rng.uniform(0.3, 0.9, size=n).astype(np.float32)
        colors = rng.uniform(size=(n, 3)).astype(np.float32)
        target = jnp.asarray(rng.uniform(size=(3, H, W)).astype(np.float32))

        def loss(means_, renderer):
            proj = project_gaussians(
                means_,
                build_covariance(jnp.asarray(scales), jnp.asarray(quats)),
                jnp.asarray(opac),
                jnp.asarray(cam.view), jnp.asarray(cam.full_proj),
                jnp.asarray(cam.camera_center),
                W, H, math.tan(0.45), math.tan(0.45),
                colors_precomp=jnp.asarray(colors),
            )
            img = renderer(proj)
            return jnp.mean(jnp.square(img - target))

        m = jnp.asarray(means)
        g_brute = jax.grad(lambda x: loss(x, lambda p: rasterize_brute(p, W, H, jnp.zeros(3))))(m)
        g_tiled = jax.grad(
            lambda x: loss(x, lambda p: rasterize_tiled(p, W, H, jnp.zeros(3),
                                                        t_max=64, k_max=128, kb=16))
        )(m)
        np.testing.assert_allclose(np.asarray(g_tiled), np.asarray(g_brute),
                                   atol=1e-5, rtol=1e-3)

    def test_big_gaussian_overflow_binning(self):
        """Near-camera gaussians covering many tiles must not band (regression:
        the single-tier t_max cap rendered wide gaussians as 1-tile-high
        stripes). At large radii the binned paths differ from the unculled
        golden model only by the CUDA-consistent 3-sigma rect cutoff."""
        proj, W, H = random_proj(n=150, width=224, height=224, seed=7)
        bg = jnp.ones(3)
        ref = np.asarray(rasterize_brute(proj, W, H, bg))
        img = np.asarray(rasterize_tiled(proj, W, H, bg, k_max=1024))
        assert np.abs(img - ref).max() < 6e-3
        # banding check: adjacent 16px tile-row means must not jump
        rows = img.mean(axis=(0, 2)).reshape(-1, 16).mean(axis=1)
        ref_rows = ref.mean(axis=(0, 2)).reshape(-1, 16).mean(axis=1)
        np.testing.assert_allclose(rows, ref_rows, atol=1e-3)

    def test_truncation_caps_dont_crash(self):
        """Tiny caps still produce a sane (approximate) image."""
        proj, W, H = random_proj(n=300, spread=0.2, seed=4)
        img = np.asarray(rasterize_tiled(proj, W, H, jnp.zeros(3), t_max=4,
                                         k_max=32, kb=8))
        assert np.isfinite(img).all()
        assert img.max() <= 1.5

    def test_binning_saturation_telemetry(self):
        """The saturation counters must be zero when budgets cover everything
        and must count dropped tiles when caps truncate (the CUDA reference's
        binning is uncapped, so truncation must at least be visible)."""
        from sixdgs_tpu.ops.rasterizer.tiles import binning_saturation

        proj, W, H = random_proj(n=150, width=224, height=224, seed=7)
        nx, ny = -(-W // 16), -(-H // 16)
        vis = proj.radii > 0
        radii_f = proj.radii.astype(jnp.float32)
        sat = binning_saturation(proj.means2d, radii_f, vis, nx, ny, 16, 16)
        assert int(sat["dropped_main"]) == 0
        assert int(sat["dropped_mid"]) == 0
        assert int(sat["dropped_big"]) == 0
        assert int(sat["overflow_spill"]) == 0

        # starve BOTH tiers: 2+2 slots for many big gaussians
        sat2 = binning_saturation(proj.means2d, radii_f, vis, nx, ny, 16,
                                  t_max=1, overflow_k=2, t_max_big=4,
                                  mid_k=2, t_max_mid=2)
        assert int(sat2["overflow_spill"]) > 0
        assert int(sat2["dropped_main"]) > 0

    def test_many_medium_gaussians_mid_tier(self):
        """Hundreds of medium rects (17-60 tiles each, far beyond the 256-slot
        giant tier) must render exactly — this is what the mid tier exists
        for: a 25k-gaussian TRAINED scene measured ~5.7k such gaussians and
        lost 34% of its tile coverage under two-tier binning."""
        n = 400
        rng = np.random.default_rng(21)
        W = H = 320
        means = rng.uniform(20, 300, size=(n, 2)).astype(np.float32)
        # sigma 10-18 px -> radius 30-54 px -> rects of ~5x5..8x8 tiles
        # (areas 23-60, inside the 64-slot mid budget)
        sig = rng.uniform(10, 18, size=n).astype(np.float32)
        conics = np.stack([1 / sig**2, np.zeros(n, np.float32), 1 / sig**2],
                          axis=1).astype(np.float32)
        radii = (3 * sig).astype(np.int32)
        from sixdgs_tpu.ops.rasterizer.projection import ProjectedGaussians

        proj = ProjectedGaussians(
            means2d=jnp.asarray(means),
            depths=jnp.asarray(np.linspace(1, 2, n).astype(np.float32)),
            conics=jnp.asarray(conics),
            radii=jnp.asarray(radii),
            colors=jnp.asarray(rng.uniform(0, 1, size=(n, 3)).astype(np.float32)),
            opacities=jnp.asarray(rng.uniform(0.1, 0.5, size=n).astype(np.float32)),
        )
        bg = jnp.full(3, 0.1)
        ref = np.asarray(rasterize_brute(proj, W, H, bg))
        img = np.asarray(rasterize_tiled(proj, W, H, bg, k_max=512))
        np.testing.assert_allclose(img, ref, atol=1e-2)
        from sixdgs_tpu.ops.rasterizer.pallas_tiles import rasterize_pallas

        imgp = np.asarray(rasterize_pallas(proj, W, H, bg, interpret=True))
        np.testing.assert_allclose(imgp, ref, atol=1e-2)

    def test_pathological_near_camera_gaussian(self):
        """One gaussian covering the whole screen (the VERDICT stress case):
        the overflow tier must render it identically to the brute model."""
        n = 32
        rng = np.random.default_rng(11)
        W = H = 256
        means = rng.uniform(40, 210, size=(n, 2)).astype(np.float32)
        means[0] = [128.0, 128.0]
        conics = np.tile(np.array([[4e-2, 0.0, 4e-2]], np.float32), (n, 1))
        conics[0] = [5e-5, 0.0, 5e-5]  # sigma ~140 px -> covers all 256 tiles
        radii = np.full(n, 12, np.int32)
        radii[0] = 500
        from sixdgs_tpu.ops.rasterizer.projection import ProjectedGaussians

        proj = ProjectedGaussians(
            means2d=jnp.asarray(means),
            depths=jnp.asarray(np.linspace(1, 2, n).astype(np.float32)),
            conics=jnp.asarray(conics),
            radii=jnp.asarray(radii),
            colors=jnp.asarray(rng.uniform(0, 1, size=(n, 3)).astype(np.float32)),
            opacities=jnp.asarray(rng.uniform(0.3, 0.8, size=n).astype(np.float32)),
        )
        bg = jnp.full(3, 0.2)
        ref = np.asarray(rasterize_brute(proj, W, H, bg))
        # atol 1e-2: a handful of pixels sit on the early-stop threshold and
        # accumulate in a different order than the brute model; a truncated
        # (banded) gaussian would instead be off by ~0.3 on whole tiles.
        img = np.asarray(rasterize_tiled(proj, W, H, bg, k_max=128))
        np.testing.assert_allclose(img, ref, atol=1e-2)
        from sixdgs_tpu.ops.rasterizer.pallas_tiles import rasterize_pallas

        imgp = np.asarray(rasterize_pallas(proj, W, H, bg, interpret=True))
        np.testing.assert_allclose(imgp, ref, atol=1e-2)
