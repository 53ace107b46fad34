"""Ray engine tests, including numeric parity against the reference
quadricell implementation (imported read-only from /root/reference; it is
pure torch with no CUDA deps)."""

import sys

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from sixdgs_tpu.rays.quadricell import (
    ellipse_perimeter,
    ellipsoid_surface,
    mask_degraded_ellipsoids,
    quadricell_points,
    ring_layout,
)
from sixdgs_tpu.rays.normals import estimate_normals
from sixdgs_tpu.rays.engine import generate_rays, generate_rays_from_scene
from sixdgs_tpu.scene.gaussians import from_arrays

REF = "/root/reference"


def ref_quadricell():
    if REF not in sys.path:
        sys.path.insert(0, REF)
    import importlib

    return importlib.import_module("pose_estimation.quadricell")


class TestQuadricellParity:
    def test_perimeter_and_surface_match_reference(self):
        torch = pytest.importorskip("torch")
        refq = ref_quadricell()
        rng = np.random.default_rng(0)
        b = rng.uniform(0.01, 2.0, size=50).astype(np.float32)
        c = rng.uniform(0.01, 2.0, size=50).astype(np.float32)
        a = rng.uniform(0.01, 2.0, size=50).astype(np.float32)
        ref_p = refq.ellipse_perimeter(torch.from_numpy(b), torch.from_numpy(c)).numpy()
        ours_p = np.asarray(ellipse_perimeter(jnp.asarray(b), jnp.asarray(c)))
        np.testing.assert_allclose(ours_p, ref_p, rtol=1e-5)
        ref_s = refq.ellipsoid_surface(
            torch.from_numpy(a), torch.from_numpy(b), torch.from_numpy(c)
        ).numpy()
        ours_s = np.asarray(ellipsoid_surface(jnp.asarray(a), jnp.asarray(b), jnp.asarray(c)))
        np.testing.assert_allclose(ours_s, ref_s, rtol=1e-4)

    def test_degraded_mask_matches_reference(self):
        torch = pytest.importorskip("torch")
        refq = ref_quadricell()
        rng = np.random.default_rng(1)
        # include some extreme needles that must be degraded
        a = np.concatenate([rng.uniform(0.01, 1.0, 40), [5.0, 10.0]]).astype(np.float32)
        b = np.concatenate([rng.uniform(0.01, 1.0, 40), [0.001, 0.0001]]).astype(np.float32)
        c = np.concatenate([rng.uniform(0.01, 1.0, 40), [0.001, 0.0001]]).astype(np.float32)
        ref_m = refq.mask_degraded_ellipsoids(
            torch.from_numpy(a), torch.from_numpy(b), torch.from_numpy(c)
        ).numpy()
        ours_valid = np.asarray(
            mask_degraded_ellipsoids(jnp.asarray(a), jnp.asarray(b), jnp.asarray(c))
        )
        np.testing.assert_array_equal(ours_valid, ref_m)
        assert not ours_valid[-1] and not ours_valid[-2]

    def test_points_match_reference_structure(self):
        """Same ring heights, ring radii, and per-ring point counts as the
        reference compute_quadricell_centers."""
        torch = pytest.importorskip("torch")
        refq = ref_quadricell()
        a = np.array([0.3], np.float32)
        b = np.array([0.1], np.float32)
        c = np.array([0.05], np.float32)
        ref_pts, _ = refq.compute_quadricell_centers(
            torch.from_numpy(a), torch.from_numpy(b), torch.from_numpy(c),
            target_points=50,
        )
        ref_pts = ref_pts.numpy()
        grid = quadricell_points(jnp.asarray(a), jnp.asarray(b), jnp.asarray(c),
                                 target_points=50)
        ours = np.asarray(grid.points[0])[np.asarray(grid.valid[0])]
        assert ours.shape[0] == ref_pts.shape[0]
        # identical set of ring heights and per-ring counts
        ref_z = np.unique(np.round(ref_pts[:, 2], 5))
        our_z = np.unique(np.round(ours[:, 2], 5))
        np.testing.assert_allclose(our_z, ref_z, atol=1e-4)
        for z in ref_z:
            rcount = np.isclose(ref_pts[:, 2], z, atol=1e-4).sum()
            ocount = np.isclose(ours[:, 2], z, atol=1e-4).sum()
            assert rcount == ocount
        # positions close (theta placement differs by < one lookup bin)
        # match each of our points to the closest reference point
        d = np.linalg.norm(ours[:, None, :] - ref_pts[None, :, :], axis=-1)
        assert d.min(axis=1).max() < 0.02

    def test_points_on_permuted_ellipsoid_surface(self):
        """Points satisfy (x/b)^2 + (y/c)^2 + (z/a)^2 = 1 (the reference's
        permuted local frame)."""
        a = jnp.asarray([0.5])
        b = jnp.asarray([0.3])
        c = jnp.asarray([0.2])
        grid = quadricell_points(a, b, c)
        pts = np.asarray(grid.points[0])[np.asarray(grid.valid[0])]
        q = (pts[:, 0] / 0.3) ** 2 + (pts[:, 1] / 0.2) ** 2 + (pts[:, 2] / 0.5) ** 2
        np.testing.assert_allclose(q, 1.0, atol=1e-4)


class TestNormals:
    def test_plane_normals(self):
        rng = np.random.default_rng(2)
        pts = np.zeros((200, 3), np.float32)
        pts[:, :2] = rng.uniform(-1, 1, size=(200, 2))
        pts[:, 2] = 0.01 * rng.normal(size=200)
        normals = np.asarray(estimate_normals(jnp.asarray(pts), 20))
        assert (np.abs(normals[:, 2]) > 0.95).all()

    def test_sphere_normals_point_outward_or_inward_consistently(self):
        rng = np.random.default_rng(3)
        v = rng.normal(size=(500, 3)).astype(np.float32)
        v /= np.linalg.norm(v, axis=-1, keepdims=True)
        normals = np.asarray(estimate_normals(jnp.asarray(v), 20))
        cos = np.abs(np.sum(normals * v, axis=-1))
        assert np.median(cos) > 0.95


class TestGenerateRays:
    def make_scene(self, n=200, seed=4):
        rng = np.random.default_rng(seed)
        arrs = {
            "xyz": rng.normal(size=(n, 3)).astype(np.float32),
            "features_dc": rng.normal(size=(n, 1, 3)).astype(np.float32),
            "features_rest": np.zeros((n, 15, 3), np.float32),
            "opacity": rng.normal(size=(n, 1)).astype(np.float32),
            "scaling": rng.uniform(-3.0, -1.5, size=(n, 3)).astype(np.float32),
            "rotation": rng.normal(size=(n, 4)).astype(np.float32),
        }
        return from_arrays(arrs, max_sh_degree=3, capacity=256)

    def test_basic_properties(self):
        scene = self.make_scene()
        rays = generate_rays_from_scene(
            scene, jax.random.key(0), max_ellipsoids=128, ray_budget=4096,
        )
        valid = np.asarray(rays.valid)
        assert valid.sum() > 500  # plenty of rays from 128 ellipsoids
        d = np.asarray(rays.dir)[valid]
        np.testing.assert_allclose(np.linalg.norm(d, axis=-1), 1.0, atol=1e-5)
        gi = np.asarray(rays.gaussian_idx)[valid]
        assert (gi >= 0).all() and (gi < 200).all()  # only active gaussians
        rgb = np.asarray(rays.rgb)[valid]
        assert (rgb >= 0).all()

    def test_origin_near_parent_gaussian(self):
        scene = self.make_scene()
        rays = generate_rays_from_scene(
            scene, jax.random.key(1), max_ellipsoids=64, ray_budget=2048,
        )
        valid = np.asarray(rays.valid)
        ori = np.asarray(rays.ori)[valid]
        gi = np.asarray(rays.gaussian_idx)[valid]
        centers = np.asarray(scene.xyz)[gi]
        dist = np.linalg.norm(ori - centers, axis=-1)
        max_scale = np.exp(np.asarray(scene.scaling)[gi]).max(axis=-1)
        assert (dist <= max_scale * 1.05 + 1e-5).all()

    def test_hemisphere_masking_halves_rays(self):
        """For spheres, the normal hemisphere keeps ~half the surface points."""
        n = 64
        rng = np.random.default_rng(5)
        arrs = {
            "xyz": (rng.normal(size=(n, 3)) * 0.02).astype(np.float32),
            "features_dc": np.zeros((n, 1, 3), np.float32),
            "features_rest": np.zeros((n, 15, 3), np.float32),
            "opacity": np.zeros((n, 1), np.float32),
            "scaling": np.full((n, 3), -2.0, np.float32),
            "rotation": np.tile(np.array([[1, 0, 0, 0]], np.float32), (n, 1)),
        }
        scene = from_arrays(arrs, max_sh_degree=3, capacity=64)
        rays = generate_rays_from_scene(
            scene, jax.random.key(2), max_ellipsoids=64, ray_budget=8192,
        )
        n_valid = int(np.asarray(rays.valid).sum())
        # ~50 target points per ellipsoid, ~half masked -> ~25 per ellipsoid
        per_ell = n_valid / n
        assert 10 < per_ell < 40, per_ell

    def test_budget_respected_and_padding_zeroed(self):
        scene = self.make_scene()
        rays = generate_rays_from_scene(
            scene, jax.random.key(3), max_ellipsoids=200, ray_budget=512,
        )
        assert rays.ori.shape == (512, 3)
        invalid = ~np.asarray(rays.valid)
        if invalid.any():
            np.testing.assert_allclose(np.asarray(rays.ori)[invalid], 0.0)
            assert (np.asarray(rays.gaussian_idx)[invalid] == -1).all()
