"""Property tests for quadricell surface sampling (SURVEY §4 recommendation):
point spacing ~ sqrt(cell area), coverage of the surface."""

import numpy as np
import jax.numpy as jnp

from sixdgs_tpu.rays.quadricell import (
    ellipsoid_surface,
    quadricell_points,
)


class TestUniformity:
    def test_sphere_point_spacing(self):
        """On a sphere, nearest-neighbor spacing should concentrate around
        sqrt(surface / target_points)."""
        r = 0.5
        a = jnp.asarray([r])
        grid = quadricell_points(a, a, a, target_points=50)
        pts = np.asarray(grid.points[0])[np.asarray(grid.valid[0])]
        assert 30 <= pts.shape[0] <= 70  # ~target
        surface = float(ellipsoid_surface(a, a, a)[0])
        expected = np.sqrt(surface / 50)
        d = np.linalg.norm(pts[:, None] - pts[None, :], axis=-1)
        np.fill_diagonal(d, np.inf)
        nn = d.min(axis=1)
        # median spacing within 40% of the ideal cell side
        assert 0.6 * expected < np.median(nn) < 1.4 * expected, (
            np.median(nn), expected,
        )

    def test_covers_both_hemispheres(self):
        a = jnp.asarray([0.4])
        b = jnp.asarray([0.25])
        c = jnp.asarray([0.15])
        grid = quadricell_points(a, b, c, target_points=50)
        pts = np.asarray(grid.points[0])[np.asarray(grid.valid[0])]
        for axis in range(3):
            assert (pts[:, axis] > 0).any() and (pts[:, axis] < 0).any()

    def test_batch_of_ellipsoids(self):
        rng = np.random.default_rng(0)
        scales = np.exp(rng.uniform(-2.5, -1.0, size=(64, 3))).astype(np.float32)
        grid = quadricell_points(
            jnp.asarray(scales[:, 0]), jnp.asarray(scales[:, 1]),
            jnp.asarray(scales[:, 2]), target_points=50,
        )
        counts = np.asarray(grid.valid).reshape(64, -1).sum(axis=1)
        # every healthy ellipsoid gets a meaningful number of surface points
        assert (counts > 20).all(), counts.min()
        assert (counts < 90).all(), counts.max()
