"""Rasterizer tests: projection math, compositing semantics, gradients."""

import math

import numpy as np
import jax
import jax.numpy as jnp

from sixdgs_tpu.ops.rasterizer import project_gaussians, rasterize_scan
from sixdgs_tpu.ops.rasterizer.compositing import rasterize_brute
from sixdgs_tpu.ops.rasterizer.projection import project_scene
from sixdgs_tpu.ops.transforms import build_covariance
from sixdgs_tpu.ops.cameras import world_to_view, full_projection
from sixdgs_tpu.scene.cameras import make_synthetic_camera
from sixdgs_tpu.scene.gaussians import from_arrays


def simple_camera(width=64, height=64, fov=0.8):
    R = np.eye(3)
    T = np.zeros(3)
    return make_synthetic_camera(width, height, fov, fov, R, T)


def project_simple(means, scales, quats, opac, cam, colors=None):
    cov3d = build_covariance(jnp.asarray(scales), jnp.asarray(quats))
    return project_gaussians(
        jnp.asarray(means),
        cov3d,
        jnp.asarray(opac),
        jnp.asarray(cam.view),
        jnp.asarray(cam.full_proj),
        jnp.asarray(cam.camera_center),
        cam.width,
        cam.height,
        math.tan(cam.FoVx / 2),
        math.tan(cam.FoVy / 2),
        colors_precomp=jnp.asarray(
            colors if colors is not None else np.ones((means.shape[0], 3), np.float32)
        ),
    )


class TestProjection:
    def test_center_gaussian(self):
        cam = simple_camera()
        means = np.array([[0.0, 0.0, 5.0]], np.float32)
        proj = project_simple(
            means,
            np.full((1, 3), 0.1, np.float32),
            np.array([[1, 0, 0, 0]], np.float32),
            np.array([1.0], np.float32),
            cam,
        )
        # projects to image center (pixel coords (W-1)/2)
        np.testing.assert_allclose(
            np.asarray(proj.means2d)[0], [(64 - 1) / 2, (64 - 1) / 2], atol=1e-3
        )
        assert int(proj.radii[0]) > 0
        np.testing.assert_allclose(float(proj.depths[0]), 5.0, atol=1e-5)

    def test_behind_camera_culled(self):
        cam = simple_camera()
        means = np.array([[0.0, 0.0, -5.0], [0.0, 0.0, 0.1]], np.float32)
        proj = project_simple(
            means,
            np.full((2, 3), 0.1, np.float32),
            np.tile(np.array([[1, 0, 0, 0]], np.float32), (2, 1)),
            np.ones(2, np.float32),
            cam,
        )
        assert (np.asarray(proj.radii) == 0).all()
        assert (np.asarray(proj.opacities) == 0).all()

    def test_offscreen_culled(self):
        cam = simple_camera()
        means = np.array([[100.0, 0.0, 5.0]], np.float32)
        proj = project_simple(
            means,
            np.full((1, 3), 0.01, np.float32),
            np.array([[1, 0, 0, 0]], np.float32),
            np.ones(1, np.float32),
            cam,
        )
        assert int(proj.radii[0]) == 0

    def test_radius_scales_with_size(self):
        cam = simple_camera()
        means = np.tile(np.array([[0.0, 0.0, 5.0]], np.float32), (2, 1))
        scales = np.array([[0.05] * 3, [0.4] * 3], np.float32)
        proj = project_simple(
            means,
            scales,
            np.tile(np.array([[1, 0, 0, 0]], np.float32), (2, 1)),
            np.ones(2, np.float32),
            cam,
        )
        r = np.asarray(proj.radii)
        assert r[1] > r[0] > 0

    def test_cov2d_matches_analytic(self):
        """For an isotropic Gaussian at the optical axis, cov2D is
        (focal*s/z)^2 + 0.3 on the diagonal."""
        fov = 0.8
        cam = simple_camera(fov=fov)
        s, z = 0.2, 4.0
        proj = project_simple(
            np.array([[0.0, 0.0, z]], np.float32),
            np.full((1, 3), s, np.float32),
            np.array([[1, 0, 0, 0]], np.float32),
            np.ones(1, np.float32),
            cam,
        )
        focal = 64 / (2 * math.tan(fov / 2))
        expected_var = (focal * s / z) ** 2 + 0.3
        conic = np.asarray(proj.conics)[0]
        np.testing.assert_allclose(conic[0], 1.0 / expected_var, rtol=1e-4)
        np.testing.assert_allclose(conic[2], 1.0 / expected_var, rtol=1e-4)
        np.testing.assert_allclose(conic[1], 0.0, atol=1e-6)


class TestCompositing:
    def _one_gaussian_scene(self, opacity=0.8):
        cam = simple_camera()
        proj = project_simple(
            np.array([[0.0, 0.0, 5.0]], np.float32),
            np.full((1, 3), 0.3, np.float32),
            np.array([[1, 0, 0, 0]], np.float32),
            np.array([opacity], np.float32),
            cam,
            colors=np.array([[1.0, 0.0, 0.0]], np.float32),
        )
        return cam, proj

    def test_single_gaussian_center_alpha(self):
        cam, proj = self._one_gaussian_scene(opacity=0.8)
        img = np.asarray(rasterize_brute(proj, 64, 64, jnp.zeros(3)))
        # center pixel: alpha ~ opacity (up to subpixel offset), red channel
        c = img[:, 31, 31]
        assert 0.75 < c[0] <= 0.81
        assert c[1] == 0 and c[2] == 0
        # far corner: nearly zero
        assert img[0, 0, 0] < 0.05

    def test_background_composited(self):
        cam, proj = self._one_gaussian_scene(opacity=0.5)
        bg = jnp.asarray([0.0, 1.0, 0.0])
        img = np.asarray(rasterize_brute(proj, 64, 64, bg))
        c = img[:, 31, 31]
        np.testing.assert_allclose(c[0] + c[1], 1.0, atol=1e-5)  # alpha blend
        corner = img[:, 0, 0]
        np.testing.assert_allclose(corner, [0, 1, 0], atol=0.05)

    def test_depth_ordering(self):
        """A nearer opaque red gaussian must occlude a farther blue one,
        regardless of array order."""
        cam = simple_camera()
        means = np.array([[0.0, 0.0, 8.0], [0.0, 0.0, 4.0]], np.float32)  # far first
        colors = np.array([[0.0, 0.0, 1.0], [1.0, 0.0, 0.0]], np.float32)
        proj = project_simple(
            means,
            np.full((2, 3), 0.5, np.float32),
            np.tile(np.array([[1, 0, 0, 0]], np.float32), (2, 1)),
            np.array([0.99, 0.99], np.float32),
            cam,
            colors=colors,
        )
        img = np.asarray(rasterize_brute(proj, 64, 64, jnp.zeros(3)))
        c = img[:, 31, 31]
        assert c[0] > 0.9  # red in front
        assert c[2] < 0.05

    def test_scan_matches_brute(self):
        rng = np.random.default_rng(20)
        n = 50
        cam = simple_camera()
        means = rng.normal(size=(n, 3)).astype(np.float32) * 0.8 + [0, 0, 5]
        scales = np.exp(rng.normal(size=(n, 3)) * 0.3 - 1.5).astype(np.float32)
        quats = rng.normal(size=(n, 4)).astype(np.float32)
        opac = rng.uniform(0.2, 0.95, size=n).astype(np.float32)
        colors = rng.uniform(size=(n, 3)).astype(np.float32)
        proj = project_simple(means, scales, quats, opac, cam, colors)
        bg = jnp.asarray([1.0, 1.0, 1.0])
        img_brute = np.asarray(rasterize_brute(proj, 64, 64, bg))
        img_scan = np.asarray(rasterize_scan(proj, 64, 64, bg, chunk=16))
        np.testing.assert_allclose(img_scan, img_brute, atol=1e-5)

    def test_padded_inactive_no_contribution(self):
        cam = simple_camera()
        arrs = {
            "xyz": np.array([[0.0, 0.0, 5.0]], np.float32),
            "features_dc": np.ones((1, 1, 3), np.float32),
            "features_rest": np.zeros((1, 15, 3), np.float32),
            "opacity": np.array([[3.0]], np.float32),
            "scaling": np.full((1, 3), -1.2, np.float32),
            "rotation": np.array([[1, 0, 0, 0]], np.float32),
        }
        scene = from_arrays(arrs, max_sh_degree=3, capacity=8)
        proj = project_scene(scene, cam)
        r = np.asarray(proj.radii)
        assert r[0] > 0 and (r[1:] == 0).all()
        img = np.asarray(rasterize_scan(proj, 64, 64, jnp.zeros(3), chunk=4))
        assert img.max() > 0.1

    def test_gradients_finite_diff(self):
        """Autodiff gradients of the photometric loss w.r.t. means3d/opacity
        match central finite differences."""
        cam = simple_camera(width=24, height=24)
        rng = np.random.default_rng(21)
        n = 4
        means = rng.normal(size=(n, 3)).astype(np.float64) * 0.4 + [0, 0, 4]
        scales = np.full((n, 3), 0.3, np.float64)
        quats = np.tile(np.array([1.0, 0, 0, 0]), (n, 1))
        opac = np.full(n, 0.6)
        colors = rng.uniform(size=(n, 3))
        target = jnp.asarray(rng.uniform(size=(3, 24, 24)).astype(np.float32))

        def loss(means_, opac_):
            proj = project_gaussians(
                means_,
                build_covariance(jnp.asarray(scales, jnp.float32), jnp.asarray(quats, jnp.float32)),
                opac_,
                jnp.asarray(cam.view),
                jnp.asarray(cam.full_proj),
                jnp.asarray(cam.camera_center),
                24, 24,
                math.tan(cam.FoVx / 2), math.tan(cam.FoVy / 2),
                colors_precomp=jnp.asarray(colors, jnp.float32),
            )
            img = rasterize_brute(proj, 24, 24, jnp.zeros(3))
            return jnp.mean(jnp.square(img - target))

        m32 = jnp.asarray(means, jnp.float32)
        o32 = jnp.asarray(opac, jnp.float32)
        g_means, g_opac = jax.grad(loss, argnums=(0, 1))(m32, o32)
        eps = 1e-3
        for (i, j) in [(0, 0), (1, 2), (3, 1)]:
            dm = np.zeros_like(means)
            dm[i, j] = eps
            fd = (
                float(loss(jnp.asarray(means + dm, jnp.float32), o32))
                - float(loss(jnp.asarray(means - dm, jnp.float32), o32))
            ) / (2 * eps)
            assert abs(fd - float(g_means[i, j])) < 2e-3 + 0.15 * abs(fd), (i, j, fd, float(g_means[i, j]))
        for i in [0, 2]:
            do = np.zeros_like(opac)
            do[i] = eps
            fd = (
                float(loss(m32, jnp.asarray(opac + do, jnp.float32)))
                - float(loss(m32, jnp.asarray(opac - do, jnp.float32)))
            ) / (2 * eps)
            assert abs(fd - float(g_opac[i])) < 2e-3 + 0.15 * abs(fd)

    def test_means2d_gradient_receptacle(self):
        """grad w.r.t. the zero means2D offset is nonzero for visible
        gaussians — the densification signal (gaussian_renderer:26-30)."""
        cam = simple_camera(width=32, height=32)
        arrs = {
            "xyz": np.array([[0.3, 0.0, 5.0], [0.0, -0.2, 6.0]], np.float32),
            "features_dc": np.ones((2, 1, 3), np.float32),
            "features_rest": np.zeros((2, 15, 3), np.float32),
            "opacity": np.array([[1.0], [1.0]], np.float32),
            "scaling": np.full((2, 3), -1.0, np.float32),
            "rotation": np.tile(np.array([[1, 0, 0, 0]], np.float32), (2, 1)),
        }
        scene = from_arrays(arrs, max_sh_degree=3, capacity=4)
        target = jnp.zeros((3, 32, 32))

        def loss(offset):
            proj = project_scene(scene, cam, means2d_offset=offset)
            img = rasterize_scan(proj, 32, 32, jnp.zeros(3), chunk=4)
            return jnp.mean(jnp.abs(img - target))

        g = np.asarray(jax.grad(loss)(jnp.zeros((4, 2))))
        assert np.abs(g[:2]).max() > 0
        np.testing.assert_allclose(g[2:], 0.0)
