"""Unit tests for the core math ops (SH, transforms, sym-eig, kNN, SSIM, lines)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from sixdgs_tpu.ops import (
    eval_sh,
    rgb_to_sh,
    sh_to_rgb,
    quat_to_rotmat,
    build_scaling_rotation,
    build_covariance,
    build_covariance_6,
    build_a_mat,
    sym_eig_3x3,
    mean_sq_dist_3nn,
    knn_indices,
    ssim,
    psnr,
    line_intersection_wls,
    exclude_negatives,
    make_rotation_mat,
)
from sixdgs_tpu.ops.transforms import unpack_covariance_6
from sixdgs_tpu.ops.cameras import (
    projection_matrix,
    world_to_view,
    full_projection,
    fov2focal,
    focal2fov,
)


class TestSH:
    def test_deg0_is_constant(self):
        sh = np.zeros((5, 3, 1), np.float32)
        sh[:, :, 0] = 1.0
        dirs = np.random.default_rng(0).normal(size=(5, 3)).astype(np.float32)
        dirs /= np.linalg.norm(dirs, axis=-1, keepdims=True)
        out = eval_sh(0, jnp.asarray(sh), jnp.asarray(dirs))
        np.testing.assert_allclose(out, 0.28209479177387814, rtol=1e-6)

    def test_rgb_sh_roundtrip(self):
        rgb = jnp.asarray(np.random.default_rng(1).uniform(size=(10, 3)))
        np.testing.assert_allclose(sh_to_rgb(rgb_to_sh(rgb)), rgb, atol=1e-6)

    @pytest.mark.parametrize("deg", [4])
    def test_sh_orthonormality_integral(self, deg):
        """Monte-Carlo check: E_dir[Y_i * Y_j] ~ delta_ij / (4*pi)."""
        rng = np.random.default_rng(2)
        n = 50_000
        v = rng.normal(size=(n, 3))
        v /= np.linalg.norm(v, axis=-1, keepdims=True)
        ncoef = (deg + 1) ** 2
        # Evaluate each basis function by one-hot coefficients
        ys = []
        for i in range(ncoef):
            sh = np.zeros((1, 1, ncoef), np.float32)
            sh[..., i] = 1.0
            ys.append(np.asarray(eval_sh(deg, jnp.asarray(sh), jnp.asarray(v[:, None, :].astype(np.float32)))).squeeze())
        ys = np.stack(ys, axis=0)  # [ncoef, n]
        gram = (ys @ ys.T) / n * (4 * np.pi)
        np.testing.assert_allclose(gram, np.eye(ncoef), atol=0.15)


class TestTransforms:
    def test_quat_identity(self):
        q = jnp.asarray([[1.0, 0, 0, 0]])
        np.testing.assert_allclose(quat_to_rotmat(q)[0], np.eye(3), atol=1e-6)

    def test_quat_unnormalized_ok(self):
        rng = np.random.default_rng(3)
        q = jnp.asarray(rng.normal(size=(50, 4)).astype(np.float32))
        R = np.asarray(quat_to_rotmat(q))
        eye = np.einsum("nij,nkj->nik", R, R)
        np.testing.assert_allclose(eye, np.broadcast_to(np.eye(3), (50, 3, 3)), atol=1e-5)
        np.testing.assert_allclose(np.linalg.det(R), 1.0, atol=1e-5)

    def test_covariance_psd_and_pack(self):
        rng = np.random.default_rng(4)
        s = jnp.asarray(rng.uniform(0.1, 2.0, size=(20, 3)).astype(np.float32))
        q = jnp.asarray(rng.normal(size=(20, 4)).astype(np.float32))
        cov = np.asarray(build_covariance(s, q))
        np.testing.assert_allclose(cov, np.swapaxes(cov, -1, -2), atol=1e-5)
        evals = np.linalg.eigvalsh(cov)
        assert (evals > 0).all()
        # eigenvalues are squared scales
        np.testing.assert_allclose(
            np.sort(evals, axis=-1), np.sort(np.asarray(s) ** 2, axis=-1), rtol=1e-2
        )
        cov6 = build_covariance_6(s, q)
        np.testing.assert_allclose(np.asarray(unpack_covariance_6(cov6)), cov, atol=1e-6)

    def test_a_mat_inverse_sqrt(self):
        """A = R diag(1/s) R^T: A @ Sigma @ A == identity-scaled ... check A
        eigvals are 1/s."""
        rng = np.random.default_rng(5)
        s = jnp.asarray(rng.uniform(0.5, 2.0, size=(8, 3)).astype(np.float32))
        q = jnp.asarray(rng.normal(size=(8, 4)).astype(np.float32))
        A = np.asarray(build_a_mat(s, q))
        evals = np.sort(np.linalg.eigvalsh(A), axis=-1)
        np.testing.assert_allclose(evals, np.sort(1.0 / np.asarray(s), axis=-1), rtol=1e-2)

    def test_scaling_rotation(self):
        s = jnp.asarray([[2.0, 1.0, 0.5]])
        q = jnp.asarray([[1.0, 0, 0, 0]])
        L = np.asarray(build_scaling_rotation(s, q))[0]
        np.testing.assert_allclose(L, np.diag([2.0, 1.0, 0.5]), atol=1e-6)


class TestSymEig:
    def test_matches_eigh(self):
        rng = np.random.default_rng(6)
        B = rng.normal(size=(256, 3, 3)).astype(np.float32)
        A = B @ np.swapaxes(B, -1, -2)
        vals, vecs = sym_eig_3x3(jnp.asarray(A))
        ref_vals, _ = np.linalg.eigh(A)
        np.testing.assert_allclose(np.asarray(vals), ref_vals, rtol=1e-3, atol=1e-3)
        # eigenvector property: A v = lambda v
        vals = np.asarray(vals)
        vecs = np.asarray(vecs)
        for i in range(3):
            av = np.einsum("nij,nj->ni", A, vecs[:, :, i])
            lv = vals[:, i : i + 1] * vecs[:, :, i]
            np.testing.assert_allclose(av, lv, atol=5e-3)

    def test_degenerate_isotropic(self):
        A = jnp.broadcast_to(2.0 * jnp.eye(3), (4, 3, 3))
        vals, vecs = sym_eig_3x3(A)
        np.testing.assert_allclose(np.asarray(vals), 2.0, atol=1e-6)
        eye = np.einsum("nij,nkj->nik", np.asarray(vecs), np.asarray(vecs))
        np.testing.assert_allclose(eye, np.broadcast_to(np.eye(3), (4, 3, 3)), atol=1e-5)

    def test_repeated_eigenvalue(self):
        A = jnp.asarray(np.diag([1.0, 1.0, 3.0]).astype(np.float32))[None]
        vals, vecs = sym_eig_3x3(A)
        np.testing.assert_allclose(np.asarray(vals)[0], [1.0, 1.0, 3.0], atol=1e-3)
        v2 = np.asarray(vecs)[0, :, 2]
        np.testing.assert_allclose(np.abs(v2), [0, 0, 1], atol=1e-4)


class TestKNN:
    def test_mean_sq_dist_3nn_vs_bruteforce(self):
        rng = np.random.default_rng(7)
        pts = rng.normal(size=(300, 3)).astype(np.float32)
        out = np.asarray(mean_sq_dist_3nn(pts, chunk=64))
        d = ((pts[:, None, :] - pts[None, :, :]) ** 2).sum(-1)
        np.fill_diagonal(d, np.inf)
        ref = np.sort(d, axis=-1)[:, :3].mean(-1)
        np.testing.assert_allclose(out, ref, rtol=1e-4, atol=1e-5)

    def test_knn_indices(self):
        rng = np.random.default_rng(8)
        pts = rng.normal(size=(100, 3)).astype(np.float32)
        idx = np.asarray(knn_indices(pts, k=5, chunk=32))
        d = ((pts[:, None, :] - pts[None, :, :]) ** 2).sum(-1)
        np.fill_diagonal(d, np.inf)
        ref = np.argsort(d, axis=-1)[:, :5]
        # sets must match (ties may reorder)
        for i in range(100):
            assert set(idx[i].tolist()) == set(ref[i].tolist())


class TestSSIM:
    def test_identical_images(self):
        img = jnp.asarray(np.random.default_rng(9).uniform(size=(3, 32, 32)).astype(np.float32))
        assert float(ssim(img, img)) > 0.9999

    def test_matches_torch_reference(self):
        torch = pytest.importorskip("torch")
        import torch.nn.functional as F
        from math import exp

        rng = np.random.default_rng(10)
        a = rng.uniform(size=(3, 24, 24)).astype(np.float32)
        b = rng.uniform(size=(3, 24, 24)).astype(np.float32)

        # independent torch implementation of the reference SSIM
        def t_ssim(i1, i2, ws=11):
            g = torch.tensor([exp(-((x - ws // 2) ** 2) / (2 * 1.5**2)) for x in range(ws)])
            g = (g / g.sum()).unsqueeze(1)
            w2 = g.mm(g.t()).float().unsqueeze(0).unsqueeze(0).expand(3, 1, ws, ws).contiguous()
            mu1 = F.conv2d(i1, w2, padding=ws // 2, groups=3)
            mu2 = F.conv2d(i2, w2, padding=ws // 2, groups=3)
            mu1_sq, mu2_sq, mu12 = mu1**2, mu2**2, mu1 * mu2
            s1 = F.conv2d(i1 * i1, w2, padding=ws // 2, groups=3) - mu1_sq
            s2 = F.conv2d(i2 * i2, w2, padding=ws // 2, groups=3) - mu2_sq
            s12 = F.conv2d(i1 * i2, w2, padding=ws // 2, groups=3) - mu12
            c1, c2 = 0.01**2, 0.03**2
            m = ((2 * mu12 + c1) * (2 * s12 + c2)) / ((mu1_sq + mu2_sq + c1) * (s1 + s2 + c2))
            return m.mean().item()

        ref = t_ssim(torch.from_numpy(a)[None], torch.from_numpy(b)[None])
        ours = float(ssim(jnp.asarray(a), jnp.asarray(b)))
        assert abs(ref - ours) < 1e-5

    def test_psnr(self):
        a = jnp.zeros((3, 8, 8))
        b = jnp.full((3, 8, 8), 0.1)
        np.testing.assert_allclose(float(psnr(a, b)), 20.0, atol=1e-4)


class TestLines:
    def test_intersection_exact(self):
        rng = np.random.default_rng(11)
        target = np.array([0.5, -1.0, 2.0], np.float32)
        dirs = rng.normal(size=(50, 3)).astype(np.float32)
        dirs /= np.linalg.norm(dirs, axis=-1, keepdims=True)
        ts = rng.uniform(0.5, 3.0, size=(50, 1)).astype(np.float32)
        origins = target[None] - ts * dirs
        p = np.asarray(line_intersection_wls(jnp.asarray(origins), jnp.asarray(dirs)))
        np.testing.assert_allclose(p, target, atol=1e-4)

    def test_mask_ignores_padding(self):
        rng = np.random.default_rng(12)
        target = np.array([1.0, 2.0, 3.0], np.float32)
        dirs = rng.normal(size=(20, 3)).astype(np.float32)
        dirs /= np.linalg.norm(dirs, axis=-1, keepdims=True)
        origins = target[None] - dirs
        # append garbage padded rows
        pad_o = rng.normal(size=(10, 3)).astype(np.float32) * 100
        pad_d = rng.normal(size=(10, 3)).astype(np.float32)
        pad_d /= np.linalg.norm(pad_d, axis=-1, keepdims=True)
        o = np.concatenate([origins, pad_o])
        d = np.concatenate([dirs, pad_d])
        mask = np.concatenate([np.ones(20, bool), np.zeros(10, bool)])
        p = np.asarray(line_intersection_wls(jnp.asarray(o), jnp.asarray(d), mask=jnp.asarray(mask)))
        np.testing.assert_allclose(p, target, atol=1e-4)

    def test_singular_returns_nan(self):
        # all parallel lines -> singular normal matrix
        d = np.tile(np.array([[0.0, 0.0, 1.0]], np.float32), (5, 1))
        o = np.tile(np.array([[1.0, 0.0, 0.0]], np.float32), (5, 1))
        p = np.asarray(line_intersection_wls(jnp.asarray(o), jnp.asarray(d)))
        assert np.isnan(p).all()

    def test_exclude_negatives(self):
        center = jnp.asarray([0.0, 0.0, 1.0])
        pts = jnp.asarray([[0.0, 0.0, 0.0], [0.0, 0.0, 2.0]])
        dirs = jnp.asarray([[0.0, 0.0, 1.0], [0.0, 0.0, 1.0]])
        out = np.asarray(exclude_negatives(center, pts, dirs))
        np.testing.assert_allclose(out, [1.0, 0.0])

    def test_make_rotation_mat_orthonormal(self):
        direction = jnp.asarray([0.0, 0.0, 1.0])
        up = jnp.asarray([0.0, 1.0, 0.0])
        R = np.asarray(make_rotation_mat(direction, up))
        np.testing.assert_allclose(R @ R.T, np.eye(3), atol=1e-6)
        np.testing.assert_allclose(R[2], [0, 0, 1], atol=1e-6)


class TestCameras:
    def test_fov_focal_roundtrip(self):
        fov = 0.9
        assert abs(focal2fov(fov2focal(fov, 640), 640) - fov) < 1e-9

    def test_projection_matches_reference(self):
        torch = pytest.importorskip("torch")
        import math

        znear, zfar, fx, fy = 0.01, 100.0, 0.8, 0.6
        # reference getProjectionMatrix (graphics_utils.py:56-76)
        tanY, tanX = math.tan(fy / 2), math.tan(fx / 2)
        P = np.zeros((4, 4), np.float32)
        P[0, 0] = 2 * znear / (2 * tanX * znear)
        P[1, 1] = 2 * znear / (2 * tanY * znear)
        P[3, 2] = 1.0
        P[2, 2] = zfar / (zfar - znear)
        P[2, 3] = -(zfar * znear) / (zfar - znear)
        np.testing.assert_allclose(projection_matrix(znear, zfar, fx, fy), P, atol=1e-6)

    def test_world_to_view_roundtrip(self):
        rng = np.random.default_rng(13)
        q = rng.normal(size=4)
        q /= np.linalg.norm(q)
        R_w2c = np.asarray(quat_to_rotmat(jnp.asarray(q[None])))[0]
        t = rng.normal(size=3)
        # loader convention: R stored transposed
        view = world_to_view(R_w2c.T, t)
        pt_w = rng.normal(size=3)
        pt_c = view[:3, :3] @ pt_w + view[:3, 3]
        np.testing.assert_allclose(pt_c, R_w2c @ pt_w + t, atol=1e-5)

    def test_full_projection_center(self):
        view = world_to_view(np.eye(3), np.zeros(3))
        fp = full_projection(view, 0.8, 0.8)
        p = fp @ np.array([0.0, 0.0, 10.0, 1.0])
        ndc = p[:3] / p[3]
        np.testing.assert_allclose(ndc[:2], 0.0, atol=1e-6)


class TestPlaneMajorParity:
    """Pin the plane-major TPU twins to their stacked predecessors
    (ADVICE r4: the hot path's values shifted without tests)."""

    @pytest.mark.parametrize("deg", [0, 1, 2, 3, 4])
    def test_eval_sh_planes_bitwise(self, deg):
        from sixdgs_tpu.ops.sh import eval_sh_planes

        rng = np.random.default_rng(deg)
        P, C = 257, 3
        ncoeff = (deg + 1) ** 2
        sh = rng.normal(size=(P, ncoeff, C)).astype(np.float32)
        dirs = rng.normal(size=(P, 3)).astype(np.float32)
        dirs /= np.linalg.norm(dirs, axis=-1, keepdims=True)
        ref = eval_sh(deg, jnp.swapaxes(jnp.asarray(sh), 1, 2),
                      jnp.asarray(dirs))
        got = eval_sh_planes(deg, jnp.asarray(sh), jnp.asarray(dirs))
        np.testing.assert_array_equal(np.asarray(got), np.asarray(ref))
        # under jit XLA may re-associate the FMA chain; tight allclose only
        got_jit = jax.jit(eval_sh_planes, static_argnums=0)(
            deg, jnp.asarray(sh), jnp.asarray(dirs))
        np.testing.assert_allclose(np.asarray(got_jit), np.asarray(ref),
                                   rtol=1e-5, atol=1e-6)

    def test_covariance_planes_close(self):
        from sixdgs_tpu.ops.transforms import covariance_planes

        rng = np.random.default_rng(1)
        P = 513
        scaling = np.exp(rng.uniform(-5, 0, size=(P, 3))).astype(np.float32)
        q = rng.normal(size=(P, 4)).astype(np.float32)
        full = np.asarray(build_covariance(jnp.asarray(scaling),
                                           jnp.asarray(q)))
        planes = covariance_planes(jnp.asarray(scaling), jnp.asarray(q))
        idx = [(0, 0), (0, 1), (0, 2), (1, 1), (1, 2), (2, 2)]
        for p, (i, j) in zip(planes, idx):
            np.testing.assert_allclose(
                np.asarray(p), full[:, i, j], rtol=1e-4, atol=1e-6)

    def test_projection_accepts_packed_cov6(self):
        # the [P, 6] branch must route identically to [P, 3, 3]
        # (ADVICE r4 medium: the branch condition was unreachable)
        from sixdgs_tpu.ops.rasterizer.projection import project_gaussians

        rng = np.random.default_rng(2)
        P = 64
        xyz = (rng.normal(size=(P, 3)) * 2 + [0, 0, 6]).astype(np.float32)
        scaling = np.exp(rng.uniform(-4, -2, size=(P, 3))).astype(np.float32)
        q = rng.normal(size=(P, 4)).astype(np.float32)
        opac = rng.uniform(0.2, 1, size=P).astype(np.float32)
        colors = rng.uniform(size=(P, 3)).astype(np.float32)
        cov33 = build_covariance(jnp.asarray(scaling), jnp.asarray(q))
        cov6 = build_covariance_6(jnp.asarray(scaling), jnp.asarray(q))
        from sixdgs_tpu.scene.cameras import make_synthetic_camera
        from sixdgs_tpu.train.gs_trainer import camera_arrays

        cam = make_synthetic_camera(128, 96, 0.9, 0.65, np.eye(3),
                                    np.zeros(3))
        ca = camera_arrays(cam)
        kw = dict(view=ca.view, full_proj=ca.full_proj,
                  camera_center=ca.camera_center, width=128, height=96,
                  tan_fovx=0.9, tan_fovy=0.65,
                  colors_precomp=jnp.asarray(colors))
        a = project_gaussians(jnp.asarray(xyz), cov33,
                              jnp.asarray(opac), **kw)
        b = project_gaussians(jnp.asarray(xyz), cov6,
                              jnp.asarray(opac), **kw)
        for fa, fb in zip(a, b):
            np.testing.assert_allclose(np.asarray(fa), np.asarray(fb),
                                       rtol=1e-5, atol=1e-6)
        with pytest.raises(ValueError):
            project_gaussians(jnp.asarray(xyz), cov6[:, :5],
                              jnp.asarray(opac), **kw)

    def test_segment_starts_matches_searchsorted(self):
        from sixdgs_tpu.ops.rasterizer.pallas_tiles import _segment_starts

        rng = np.random.default_rng(3)
        for trial in range(30):
            n_tiles = int(rng.integers(1, 50))
            nc = 128 * int(rng.integers(1, 9))
            n_real = int(rng.integers(0, nc + 1))
            tiles = np.sort(rng.integers(0, n_tiles, size=n_real))
            # sentinels sort last (tile id == n_tiles)
            full = np.concatenate(
                [tiles, np.full(nc - n_real, n_tiles)]).astype(np.int32)
            ref = np.searchsorted(full, np.arange(n_tiles + 1))
            got = np.asarray(_segment_starts(jnp.asarray(full), n_tiles))
            np.testing.assert_array_equal(got, ref)
        # nc == 0 guard (ADVICE r4): must return zeros, not garbage
        got = np.asarray(_segment_starts(jnp.zeros(0, jnp.int32), 7))
        np.testing.assert_array_equal(got, np.zeros(8, np.int32))
