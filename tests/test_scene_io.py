"""Tests: PLY codec byte-compat, GaussianScene pytree, loaders, cameras."""

import json
import os

import numpy as np
import jax.numpy as jnp
import pytest

from sixdgs_tpu.scene import ply_io, colmap_io
from sixdgs_tpu.scene.gaussians import (
    GaussianScene,
    create_from_pcd,
    from_arrays,
    load_ply,
    round_capacity,
)
from sixdgs_tpu.scene.structures import BasicPointCloud, CameraInfo, get_nerfpp_norm
from sixdgs_tpu.scene.dataset_loader import load_data, get_dataset_prefix
from sixdgs_tpu.scene.cameras import load_camera, make_synthetic_camera


def random_gaussian_arrays(n=17, sh_degree=3, seed=0):
    rng = np.random.default_rng(seed)
    ncoef = (sh_degree + 1) ** 2
    return {
        "xyz": rng.normal(size=(n, 3)).astype(np.float32),
        "features_dc": rng.normal(size=(n, 1, 3)).astype(np.float32),
        "features_rest": rng.normal(size=(n, ncoef - 1, 3)).astype(np.float32),
        "opacity": rng.normal(size=(n, 1)).astype(np.float32),
        "scaling": rng.normal(size=(n, 3)).astype(np.float32),
        "rotation": rng.normal(size=(n, 4)).astype(np.float32),
    }


class TestPlyCodec:
    def test_gaussian_ply_roundtrip(self, tmp_path):
        arrs = random_gaussian_arrays()
        p = str(tmp_path / "pc.ply")
        ply_io.save_gaussian_ply(p, **arrs)
        loaded = ply_io.load_gaussian_ply(p, sh_degree=3)
        for k in arrs:
            np.testing.assert_allclose(loaded[k], arrs[k], atol=1e-7, err_msg=k)

    def test_reference_byte_compat(self, tmp_path):
        """Write with our codec, read with an independent minimal parser that
        follows the reference plyfile schema assumptions."""
        arrs = random_gaussian_arrays(n=5)
        p = str(tmp_path / "pc.ply")
        ply_io.save_gaussian_ply(p, **arrs)
        with open(p, "rb") as fh:
            header = []
            while True:
                line = fh.readline().decode()
                header.append(line.strip())
                if line.strip() == "end_header":
                    break
            body = fh.read()
        assert header[0] == "ply"
        assert header[1] == "format binary_little_endian 1.0"
        assert header[2] == "element vertex 5"
        names = [h.split()[-1] for h in header if h.startswith("property")]
        assert names == ply_io.gaussian_attribute_names(3)
        assert all("property float" in h for h in header if h.startswith("property"))
        data = np.frombuffer(body, dtype="<f4").reshape(5, len(names))
        np.testing.assert_allclose(data[:, 0:3], arrs["xyz"], atol=0)
        np.testing.assert_allclose(data[:, 3:6], 0.0)
        # f_dc flattening: [N,1,3] -> transpose -> [N,3]
        np.testing.assert_allclose(data[:, 6:9], arrs["features_dc"][:, 0, :])
        assert data.shape[1] == 3 + 3 + 3 + 45 + 1 + 3 + 4

    def test_point_cloud_roundtrip(self, tmp_path):
        rng = np.random.default_rng(1)
        xyz = rng.normal(size=(10, 3))
        rgb = rng.integers(0, 255, size=(10, 3))
        p = str(tmp_path / "points3d.ply")
        ply_io.store_point_cloud_ply(p, xyz, rgb)
        pcd = ply_io.fetch_point_cloud_ply(p)
        np.testing.assert_allclose(pcd.points, xyz, atol=1e-6)
        np.testing.assert_allclose(pcd.colors * 255.0, rgb, atol=0.5)


class TestGaussianScene:
    def test_create_from_pcd(self):
        rng = np.random.default_rng(2)
        pcd = BasicPointCloud(
            points=rng.normal(size=(100, 3)),
            colors=rng.uniform(size=(100, 3)),
            normals=np.zeros((100, 3)),
        )
        scene = create_from_pcd(pcd, max_sh_degree=3, capacity=256)
        assert scene.capacity == 256
        assert int(scene.num_active()) == 100
        # opacity activation = 0.1 on live, 0 on padding
        op = np.asarray(scene.get_opacity)
        np.testing.assert_allclose(op[:100], 0.1, atol=1e-5)
        np.testing.assert_allclose(op[100:], 0.0, atol=1e-6)
        # scales are isotropic, log of sqrt of mean 3-NN dist
        s = np.asarray(scene.get_scaling)[:100]
        assert np.allclose(s[:, 0], s[:, 1])
        assert (s > 0).all()

    def test_ply_roundtrip_via_scene(self, tmp_path):
        arrs = random_gaussian_arrays(n=33)
        scene = from_arrays(arrs, max_sh_degree=3, capacity=64)
        p = str(tmp_path / "point_cloud.ply")
        scene.save_ply(p)
        scene2 = load_ply(p, max_sh_degree=3)
        assert int(scene2.num_active()) == 33
        d2 = scene2.to_numpy_active()
        for k, v in arrs.items():
            np.testing.assert_allclose(d2[k], v, atol=1e-7, err_msg=k)

    def test_capacity_bucket(self):
        assert round_capacity(1) == 16384
        assert round_capacity(16384) == 16384
        assert round_capacity(16385) == 32768

    def test_covariance_accessors(self):
        arrs = random_gaussian_arrays(n=8)
        scene = from_arrays(arrs, max_sh_degree=3, capacity=16)
        cov6 = np.asarray(scene.get_covariance())
        cov = np.asarray(scene.get_covariance_mat())
        np.testing.assert_allclose(cov6[:, 0], cov[:, 0, 0], atol=1e-6)
        np.testing.assert_allclose(cov6[:, 4], cov[:, 1, 2], atol=1e-6)
        feats = np.asarray(scene.get_features)
        assert feats.shape == (16, 16, 3)


def make_blender_dataset(root, n_train=3, n_test=2, size=32):
    from PIL import Image

    rng = np.random.default_rng(3)
    for split, n in [("train", n_train), ("test", n_test)]:
        frames = []
        for i in range(n):
            c2w = np.eye(4)
            c2w[:3, 3] = rng.normal(size=3) * 3
            frames.append(
                {"file_path": f"./{split}/r_{i}", "transform_matrix": c2w.tolist()}
            )
            img_dir = os.path.join(root, split)
            os.makedirs(img_dir, exist_ok=True)
            arr = rng.integers(0, 255, size=(size, size, 4), dtype=np.uint8)
            Image.fromarray(arr, "RGBA").save(os.path.join(img_dir, f"r_{i}.png"))
        with open(os.path.join(root, f"transforms_{split}.json"), "w") as fh:
            json.dump({"camera_angle_x": 0.7, "frames": frames}, fh)


class TestLoaders:
    def test_blender_loader(self, tmp_path):
        root = str(tmp_path / "lego")
        os.makedirs(root)
        make_blender_dataset(root)
        assert get_dataset_prefix(root) == "synthetic"

        class Args:
            source_path = root
            images = None
            eval = True
            white_background = True

        info = load_data(Args())
        assert len(info.train_cameras) == 3
        assert len(info.test_cameras) == 2
        assert info.point_cloud is not None
        assert info.point_cloud.points.shape == (100_000, 3)
        assert info.nerf_normalization["radius"] > 0
        cam = info.train_cameras[0]
        # R orthonormal
        np.testing.assert_allclose(cam.R @ cam.R.T, np.eye(3), atol=1e-6)

    def test_colmap_roundtrip_loader(self, tmp_path):
        from PIL import Image

        root = str(tmp_path / "scene")
        sparse = os.path.join(root, "sparse/0")
        os.makedirs(sparse)
        os.makedirs(os.path.join(root, "images"))
        rng = np.random.default_rng(4)
        cams = {
            1: colmap_io.ColmapCamera(1, "PINHOLE", 64, 48, np.array([60.0, 60.0, 32.0, 24.0]))
        }
        images = {}
        for i in range(1, 10):
            q = rng.normal(size=4)
            q /= np.linalg.norm(q)
            images[i] = colmap_io.ColmapImage(
                i, q, rng.normal(size=3), 1, f"img_{i:03d}.png",
                np.zeros((0, 2)), np.zeros(0, np.int64),
            )
            Image.fromarray(
                rng.integers(0, 255, size=(48, 64, 3), dtype=np.uint8)
            ).save(os.path.join(root, "images", f"img_{i:03d}.png"))
        colmap_io.write_cameras_binary(cams, os.path.join(sparse, "cameras.bin"))
        colmap_io.write_images_binary(images, os.path.join(sparse, "images.bin"))
        xyz = rng.normal(size=(50, 3))
        rgb = rng.integers(0, 255, size=(50, 3)).astype(np.uint8)
        colmap_io.write_points3d_binary(xyz, rgb, np.zeros(50), os.path.join(sparse, "points3D.bin"))

        assert get_dataset_prefix(root) == "mip_360"

        class Args:
            source_path = root
            images = None
            eval = True
            white_background = False

        info = load_data(Args())
        # llffhold=8: every 8th -> test
        assert len(info.test_cameras) == 2
        assert len(info.train_cameras) == 7
        np.testing.assert_allclose(info.point_cloud.points, xyz, atol=1e-6)

    def test_tt_loader(self, tmp_path):
        from PIL import Image

        root = str(tmp_path / "Ignatius")
        os.makedirs(os.path.join(root, "pose"))
        os.makedirs(os.path.join(root, "rgb"))
        rng = np.random.default_rng(5)
        K = np.eye(4)
        K[0, 0] = K[1, 1] = 100.0
        np.savetxt(os.path.join(root, "intrinsics.txt"), K)
        np.savetxt(os.path.join(root, "bbox.txt"), np.array([-1, -1, -1, 1, 1, 1, 0.1]).reshape(1, -1))
        for split_prefix, n in [("0", 4), ("1", 2)]:
            for i in range(n):
                c2w = np.eye(4)
                c2w[:3, 3] = rng.normal(size=3)
                np.savetxt(os.path.join(root, "pose", f"{split_prefix}_{i:04d}.txt"), c2w)
                Image.fromarray(
                    rng.integers(0, 255, size=(40, 60, 3), dtype=np.uint8)
                ).save(os.path.join(root, "rgb", f"{split_prefix}_{i:04d}.png"))
        assert get_dataset_prefix(root) == "tt"

        class Args:
            source_path = root
            images = None
            eval = True
            white_background = True

        info = load_data(Args())
        assert len(info.train_cameras) == 4
        assert len(info.test_cameras) == 2  # fallback to "1_" prefix
        pts = info.point_cloud.points
        assert (pts >= -1 - 1e-6).all() and (pts <= 1 + 1e-6).all()


class TestCameras:
    def test_load_camera_resolution(self, tmp_path):
        from PIL import Image

        rng = np.random.default_rng(6)
        img = Image.fromarray(rng.integers(0, 255, size=(48, 64, 3), dtype=np.uint8))
        info = CameraInfo(
            uid=0, R=np.eye(3), T=np.zeros(3), FovY=0.6, FovX=0.8,
            image=img, image_path="", image_name="x", width=64, height=48,
        )
        cam = load_camera(info, 0, resolution=2)
        assert cam.image.shape == (3, 24, 32)
        # full_proj maps camera-center-forward point to ndc center
        p = cam.full_proj @ np.array([0, 0, 5.0, 1.0])
        np.testing.assert_allclose((p / p[3])[:2], 0, atol=1e-6)

    def test_c2w_consistency(self):
        rng = np.random.default_rng(7)
        q = rng.normal(size=4)
        q /= np.linalg.norm(q)
        from sixdgs_tpu.ops.transforms import quat_to_rotmat

        Rw2c = np.asarray(quat_to_rotmat(jnp.asarray(q[None])))[0]
        T = rng.normal(size=3)
        info = CameraInfo(
            uid=0, R=Rw2c.T, T=T, FovY=0.6, FovX=0.8,
            image=None, image_path="", image_name="x", width=64, height=48,
        )
        c2w = info.c2w()
        cam = make_synthetic_camera(64, 48, 0.8, 0.6, Rw2c.T, T)
        np.testing.assert_allclose(cam.camera_center, c2w[:3, 3], atol=1e-5)
        np.testing.assert_allclose(cam.view @ c2w, np.eye(4), atol=1e-5)
