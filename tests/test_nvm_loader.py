"""NVM parser + Cambridge Landmarks loader tests."""

import os

import numpy as np

from sixdgs_tpu.scene.colmap_io import qvec2rotmat
from sixdgs_tpu.scene.dataset_loader import get_dataset_prefix, load_data
from sixdgs_tpu.scene.nvm import read_nvm


def write_nvm_dataset(root, n_cams=9, n_pts=40, seed=0):
    from PIL import Image

    rng = np.random.default_rng(seed)
    os.makedirs(os.path.join(root, "seq1"), exist_ok=True)
    lines = ["NVM_V3", "", f"{n_cams}"]
    centers, quats = [], []
    for i in range(n_cams):
        q = rng.normal(size=4)
        q /= np.linalg.norm(q)
        c = rng.normal(size=3) * 2
        centers.append(c)
        quats.append(q)
        name = f"seq1/frame{i:05d}.jpg"
        Image.fromarray(
            rng.integers(0, 255, size=(30, 40, 3), dtype=np.uint8)
        ).save(os.path.join(root, name))
        lines.append(
            f"{name} 500.0 {q[0]} {q[1]} {q[2]} {q[3]} {c[0]} {c[1]} {c[2]} 0.0 0"
        )
    lines.append(f"{n_pts}")
    pts = rng.normal(size=(n_pts, 3))
    for p in pts:
        # one measurement referencing camera 0 feature 0
        lines.append(
            f"{p[0]} {p[1]} {p[2]} 120 130 140 1 0 0 1.5 2.5"
        )
    lines.append("0")  # terminating model count
    with open(os.path.join(root, "reconstruction.nvm"), "w") as fh:
        fh.write("\n".join(lines) + "\n")
    return np.stack(centers), np.stack(quats), pts


class TestNvm:
    def test_parse(self, tmp_path):
        root = str(tmp_path / "KingsCollege")
        os.makedirs(root)
        centers, quats, pts = write_nvm_dataset(root)
        models = read_nvm(os.path.join(root, "reconstruction.nvm"))
        assert len(models) == 1
        m = models[0]
        assert len(m.cameras) == 9
        np.testing.assert_allclose(m.points, pts, atol=1e-6)
        np.testing.assert_allclose(m.cameras[0].center, centers[0], atol=1e-6)
        assert m.colors[0].tolist() == [120, 130, 140]

    def test_loader_and_dispatch(self, tmp_path):
        root = str(tmp_path / "OldHospital")
        os.makedirs(root)
        centers, quats, _ = write_nvm_dataset(root)

        assert get_dataset_prefix(root) == "cl"

        class Args:
            source_path = root
            images = None
            eval = True
            white_background = False

        info = load_data(Args())
        assert len(info.test_cameras) == 2  # every 8th of 9
        assert len(info.train_cameras) == 7
        # camera center recovered: c2w translation == NVM center
        cam = info.train_cameras[0]
        c2w = cam.c2w()
        # find matching source camera by name order (sorted by file_name)
        idx = int(cam.image_name.replace("frame", ""))
        np.testing.assert_allclose(c2w[:3, 3], centers[idx], atol=1e-5)
        R_w2c = qvec2rotmat(quats[idx])
        np.testing.assert_allclose(cam.R, R_w2c.T, atol=1e-6)
        assert info.point_cloud.points.shape == (40, 3)
        assert os.path.exists(info.ply_path)
