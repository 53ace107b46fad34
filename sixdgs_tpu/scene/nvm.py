"""VisualSFM .nvm reconstruction parser + Cambridge Landmarks loader.

The reference enumerates Cambridge Landmarks as a dataset type
(pose_estimation/opt.py:23, dataset_loader.py get_dataset_prefix "cl") and
ships a .nvm parser (scene/nvm_utils/, 247 LoC) but its loader is an EMPTY
placeholder (scene/cambridge_loader.py — SURVEY §2.4). This module completes
the intended functionality.

NVM_V3 format (documented in the reference's read_nvm.py header):
    NVM_V3 [optional calibration]
    <num cameras>
    <name> <focal> <qw qx qy qz> <cx cy cz> <radial distortion> 0
    <num points>
    <x y z> <r g b> <num measurements> <image idx> <feature idx> <px py> ...

NVM convention: the quaternion is the world->camera rotation, the camera
position is given as the CENTER (not translation): t = -R @ center.
"""

from __future__ import annotations

import os
from dataclasses import dataclass
from typing import List, Optional

import numpy as np

from sixdgs_tpu.ops.cameras import focal2fov
from sixdgs_tpu.scene.colmap_io import qvec2rotmat
from sixdgs_tpu.scene.structures import (
    BasicPointCloud,
    CameraInfo,
    SceneInfo,
    get_nerfpp_norm,
)


@dataclass
class NvmCamera:
    file_name: str
    focal: float
    qvec: np.ndarray  # [4] w, x, y, z (world->camera)
    center: np.ndarray  # [3]
    radial: float


@dataclass
class NvmModel:
    cameras: List[NvmCamera]
    points: np.ndarray  # [N, 3]
    colors: np.ndarray  # [N, 3] uint8


def _token_stream(path: str):
    with open(path) as fh:
        for line in fh:
            if "#" in line:
                line = line[: line.index("#")]
            for tok in line.split():
                yield tok


def read_nvm(path: str) -> List[NvmModel]:
    """Parse all full models of an NVM_V3 file."""
    toks = _token_stream(path)
    version = next(toks)
    if not version.startswith("NVM"):
        raise ValueError(f"{path}: not an NVM file (header {version!r})")
    # optional calibration: 'FixedK fx cx fy cy'
    first = next(toks)
    if first == "FixedK":
        for _ in range(4):
            next(toks)
        first = next(toks)
    models: List[NvmModel] = []
    n_cams_tok: Optional[str] = first
    while n_cams_tok is not None:
        n_cams = int(n_cams_tok)
        if n_cams <= 0:
            break
        cameras = []
        for _ in range(n_cams):
            name = next(toks)
            focal = float(next(toks))
            qvec = np.array([float(next(toks)) for _ in range(4)])
            center = np.array([float(next(toks)) for _ in range(3)])
            radial = float(next(toks))
            next(toks)  # trailing 0
            cameras.append(NvmCamera(name, focal, qvec, center, radial))
        n_pts = int(next(toks))
        xyz = np.zeros((n_pts, 3))
        rgb = np.zeros((n_pts, 3), np.uint8)
        for i in range(n_pts):
            xyz[i] = [float(next(toks)) for _ in range(3)]
            rgb[i] = [int(float(next(toks))) for _ in range(3)]
            n_meas = int(next(toks))
            for _ in range(n_meas * 4):
                next(toks)
        models.append(NvmModel(cameras, xyz, rgb))
        try:
            n_cams_tok = next(toks)
        except StopIteration:
            n_cams_tok = None
    return models


def read_cambridge_scene_info(path: str, eval_split: bool = True,
                              llffhold: int = 8,
                              nvm_name: str = "reconstruction.nvm") -> SceneInfo:
    """Cambridge Landmarks scene from its VisualSFM reconstruction.

    Split policy follows the COLMAP loader's every-8th convention
    (scene/colmap.py:98-103) since the reference never defined one.
    """
    from PIL import Image

    models = read_nvm(os.path.join(path, nvm_name))
    if not models:
        raise ValueError(f"no models in {path}/{nvm_name}")
    model = max(models, key=lambda m: len(m.cameras))

    cam_infos = []
    for idx, cam in enumerate(sorted(model.cameras, key=lambda c: c.file_name)):
        image_path = os.path.join(path, cam.file_name)
        if not os.path.exists(image_path):
            continue
        image = Image.open(image_path).convert("RGB")
        w, h = image.size
        R_w2c = qvec2rotmat(cam.qvec)
        T = -R_w2c @ cam.center  # NVM stores the camera CENTER
        cam_infos.append(
            CameraInfo(
                uid=idx,
                R=R_w2c.T,
                T=T,
                FovY=focal2fov(cam.focal, h),
                FovX=focal2fov(cam.focal, w),
                image=image,
                image_path=image_path,
                image_name=os.path.splitext(os.path.basename(cam.file_name))[0],
                width=w,
                height=h,
            )
        )
    if eval_split:
        train = [c for i, c in enumerate(cam_infos) if i % llffhold != 0]
        test = [c for i, c in enumerate(cam_infos) if i % llffhold == 0]
    else:
        train, test = cam_infos, []
    pcd = BasicPointCloud(
        points=model.points,
        colors=model.colors.astype(np.float64) / 255.0,
        normals=np.zeros_like(model.points),
    )
    ply_path = os.path.join(path, "points3d.ply")
    if not os.path.exists(ply_path):
        from sixdgs_tpu.scene.ply_io import store_point_cloud_ply

        store_point_cloud_ply(ply_path, model.points, model.colors)
    return SceneInfo(pcd, train, test, get_nerfpp_norm(train), ply_path)
