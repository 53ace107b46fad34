"""Scene & data layer: Gaussian scene pytree, PLY IO, dataset loaders, cameras."""

from sixdgs_tpu.scene.gaussians import GaussianScene
from sixdgs_tpu.scene.structures import BasicPointCloud, CameraInfo, SceneInfo
from sixdgs_tpu.scene.dataset_loader import load_data, get_dataset_prefix

__all__ = [
    "GaussianScene",
    "BasicPointCloud",
    "CameraInfo",
    "SceneInfo",
    "load_data",
    "get_dataset_prefix",
]
