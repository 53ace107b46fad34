"""Pure math ops: vmappable, jittable building blocks of the framework."""

from sixdgs_tpu.ops.sh import eval_sh, rgb_to_sh, sh_to_rgb
from sixdgs_tpu.ops.transforms import (
    quat_to_rotmat,
    build_scaling_rotation,
    build_covariance,
    build_covariance_6,
    build_a_mat,
    strip_symmetric,
    inverse_sigmoid,
)
from sixdgs_tpu.ops.cameras import (
    world_to_view,
    projection_matrix,
    fov2focal,
    focal2fov,
)
from sixdgs_tpu.ops.sym_eig import sym_eig_3x3
from sixdgs_tpu.ops.knn import mean_sq_dist_3nn, knn_indices
from sixdgs_tpu.ops.ssim import ssim, psnr, l1_loss
from sixdgs_tpu.ops.lines import (
    line_intersection_wls,
    exclude_negatives,
    make_rotation_mat,
)

__all__ = [
    "eval_sh",
    "rgb_to_sh",
    "sh_to_rgb",
    "quat_to_rotmat",
    "build_scaling_rotation",
    "build_covariance",
    "build_covariance_6",
    "build_a_mat",
    "strip_symmetric",
    "inverse_sigmoid",
    "world_to_view",
    "projection_matrix",
    "fov2focal",
    "focal2fov",
    "sym_eig_3x3",
    "mean_sq_dist_3nn",
    "knn_indices",
    "ssim",
    "psnr",
    "l1_loss",
    "line_intersection_wls",
    "exclude_negatives",
    "make_rotation_mat",
]
