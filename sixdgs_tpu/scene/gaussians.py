"""GaussianScene: the 3DGS parameter container as a functional pytree.

TPU-native counterpart of the reference's mutable torch.nn.Module
(/root/reference/scene/gaussian_model.py:46-632). Key re-design:

  * **Fixed-capacity arrays + validity mask.** Densify/prune changes the
    Gaussian count every 100 iters in the reference (gaussian_model.py:539-626),
    which would force an XLA recompile per event. We preallocate capacity
    (rounded up in buckets) and mark live Gaussians in ``active``; padded
    entries have zero opacity and never contribute to renders or grads.
  * **Pure functions.** All state transitions (activation, densify, prune,
    opacity reset) return new pytrees; the optimizer state lives alongside as
    a matching pytree, so the reference's "optimizer-state surgery"
    (gaussian_model.py:422-507) becomes a plain gather/concat on pytrees.
  * Same parameterization: log-scale, sigmoid-opacity, unnormalized quaternion
    (gaussian_model.py:47-58), SH features split dc/rest.
"""

from __future__ import annotations

from typing import Dict, Optional

import numpy as np
import jax
import jax.numpy as jnp
from flax import struct

from sixdgs_tpu.ops.sh import rgb_to_sh
from sixdgs_tpu.ops.transforms import (
    build_covariance,
    build_covariance_6,
    inverse_sigmoid,
    quat_to_rotmat,
    build_a_mat,
)
from sixdgs_tpu.ops.knn import mean_sq_dist_3nn
from sixdgs_tpu.scene.structures import BasicPointCloud
from sixdgs_tpu.scene import ply_io

CAPACITY_BUCKET = 16384

PARAM_NAMES = ("xyz", "features_dc", "features_rest", "opacity", "scaling", "rotation")


def round_capacity(n: int, bucket: int = CAPACITY_BUCKET) -> int:
    return max(bucket, ((n + bucket - 1) // bucket) * bucket)


@struct.dataclass
class GaussianScene:
    """Capacity-padded Gaussian scene.

    Trainable leaves (shape [C, ...]): xyz, features_dc [C,1,3],
    features_rest [C,R,3], opacity [C,1] (pre-sigmoid), scaling [C,3] (log),
    rotation [C,4] (unnormalized quat).
    ``active`` [C] bool marks live Gaussians. ``max_sh_degree`` is static.
    """

    xyz: jnp.ndarray
    features_dc: jnp.ndarray
    features_rest: jnp.ndarray
    opacity: jnp.ndarray
    scaling: jnp.ndarray
    rotation: jnp.ndarray
    active: jnp.ndarray
    max_sh_degree: int = struct.field(pytree_node=False, default=3)

    # ------------------------------------------------------------ accessors
    @property
    def capacity(self) -> int:
        return self.xyz.shape[0]

    def num_active(self) -> jnp.ndarray:
        return jnp.sum(self.active.astype(jnp.int32))

    @property
    def get_scaling(self) -> jnp.ndarray:
        return jnp.exp(self.scaling)

    @property
    def get_rotation(self) -> jnp.ndarray:
        return self.rotation / jnp.linalg.norm(self.rotation, axis=-1, keepdims=True)

    @property
    def get_opacity(self) -> jnp.ndarray:
        """Sigmoid opacity, zeroed on padded entries."""
        return jax.nn.sigmoid(self.opacity) * self.active[:, None]

    @property
    def get_features(self) -> jnp.ndarray:
        """[C, (deg+1)**2, 3] full SH coefficients (gaussian_model.py:141-144)."""
        return jnp.concatenate([self.features_dc, self.features_rest], axis=1)

    def get_rotation_mat(self) -> jnp.ndarray:
        return quat_to_rotmat(self.rotation)

    def get_covariance(self, scaling_modifier: float = 1.0) -> jnp.ndarray:
        return build_covariance_6(self.get_scaling, self.rotation, scaling_modifier)

    def get_covariance_mat(self, scaling_modifier: float = 1.0) -> jnp.ndarray:
        return build_covariance(self.get_scaling, self.rotation, scaling_modifier)

    def get_a_mat(self, scaling_modifier: float = 1.0) -> jnp.ndarray:
        return build_a_mat(self.get_scaling, self.rotation, scaling_modifier)

    # ------------------------------------------------------------- params
    def params(self) -> Dict[str, jnp.ndarray]:
        return {name: getattr(self, name) for name in PARAM_NAMES}

    def with_params(self, params: Dict[str, jnp.ndarray]) -> "GaussianScene":
        return self.replace(**params)

    # ---------------------------------------------------------------- IO
    def to_numpy_active(self) -> Dict[str, np.ndarray]:
        """Gather live Gaussians to host numpy arrays (for PLY / densify)."""
        mask = np.asarray(self.active)
        out = {}
        for name in PARAM_NAMES:
            out[name] = np.asarray(getattr(self, name))[mask]
        return out

    def save_ply(self, path: str) -> None:
        d = self.to_numpy_active()
        ply_io.save_gaussian_ply(
            path,
            xyz=d["xyz"],
            features_dc=d["features_dc"],
            features_rest=d["features_rest"],
            opacity=d["opacity"],
            scaling=d["scaling"],
            rotation=d["rotation"],
        )


def _pad(arr: np.ndarray, capacity: int, fill: float = 0.0) -> np.ndarray:
    n = arr.shape[0]
    if n == capacity:
        return arr
    out = np.full((capacity,) + arr.shape[1:], fill, dtype=arr.dtype)
    out[:n] = arr
    return out


def from_arrays(
    arrays: Dict[str, np.ndarray],
    max_sh_degree: int,
    capacity: Optional[int] = None,
) -> GaussianScene:
    """Build a padded scene from host arrays of live Gaussians."""
    n = arrays["xyz"].shape[0]
    cap = capacity or round_capacity(n)
    if cap < n:
        raise ValueError(f"capacity {cap} < number of gaussians {n}")
    active = np.zeros(cap, bool)
    active[:n] = True
    padded = {name: _pad(np.asarray(arrays[name], np.float32), cap) for name in PARAM_NAMES}
    # padded quaternions must stay normalizable; padded opacities very negative
    padded["rotation"][n:, 0] = 1.0
    padded["opacity"][n:] = -15.0
    kw = {name: jnp.asarray(v) for name, v in padded.items()}
    return GaussianScene(active=jnp.asarray(active), max_sh_degree=max_sh_degree, **kw)


def create_from_pcd(
    pcd: BasicPointCloud,
    max_sh_degree: int = 3,
    capacity: Optional[int] = None,
) -> GaussianScene:
    """Initialize from a point cloud (gaussian_model.py:189-228): DC SH from
    colors, isotropic log-scale from sqrt(mean 3-NN squared distance),
    identity rotation, opacity inverse_sigmoid(0.1)."""
    pts = np.asarray(pcd.points, np.float32)
    n = pts.shape[0]
    colors = np.asarray(pcd.colors, np.float32)
    fused_color = np.asarray(rgb_to_sh(jnp.asarray(colors)))
    n_coeffs = (max_sh_degree + 1) ** 2
    features_dc = fused_color.reshape(n, 1, 3)
    features_rest = np.zeros((n, n_coeffs - 1, 3), np.float32)

    dist2 = np.asarray(mean_sq_dist_3nn(jnp.asarray(pts)))
    dist2 = np.maximum(dist2, 1e-7)
    scales = np.log(np.sqrt(dist2))[:, None].repeat(3, axis=1)
    rots = np.zeros((n, 4), np.float32)
    rots[:, 0] = 1.0
    opacities = np.asarray(
        inverse_sigmoid(0.1 * jnp.ones((n, 1), jnp.float32))
    )
    return from_arrays(
        {
            "xyz": pts,
            "features_dc": features_dc,
            "features_rest": features_rest,
            "opacity": opacities,
            "scaling": scales.astype(np.float32),
            "rotation": rots,
        },
        max_sh_degree=max_sh_degree,
        capacity=capacity,
    )


def load_ply(path: str, max_sh_degree: int = 3, capacity: Optional[int] = None) -> GaussianScene:
    """Load a reference-format checkpoint PLY (gaussian_model.py:342-420)."""
    arrays = ply_io.load_gaussian_ply(path, max_sh_degree)
    return from_arrays(arrays, max_sh_degree=max_sh_degree, capacity=capacity)
