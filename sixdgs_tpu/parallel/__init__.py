"""Multi-chip scaling via jax.sharding (ICI collectives emitted by XLA).

The reference is strictly single-GPU (SURVEY.md §2.3: no torch.distributed /
NCCL anywhere). Here parallelism is first-class:

  * DP over the pose-training image batch (the reference's 32-step gradient
    accumulation loop becomes a sharded batch with a mean-gradient psum),
  * SP over the ray axis (ray-MLP rows + the patches x rays attention logits
    are ray-sharded; softmax statistics cross shards via XLA-inserted
    collectives) — the system's analogue of sequence parallelism,
  * Gaussian-parallel projection + pixel-parallel compositing for rendering,
  * DP over a batch of cameras for 3DGS training (one B-camera step is the
    statistical equivalent of B reference iterations; densify stats keep
    reference semantics).
"""

from sixdgs_tpu.parallel.gs_sharding import make_sharded_gs_step, shard_camera_batch
from sixdgs_tpu.parallel.mesh import make_mesh
from sixdgs_tpu.parallel.pose_sharding import make_sharded_pose_step, shard_pose_inputs

__all__ = ["make_mesh", "make_sharded_pose_step", "shard_pose_inputs",
           "make_sharded_gs_step", "shard_camera_batch"]
