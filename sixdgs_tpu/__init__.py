"""sixdgs_tpu — a TPU-native (JAX/XLA/Pallas) 6DGS framework.

A from-scratch rebuild of the capabilities of mbortolon97/6dgs (ECCV 2024,
arXiv 2407.15484): 3D Gaussian Splatting training + differentiable rendering,
and single-image 6-DoF camera pose estimation against a pre-trained 3DGS model
via ellipsoid-surface ray casting and cross-attention ray scoring.

Everything is designed TPU-first:
  * pure-functional pytree scene state (fixed-capacity, mask-padded arrays),
  * XLA-friendly static shapes everywhere (no data-dependent shapes under jit),
  * Pallas kernels for the hot ops (tile rasterization, patch x ray attention),
  * multi-chip scaling via jax.sharding.Mesh (+DP over images, SP over rays,
    Gaussian-parallel projection) instead of per-device loops.

Layout:
  ops/       pure math kernels (SH, transforms, sym-eig, kNN, SSIM, LS lines,
             rasterizer projection/compositing, attention-score kernel)
  scene/     Gaussian scene pytree, PLY codec, dataset loaders, cameras
  renderer/  public differentiable render() API
  train/     3DGS training loop + densification
  rays/      ellipsoid-surface ray engine (quadricell)
  pose/      DINOv2 backbone, ray MLP, attention scorer, loss, solver, trainer
  parallel/  mesh/sharding helpers, sharded train steps
  apps/      CLI entry points (train, render, metrics, pose eval)
"""

__version__ = "0.1.0"


def __getattr__(name):
    """Lazy top-level API (keeps `import sixdgs_tpu` light)."""
    import importlib

    api = {
        "GaussianScene": ("sixdgs_tpu.scene.gaussians", "GaussianScene"),
        "load_ply": ("sixdgs_tpu.scene.gaussians", "load_ply"),
        "create_from_pcd": ("sixdgs_tpu.scene.gaussians", "create_from_pcd"),
        "load_data": ("sixdgs_tpu.scene.dataset_loader", "load_data"),
        "render": ("sixdgs_tpu.renderer", "render"),
        "GSTrainer": ("sixdgs_tpu.train.gs_trainer", "GSTrainer"),
        "PoseTrainer": ("sixdgs_tpu.pose.trainer", "PoseTrainer"),
        "generate_rays": ("sixdgs_tpu.rays.engine", "generate_rays_from_scene"),
        "score_image": ("sixdgs_tpu.pose.id_module", "score_image"),
        "solve_pose": ("sixdgs_tpu.pose.solver", "solve_pose"),
        "make_mesh": ("sixdgs_tpu.parallel.mesh", "make_mesh"),
    }
    if name in api:
        module, attr = api[name]
        return getattr(importlib.import_module(module), attr)
    raise AttributeError(f"module 'sixdgs_tpu' has no attribute {name!r}")
