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
