"""street_sparse_3dgs_tpu — a TPU-native hierarchical 3D Gaussian Splatting framework.

A from-scratch JAX/XLA/Pallas re-design of the capability set of
`iacopoermacora/Street-sparse-3DGS` (street-scene fork of Inria's
"Hierarchical 3D Gaussians", TOG 2024):

- differentiable Gaussian rasterization (SH eval, EWA covariance projection,
  tile binning, depth-sorted alpha blending fwd/bwd) as vectorized JAX +
  fused Pallas TPU kernels,
- coarse scaffold + skybox training, per-chunk 3DGS optimization with
  monocular/LiDAR depth regularization, depth-only virtual cameras and
  GT-point-cloud constraints,
- LOD hierarchy construction, view-dependent cut selection with parent/child
  interpolation, post-optimization and multi-chunk consolidation,
- multi-chip scaling via `jax.sharding.Mesh` (tiles sharded over chips,
  gradients all-reduced over ICI).

Layer map (mirrors SURVEY.md §7):
  core/      pure math (SH, quaternions, covariances, cameras, schedules, KNN)
  ops/       the rasterizer: oracle (pure jnp), preprocess, binning, blend,
             pallas kernels, public render API
  models/    GaussianModel pytree, sparse Adam, densification, exposure, ply IO
  data/      COLMAP parsers, scene/camera containers, toy scene synthesis
  hierarchy/ builder (Creator), cut selection (expand_to_size), merger, IO
  train/     losses and the coarse/single/post training loops
  parallel/  device mesh, sharded render + train step
  eval/      metrics (PSNR/SSIM/iMAE/iRMSE/LPIPS) and hierarchy eval drivers
  pipeline/  full_train orchestrator (chunk fan-out, consolidation)
"""

__version__ = "0.1.0"
