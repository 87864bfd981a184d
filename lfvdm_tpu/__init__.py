"""lfvdm_tpu — TPU-native latent flexible video diffusion modeling.

A from-scratch JAX/Flax/Pallas rebuild of the capabilities of
plai-group/latent-flexible-video-diffusion-modeling (FDM + SVD-VAE latent
diffusion): frame-indexed video U-Net with relative-position temporal
attention, flexible conditioning masks, DDPM/DDIM sampling compiled to
on-device `lax.scan`, flexible long-video sampling schemes, and a
data-parallel (+FSDP) training runtime over `jax.sharding` meshes.

Package layout:
  diffusion/  — schedules, Gaussian diffusion core, respacing, resamplers
  models/     — Flax video U-Net, RPE attention, NN primitives
  ops/        — Pallas TPU kernels (fused masked RPE attention, group norm)
  parallel/   — mesh construction, sharding rules, distributed init
  training/   — train loop, mask/frame samplers, checkpointing
  data/       — dataset registry and loaders
  sampling/   — flexible sampling schemes + jitted sampler driver
  evals/      — FVD, LPIPS, CARLA regressor metrics
  utils/      — logger, rng helpers, results paths
"""

__version__ = "0.1.0"
