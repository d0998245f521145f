"""transplat_tpu — a TPU-native (JAX/XLA/Pallas) feed-forward Gaussian-splatting framework.

Re-implements the capabilities of TranSplat (AAAI 2025, arXiv 2408.13770) as a
brand-new TPU-first stack:

  * geometry/    pure-jnp camera geometry, spherical harmonics, covariance math
  * ops/         Pallas + XLA compute kernels (tile rasterizer, deformable
                 sampling, window attention)
  * model/       Flax modules: multi-view matching backbone, depth predictor,
                 Gaussian adapter, splatting decoder, Depth-Anything-V2 prior
  * loss/        MSE / LPIPS / depth-smoothness losses
  * dataset/     RE10K/ACID/DTU chunked dataset pipeline + view samplers
  * parallel/    mesh construction and sharding rules (dp/sp over ICI)
  * training/    train step, optimizer schedule, checkpointing
  * evaluation/  PSNR/SSIM/LPIPS and golden-index eval harness
"""

__version__ = "0.1.0"
