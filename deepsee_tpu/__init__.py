"""deepsee_tpu — a TPU-native (JAX/XLA/Pallas/pjit) semantic face super-resolution framework.

A from-scratch rebuild of the capabilities of mcbuehler/DeepSEE (ACCV 2020):
semantic-conditioned explorative extreme super-resolution of faces (8x/32x) with
per-region style control, built TPU-first:

  * NHWC layouts, bfloat16-friendly compute, static shapes, `jax.jit` everywhere
  * a device-mesh / GSPMD sharding layer instead of DataParallel + manual
    `.cuda(n)` pipeline splits (reference: managers/base_manager.py:17-21,
    deepsee_models/networks/sr.py:73-92)
  * cross-replica norm statistics via global-array reductions instead of the
    vendored thread-rendezvous SyncBN (reference: sync_batchnorm/batchnorm.py)
  * fused Pallas kernels for the hot SPADE/SEAN modulation paths

Layout:
  config.py    typed configuration (replaces options/ argparse reflection)
  regions.py   CelebAMask-HQ 19-region metadata + label colormap
  ops/         resize / one-hot / norms / modulation primitives (+ Pallas kernels)
  models/      generator, style encoders, multiscale discriminator, VGG
  losses.py    GAN / feature-matching / perceptual losses
  parallel/    mesh + sharding specs
  data/        dataset pairing, transforms, on-device preprocessor
  train/       train state, jitted G/D steps, training loop
  eval/        PSNR/SSIM/MS-SSIM/RMSE/LPIPS/FID + eval harness
  inference/   explorative inference toolbox (interpolation, transplants, demo)
  utils/       checkpointing (Orbax + torch import), logging, visualization
"""

__version__ = "0.1.0"

from deepsee_tpu import config as config
from deepsee_tpu import regions as regions
