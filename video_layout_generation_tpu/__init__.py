"""video_layout_generation_tpu — a TPU-native (JAX/XLA/Pallas) framework for
joint future-frame video prediction + semantic layout generation.

Re-designed from scratch for TPU with the capability surface of the reference
``gongaa/video-layout-generation`` stack (see SURVEY.md):

- ``models``:    GridNet / CoordGridNet (dual seg+img heads), HNED edge net,
                 pix2pix toolkit (ResnetGenerator, UnetGenerator, PatchGAN /
                 Pixel discriminators), legacy layout-completion models.
- ``ops``:       MXU-friendly resize (matmul-form bilinear/nearest), SSIM
                 windows, one-hot, colorize LUT, Pallas kernels for hot paths.
- ``losses``:    L1, VGG19-feature, SSIM, gradient, (weighted/masked) CE,
                 GAN losses (lsgan / vanilla / wgangp) + gradient penalty.
- ``data``:      Cityscapes triplet indexer, synthetic hermetic dataset,
                 host-side prefetching pipeline feeding sharded device arrays.
- ``parallel``:  device-mesh construction + sharding helpers (DP over ICI).
- ``train``:     fused jitted train/eval steps, Trainer orchestration,
                 lax.scan autoregressive rollout.
- ``evaluation``: per-class IoU / pixel accuracy, colorized PNG export.
- ``io``:        orbax checkpointing, logging, TensorBoard.

Everything under ``jit`` is static-shape, functional, and layout-NHWC.
"""

__version__ = "0.1.0"
