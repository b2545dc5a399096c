"""advise_tpu — a TPU-native video self-supervised learning framework.

A from-scratch JAX/Flax/pjit/Pallas rebuild of the capabilities of
``JingwWu/advise-video-ssl`` (playback-speed pretext pretraining, BYOL/MoCo/
SimCLR/SwAV/memory-bank contrastive learning, MAE/MaskFeat masked prediction,
AdViSe temporal modeling, and a video model zoo: 3D-ResNet, SlowFast, X3D,
MViT, Video Swin), designed TPU-first:

- one SPMD ``jit(shard_map(...))`` train step over a ``jax.sharding.Mesh``
  (the reference runs one torch process per GPU with NCCL DDP),
- functional state ``{params, batch_stats, opt_state, ema, ssl buffers, rng}``
  threaded through the step (the reference mutates ``nn.Module`` buffers),
- the CPU-bound PIL augmentation pipeline moved on-device as fused XLA/Pallas
  kernels over batched uint8 frames (reference: ``datasets/augmentation.py``),
- SyncBN / feature gathers lowered to ``lax.psum`` / ``lax.all_gather`` over
  ICI (reference: ``utils/distributed.py``, ``models/batchnorm_helper.py``).

The YACS config surface (``--cfg file.yaml --opts K V``) is kept compatible
with the reference's ``configs/defaults.py`` so existing recipes translate.
"""

__version__ = "0.1.0"
