"""octcubem_tpu — a TPU-native JAX/XLA/Pallas framework with the capabilities of
OCTCube-M (3D multimodal OCT foundation model).

Built from scratch for TPU (not a port): channel-last layouts, einsum patchify,
Pallas flash attention, pjit/shard_map data parallelism over a device mesh, and
an exact PyTorch-checkpoint importer for output parity with the released
OCTCube weights.

Subpackages
-----------
core      mesh/sharding, precision policy, config.
ops       pure-function compute ops: patchify, pos embeds, resize-as-matmul,
          tube masking, attention (naive + Pallas flash).
nn        flax.linen building blocks: patch embeds, transformer blocks.
models    MAE-3D pretrainer, spatiotemporal ViT classifiers, 2D ViTs,
          COEM contrastive towers.
data      OCT volume ingestion (DICOM/PNG-stack/npy), transforms, patient
          indexing, splits.
train     optimizers, LR schedules, engines (pretrain / finetune / clip),
          metrics.
parallel  sharding helpers for multi-chip training.
compat    PyTorch checkpoint import (state-dict remapping).
cli       entry points.
"""

__version__ = "0.1.0"
