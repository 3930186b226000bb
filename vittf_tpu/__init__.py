"""vit-tf_tpu — TPU-native rebuild of the vit-tf volumetric segmentation framework.

A from-scratch JAX/XLA/Pallas implementation of the capabilities of
xeTaiz/vit-tf ("Leveraging Self-Supervised Vision Transformers for
Segmentation-based Transfer Function Design", IEEE TVCG 2024):

- ``core``     — volume types, artifact I/O contract, synthetic fixtures
- ``ops``      — exact-parity numerics (grid_sample, resize, pooling) plus
                 Pallas TPU kernels (flash attention, tiled similarity)
- ``models``   — DINO/DINOv2 ViT in JAX with explicit qkv capture,
                 3D CNN feature extractors for the trainer layer
- ``pipeline`` — feature extraction / similarity / refinement / prediction
- ``parallel`` — mesh + sharding layer (DP over slices, voxel-sharded
                 similarity, optional TP attention)
- ``train``    — contrastive / semi-supervised trainer layer (InfoNCE, PAWS,
                 LARS) mirroring the reference's legacy ``old/`` capability

Import name is ``vittf_tpu`` (a valid Python identifier for the package
the task brief calls ``vit-tf_tpu``).
"""

__version__ = "0.1.0"

from vittf_tpu.utils.tensor import (  # noqa: F401
    make_nd,
    make_3d,
    make_4d,
    make_5d,
    norm_minmax,
    norm_mean_std,
)
