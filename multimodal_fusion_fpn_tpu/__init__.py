"""TPU-native reimplementation of the projective multimodal-fusion FPN.

A brand-new JAX / Flax / Pallas framework with the capabilities of the
PyTorch reference (j-morano/multimodal-fusion-fpn, IEEE JBHI 2024): deep
multimodal fusion of data with heterogeneous dimensionality (3D OCT volumes
+ 2D en-face modalities) via projective networks.

Design notes (TPU-first, not a port):
  * channels-last layouts everywhere on device: volumes are (B, Y, X, Z, C)
    with Y = B-scan index (en-face rows), X = en-face width, Z = depth;
    2D maps are (B, H, W, C).  The model-zoo wrappers accept and emit the
    reference's channels-second dict layout at the API boundary only.
  * pure-functional training step under jit; explicit RNG threading;
    gradient accumulation via lax.scan; SPMD via jax.sharding.Mesh.
  * exact-semantics ops (index-gather nearest upsample, adaptive max pool,
    half-pixel trilinear resize) parity-tested against torch on CPU.
"""

__version__ = "0.1.0"

from multimodal_fusion_fpn_tpu.registry import get_factory_adder  # noqa: F401
