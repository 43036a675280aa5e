"""Layout conversion between the reference API layout and device layout.

The framework's public batch layout matches the reference datasets
(``/root/reference/common/dataloader_hrf_spec_aligned_seg.py:47-112``):

  * ``image``: (B, 1, D, H, W) — D = #B-scans (en-face rows, "Y"),
    H = B-scan depth ("Z"), W = en-face width ("X").
  * ``mask`` / ``slo`` / ``faf``: (B, 1, H_ef, 1, W).

On device everything is channels-last: volumes (B, Y, X, Z, C) and 2D
maps (B, H, W, C).  These converters are the only place the two layouts
meet; they correspond to the reference's ``permute(0,1,2,4,3)`` calls in
``fusion_nets.py``.
"""

import jax.numpy as jnp


def volume_to_device(image: jnp.ndarray) -> jnp.ndarray:
    """(B, C, D, H, W) -> (B, Y=D, X=W, Z=H, C)."""
    return jnp.transpose(image, (0, 2, 4, 3, 1))


def seg_from_device(seg: jnp.ndarray) -> jnp.ndarray:
    """(B, Y, X, Z=1, C) -> reference prediction layout (B, C, Y, 1, X)."""
    return jnp.transpose(seg, (0, 4, 1, 3, 2))


def enface_to_device(modality: jnp.ndarray) -> jnp.ndarray:
    """(B, C, H, 1, W) -> (B, H, W, C)."""
    return jnp.transpose(modality[:, :, :, 0, :], (0, 2, 3, 1))
