"""Noise-robustness injectors.

Behavioral parity with ``/root/reference/noise.py:15-76``: evaluation-time
corruption of one modality, selected by ``--noise <modality>-<type>
--noise-level x``.  ``GaussianNoise(level)`` adds N(0, level*range) noise
then renormalizes back to the original range; ``MaskingNoise(level)``
stamps ``level*200`` mean-valued patches (patch ≈10% of H/W, near-full
depth).  Operates on host numpy batches before the device step.
"""

import numpy as np

from multimodal_fusion_fpn_tpu.registry import get_factory_adder

add_noise_class, noise_classes = get_factory_adder()


@add_noise_class("gaussian")
class GaussianNoise:
    def __init__(self, level: float, seed: int = 1234):
        self.mean = 0.0
        self.level = level
        self.rng = np.random.default_rng(seed)

    @staticmethod
    def normalize_to(data: np.ndarray, min_v, max_v) -> np.ndarray:
        data = data - data.min()
        data = data / (data.max() + 1e-8)
        return data * (max_v - min_v) + min_v

    def __call__(self, data: np.ndarray) -> np.ndarray:
        data = np.asarray(data)
        data_min = data.min()
        data_max = data.max()
        std = self.level * (data_max - data_min)
        data = data + self.rng.standard_normal(data.shape).astype(
            data.dtype) * std + self.mean
        return self.normalize_to(data, data_min, data_max)


@add_noise_class("masking")
class MaskingNoise:
    def __init__(self, level: float, patch_size: float = 0.1,
                 seed: int = 1234):
        self.level = level
        self.num_masks = int(self.level * 200)
        self.patch_size = patch_size
        self.rng = np.random.default_rng(seed)

    def __call__(self, data: np.ndarray) -> np.ndarray:
        data = np.array(data, copy=True)
        max_h, max_d, max_w = data.shape[-3:]
        pct_10 = float((data.max() - data.min()) * 0.1)
        mean = data.mean()
        patch_size_h = max(int(max_h * self.patch_size), 1)
        patch_size_d = max(int(max_d * (1 - self.patch_size / 2)), 1)
        patch_size_w = max(int(max_w * self.patch_size), 1)
        for _ in range(self.num_masks):
            approx_mean = mean + self.rng.uniform(-pct_10, pct_10)
            w = int(self.rng.integers(0, max_w - patch_size_w))
            h = int(self.rng.integers(0, max_h - patch_size_h))
            if max_d > 1:
                d = int(self.rng.integers(0, max_d - patch_size_d))
                data[:, :, h:h + patch_size_h, d:d + patch_size_d,
                     w:w + patch_size_w] = approx_mean
            else:
                data[:, :, h:h + patch_size_h, :,
                     w:w + patch_size_w] = approx_mean
        return data
