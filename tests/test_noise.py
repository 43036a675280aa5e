"""Noise-robustness injector semantics (reference noise.py:18-76)."""

import numpy as np

from multimodal_fusion_fpn_tpu.eval.noise import (GaussianNoise,
                                                  MaskingNoise,
                                                  noise_classes)


def test_factory_names():
    assert set(noise_classes) == {"gaussian", "masking"}


def test_gaussian_preserves_range():
    rng = np.random.default_rng(0)
    data = rng.uniform(2.0, 5.0, size=(1, 1, 16, 8, 16)).astype(np.float32)
    noised = GaussianNoise(0.5, seed=1)(data)
    assert noised.shape == data.shape
    np.testing.assert_allclose(noised.min(), data.min(), atol=1e-5)
    np.testing.assert_allclose(noised.max(), data.max(), atol=1e-5)
    assert not np.allclose(noised, data)


def test_masking_stamps_patches():
    rng = np.random.default_rng(0)
    data = rng.normal(size=(1, 1, 64, 4, 64)).astype(np.float32)
    level = 0.1
    noised = MaskingNoise(level, seed=1)(data)
    assert noised.shape == data.shape
    changed = (noised != data).sum()
    assert changed > 0
    # masking writes near-mean constants into patches
    assert np.isfinite(noised).all()


def test_masking_2d_branch():
    """max_d == 1 takes the depth-free branch (reference noise.py:74-75)."""
    rng = np.random.default_rng(0)
    data = rng.normal(size=(1, 1, 64, 1, 64)).astype(np.float32)
    noised = MaskingNoise(0.05, seed=2)(data)
    assert (noised != data).sum() > 0
