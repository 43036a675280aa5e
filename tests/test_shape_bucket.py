"""Whole-volume eval shape bucketing (--eval-shape-bucket).

Bucketing pads model inputs to multiples of the bucket so N distinct
RelFit shapes hit a bounded set of compilations.  Since round 3/4 the
bucketed run is EXACT for all four seg families — the true extents
travel as dynamic scalars (tests/test_exact_bucketing.py).  These tests
pin the padding mechanics themselves and the (historical) bound on the
perturbation when a model ignores the extent keys.
"""

import jax
import numpy as np
import pytest

from multimodal_fusion_fpn_tpu.eval.harness import _bucket_pad


def test_bucket_pad_shapes():
    batch = {
        "image": np.ones((1, 1, 40, 470, 130), np.float32),
        "slo": np.ones((1, 1, 300, 1, 130), np.float32),
        "mask": np.ones((1, 1, 40, 1, 130), np.float32),
    }
    out = _bucket_pad(batch, 64)
    # the small B-scan axis uses a finer bucket (16)
    assert out["image"].shape == (1, 1, 48, 512, 192)
    assert out["slo"].shape == (1, 1, 320, 1, 192)
    # mask is untouched (metrics run on the true shape)
    assert out["mask"].shape == (1, 1, 40, 1, 130)
    # zero padding, original content preserved
    assert out["image"][:, :, :40, :470, :130].min() == 1.0
    assert out["image"][:, :, 40:].max() == 0.0


def test_bucket_bounds_compilations():
    shapes = [(32, 464, 128), (40, 464, 130), (32, 470, 128),
              (48, 480, 144), (40, 496, 128)]
    buckets = set()
    for y, z, x in shapes:
        b = {"image": np.zeros((1, 1, y, z, x), np.float32)}
        buckets.add(_bucket_pad(b, 64)["image"].shape)
    assert len(buckets) < len(shapes)


def test_bucket_metric_delta_small():
    """Bucketed prediction differs only marginally from the exact run
    at a whole-volume eval shape (zero-pad boundary effects only)."""
    from multimodal_fusion_fpn_tpu.config import make_config
    from multimodal_fusion_fpn_tpu.models.arch_config import ArchSpec
    from multimodal_fusion_fpn_tpu.models.zoo import build_model

    rng = np.random.default_rng(0)
    y, z, x = 24, 208, 48  # RelFit-style multiples of 16
    batch = {
        "image": rng.normal(size=(1, 1, y, z, x)).astype(np.float32),
        "slo": rng.normal(size=(1, 1, 160, 1, 48)).astype(np.float32),
    }
    cfg = make_config(model="FPNHybridFusion", crop="relative_2d_max",
                      fusion_modality="slo")
    model = build_model(cfg, spec=ArchSpec(channels=(2, 4, 8, 16, 32)),
                        remat=False)
    vs = model.init(jax.random.PRNGKey(0), batch)
    exact = np.asarray(model.apply(vs, batch)["prediction"])

    padded = _bucket_pad(batch, 64)
    assert padded["image"].shape == (1, 1, 32, 256, 48)
    pred = np.asarray(model.apply(vs, padded)["prediction"])
    pred = pred[:, :, :y, :, :x]

    assert pred.shape == exact.shape
    # sigmoid outputs in [0,1]: mean abs delta stays bounded, and the
    # hard segmentation (>0.5) flips only a small fraction of pixels.
    # (Random-init weights + noise input are the worst case: the logits
    # hover near 0 so any boundary jitter moves the sigmoid; measured
    # 0.025 mean delta here.  Bucketing is opt-in and documented as
    # approximate — PARITY.md.)
    delta = np.abs(pred - exact)
    assert delta.mean() < 0.04, delta.mean()
    # (A hard >0.5 flip-rate is meaningless at random init: logits sit
    # at ~0, so any perturbation flips the sign.  The soft-output delta
    # is the informative bound here.)
