"""Dataset + loader tests on synthetic data in the reference disk layout."""

import json

import numpy as np

from multimodal_fusion_fpn_tpu.config import make_config
from multimodal_fusion_fpn_tpu.data.hrf import HRF_SPEC_Dataset
from multimodal_fusion_fpn_tpu.data.loader import DataLoader
from multimodal_fusion_fpn_tpu.train.configs import data_config_factory


def test_hrf_dataset_layouts(synthetic_hrf):
    with open(synthetic_hrf["split"]) as f:
        split = json.load(f)
    ds = HRF_SPEC_Dataset(path=synthetic_hrf["oct"],
                          patients=split["train"], multiplier=3,
                          transforms=None, get_spacing=True,
                          visits_fn=synthetic_hrf["visits"])
    assert len(ds) == 3 * ds.real_length
    rec = ds.get_example(0)
    assert rec["image"].ndim == 4 and rec["image"].shape[0] == 1
    assert rec["mask"].shape[0] == 1 and rec["mask"].shape[2] == 1
    assert rec["slo"].shape[0] == 1 and rec["slo"].shape[2] == 1
    assert set(np.unique(rec["mask"])).issubset({0.0, 1.0})
    assert rec["spacing"].shape == (3,)
    # virtual-epoch modulo
    rec2 = ds.get_example(ds.real_length)
    assert rec2["FileSetId"] == rec["FileSetId"]


def test_full_training_pipeline_shapes(synthetic_hrf):
    cfg = make_config(training_dataset="hrf_fusion", model="FPNHybridFusion",
                      crop="relative_2d_max", fusion_modality="slo",
                      data_root=synthetic_hrf["oct"], multiplier=2,
                      threads=2)
    dc = data_config_factory["hrf_fusion"](cfg)
    dc.paths = synthetic_hrf | {}
    train_t, val_t = dc.get_transforms()
    with open(synthetic_hrf["split"]) as f:
        split = json.load(f)
    ds = dc.train_data(split["train"], train_t)
    loader = DataLoader(ds, batch_size=2, shuffle=True, drop_last=True,
                        num_workers=2, seed=1234)
    batch = next(iter(loader))
    # crop: 32 B-scans x 128 width, but synthetic volume is (16, 64, 32):
    # RelSize forces (32, h, 128)? No: crop takes min(real, requested) via
    # relative logic then RelSize resizes to the fixed (32, -, 128).
    assert batch["image"].shape[0] == 2
    assert batch["image"].shape[1] == 1
    assert batch["image"].shape[2] == 32   # s_size
    assert batch["image"].shape[4] == 128  # w_size
    assert batch["slo"].shape == (2, 1, 320, 1, 128)
    assert batch["mask"].shape[2] == 32 and batch["mask"].shape[4] == 128
    assert batch["image"].dtype == np.float32
    assert isinstance(batch["FileSetId"], list)


def test_loader_determinism(synthetic_hrf):
    cfg = make_config(training_dataset="hrf_fusion", model="FPNHybridFusion",
                      crop="relative_2d_max", fusion_modality="slo",
                      data_root=synthetic_hrf["oct"], multiplier=1)
    dc = data_config_factory["hrf_fusion"](cfg)
    train_t, _ = dc.get_transforms()
    with open(synthetic_hrf["split"]) as f:
        split = json.load(f)

    def first_batch(workers):
        ds = dc.train_data(split["train"], train_t)
        loader = DataLoader(ds, batch_size=2, shuffle=True, drop_last=True,
                            num_workers=workers, seed=7)
        return next(iter(loader))

    a = first_batch(0)
    b = first_batch(3)
    np.testing.assert_array_equal(a["image"], b["image"])
    np.testing.assert_array_equal(a["slo"], b["slo"])


def test_val_transforms_deterministic(synthetic_hrf):
    cfg = make_config(training_dataset="hrf_fusion", model="FPNHybridFusion",
                      crop="relative_2d_max", fusion_modality="slo",
                      data_root=synthetic_hrf["oct"])
    dc = data_config_factory["hrf_fusion"](cfg)
    val_t = dc.get_val_transforms()
    with open(synthetic_hrf["split"]) as f:
        split = json.load(f)
    ds = dc.val_data(split["val"], val_t)
    a = ds.get_example(0)
    b = ds.get_example(0)
    np.testing.assert_array_equal(a["image"], b["image"])
    # val sizes are multiples of 16 on dims 1,3
    assert a["image"].shape[1] % 16 == 0
    assert a["image"].shape[3] % 16 == 0


def test_patches_from_single_image_block_reuse(synthetic_hrf):
    """patches_from_single_image=2: each loaded image serves 2
    consecutive examples (reference abstract_dataloader.py:94-101 —
    calls 2..N reuse the image loaded at call 1, regardless of their own
    shuffled index)."""
    with open(synthetic_hrf["split"]) as f:
        split = json.load(f)
    ds = HRF_SPEC_Dataset(path=synthetic_hrf["oct"],
                          patients=split["train"], multiplier=2,
                          patches_from_single_image=2,
                          transforms=None,
                          visits_fn=synthetic_hrf["visits"])
    loader = DataLoader(ds, batch_size=1, shuffle=True, num_workers=2,
                        seed=7)
    loader.set_epoch(0)
    ids = [batch["FileSetId"][0] for batch in loader]
    assert len(ids) == len(ds)
    # consecutive pairs come from the same loaded image
    for a, b in zip(ids[0::2], ids[1::2]):
        assert a == b
    # ...but the epoch still visits more than one distinct image
    assert len(set(ids)) > 1
