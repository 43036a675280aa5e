"""VRC vessel dataset + config family tests on synthetic data."""

import json

import numpy as np
import pytest

from multimodal_fusion_fpn_tpu.config import make_config
from multimodal_fusion_fpn_tpu.data.loader import DataLoader
from multimodal_fusion_fpn_tpu.data.vrc import VRC_Dataset
from multimodal_fusion_fpn_tpu.train.configs import data_config_factory


@pytest.fixture(scope="module")
def synthetic_vrc(tmp_path_factory):
    from multimodal_fusion_fpn_tpu.data.synthetic import make_synthetic_vrc
    root = tmp_path_factory.mktemp("vrc")
    return make_synthetic_vrc(str(root), n_patients=4, d=16, h=64, w=32,
                              enface_h=80, enface_w=32, seed=1)


def test_vrc_flat_layout(synthetic_vrc):
    with open(synthetic_vrc["split"]) as f:
        split = json.load(f)
    ds = VRC_Dataset(path=synthetic_vrc["oct"], patients=split["train"],
                     multiplier=1, transforms=None, get_spacing=True,
                     mask_variant="faf",
                     visits_fn=synthetic_vrc["visits"])
    rec = ds.get_example(0)
    assert rec["image"].shape[0] == 1
    assert rec["mask"].dtype == bool  # flat variant keeps the bool mask
    assert rec["slo"].shape[0] == 1 and rec["slo"].shape[2] == 1


def test_vrc_lr2_variant(synthetic_vrc):
    with open(synthetic_vrc["split"]) as f:
        split = json.load(f)
    ds = VRC_Dataset(path=synthetic_vrc["oct"], patients=split["train"],
                     multiplier=1, transforms=None, get_spacing=True,
                     mask_variant="faf", visits_fn=synthetic_vrc["visits"],
                     preprocessed_bscan="lr2")
    rec = ds.get_example(0)
    assert rec["image"].shape[2] == 32  # lr2: half depth


def test_vrc_sq_proj_dil_mask_variant(synthetic_vrc):
    with open(synthetic_vrc["split"]) as f:
        split = json.load(f)
    ds = VRC_Dataset(path=synthetic_vrc["oct"], patients=split["train"],
                     multiplier=1, transforms=None,
                     mask_variant="sq_proj_dil",
                     visits_fn=synthetic_vrc["visits"])
    rec = ds.get_example(0)
    # OCT-grid mask (d, w) = (16, 32)
    assert rec["mask"].shape == (1, 16, 1, 32)


def test_vrc_training_config_pipeline(synthetic_vrc):
    cfg = make_config(training_dataset="vrc", model="FPN", crop="oct",
                      data_root=synthetic_vrc["oct"], multiplier=1)
    dc = data_config_factory["vrc"](cfg)
    dc.paths = dict(synthetic_vrc)
    train_t, val_t = dc.get_transforms()
    with open(synthetic_vrc["split"]) as f:
        split = json.load(f)
    ds = dc.train_data(split["train"], train_t)
    loader = DataLoader(ds, batch_size=2, shuffle=True, drop_last=True,
                        num_workers=0, seed=0)
    batch = next(iter(loader))
    assert batch["image"].shape[2] == 32 and batch["image"].shape[4] == 128
    assert batch["mask"].shape[2] == 32 and batch["mask"].shape[4] == 128
    assert batch["image"].dtype == np.float32
