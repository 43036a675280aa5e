"""Full-model logit parity against a torch oracle at the ini widths.

Builds each reference architecture in torch (tests/torch_oracle.py),
imports its state dict through :mod:`train.torch_import`, and asserts
fp32 eval-mode logit agreement — the proof that "matches the reference"
(SURVEY.md §7.2; closes VERDICT round-1 missing item #1).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import torch

from multimodal_fusion_fpn_tpu.config import make_config
from multimodal_fusion_fpn_tpu.models.zoo import build_model
from multimodal_fusion_fpn_tpu.train.torch_import import map_state_dict

from torch_oracle import (TFPN, TFPN2D, TFPNHybrid, TFPNLateFusion,
                          randomize)

INI_CH = (16, 32, 64, 128, 256)


def _batch(seed=0, b=1, y=8, d=64, w=32, eh=80, ew=32):
    rng = np.random.default_rng(seed)
    return {
        "image": rng.normal(size=(b, 1, y, d, w)).astype(np.float32),
        "slo": rng.normal(size=(b, 1, eh, 1, ew)).astype(np.float32),
        "mask": (rng.random((b, 1, y, 1, w)) > 0.7).astype(np.float32),
    }


def _torch_forward(tmodel, batch):
    tb = {k: torch.from_numpy(v) for k, v in batch.items()}
    with torch.no_grad():
        return tmodel(tb)["prediction"].numpy()


def _flax_forward(model, batch, state_dict, rename=False):
    jb = {k: jnp.asarray(v) for k, v in batch.items()}
    variables = model.init({"params": jax.random.PRNGKey(0)}, jb,
                           train=False)
    if rename:
        state_dict = {k.replace("resensenet", "resensnet"): v
                      for k, v in state_dict.items()}
    params, batch_stats = map_state_dict(
        state_dict, variables["params"],
        variables.get("batch_stats", {}))
    out = model.apply({"params": params, "batch_stats": batch_stats}, jb,
                      train=False)
    return np.asarray(out["prediction"])


def _assert_close(y_f, y_t):
    assert y_f.shape == y_t.shape, (y_f.shape, y_t.shape)
    np.testing.assert_allclose(y_f, y_t, rtol=1e-4, atol=1e-4)


def test_fpn_full_parity():
    """ModifiedUnet3D via the FPN wrapper (crop=oct: no alignment)."""
    tmodel = randomize(TFPN(ch=INI_CH), seed=1)
    batch = _batch(1)
    cfg = make_config(model="FPN", crop="oct")
    model = build_model(cfg, remat=False)
    _assert_close(_flax_forward(model, batch, tmodel.state_dict()),
                  _torch_forward(tmodel, batch))


@pytest.mark.parametrize("interp,crop", [("2d_max", "relative_2d_max"),
                                         ("2d", "relative_2d")])
def test_hybrid_fusion_full_parity(interp, crop):
    """ModifiedUnet3D2DLevel5 via FPNHybridFusion (both alignments)."""
    tmodel = randomize(TFPNHybrid(ch=INI_CH, interpolate=interp), seed=2)
    batch = _batch(2)
    cfg = make_config(model="FPNHybridFusion", crop=crop,
                      fusion_modality="slo")
    model = build_model(cfg, remat=False)
    _assert_close(_flax_forward(model, batch, tmodel.state_dict()),
                  _torch_forward(tmodel, batch))


def test_fpn2d_full_parity():
    """ModifiedUnet2DLevel5 via FPN2D (incl. resize-to-mask)."""
    tmodel = randomize(TFPN2D(ch=INI_CH), seed=3)
    batch = _batch(3)
    cfg = make_config(model="FPN2D", crop="relative_2d_max",
                      fusion_modality="slo")
    model = build_model(cfg, remat=False)
    _assert_close(_flax_forward(model, batch, tmodel.state_dict()),
                  _torch_forward(tmodel, batch))


def test_late_fusion_full_parity():
    """FPNLateFusion: 3D branch keeps orphan final1 params
    (fusion_nets.py:168-171) — the import must tolerate them."""
    tmodel = randomize(TFPNLateFusion(ch=INI_CH, interpolate="2d_max"),
                       seed=4)
    sd = tmodel.state_dict()
    assert any(k.startswith("resensnet3d.final1") for k in sd)
    batch = _batch(4)
    cfg = make_config(model="FPNLateFusion", crop="relative_2d_max",
                      fusion_modality="slo")
    model = build_model(cfg, remat=False)
    _assert_close(_flax_forward(model, batch, sd),
                  _torch_forward(tmodel, batch))
