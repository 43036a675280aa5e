"""Torch checkpoint import: name mapping + numeric forward parity.

Builds a torch module with the reference's exact submodule structure for
one encoder stage (Sequential of two ConvX blocks, ``unets3D.py:187-219``
naming: ``convBlock.{i}.{0,1}``, ``downsample.{0,1}``), maps its state
dict through :mod:`train.torch_import`, and checks the flax stage
reproduces the torch forward on the same input.
"""

import jax
import jax.numpy as jnp
import numpy as np
import torch
import torch.nn as tnn
from flax import linen as nn

from multimodal_fusion_fpn_tpu.models.blocks import EncoderStage
from multimodal_fusion_fpn_tpu.train.torch_import import map_state_dict


def _t_convx(c_in, c_out, kernels, paddings, downsample):
    layers = []
    for i, (k, p) in enumerate(zip(kernels, paddings)):
        mods = [tnn.Conv3d(c_in if i == 0 else c_out, c_out, k,
                           stride=1, padding=p, bias=False),
                tnn.BatchNorm3d(c_out)]
        if i < len(kernels) - 1:
            mods.append(tnn.ReLU())
        layers.append(tnn.Sequential(*mods))

    class TConvX(tnn.Module):
        def __init__(self):
            super().__init__()
            self.convBlock = tnn.Sequential(*layers)
            if downsample:
                self.downsample = tnn.Sequential(
                    tnn.Conv3d(c_in, c_out, 1, stride=1, bias=False),
                    tnn.BatchNorm3d(c_out))
            else:
                self.downsample = None
            self.relu = tnn.ReLU()

        def forward(self, x):
            out = self.convBlock(x)
            res = self.downsample(x) if self.downsample is not None else x
            return self.relu(out + res)

    return TConvX()


class TStageWrapper(tnn.Module):
    """Mimics the reference's `resensnet.conv1` naming."""

    def __init__(self, c_in, c_out):
        super().__init__()
        stage = tnn.Sequential(
            _t_convx(c_in, c_out, [(1, 3, 3), (1, 3, 3)],
                     [(0, 1, 1), (0, 1, 1)], downsample=(c_in != c_out)),
            _t_convx(c_out, c_out, [(1, 3, 3), (1, 3, 3), (3, 1, 1)],
                     [(0, 1, 1), (0, 1, 1), (1, 0, 0)], downsample=False),
        )
        inner = tnn.Module()
        inner.conv1 = stage
        self.resensnet = inner

    def forward(self, x):
        return self.resensnet.conv1(x)


class FStageWrapper(nn.Module):
    c_out: int
    downsample: bool

    @nn.compact
    def __call__(self, x, train=False):
        class Inner(nn.Module):
            c_out: int
            downsample: bool

            @nn.compact
            def __call__(self, x, train=False):
                return EncoderStage(self.c_out, use_bn=True,
                                    downsample=self.downsample, ndim=3,
                                    name="conv1")(x, train)
        return Inner(self.c_out, self.downsample, name="resensnet")(x, train)


def test_torch_stage_import_numeric_parity():
    torch.manual_seed(0)
    c_in, c_out = 2, 4
    tmodel = TStageWrapper(c_in, c_out).eval()
    # randomize BN running stats so the test is not trivial
    for m in tmodel.modules():
        if isinstance(m, tnn.BatchNorm3d):
            m.running_mean.normal_(0, 0.5)
            m.running_var.uniform_(0.5, 2.0)
            m.weight.data.normal_(1, 0.1)
            m.bias.data.normal_(0, 0.1)

    x_t = torch.randn(2, c_in, 4, 6, 16)  # (B, C, Y, X, Z)
    with torch.no_grad():
        y_t = tmodel(x_t).numpy()

    fmodel = FStageWrapper(c_out, downsample=(c_in != c_out))
    x_f = jnp.transpose(jnp.asarray(x_t.numpy()), (0, 2, 3, 4, 1))
    variables = fmodel.init(jax.random.PRNGKey(0), x_f)

    params, batch_stats = map_state_dict(
        tmodel.state_dict(), variables["params"], variables["batch_stats"])
    y_f = fmodel.apply({"params": params, "batch_stats": batch_stats}, x_f)
    y_f = np.transpose(np.asarray(y_f), (0, 4, 1, 2, 3))
    np.testing.assert_allclose(y_f, y_t, rtol=2e-4, atol=2e-4)


def test_resensenet_rename_compat():
    """The eval-side legacy rename (validate_ensemble.py:253-256)."""
    sd = {"model.resensenet.final1.weight": np.zeros((1, 4, 1, 1, 1)),
          "model.resensenet.final1.bias": np.zeros((1,))}
    renamed = {k.replace("resensenet", "resensnet"): v
               for k, v in sd.items()}
    assert "model.resensnet.final1.weight" in renamed
