"""Certify the torch oracle against the ACTUAL reference code.

Every full-model parity test flows through the hand-written oracle in
``tests/torch_oracle.py``; an error replicated into both the oracle and
the flax models would pass the whole suite (VERDICT r2, missing #1).
This module closes that two-sided-error hole: it imports the real
reference (``/root/reference``, read-only), loads the oracle's state
dict into the reference models with ``strict=True`` (certifying the
parameter naming AND shapes), and asserts bit-exact eval-mode logit
equality on random inputs with randomized BN statistics.

Reference import side effects handled: ``config.py:76`` parses argv at
import (shimmed), ``fusion_nets.FPNConfig`` reads the architecture ini
via a cwd-relative path (chdir'd for the fixture's lifetime of the
module import only).
"""

import os
import sys

import numpy as np
import pytest
import torch

REF = "/root/reference"

sys.path.insert(0, os.path.dirname(__file__))

from torch_oracle import (TFPN, TFPN2D, TFPNHybrid, TFPNLateFusion,
                          randomize)

INI_CH = (16, 32, 64, 128, 256)


@pytest.fixture(scope="module")
def ref_factory():
    """Import the actual reference's model factory (module-scoped: the
    argparse-at-import side effect runs once)."""
    if not os.path.isdir(REF):
        pytest.skip("reference checkout not present")
    argv, cwd = sys.argv, os.getcwd()
    sys.argv = ["prog", "--training-dataset", "hrf_fusion",
                "--model", "FPNHybridFusion",
                "--crop", "relative_2d_max", "--fusion-modality", "slo"]
    sys.path.insert(0, REF)
    os.chdir(REF)  # FPNConfig reads models/fpn/<ini> relative to cwd
    try:
        import models.fusion_nets as fusion_nets
        yield fusion_nets
    finally:
        os.chdir(cwd)
        sys.argv = argv
        sys.path.remove(REF)
        # Drop the reference's generically-named modules so later tests
        # cannot accidentally resolve them.
        for mod in list(sys.modules):
            root = mod.split(".")[0]
            if root in ("config", "models", "utils") and \
                    getattr(sys.modules[mod], "__file__", "") and \
                    str(sys.modules[mod].__file__).startswith(REF):
                del sys.modules[mod]


def _batch(seed=0, b=1, y=8, d=64, w=32, eh=80, ew=32):
    rng = np.random.default_rng(seed)
    return {k: torch.from_numpy(v) for k, v in {
        "image": rng.normal(size=(b, 1, y, d, w)).astype(np.float32),
        "slo": rng.normal(size=(b, 1, eh, 1, ew)).astype(np.float32),
        "mask": (rng.random((b, 1, y, 1, w)) > 0.7).astype(np.float32),
    }.items()}


def _certify(oracle, ref_model, batch):
    """strict state-dict load (naming+shape certification) + bit-exact
    eval logits."""
    ref_model.load_state_dict(oracle.state_dict(), strict=True)
    ref_model.eval()
    with torch.no_grad():
        y_ref = ref_model(batch)["prediction"].numpy()
        y_orc = oracle(batch)["prediction"].numpy()
    assert y_ref.shape == y_orc.shape, (y_ref.shape, y_orc.shape)
    np.testing.assert_array_equal(y_ref, y_orc)


def test_fpn_oracle_is_reference(ref_factory):
    """TFPN == reference FPN / ModifiedUnet3D (unets3D.py:8-485)."""
    _certify(randomize(TFPN(ch=INI_CH), seed=11),
             ref_factory.factory_classes["FPN"](), _batch(11))


@pytest.mark.parametrize("crop,interp", [("relative_2d_max", "2d_max"),
                                         ("relative_2d", "2d")])
def test_hybrid_oracle_is_reference(ref_factory, crop, interp):
    """TFPNHybrid == reference FPNHybridFusion / ModifiedUnet3D2DLevel5
    (fusion3D2D.py:10-581), both alignment modes."""
    old = ref_factory.config.crop
    ref_factory.config.crop = crop  # wrapper reads global config at init
    try:
        ref = ref_factory.factory_classes["FPNHybridFusion"]()
        assert ref.interpolate == interp
    finally:
        ref_factory.config.crop = old
    _certify(randomize(TFPNHybrid(ch=INI_CH, interpolate=interp),
                       seed=12), ref, _batch(12))


def test_fpn2d_oracle_is_reference(ref_factory):
    """TFPN2D == reference FPN2D / ModifiedUnet2DLevel5
    (unets2D.py:9-213), incl. the resize-to-mask path."""
    _certify(randomize(TFPN2D(ch=INI_CH), seed=13),
             ref_factory.factory_classes["FPN2D"](), _batch(13))


def test_late_fusion_oracle_is_reference(ref_factory):
    """TFPNLateFusion == reference FPNLateFusion (fusion_nets.py:159-216)
    incl. the orphan final1 params and hardcoded fusion width 32."""
    _certify(randomize(TFPNLateFusion(ch=INI_CH, interpolate="2d_max"),
                       seed=14),
             ref_factory.factory_classes["FPNLateFusion"](), _batch(14))


def test_hybrid_oracle_matches_reference_gradients(ref_factory):
    """One training-mode forward+backward: gradients and updated BN
    running stats agree — the oracle's train-mode semantics (used by the
    K-step dynamics parity) are the reference's too."""
    oracle = randomize(TFPNHybrid(ch=INI_CH, interpolate="2d_max"),
                       seed=15)
    ref = ref_factory.factory_classes["FPNHybridFusion"]()
    ref.load_state_dict(oracle.state_dict(), strict=True)
    batch = _batch(15)

    grads = {}
    for name, model in (("oracle", oracle), ("ref", ref)):
        model.train()
        out = model(batch)["prediction"]
        loss = torch.nn.functional.binary_cross_entropy(
            out, batch["mask"])
        model.zero_grad()
        loss.backward()
        grads[name] = {k: p.grad.detach().clone().numpy()
                       for k, p in model.named_parameters()
                       if p.grad is not None}
    assert grads["oracle"].keys() == grads["ref"].keys()
    for k in grads["oracle"]:
        np.testing.assert_allclose(grads["oracle"][k], grads["ref"][k],
                                   rtol=1e-5, atol=1e-6, err_msg=k)
    # BN running stats updated identically by the train-mode forward
    sd_o, sd_r = oracle.state_dict(), ref.state_dict()
    for k in sd_o:
        if "running_" in k:
            np.testing.assert_allclose(np.asarray(sd_o[k]),
                                       np.asarray(sd_r[k]),
                                       rtol=1e-6, err_msg=k)
