"""EXACT shape bucketing (round-2 verdict #6): evaluating a model on a
ZERO-PADDED input with the true extents passed as dynamic scalars
("__valid_image__"/"__valid_enface__") must reproduce the unpadded
run's prediction on the valid region — conv-boundary zeros, pool
extents, projection depth means and the 2D->3D alignment all computed
over the TRUE extents inside the padded buffers."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from multimodal_fusion_fpn_tpu.config import make_config
from multimodal_fusion_fpn_tpu.models.zoo import build_model


def _pad_to(a, dims):
    pads = [(0, 0)] * a.ndim
    for d, tgt in dims.items():
        pads[d] = (0, tgt - a.shape[d])
    return np.pad(np.asarray(a), pads)


@pytest.mark.parametrize("name", ["FPN", "FPNHybridFusion"])
def test_exact_bucketing_matches_unpadded(name, tiny_spec):
    rng = np.random.default_rng(5)
    y, z, x = 8, 64, 32
    eh, ew = 80, 32
    batch = {
        "image": rng.normal(size=(1, 1, y, z, x)).astype(np.float32),
    }
    if name == "FPNHybridFusion":
        batch["slo"] = rng.normal(size=(1, 1, eh, 1, ew)).astype(
            np.float32)
        cfg = make_config(model=name, crop="relative_2d_max",
                          fusion_modality="slo")
    else:
        cfg = make_config(model=name, crop="oct")
    model = build_model(cfg, spec=tiny_spec, remat=False)
    vs = model.init({"params": jax.random.PRNGKey(0)}, batch,
                    train=False)
    ref = np.asarray(model.apply(vs, batch, train=False)["prediction"])

    padded = {"image": _pad_to(batch["image"], {2: 16, 3: 96, 4: 48}),
              "__valid_image__": jnp.asarray([y, z, x], jnp.int32)}
    if "slo" in batch:
        padded["slo"] = _pad_to(batch["slo"], {2: 96, 4: 48})
        padded["__valid_enface__"] = jnp.asarray([eh, ew], jnp.int32)

    out = np.asarray(model.apply(vs, padded, train=False)["prediction"])
    got = out[:, :, :y, :, :x]
    np.testing.assert_allclose(got, ref, rtol=1e-5, atol=1e-6)
