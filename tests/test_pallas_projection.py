"""Pallas fused projection head vs the flax ZDimReduction module
(interpret mode on CPU)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from multimodal_fusion_fpn_tpu.models.blocks import ZDimReduction
from multimodal_fusion_fpn_tpu.ops.pallas.projection import (
    fold_projection_params, projection_head_pallas)


@pytest.mark.parametrize("num_reductions,z", [(4, 64), (2, 16), (0, 8)])
def test_pallas_projection_matches_module(num_reductions, z):
    c = 8
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=(2, 3, 4, z, c)).astype(np.float32))

    mod = ZDimReduction(features=c, num_reductions=num_reductions,
                        final_kernel=4)
    variables = mod.init(jax.random.PRNGKey(0), x)
    params = jax.tree.map(
        lambda k: jnp.asarray(rng.normal(size=k.shape).astype(np.float32))
        * 0.3, variables["params"])
    # randomized running stats (inference-mode BN folding must use them)
    batch_stats = jax.tree.map(
        lambda s: jnp.asarray(
            rng.uniform(0.5, 2.0, size=s.shape).astype(np.float32)),
        variables["batch_stats"])

    expected = mod.apply({"params": params, "batch_stats": batch_stats},
                         x, False)
    expected = jnp.mean(expected, axis=3, keepdims=True)

    cascade, ds, final = fold_projection_params(params, batch_stats,
                                                num_reductions)
    got = projection_head_pallas(x, cascade, ds, final, interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(expected),
                               rtol=2e-3, atol=2e-3)
