"""Blocked-activation ConvX fast path == unblocked path numerically."""

import jax
import jax.numpy as jnp
import numpy as np

from multimodal_fusion_fpn_tpu.models.blocks import ConvX, EncoderStage


def _compare(module, x, monkeypatch, train=False):
    variables = module.init({"params": jax.random.PRNGKey(0)}, x,
                            train)
    kwargs = dict(rngs={"dropout": jax.random.PRNGKey(1)},
                  mutable=["batch_stats"]) if train else {}
    out_blocked = module.apply(variables, x, train, **kwargs)
    monkeypatch.setattr(ConvX, "_blocked_block_size",
                        lambda self, x: None)
    out_ref = module.apply(variables, x, train, **kwargs)
    if train:
        np.testing.assert_allclose(np.asarray(out_blocked[0]),
                                   np.asarray(out_ref[0]),
                                   rtol=2e-4, atol=2e-4)
        for a, b in zip(jax.tree.leaves(out_blocked[1]),
                        jax.tree.leaves(out_ref[1])):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       rtol=2e-4, atol=2e-4)
    else:
        np.testing.assert_allclose(np.asarray(out_blocked),
                                   np.asarray(out_ref),
                                   rtol=2e-4, atol=2e-4)


def test_convx_blocked_matches_unblocked(monkeypatch):
    x = jnp.asarray(np.random.default_rng(0).normal(
        size=(2, 3, 6, 16, 2)).astype(np.float32))
    mod = ConvX(features=4,
                kernels=((1, 3, 3), (1, 3, 3), (3, 1, 1)),
                strides=((1, 1, 1),) * 3,
                paddings=((0, 1, 1), (0, 1, 1), (1, 0, 0)),
                residual=True, downsample=True)
    assert mod._blocked_block_size(x) == 8
    _compare(mod, x, monkeypatch)


def test_convx_blocked_matches_unblocked_train_bn(monkeypatch):
    """Batch-norm statistics must be identical in blocked form."""
    x = jnp.asarray(np.random.default_rng(1).normal(
        size=(2, 3, 6, 16, 4)).astype(np.float32))
    mod = EncoderStage(features=4, ndim=3, downsample=False)
    _compare(mod, x, monkeypatch, train=True)


def test_blocked_block_size_conditions():
    mod = ConvX(features=4, kernels=((1, 3, 3),),
                strides=((1, 1, 1),), paddings=((0, 1, 1),))
    x = jnp.zeros((1, 2, 4, 16, 2))
    assert mod._blocked_block_size(x) == 8
    assert mod._blocked_block_size(jnp.zeros((1, 2, 4, 124, 2))) == 4
    assert mod._blocked_block_size(jnp.zeros((1, 2, 4, 62, 2))) == 2
    assert mod._blocked_block_size(jnp.zeros((1, 2, 4, 31, 2))) is None
    assert mod._blocked_block_size(jnp.zeros((1, 2, 4, 1, 2))) is None
    # wide channels stay on the dedicated paths
    wide = ConvX(features=128, kernels=((1, 3, 3),),
                 strides=((1, 1, 1),), paddings=((0, 1, 1),))
    assert wide._blocked_block_size(x) is None
    # largest dividing block is used at every width (see PERF.md)
    c32 = ConvX(features=32, kernels=((1, 3, 3),),
                strides=((1, 1, 1),), paddings=((0, 1, 1),))
    assert c32._blocked_block_size(jnp.zeros((1, 2, 4, 248, 16))) == 8
    c64 = ConvX(features=64, kernels=((1, 3, 3),),
                strides=((1, 1, 1),), paddings=((0, 1, 1),))
    assert c64._blocked_block_size(jnp.zeros((1, 2, 4, 124, 32))) == 4
    # strided convs are excluded
    strided = ConvX(features=4, kernels=((1, 1, 3),),
                    strides=((1, 1, 2),), paddings=((0, 0, 1),))
    assert strided._blocked_block_size(x) is None


def test_convx_blocked_2d_matches_unblocked(monkeypatch):
    """2D encoder stages (SLO branch) also run blocked along W."""
    x = jnp.asarray(np.random.default_rng(2).normal(
        size=(2, 10, 32, 3)).astype(np.float32))
    mod = ConvX(features=4,
                kernels=((1, 3), (1, 3), (3, 1)),
                strides=((1, 1),) * 3,
                paddings=((0, 1), (0, 1), (1, 0)),
                residual=True, downsample=True)
    assert mod._blocked_block_size(x) == 8
    _compare(mod, x, monkeypatch)


def test_encoder_stage_2d_blocked_train(monkeypatch):
    x = jnp.asarray(np.random.default_rng(3).normal(
        size=(2, 10, 16, 4)).astype(np.float32))
    mod = EncoderStage(features=4, ndim=2, downsample=False)
    _compare(mod, x, monkeypatch, train=True)
