"""Per-replica vs synchronized batch-norm data parallelism (8 CPU
devices)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from multimodal_fusion_fpn_tpu.config import make_config
from multimodal_fusion_fpn_tpu.losses import Mix, bce_loss, dice_loss_joint
from multimodal_fusion_fpn_tpu.models.zoo import build_model
from multimodal_fusion_fpn_tpu.parallel.mesh import make_mesh, shard_batch, shard_state
from multimodal_fusion_fpn_tpu.parallel.step import make_dp_train_step
from multimodal_fusion_fpn_tpu.train.optim import sgd
from multimodal_fusion_fpn_tpu.train.state import create_train_state




def _build(tiny_spec, B=4):
    rng = np.random.default_rng(0)
    batch = {
        "image": rng.normal(size=(B, 1, 8, 64, 32)).astype(np.float32),
        "slo": rng.normal(size=(B, 1, 80, 1, 32)).astype(np.float32),
        "mask": (rng.random((B, 1, 8, 1, 32)) > 0.7).astype(np.float32),
    }
    cfg = make_config(model="FPNHybridFusion", crop="relative_2d_max",
                      fusion_modality="slo")
    model = build_model(cfg, spec=tiny_spec, remat=False)
    tx = sgd(0.1)
    criterion = Mix({"d": dice_loss_joint(), "b": bce_loss()})
    state = create_train_state(model, tx, jax.random.PRNGKey(0), batch)
    return model, tx, criterion, state, batch


def test_per_replica_bn_differs_from_synced(tiny_spec):
    if len(jax.devices()) < 4:
        pytest.skip("needs 4 devices")
    mesh = make_mesh("data=4", jax.devices()[:4])
    model, tx, criterion, state, batch = _build(tiny_spec, B=4)

    step_sync = make_dp_train_step(model, tx, criterion, mesh,
                                   bn_sync=True)
    step_local = make_dp_train_step(model, tx, criterion, mesh,
                                    bn_sync=False)

    sb = shard_batch(batch, mesh)
    # the jit path donates its input state — use independent host copies
    def fresh_state():
        return shard_state(jax.tree.map(np.asarray, state), mesh)

    s1, aux1 = step_sync(fresh_state(), sb, jax.random.PRNGKey(1))
    s2, aux2 = step_local(fresh_state(), sb, jax.random.PRNGKey(1))

    # Both losses are finite and close (same data, same init).
    l1, l2 = float(aux1["loss"]), float(aux2["loss"])
    assert np.isfinite(l1) and np.isfinite(l2)
    np.testing.assert_allclose(l1, l2, rtol=0.2)

    # The batch-norm semantics differ: per-replica stats != global stats
    # (each shard of size 1 normalizes with its own statistics).
    bs1 = np.concatenate([np.asarray(x).ravel() for x in
                          jax.tree.leaves(s1.batch_stats)])
    bs2 = np.concatenate([np.asarray(x).ravel() for x in
                          jax.tree.leaves(s2.batch_stats)])
    assert not np.allclose(bs1, bs2)

    # Per-shard-size-1 Dice metrics cover the whole batch after gather.
    assert np.asarray(aux2["metrics"]["Dice"]).shape[0] == 4
