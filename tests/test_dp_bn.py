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


def test_dp_accum_composition(tiny_spec):
    """shard_map DP with accum_steps=2 on a data=1 mesh is numerically
    identical to the (separately verified) non-mesh accumulation step —
    validates the micro-batch loop inside per_shard. Then data=4 runs the
    real composed config (reference train.py:161,166: strategy='dp' x
    accumulate_grad_batches)."""
    from multimodal_fusion_fpn_tpu.train.step import make_train_step

    model, tx, criterion, state, batch = _build(tiny_spec, B=4)
    rng2 = np.random.default_rng(1)
    batch2 = {k: rng2.normal(size=v.shape).astype(np.float32)
              if k != "mask" else v for k, v in batch.items()}
    stacked = jax.tree.map(lambda *xs: np.stack(xs), batch, batch2)

    def fresh(mesh=None):
        s = jax.tree.map(np.asarray, state)
        return shard_state(s, mesh) if mesh is not None else s

    mesh1 = make_mesh("data=1", jax.devices()[:1])
    step_dp1 = make_dp_train_step(model, tx, criterion, mesh1,
                                  bn_sync=False, accum_steps=2)
    step_ref = make_train_step(model, tx, criterion, accum_steps=2,
                               donate=False)

    sb1 = shard_batch(stacked, mesh1, stacked=True)
    s_dp, aux_dp = step_dp1(fresh(mesh1), sb1, jax.random.PRNGKey(1))
    s_ref, aux_ref = step_ref(fresh(), stacked, jax.random.PRNGKey(1))

    np.testing.assert_allclose(float(aux_dp["loss"]),
                               float(aux_ref["loss"]), rtol=1e-6)
    for a, b in zip(jax.tree.leaves(s_dp.params),
                    jax.tree.leaves(s_ref.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-5, atol=1e-6)
    # Dice covers all accum_steps * B samples.
    assert np.asarray(aux_dp["metrics"]["Dice"]).shape[0] == 8

    if len(jax.devices()) >= 4:
        mesh4 = make_mesh("data=4", jax.devices()[:4])
        step_dp4 = make_dp_train_step(model, tx, criterion, mesh4,
                                      bn_sync=False, accum_steps=2)
        sb4 = shard_batch(stacked, mesh4, stacked=True)
        s4, aux4 = step_dp4(fresh(mesh4), sb4, jax.random.PRNGKey(1))
        assert np.isfinite(float(aux4["loss"]))
        assert np.asarray(aux4["metrics"]["Dice"]).shape[0] == 8
