"""Sharded training steps.

Two data-parallel flavors over a ``jax.sharding.Mesh``:

  * ``bn_sync=True`` (default): plain jit with sharding annotations.
    GSPMD computes batch-norm statistics over the GLOBAL batch — synced
    BN, a strict improvement over the reference.
  * ``bn_sync=False``: reference parity with Lightning ``strategy='dp'``
    + ``sync_batchnorm=False`` (``/root/reference/train.py:163,166``) —
    each data shard normalizes with its LOCAL batch statistics.
    Implemented with ``shard_map``: the model runs per-shard, gradients
    are ``psum``-averaged over the data axis (exactly what DP's gradient
    reduction does), and the running statistics are ``pmean``-averaged
    for storage.

Both return a step with the same signature as
``train.step.make_train_step``.
"""

import functools
from typing import Callable

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P
from jax.experimental.shard_map import shard_map

from multimodal_fusion_fpn_tpu.metrics.device import bce_scalar, dice_per_sample
from multimodal_fusion_fpn_tpu.train.state import TrainState


def make_dp_train_step(model, tx, criterion, mesh: Mesh,
                       bn_sync: bool = True,
                       compute_train_metrics: bool = True) -> Callable:
    if bn_sync:
        from multimodal_fusion_fpn_tpu.train.step import make_train_step
        return make_train_step(model, tx, criterion,
                               compute_train_metrics=compute_train_metrics)

    data_axis = "data"

    def loss_fn(params, batch_stats, batch, rng):
        variables = {"params": params, "batch_stats": batch_stats}
        out, mutated = model.apply(
            variables, batch, train=True, rngs={"dropout": rng},
            mutable=["batch_stats"])
        loss, parts = criterion(batch, out)
        return loss, (parts, out, mutated["batch_stats"])

    grad_fn = jax.value_and_grad(loss_fn, has_aux=True)

    def per_shard(params, batch_stats, opt_state, step, batch, rng):
        # params replicated; batch is the LOCAL shard.
        (loss, (parts, out, new_bs)), grads = grad_fn(
            params, batch_stats, batch, rng)
        # DP gradient reduction (mean over shards).
        grads = jax.lax.pmean(grads, data_axis)
        loss = jax.lax.pmean(loss, data_axis)
        parts = jax.lax.pmean(parts, data_axis)
        # Per-replica normalization happened above; store the mean of the
        # per-shard running statistics.
        new_bs = jax.lax.pmean(new_bs, data_axis)
        updates, opt_state = tx.update(grads, opt_state, params)
        params = jax.tree.map(lambda p, u: p + u, params, updates)
        metrics = {}
        if compute_train_metrics and "mask" in batch:
            dice = dice_per_sample(out["prediction"], batch["mask"])
            metrics["Dice"] = jax.lax.all_gather(
                dice, data_axis, tiled=True)
            metrics["BCE"] = jax.lax.pmean(
                bce_scalar(out["prediction"], batch["mask"]), data_axis)
        aux = {"loss": loss, "parts": parts, "metrics": metrics}
        return params, new_bs, opt_state, step + 1, aux

    replicated = P()
    batch_spec = P(data_axis)

    sharded = shard_map(
        per_shard, mesh=mesh,
        in_specs=(replicated, replicated, replicated, replicated,
                  batch_spec, replicated),
        out_specs=(replicated, replicated, replicated, replicated,
                   replicated),
        check_rep=False)

    @jax.jit
    def step_fn(state: TrainState, batch, rng):
        params, bs, opt_state, step, aux = sharded(
            state.params, state.batch_stats, state.opt_state,
            jnp.asarray(state.step), batch, rng)
        return TrainState(step=step, params=params, batch_stats=bs,
                          opt_state=opt_state), aux

    return step_fn
