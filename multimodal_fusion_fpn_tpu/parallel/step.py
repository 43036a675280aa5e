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
from jax import shard_map

from multimodal_fusion_fpn_tpu.metrics.device import bce_scalar, dice_per_sample
from multimodal_fusion_fpn_tpu.train.state import TrainState


def make_dp_train_step(model, tx, criterion, mesh: Mesh,
                       bn_sync: bool = True,
                       compute_train_metrics: bool = True,
                       accum_steps: int = 1) -> Callable:
    """DP train step; composes with gradient accumulation like the
    reference's ``strategy='dp'`` × ``accumulate_grad_batches``
    (``/root/reference/train.py:161,166``).  With ``accum_steps > 1``
    batch arrays carry a leading ``(accum_steps, batch, ...)`` shape and
    the batch dim is sharded over the mesh's 'data' axis.
    """
    if bn_sync:
        from multimodal_fusion_fpn_tpu.train.step import make_train_step
        return make_train_step(model, tx, criterion,
                               compute_train_metrics=compute_train_metrics,
                               accum_steps=accum_steps)

    data_axis = "data"

    def loss_fn(params, batch_stats, batch, rng):
        variables = {"params": params, "batch_stats": batch_stats}
        out, mutated = model.apply(
            variables, batch, train=True, rngs={"dropout": rng},
            mutable=["batch_stats"])
        loss, parts = criterion(batch, out)
        return loss, (parts, out, mutated["batch_stats"])

    grad_fn = jax.value_and_grad(loss_fn, has_aux=True)

    def micro_metrics(out, batch):
        m = {}
        if compute_train_metrics and "mask" in batch:
            # per-sample Dice (all_gathered later), scalar BCE (pmeaned).
            m["Dice"] = dice_per_sample(out["prediction"], batch["mask"])
            m["BCE"] = bce_scalar(out["prediction"], batch["mask"])
        return m

    def per_shard(params, batch_stats, opt_state, step, batches, rngs):
        # params replicated; batches is the LOCAL shard, with a leading
        # (accum_steps, ...) axis when accumulating.
        bs = batch_stats
        grad_sum = loss_sum = parts_sum = None
        dice_parts, bce_sum = [], 0.0
        for i in range(accum_steps):
            mb = (jax.tree.map(lambda x: x[i], batches)
                  if accum_steps > 1 else batches)
            rng = rngs[i] if accum_steps > 1 else rngs
            (loss, (parts, out, bs)), grads = grad_fn(params, bs, mb, rng)
            grad_sum = (grads if grad_sum is None
                        else jax.tree.map(jnp.add, grad_sum, grads))
            loss_sum = loss if loss_sum is None else loss_sum + loss
            parts_sum = (parts if parts_sum is None
                         else jax.tree.map(jnp.add, parts_sum, parts))
            m = micro_metrics(out, mb)
            if m:
                dice_parts.append(m["Dice"])
                bce_sum = bce_sum + m["BCE"]
        # DP gradient reduction (mean over shards and micro-batches).
        grads = jax.lax.pmean(
            jax.tree.map(lambda g: g / accum_steps, grad_sum), data_axis)
        loss = jax.lax.pmean(loss_sum / accum_steps, data_axis)
        parts = jax.lax.pmean(
            jax.tree.map(lambda p: p / accum_steps, parts_sum), data_axis)
        # Per-replica normalization happened above; store the mean of the
        # per-shard running statistics.
        new_bs = jax.lax.pmean(bs, data_axis)
        updates, opt_state = tx.update(grads, opt_state, params)
        params = jax.tree.map(lambda p, u: p + u, params, updates)
        metrics = {}
        if dice_parts:
            metrics["Dice"] = jax.lax.all_gather(
                jnp.concatenate(dice_parts), data_axis, tiled=True)
            metrics["BCE"] = jax.lax.pmean(bce_sum / accum_steps, data_axis)
        aux = {"loss": loss, "parts": parts, "metrics": metrics}
        return params, new_bs, opt_state, step + 1, aux

    replicated = P()
    # batch dim on 'data'; with accumulation it is the second axis.
    batch_spec = P(None, data_axis) if accum_steps > 1 else P(data_axis)

    sharded = shard_map(
        per_shard, mesh=mesh,
        in_specs=(replicated, replicated, replicated, replicated,
                  batch_spec, replicated),
        out_specs=(replicated, replicated, replicated, replicated,
                   replicated),
        check_vma=False)

    @jax.jit
    def step_fn(state: TrainState, batch, rng):
        rngs = (jax.random.split(rng, accum_steps)
                if accum_steps > 1 else rng)
        params, bs, opt_state, step, aux = sharded(
            state.params, state.batch_stats, state.opt_state,
            jnp.asarray(state.step), batch, rngs)
        return TrainState(step=step, params=params, batch_stats=bs,
                          opt_state=opt_state), aux

    return step_fn
