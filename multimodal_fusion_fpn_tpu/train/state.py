"""Functional training state."""

from typing import Any

import jax
from flax import struct


@struct.dataclass
class TrainState:
    step: int
    params: Any
    batch_stats: Any
    opt_state: Any


def create_train_state(model, tx, rng, example_batch,
                       params=None, batch_stats=None) -> TrainState:
    """Init a fresh state; pass ``params``/``batch_stats`` to start from
    imported weights (e.g. a converted torch checkpoint) instead."""
    if params is None or batch_stats is None:
        variables = jax.jit(
            lambda b: model.init({"params": rng}, b,
                                 train=False))(example_batch)
        if params is None:
            params = variables["params"]
        if batch_stats is None:
            batch_stats = variables.get("batch_stats", {})
    opt_state = tx.init(params)
    return TrainState(step=0, params=params, batch_stats=batch_stats,
                      opt_state=opt_state)
