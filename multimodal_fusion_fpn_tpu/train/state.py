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


def create_train_state(model, tx, rng, example_batch) -> TrainState:
    variables = jax.jit(
        lambda b: model.init({"params": rng}, b, train=False))(example_batch)
    params = variables["params"]
    batch_stats = variables.get("batch_stats", {})
    opt_state = tx.init(params)
    return TrainState(step=0, params=params, batch_stats=batch_stats,
                      opt_state=opt_state)
