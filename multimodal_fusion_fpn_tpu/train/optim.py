"""Optimizer — torch-semantics SGD via optax.

The reference trains with ``torch.optim.SGD(lr, momentum=0.9,
weight_decay=1e-4)`` (``/root/reference/train.py:126-133``).  Torch SGD
applies *coupled* weight decay (added to the gradient before the momentum
buffer) and classical (non-Nesterov) momentum with the update
``buf = m*buf + g; p -= lr*buf`` — exactly
``optax.chain(add_decayed_weights(wd), trace(m), scale(-lr))``.
"""

import optax


def sgd(learning_rate: float, momentum: float = 0.9,
        weight_decay: float = 1e-4) -> optax.GradientTransformation:
    parts = []
    if weight_decay:
        parts.append(optax.add_decayed_weights(weight_decay))
    if momentum:
        parts.append(optax.trace(decay=momentum, nesterov=False))
    parts.append(optax.scale(-learning_rate))
    return optax.chain(*parts)
