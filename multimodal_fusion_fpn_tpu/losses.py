"""Losses — exact formula parity with ``/root/reference/common/loss.py``.

All losses are pure jittable functions over dicts of arrays in the
reference layout; they run fully on device inside the training step.
"""

from typing import Callable, Dict, Optional

import jax.numpy as jnp


def bce_loss(output_key: str = "prediction", target_key: str = "mask"):
    """Mean binary cross-entropy on flattened probabilities
    (``loss.py:35-56``; ``F.binary_cross_entropy`` semantics: inputs are
    probabilities, clamped log terms)."""
    def fn(target: Dict, predict: Dict) -> jnp.ndarray:
        # trace-time analogue of the reference's runtime shape assert
        # (loss.py:49)
        assert target[target_key].shape == predict[output_key].shape, (
            target[target_key].shape, predict[output_key].shape)
        pred = predict[output_key].reshape(-1)
        gt = target[target_key].reshape(-1).astype(pred.dtype)
        # torch binary_cross_entropy clamps log outputs at -100.
        log_p = jnp.clip(jnp.log(pred), -100.0, None)
        log_1p = jnp.clip(jnp.log1p(-pred), -100.0, None)
        return -jnp.mean(gt * log_p + (1.0 - gt) * log_1p)
    return fn


def dice_loss_joint(output_key: str = "prediction",
                    target_key: str = "mask",
                    force_binary: bool = False,
                    threshold: float = 0.5):
    """Soft dice with the reference's squared-prediction denominator and
    epsilons (``loss.py:59-90``): per channel,
    ``2*(sum(p*g)+1e-6) / (sum(p^2)+sum(g)+2e-6)``, summed over batch and
    spatial dims; loss is ``1 - mean_over_channels(dice)``."""
    def fn(target: Dict, predict: Dict) -> jnp.ndarray:
        # trace-time analogue of the reference's shape assert
        # (loss.py:75-76)
        assert target[target_key].shape == predict[output_key].shape, (
            f"{target[target_key].shape} != {predict[output_key].shape}")
        shape = target[target_key].shape
        pred = predict[output_key].reshape(shape[0], shape[1], -1)
        gt = target[target_key].reshape(shape[0], shape[1], -1)
        gt = gt.astype(pred.dtype)
        if force_binary:
            gt = (gt > threshold).astype(pred.dtype)
        intersection = (pred * gt).sum(axis=(0, 2)) + 1e-6
        union = (pred ** 2 + gt).sum(axis=(0, 2)) + 2e-6
        dice = 2.0 * intersection / union
        return 1.0 - jnp.mean(dice)
    return fn


class Mix:
    """Coefficient-weighted sum of sub-losses divided by the *count* of
    sub-losses (``loss.py:9-28`` — note the division by ``len``)."""

    def __init__(self, losses: Dict[str, Callable],
                 coefficients: Optional[Dict[str, float]] = None):
        self.losses = losses
        self.coefficients = coefficients or {k: 1.0 for k in losses}

    def __call__(self, target: Dict, predict: Dict):
        results = {k: fn(target, predict) for k, fn in self.losses.items()}
        total = sum(results[k] * self.coefficients[k]
                    for k in results) / len(results)
        return total, results
