"""Streaming per-sample metric accumulators.

Behavioral parity with ``/root/reference/common/metrics.py:71-455``,
including the edge-case conventions that shape the reported numbers:

  * aggregation is ``np.nanmean`` over all accumulated per-sample values;
  * Dice@0.5 returns 1 when prediction and ground truth are both empty;
  * Precision/Recall return 1 when their denominator is empty;
  * Hausdorff/Hausdorff95 are computed on the mid-plane slice ``[:, 0]``
    with ``voxelspacing=spacing[[0,2]]`` (hd95 with ``connectivity=3``),
    append NaN when either mask is empty, and swallow RuntimeErrors.

These run on host numpy (evaluation-time, batch size 1).  The training
loop computes Dice/BCE on device inside the jitted step and feeds the
resulting per-sample values into these accumulators via ``extend_values``.
"""

from typing import Optional, Union

import numpy as np
from sklearn.metrics import jaccard_score

from multimodal_fusion_fpn_tpu.metrics.hausdorff import hd as _hd
from multimodal_fusion_fpn_tpu.metrics.hausdorff import hd95 as _hd95

Key = Union[int, str]


def _np(x) -> np.ndarray:
    return np.asarray(x)


class Metrics:
    def __init__(self):
        self.accumulator = []

    def calculate_batch(self, ground: dict, predict: dict) -> np.ndarray:
        raise NotImplementedError

    def update(self, ground, predict):
        result = self.calculate_batch(ground, predict)
        if result is not None:
            self.accumulator.extend(np.atleast_1d(result).tolist())

    def extend_values(self, values):
        """Feed precomputed per-sample values (device-side fast path)."""
        self.accumulator.extend(np.atleast_1d(_np(values)).tolist())

    def get(self):
        return np.nanmean(self.accumulator)

    def reset(self):
        self.accumulator = []


class Dice(Metrics):
    def __init__(self, output_key: Key = 0, target_key: Key = 0,
                 slice: int = 0, output_threshold: float = 0.5,
                 target_threshold: float = 0.5):
        super().__init__()
        self.output_key = output_key
        self.target_key = target_key
        self.slice = slice
        self.output_threshold = output_threshold
        self.target_threshold = target_threshold

    def calculate_batch(self, ground: dict, predict: dict) -> np.ndarray:
        pred = _np(predict[self.output_key])
        gr = _np(ground[self.target_key])
        # reference guard (metrics.py:238-242)
        assert gr[:, self.slice].shape == pred[:, self.slice].shape, (
            f"GT: {gr.shape}, Pred.: {pred.shape}")
        n = pred.shape[0]
        pred = (pred[:, self.slice] > self.output_threshold).astype(
            np.float64).reshape(n, -1)
        gr = (gr[:, self.slice] > self.target_threshold).astype(
            np.float64).reshape(n, -1)
        numerator = (pred * gr).sum(axis=1)
        denominator = (pred + gr).sum(axis=1)
        with np.errstate(divide="ignore", invalid="ignore"):
            r = 2 * numerator / denominator
        r[denominator == 0.0] = 1
        return r


class Precision(Metrics):
    def __init__(self, output_key: Key = 0, target_key: Key = 0,
                 slice: int = 0):
        super().__init__()
        self.output_key = output_key
        self.target_key = target_key
        self.slice = slice

    def calculate_batch(self, ground: dict, predict: dict) -> np.ndarray:
        pred = _np(predict[self.output_key])[:, self.slice]
        gr = _np(ground[self.target_key])[:, self.slice]
        n = pred.shape[0]
        pred = (pred > 0.5).astype(np.float64).reshape(n, -1)
        gr = (gr > 0.5).astype(np.float64).reshape(n, -1)
        tp = (pred * gr).sum(axis=1)
        denominator = pred.sum(axis=1)
        with np.errstate(divide="ignore", invalid="ignore"):
            p = tp / denominator
        p[denominator == 0.0] = 1
        return p


class Recall(Metrics):
    def __init__(self, output_key: Key = 0, target_key: Key = 0,
                 slice: int = 0):
        super().__init__()
        self.output_key = output_key
        self.target_key = target_key
        self.slice = slice

    def calculate_batch(self, ground: dict, predict: dict) -> np.ndarray:
        pred = _np(predict[self.output_key])[:, self.slice]
        gr = _np(ground[self.target_key])[:, self.slice]
        n = pred.shape[0]
        pred = (pred > 0.5).astype(np.float64).reshape(n, -1)
        gr = (gr > 0.5).astype(np.float64).reshape(n, -1)
        tp = (pred * gr).sum(axis=1)
        denominator = gr.sum(axis=1)
        with np.errstate(divide="ignore", invalid="ignore"):
            r = tp / denominator
        r[denominator == 0.0] = 1
        return r


class IoU(Metrics):
    """Jaccard index, micro-averaged over the batch via sklearn
    (reference ``metrics.py:165-192``)."""

    def __init__(self, output_key: Key = 0, target_key: Key = 0,
                 slice: int = 0):
        super().__init__()
        self.output_key = output_key
        self.target_key = target_key
        self.slice = slice

    def calculate_batch(self, ground: dict, predict: dict) -> np.ndarray:
        pred = _np(predict[self.output_key])
        gr = _np(ground[self.target_key])
        n = pred.shape[0]
        pred = (pred[:, self.slice] > 0.5).astype(np.float64).reshape(n, -1)
        gr = (gr[:, self.slice] > 0.5).astype(np.float64).reshape(n, -1)
        return jaccard_score(gr, pred, average="micro")

    def update(self, ground, predict):
        result = self.calculate_batch(ground, predict)
        self.accumulator.extend(np.atleast_1d(result).tolist())


class BCE(Metrics):
    def __init__(self, output_key: Key = 0, target_key: Key = 0,
                 bg_weight: float = 1.0, slice: Optional[int] = 0):
        super().__init__()
        self.output_key = output_key
        self.target_key = target_key
        self.bg_weight = bg_weight
        self.slice = slice

    def calculate_batch(self, ground: dict, predict: dict) -> np.ndarray:
        pred = _np(predict[self.output_key]).astype(np.float64)
        gr = _np(ground[self.target_key]).astype(np.float64)
        if self.slice is not None:
            pred = pred[:, self.slice].reshape(-1)
            gr = gr[:, self.slice].reshape(-1)
        log_p = np.maximum(np.log(np.maximum(pred, 1e-300)), -100.0)
        log_1p = np.maximum(np.log(np.maximum(1.0 - pred, 1e-300)), -100.0)
        loss = -np.mean(gr * log_p + (1.0 - gr) * log_1p)
        return np.array([loss])


class MSE(Metrics):
    def __init__(self, output_key: Key, target_key: Key):
        super().__init__()
        self.output_key = output_key
        self.target_key = target_key

    def calculate_batch(self, ground: dict, predict: dict) -> np.ndarray:
        pred = _np(predict[self.output_key])
        gr = _np(ground[self.target_key])
        result = (pred - gr) ** 2
        return result.reshape(result.shape[0], -1).mean(axis=1)


class L2(Metrics):
    def __init__(self, output_key: Key = 0, target_key: Key = 0,
                 slice: int = 0):
        super().__init__()
        self.output_key = output_key
        self.target_key = target_key
        self.slice = slice

    def calculate_batch(self, ground: dict, predict: dict) -> np.ndarray:
        pred = _np(predict[self.output_key])
        gr = _np(ground[self.target_key])
        return np.array([np.mean((pred - gr) ** 2)])


class L1(Metrics):
    def __init__(self, output_key: Key = 0, target_key: Key = 0,
                 slice: int = 0):
        super().__init__()
        self.output_key = output_key
        self.target_key = target_key
        self.slice = slice

    def calculate_batch(self, ground: dict, predict: dict) -> np.ndarray:
        pred = _np(predict[self.output_key])
        gr = _np(ground[self.target_key])
        return np.array([np.mean(np.abs(pred - gr))])


class WeightedL1(Metrics):
    def __init__(self, output_key: Key = 0, target_key: Key = 0,
                 slice: int = 0, mask: bool = True):
        super().__init__()
        self.output_key = output_key
        self.target_key = target_key
        self.slice = slice
        self.mask = mask

    def calculate_batch(self, ground: dict, predict: dict) -> np.ndarray:
        pred = _np(predict[self.output_key])
        gr = _np(ground[self.target_key])
        weight = _np(ground["weight"])
        l1 = np.abs(pred - gr) * weight
        if self.mask:
            l1 = l1[weight > 0].mean()
        else:
            l1 = l1.mean()
        return np.array([l1])


class _HausdorffBase(Metrics):
    connectivity = 1

    def __init__(self, output_key: Key = 0, target_key: Key = 0,
                 slice: int = 0, device: bool = False):
        """``device=True`` computes the distances on the accelerator
        (:func:`..device.hausdorff_device`, exact separable-min EDT)
        instead of the host scipy path — numerically identical
        (tests/test_device_hausdorff.py)."""
        super().__init__()
        self.output_key = output_key
        self.target_key = target_key
        self.slice = slice
        self.device = device

    def _device_distance(self, p, g, spacing, connectivity, want95):
        import jax.numpy as jnp
        from multimodal_fusion_fpn_tpu.metrics.device import \
            hausdorff_device
        sp = np.asarray([1.0, 1.0] if spacing is None else spacing,
                        np.float32)
        hd_v, hd95_v = hausdorff_device(jnp.asarray(p), jnp.asarray(g),
                                        jnp.asarray(sp),
                                        connectivity=connectivity)
        return float(hd95_v if want95 else hd_v)

    def _distance(self, p, g, spacing):
        raise NotImplementedError

    _fused_key = None  # '__device_hd__' / '__device_hd95__' in subclasses

    def calculate_batch(self, ground: dict, predict: dict) -> np.ndarray:
        if (self.device and self._fused_key is not None
                and self._fused_key in predict):
            # the ensemble eval step fused the distance into its jit
            # (train/step.py make_ensemble_eval_step(with_hd=True)):
            # the value arrived with the prediction in one fetch.
            return np.array([float(predict[self._fused_key])])
        pred = (_np(predict[self.output_key]) > 0.5).astype(np.uint8)
        gr = (_np(ground[self.target_key]) > 0.5).astype(np.uint8)
        result = []
        for n in range(pred.shape[0]):
            p = pred[n, self.slice]
            g = gr[n, self.slice]
            if (p.sum() == 0) or (g.sum() == 0):
                result.append(np.nan)
                continue
            spacing = _np(ground["spacing"][n]).astype(np.float64) \
                if "spacing" in ground else None
            try:
                vs = spacing[[0, 2]] if spacing is not None else None
                # mid-plane 2D slice, as the reference (metrics.py:402,449)
                result.append(self._distance(p[:, 0], g[:, 0], vs))
            except RuntimeError as exc:  # empty-surface guard, as reference
                print(f"{type(self).__name__}:RuntimeError: {exc}")
        return np.array(result)


class Hausdorff(_HausdorffBase):
    _fused_key = "__device_hd__"

    def _distance(self, p, g, spacing):
        if self.device:
            return self._device_distance(p, g, spacing, 1, want95=False)
        return _hd(p, g, voxelspacing=spacing, connectivity=1)


class Hausdorff95(_HausdorffBase):
    _fused_key = "__device_hd95__"

    def _distance(self, p, g, spacing):
        if self.device:
            return self._device_distance(p, g, spacing, 3, want95=True)
        return _hd95(p, g, voxelspacing=spacing, connectivity=3)
