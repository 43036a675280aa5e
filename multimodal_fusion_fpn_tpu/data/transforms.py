"""Dict-in/dict-out transforms over 4D numpy arrays (C, H, D, W).

Behavioral parity with ``/root/reference/common/mytransforms.py``, with
one idiomatic change: randomness is threaded explicitly.  Every transform
takes ``(data, rng)`` where ``rng`` is a ``numpy.random.Generator``,
instead of mutating global ``random`` / ``np.random`` state — the host
analogue of JAX's explicit PRNG keys, and what makes the input pipeline
reproducible per (seed, epoch, index) regardless of worker scheduling.

Array layout per key (as produced by the datasets):
  * ``image``: (1, D, H, W) OCT volume (D = B-scans, H = depth, W = width)
  * ``mask`` / ``slo`` / ``faf``: (1, H_enface, 1, W)

Quirks of the reference that are kept deliberately (they affect trained
behavior): mask keys are matched by substring (``'mask' in key``); resize
uses scikit-image 0.17 semantics including its anti-aliasing default (see
:mod:`..ops.resize`); ``Compose`` hands the *same* dict to every
transform (in-place mutation is the contract).
"""

import copy
from typing import List, Optional, Tuple, Union

import numpy as np
from scipy import ndimage

from multimodal_fusion_fpn_tpu.ops.resize import resize


class Transform:
    def __init__(self, transform_keys: list):
        self.transform_keys = transform_keys

    def __call__(self, data: dict, rng: np.random.Generator):
        raise NotImplementedError


class Compose:
    def __init__(self, transforms: list):
        self.transforms = transforms

    def __call__(self, data: dict, rng: Optional[np.random.Generator] = None):
        if rng is None:
            rng = np.random.default_rng()
        for t in self.transforms:
            result = t(data, rng)
            if result is not None:
                data = result
        return data


def _resize_key(array: np.ndarray, shape, key: str) -> np.ndarray:
    order = 0 if "mask" in key else 1
    return resize(array, shape, order=order)


class NewRandomRelCrop(Transform):
    """Pick a random crop window on the reference key and apply the same
    *relative* window to every key (singleton dims skipped)."""

    def __init__(self, reference_key: str, transform_keys: list,
                 size: List[Union[int, None]]):
        super().__init__(transform_keys)
        self.size = size
        self.reference_key = reference_key

    def __call__(self, data: dict, rng: np.random.Generator):
        rels = {}
        reference_shape = data[self.reference_key].shape
        for i, size in enumerate(self.size):
            if size is not None:
                if size > reference_shape[i]:
                    rand_start = 0
                else:
                    rand_start = int(rng.integers(0,
                                                  reference_shape[i] - size,
                                                  endpoint=True))
                rels[i] = {
                    "start": rand_start / reference_shape[i],
                    "size": size / reference_shape[i],
                }
        for k in self.transform_keys:
            starts_ends = []
            for i, size in enumerate(self.size):
                if data[k].shape[i] > 1 and size is not None:
                    abs_start = int(round(data[k].shape[i] * rels[i]["start"]))
                    abs_size = int(round(data[k].shape[i] * rels[i]["size"]))
                    abs_end = abs_start + abs_size
                else:
                    abs_start = 0
                    abs_end = data[k].shape[i]
                starts_ends.append((abs_start, abs_end))
            data[k] = data[k][
                starts_ends[0][0]:starts_ends[0][1],
                starts_ends[1][0]:starts_ends[1][1],
                starts_ends[2][0]:starts_ends[2][1],
                starts_ends[3][0]:starts_ends[3][1],
            ]
        return data


class NewRandomRelFit(Transform):
    """Resize each non-None dim to the nearest multiple of ``fit``
    (min one multiple) — used at validation time so pooling divides
    evenly without padding."""

    def __init__(self, transform_keys: list, fit: List[Union[int, None]]):
        super().__init__(transform_keys)
        self.fit = fit

    def __call__(self, data: dict, rng: np.random.Generator):
        for k in self.transform_keys:
            shapes = []
            for i, fit in enumerate(self.fit):
                if fit is None:
                    shapes.append(data[k].shape[i])
                else:
                    fit_shape = int(round(data[k].shape[i] / fit) * fit)
                    shapes.append(max(fit, fit_shape))
            final_shape = tuple(shapes)
            if final_shape == data[k].shape:
                continue
            data[k] = _resize_key(data[k], final_shape, k)
        return data


class NewRandomRelSize(Transform):
    """Resize to fixed sizes per dim (None / singleton dims preserved)."""

    def __init__(self, transform_keys: List[str],
                 fixed_size: List[Union[int, None]]):
        super().__init__(transform_keys)
        self.fixed_size = fixed_size

    def __call__(self, data: dict, rng: np.random.Generator):
        for k in self.transform_keys:
            shapes = []
            for i, fixed_size in enumerate(self.fixed_size):
                if fixed_size is None or data[k].shape[i] == 1:
                    shapes.append(data[k].shape[i])
                else:
                    shapes.append(fixed_size)
            final_shape = tuple(shapes)
            if final_shape == data[k].shape:
                continue
            data[k] = _resize_key(data[k], final_shape, k)
        return data


class RandomRotation180(Transform):
    def __init__(self, keys: list):
        self.keys = keys

    def __call__(self, data: dict, rng: np.random.Generator):
        if rng.random() > 0.5:
            for k in self.keys:
                data[k] = np.rot90(data[k], k=2, axes=(1, 3))
        return data


class Disable(Transform):
    """Replace a key with all-zeros (1,1,1,1) — complementary-only
    ablations."""

    def __init__(self, keys: list):
        self.keys = keys

    def __call__(self, data: dict, rng: np.random.Generator):
        for k in self.keys:
            data[k] = np.zeros((1,) * len(data[k].shape))
        return data


class RandomEnfaceRotation(Transform):
    def __init__(self, keys: list, range: Tuple[float, float] = (-5.0, 5.0),
                 probablity: float = 0.5):
        self.keys = keys
        self.range = range
        self.probablity = probablity

    def __call__(self, data: dict, rng: np.random.Generator):
        if rng.random() < self.probablity:
            rotation = float(rng.uniform(*self.range))
            for k in self.keys:
                order = 0 if "mask" in k else 1
                data[k] = ndimage.rotate(
                    data[k], rotation, axes=(1, 3), reshape=False,
                    order=order, mode="constant", cval=0.0, prefilter=False)
        return data


class RandomDownsample(Transform):
    def __init__(self, transform_keys: list, factor: int = 2,
                 dimensions: list = [1],
                 start_slice: Union[int, None] = None):
        super().__init__(transform_keys)
        self.factor = factor
        self.dimensions = dimensions
        self.start_slice = start_slice
        assert all(0 < dim < 4 for dim in dimensions)

    def __call__(self, data: dict, rng: np.random.Generator):
        if self.start_slice is None:
            start = int(rng.integers(0, self.factor - 1, endpoint=True))
        else:
            start = self.start_slice
        for k in self.transform_keys:
            for dim in self.dimensions:
                sl = [slice(None)] * 4
                sl[dim] = slice(start, None, self.factor)
                data[k] = data[k][tuple(sl)]
        return data


class RandomMirror(Transform):
    def __init__(self, transform_keys: list, dimensions: list):
        super().__init__(transform_keys)
        self.dimensions = dimensions

    def _flip(self, image, p):
        index = [slice(0, size) for size in image.shape]
        for i in self.dimensions:
            if p[i] < 0.5:
                index[i] = slice(-1, -image.shape[i] - 1, -1)
        return image[tuple(index)].copy()

    def __call__(self, data: dict, rng: np.random.Generator):
        first = data[self.transform_keys[0]]
        dim = len(first[0].shape) if isinstance(first, dict) \
            else len(first.shape)
        p = rng.random(dim)
        for key in self.transform_keys:
            if key not in data:
                continue
            if isinstance(data[key], dict):
                for subkey in data[key]:
                    if data[key][subkey] is not None:
                        data[key][subkey] = self._flip(data[key][subkey], p)
            else:
                data[key] = self._flip(data[key], p)
        return data


class ZScoreNormalization(Transform):
    def __init__(self, transform_keys: list, axis):
        super().__init__(transform_keys)
        self.axis = axis

    def __call__(self, data: dict, rng: np.random.Generator):
        for key in self.transform_keys:
            if isinstance(data[key], dict):
                for subkey in data[key]:
                    mean = data[key][subkey].mean(axis=self.axis,
                                                  keepdims=True)
                    std = data[key][subkey].std(axis=self.axis,
                                                keepdims=True)
                    data[key][subkey] = (data[key][subkey] - mean) / std
            else:
                mean = data[key].mean(axis=self.axis, keepdims=True)
                std = data[key].std(axis=self.axis, keepdims=True)
                data[key] = (data[key] - mean) / (std + 1e-8)
        return data


class IntensityShift(Transform):
    def __init__(self, transform_keys: list, min: float = -0.6,
                 max: float = 0.6):
        super().__init__(transform_keys)
        self.min = min
        self.max = max

    def __call__(self, data: dict, rng: np.random.Generator):
        for key in self.transform_keys:
            shift = float(rng.uniform(self.min, self.max))
            if isinstance(data[key], dict):
                for subkey in data[key]:
                    data[key][subkey] = data[key][subkey] + shift
            else:
                data[key] = data[key] + shift
        return data


class ContrastAugmentation(Transform):
    def __init__(self, transform_keys: list, min: float = 0.6,
                 max: float = 1.4):
        super().__init__(transform_keys)
        self.min = min
        self.max = max

    def __call__(self, data: dict, rng: np.random.Generator):
        for key in self.transform_keys:
            gain = float(rng.uniform(self.min, self.max))
            if isinstance(data[key], dict):
                for subkey in data[key]:
                    data[key][subkey] = data[key][subkey] * gain
            else:
                data[key] = data[key] * gain
        return data


class AddNoiseAugmentation(Transform):
    """Additive gaussian noise shaped only along ``dim`` (broadcast over
    the other axes) — e.g. per-voxel (dim=(0,)) or per-B-scan (dim=(1,))."""

    def __init__(self, transform_keys: list, dim, mu: float = 0.0,
                 sigma: float = 1.0):
        super().__init__(transform_keys)
        self.mu = mu
        self.sigma = sigma
        self.dim = dim

    def _noise_shape(self, shape):
        return [s if idx in self.dim else 1 for idx, s in enumerate(shape)]

    def __call__(self, data: dict, rng: np.random.Generator):
        for key in self.transform_keys:
            if isinstance(data[key], dict):
                for subkey in data[key]:
                    noise = rng.normal(self.mu, self.sigma,
                                       size=self._noise_shape(
                                           data[key][subkey].shape))
                    data[key][subkey] = data[key][subkey] + noise
            else:
                noise = rng.normal(self.mu, self.sigma,
                                   size=self._noise_shape(data[key].shape))
                data[key] = data[key] + noise
        return data


class MulNoiseAugmentation(Transform):
    """Multiplicative gaussian noise along ``dim`` (per-B-scan brightness
    jitter with mu=1)."""

    def __init__(self, transform_keys: list, dim, mu: float = 1.0,
                 sigma: float = 1.0):
        super().__init__(transform_keys)
        self.mu = mu
        self.sigma = sigma
        self.dim = dim

    def _noise_shape(self, shape):
        return [s if idx in self.dim else 1 for idx, s in enumerate(shape)]

    def __call__(self, data: dict, rng: np.random.Generator):
        for key in self.transform_keys:
            if isinstance(data[key], dict):
                for subkey in data[key]:
                    noise = rng.normal(self.mu, self.sigma,
                                       size=self._noise_shape(
                                           data[key][subkey].shape))
                    data[key][subkey] = data[key][subkey] * noise
            else:
                noise = rng.normal(self.mu, self.sigma,
                                   size=self._noise_shape(data[key].shape))
                data[key] = data[key] * noise
        return data


class ToTensorDict(Transform):
    """Convert arrays to contiguous float32 (host-side; the device copy
    happens at batch collation).  API-parity name."""

    def __init__(self, transform_keys: list):
        super().__init__(transform_keys)

    def __call__(self, data: dict, rng: np.random.Generator):
        for key in self.transform_keys:
            if key not in data:
                continue
            if isinstance(data[key], dict):
                for subkey in data[key]:
                    if data[key][subkey] is not None:
                        data[key][subkey] = np.ascontiguousarray(
                            data[key][subkey], dtype=np.float32)
            else:
                data[key] = np.ascontiguousarray(data[key],
                                                 dtype=np.float32)
        return data


def deepcopy_record(record: dict) -> dict:
    """Copy a record so transforms can mutate arrays safely."""
    out = {}
    for k, v in record.items():
        if isinstance(v, np.ndarray):
            out[k] = v.copy()
        elif isinstance(v, dict):
            out[k] = copy.deepcopy(v)
        else:
            out[k] = v
    return out
