"""Transform pipeline semantics tests (golden behaviors from the
reference's numpy code, ``/root/reference/common/mytransforms.py``)."""

import numpy as np
import pytest
from scipy import ndimage as ndi

from multimodal_fusion_fpn_tpu.data import transforms as T
from multimodal_fusion_fpn_tpu.ops.resize import resize


def _data(d=8, h=16, w=12, eh=24, ew=20, seed=0):
    rng = np.random.default_rng(seed)
    return {
        "image": rng.random((1, d, h, w)),
        "mask": (rng.random((1, eh, 1, ew)) > 0.5).astype(np.float64),
        "slo": rng.random((1, eh, 1, ew)),
    }


def test_rel_crop_same_relative_window():
    data = _data()
    t = T.NewRandomRelCrop(reference_key="image",
                           transform_keys=["image", "mask", "slo"],
                           size=[None, 4, None, 6])
    out = t(data, np.random.default_rng(0))
    assert out["image"].shape == (1, 4, 16, 6)
    # 2D keys cropped proportionally: 4/8 of 24 rows, 6/12 of 20 cols
    assert out["mask"].shape == (1, 12, 1, 10)
    assert out["slo"].shape == (1, 12, 1, 10)


def test_rel_crop_oversized_starts_at_zero():
    data = _data()
    t = T.NewRandomRelCrop(reference_key="image", transform_keys=["image"],
                           size=[None, 100, None, None])
    out = t(data, np.random.default_rng(0))
    assert out["image"].shape[1] == 8  # size > dim -> full extent


def test_rel_fit_rounds_to_multiple():
    data = {"image": np.random.default_rng(0).random((1, 18, 1, 33))}
    t = T.NewRandomRelFit(transform_keys=["image"],
                          fit=[None, 16, None, 16])
    out = t(data, np.random.default_rng(0))
    assert out["image"].shape == (1, 16, 1, 32)


def test_rel_fit_minimum_one_multiple():
    data = {"image": np.random.default_rng(0).random((1, 5, 1, 5))}
    t = T.NewRandomRelFit(transform_keys=["image"], fit=[None, 16, None, 16])
    out = t(data, np.random.default_rng(0))
    assert out["image"].shape == (1, 16, 1, 16)


def test_rel_size_preserves_singleton_and_uses_mask_order():
    data = _data()
    t = T.NewRandomRelSize(transform_keys=["mask"],
                           fixed_size=[None, 12, 99, 10])
    out = t(data, np.random.default_rng(0))
    # dim 2 is singleton -> preserved despite fixed_size=99
    assert out["mask"].shape == (1, 12, 1, 10)


def test_resize_order0_no_aa_on_bool():
    x = np.random.default_rng(0).random((8, 8)) > 0.5
    out = resize(x, (4, 4), order=0)
    # bool input: no anti-aliasing, output values stay binary
    assert set(np.unique(out)).issubset({0.0, 1.0})


def test_resize_identity():
    x = np.random.default_rng(0).random((4, 6))
    np.testing.assert_allclose(resize(x, (4, 6), order=1), x)


def test_resize_upscale_linear_halfpixel():
    # Upscaling 1D by 2 with the half-pixel convention: border coordinates
    # (-0.25, 1.25) reflect about the edge sample under ndimage 'mirror'
    # (what skimage 0.17 'reflect' translates to), so the edge outputs
    # equal their inner neighbors.
    x = np.array([[0.0, 1.0]])
    out = resize(x, (1, 4), order=1)
    np.testing.assert_allclose(out[0], [0.25, 0.25, 0.75, 0.75])


def test_rot180():
    data = {"image": np.arange(8.0).reshape(1, 2, 1, 4)}
    t = T.RandomRotation180(keys=["image"])
    # rng.random() > 0.5 triggers rotation; find a seed that triggers
    rng = np.random.default_rng(2)
    triggered = rng.random() > 0.5
    rng = np.random.default_rng(2)
    out = t(data, rng)
    expected = np.rot90(np.arange(8.0).reshape(1, 2, 1, 4), k=2,
                        axes=(1, 3)) if triggered \
        else np.arange(8.0).reshape(1, 2, 1, 4)
    np.testing.assert_array_equal(out["image"], expected)


def test_mirror_shared_flips():
    data = _data()
    image_before = data["image"].copy()
    mask_before = data["mask"].copy()
    t = T.RandomMirror(transform_keys=["image", "mask"], dimensions=[1, 3])
    rng = np.random.default_rng(0)
    p = np.random.default_rng(0).random(4)
    out = t(data, rng)
    exp_img, exp_mask = image_before, mask_before
    for dim in (1, 3):
        if p[dim] < 0.5:
            exp_img = np.flip(exp_img, axis=dim)
            exp_mask = np.flip(exp_mask, axis=dim)
    np.testing.assert_array_equal(out["image"], exp_img)
    np.testing.assert_array_equal(out["mask"], exp_mask)


def test_zscore_axes():
    data = _data()
    t = T.ZScoreNormalization(transform_keys=["image"], axis=(2, 3))
    out = t(data, np.random.default_rng(0))
    means = out["image"].mean(axis=(2, 3))
    np.testing.assert_allclose(means, 0.0, atol=1e-10)


def test_add_noise_broadcast_shape():
    data = _data()
    before = data["image"].copy()
    t = T.AddNoiseAugmentation(transform_keys=["image"], dim=(1,),
                               mu=0.0, sigma=1.0)
    out = t(data, np.random.default_rng(0))
    delta = out["image"] - before
    # noise varies only along dim 1
    ref = np.broadcast_to(delta[:, :, :1, :1], delta.shape)
    np.testing.assert_allclose(delta, ref, atol=1e-9)


def test_disable_zeroes_key():
    data = _data()
    t = T.Disable(keys=["image"])
    out = t(data, np.random.default_rng(0))
    assert out["image"].shape == (1, 1, 1, 1)
    assert out["image"].sum() == 0


def test_enface_rotation_matches_scipy():
    data = {"image": np.random.default_rng(0).random((1, 10, 2, 10))}
    before = data["image"].copy()
    t = T.RandomEnfaceRotation(keys=["image"], range=(30, 30),
                               probablity=1.1)
    out = t(data, np.random.default_rng(5))
    expected = ndi.rotate(before, 30.0, axes=(1, 3), reshape=False,
                          order=1, mode="constant", cval=0.0,
                          prefilter=False)
    np.testing.assert_allclose(out["image"], expected)


def test_compose_chains_and_returns():
    data = _data()
    pipeline = T.Compose([
        T.ZScoreNormalization(transform_keys=["image"], axis=(2, 3)),
        T.ToTensorDict(transform_keys=["image", "mask", "slo"]),
    ])
    out = pipeline(data, np.random.default_rng(0))
    assert out["image"].dtype == np.float32


def test_determinism_same_rng_same_result():
    t = T.Compose([
        T.RandomMirror(transform_keys=["image"], dimensions=[1, 3]),
        T.AddNoiseAugmentation(transform_keys=["image"], dim=(0,),
                               mu=0, sigma=0.2),
        T.IntensityShift(transform_keys=["image"], min=-0.2, max=0.2),
    ])
    a = t(_data(seed=4), np.random.default_rng(42))
    b = t(_data(seed=4), np.random.default_rng(42))
    np.testing.assert_array_equal(a["image"], b["image"])
