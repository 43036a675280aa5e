"""Independent oracles for the eval-preprocessing reimplementations.

scikit-image and MedPy are not installable in this environment (no
network egress), so bit-exactness is established against *independent
re-derivations* instead of wheel-generated golden files:

  * ``ops/resize.py`` implements skimage-0.17.2 ``resize`` via per-axis
    ``ndi.zoom(grid_mode=True)``; the oracle here instead builds the
    exact coordinate map of the skimage 0.17.2 N-D source path
    (half-pixel centers, ``f*(i+0.5)-0.5``) and calls
    ``ndi.map_coordinates(mode='mirror')`` — the very call skimage makes
    (its 'reflect' maps to ndimage 'mirror').  Agreement proves the
    zoom-decomposition shortcut implements the documented map.
  * ``metrics/hausdorff.py`` is checked against hand-computed analytic
    distances (surface extraction, connectivity, spacing and percentile
    semantics per MedPy 0.4.0).
"""

import numpy as np
import pytest
from scipy import ndimage as ndi

from multimodal_fusion_fpn_tpu.metrics.hausdorff import hd, hd95
from multimodal_fusion_fpn_tpu.ops.resize import resize


def skimage_017_oracle(image, output_shape, order):
    """Literal re-derivation of skimage 0.17.2 ``transform.resize`` for
    the N-D path with default args (mode='reflect', clip=True,
    preserve_range=True, anti_aliasing=None)."""
    image = np.asarray(image)
    input_shape = image.shape
    factors = np.asarray(input_shape, dtype=float) / np.asarray(
        output_shape, dtype=float)

    # 0.17.2 default: AA when any axis shrinks and dtype is not bool —
    # for every order (the order-0 exclusion only landed in 0.19).
    anti_aliasing = image.dtype != bool and any(
        o < i for o, i in zip(output_shape, input_shape))

    img = image.astype(np.float64)
    if anti_aliasing:
        sigma = np.maximum(0.0, (factors - 1.0) / 2.0)
        img = ndi.gaussian_filter(img, sigma, mode="mirror")

    coords = np.meshgrid(*[f * (np.arange(d) + 0.5) - 0.5
                           for f, d in zip(factors, output_shape)],
                         indexing="ij", sparse=False)
    out = ndi.map_coordinates(img, np.stack(coords), order=order,
                              mode="mirror", prefilter=False)
    lo, hi = img.min(), img.max()
    return np.clip(out, lo, hi)


# Shapes from the actual val/train pipelines: RelFit multiples-of-16 on
# 4D (C, H, D, W) arrays with singleton dims; RelSize fixed-size resizes
# including downsamples (anti-aliasing active).
CASES = [
    ((1, 31, 1, 120), (1, 32, 1, 128)),     # RelFit upsample
    ((1, 50, 1, 130), (1, 48, 1, 128)),     # RelFit downsample (AA)
    ((1, 496, 1, 512), (1, 320, 1, 128)),   # fixed fusion-modality resize
    ((1, 17, 1, 19), (1, 16, 1, 16)),
    ((1, 8, 3, 10), (1, 16, 3, 20)),        # non-singleton middle dim
    ((5, 7), (16, 16)),                     # 2D features.png path
]


@pytest.mark.parametrize("order", [0, 1])
@pytest.mark.parametrize("in_shape,out_shape", CASES)
def test_resize_matches_skimage_017_source_map(in_shape, out_shape, order):
    rng = np.random.default_rng(42)
    img = rng.normal(size=in_shape)
    got = resize(img, out_shape, order=order)
    want = skimage_017_oracle(img, out_shape, order)
    np.testing.assert_allclose(got, want, rtol=1e-12, atol=1e-12)


def test_resize_mask_binary_roundtrip():
    # masks resize with order 0 AND anti-aliasing disabled in the
    # transforms layer; a {0,1} float mask must stay binary.
    rng = np.random.default_rng(0)
    mask = (rng.random((1, 33, 1, 129)) > 0.5).astype(np.float32)
    out = resize(mask, (1, 32, 1, 128), order=0, anti_aliasing=False)
    assert set(np.unique(out)) <= {0.0, 1.0}


# ---------------------------------------------------------------------------
# Hausdorff analytic goldens (MedPy 0.4.0 semantics)


def test_hd_two_points_euclidean():
    a = np.zeros((32, 32), dtype=np.uint8)
    b = np.zeros((32, 32), dtype=np.uint8)
    a[5, 5] = 1
    b[8, 9] = 1  # offset (3, 4) -> distance 5
    assert hd(a, b) == 5.0
    assert hd(a, b, voxelspacing=(2.0, 1.0)) == np.hypot(6.0, 4.0)


def test_hd_asymmetric_directed_max():
    # a has an extra far blob: directed a->b max dominates.
    a = np.zeros((32, 32), dtype=np.uint8)
    b = np.zeros((32, 32), dtype=np.uint8)
    a[5, 5] = 1
    a[20, 5] = 1
    b[5, 5] = 1
    assert hd(a, b) == 15.0
    assert hd(b, a) == 15.0  # symmetric by definition


def test_hd_connectivity_changes_surface():
    # plus shape: with connectivity=1 (cross footprint) the center
    # survives erosion (all 4-neighbors set) so the surface is the 4
    # arms; with full connectivity (MedPy connectivity >= 2 in 2D) the
    # center lacks diagonal neighbors, erosion removes everything and
    # the surface is all 5 pixels.
    from multimodal_fusion_fpn_tpu.metrics.hausdorff import (
        _surface_distances)
    plus = np.zeros((9, 9), dtype=np.uint8)
    plus[4, 3:6] = 1
    plus[3:6, 4] = 1
    pt = np.zeros((9, 9), dtype=np.uint8)
    pt[4, 4] = 1
    assert len(_surface_distances(plus, pt, connectivity=1)) == 4
    assert len(_surface_distances(plus, pt, connectivity=3)) == 5
    # hd unchanged (arms dominate) but the conn=3 surface contains the
    # center, whose distance to pt is 0.
    assert hd(plus, pt, connectivity=1) == 1.0
    assert _surface_distances(plus, pt, connectivity=3).min() == 0.0


def test_hd95_percentile_semantics():
    # column strips: every a-surface voxel is at distance 3 from b and
    # vice versa -> both directed sets are constant 3, hd95 == 3.
    a = np.zeros((16, 16), dtype=np.uint8)
    b = np.zeros((16, 16), dtype=np.uint8)
    a[:, 4] = 1
    b[:, 7] = 1
    assert hd95(a, b) == 3.0
    # percentile over the CONCATENATION of both directed sets
    got = hd95(a, b, voxelspacing=(1.0, 2.0))
    assert got == 6.0


def test_hd_empty_mask_raises_runtime_error():
    a = np.zeros((8, 8), dtype=np.uint8)
    b = np.zeros((8, 8), dtype=np.uint8)
    b[2, 2] = 1
    with pytest.raises(RuntimeError):
        hd(a, b)
    with pytest.raises(RuntimeError):
        hd95(b, a)


def test_border_counts_as_surface():
    # a mask touching the image border: binary_erosion with
    # border_value=0 erodes the border pixels, so they are surface —
    # MedPy semantics (erosion default border_value=0).
    full = np.ones((8, 8), dtype=np.uint8)
    inner = np.zeros((8, 8), dtype=np.uint8)
    inner[3:5, 3:5] = 1
    # full's surface = border ring; farthest ring pixel from inner's
    # surface: corner (0,0) -> (3,3) = 3*sqrt(2)
    assert hd(full, inner) == pytest.approx(3 * np.sqrt(2.0))
