"""Loss / metric parity against torch formulas and reference conventions."""

import numpy as np
import torch
import torch.nn.functional as F

from multimodal_fusion_fpn_tpu.losses import Mix, bce_loss, dice_loss_joint
from multimodal_fusion_fpn_tpu.metrics import (BCE, Dice, Hausdorff95,
                                               Precision, Recall, hd, hd95)
from multimodal_fusion_fpn_tpu.metrics.device import (bce_scalar,
                                                      dice_per_sample)


def _rand_pred_gt(shape=(2, 1, 8, 1, 16), seed=0):
    rng = np.random.default_rng(seed)
    pred = rng.uniform(0.01, 0.99, size=shape).astype(np.float32)
    gt = (rng.random(shape) > 0.6).astype(np.float32)
    return pred, gt


def torch_dice_lossv2(pred, gt):
    pred = torch.from_numpy(pred)
    gt = torch.from_numpy(gt)
    shape = gt.shape
    p = pred.view(shape[0], shape[1], -1)
    g = gt.view(shape[0], shape[1], -1)
    intersection = (p * g).sum(dim=(0, 2)) + 1e-6
    union = (p ** 2 + g).sum(dim=(0, 2)) + 2e-6
    return float(1.0 - torch.mean(2.0 * intersection / union))


def test_dice_loss_matches_reference_formula():
    pred, gt = _rand_pred_gt()
    got = float(dice_loss_joint()({"mask": gt}, {"prediction": pred}))
    expected = torch_dice_lossv2(pred, gt)
    np.testing.assert_allclose(got, expected, rtol=1e-5)


def test_bce_loss_matches_torch():
    pred, gt = _rand_pred_gt(seed=1)
    got = float(bce_loss()({"mask": gt}, {"prediction": pred}))
    expected = float(F.binary_cross_entropy(torch.from_numpy(pred).view(-1),
                                            torch.from_numpy(gt).view(-1)))
    np.testing.assert_allclose(got, expected, rtol=1e-5)


def test_mix_divides_by_count():
    pred, gt = _rand_pred_gt(seed=2)
    mix = Mix(losses={"d": dice_loss_joint(), "b": bce_loss()})
    total, parts = mix({"mask": gt}, {"prediction": pred})
    np.testing.assert_allclose(float(total),
                               (float(parts["d"]) + float(parts["b"])) / 2,
                               rtol=1e-6)


def test_dice_metric_conventions():
    m = Dice(output_key="prediction", target_key="mask")
    # both empty -> 1
    pred = np.zeros((1, 1, 4, 1, 4))
    gt = np.zeros((1, 1, 4, 1, 4))
    r = m.calculate_batch({"mask": gt}, {"prediction": pred})
    assert r[0] == 1.0
    # perfect match -> 1
    gt[..., 1] = 1
    r = m.calculate_batch({"mask": gt}, {"prediction": gt})
    np.testing.assert_allclose(r, [1.0])


def test_precision_recall_empty_denominator_is_one():
    pred = np.zeros((1, 1, 4, 1, 4))
    gt = np.ones((1, 1, 4, 1, 4))
    p = Precision(output_key="prediction", target_key="mask")
    r = Recall(output_key="prediction", target_key="mask")
    assert p.calculate_batch({"mask": gt}, {"prediction": pred})[0] == 1.0
    assert r.calculate_batch({"mask": pred}, {"prediction": gt})[0] == 1.0


def test_device_metrics_match_host():
    pred, gt = _rand_pred_gt(seed=3)
    host_dice = Dice(output_key="prediction",
                     target_key="mask").calculate_batch(
        {"mask": gt}, {"prediction": pred})
    dev_dice = np.asarray(dice_per_sample(pred, gt))
    np.testing.assert_allclose(dev_dice, host_dice, rtol=1e-5)

    host_bce = BCE(output_key="prediction",
                   target_key="mask").calculate_batch(
        {"mask": gt}, {"prediction": pred})
    dev_bce = float(bce_scalar(pred, gt))
    np.testing.assert_allclose(dev_bce, host_bce[0], rtol=1e-4)


def test_hausdorff_known_distance():
    # Two unit squares offset by 3 pixels horizontally: hd == 3 * spacing.
    a = np.zeros((16, 16), dtype=np.uint8)
    b = np.zeros((16, 16), dtype=np.uint8)
    a[4:6, 4:6] = 1
    b[4:6, 7:9] = 1
    assert hd(a, b) == 3.0
    assert hd(a, b, voxelspacing=(1.0, 0.5)) == 1.5
    # hd95 of identical masks is 0
    assert hd95(a, a, connectivity=3) == 0.0


def test_hausdorff_metric_nan_on_empty():
    m = Hausdorff95(output_key="prediction", target_key="mask")
    pred = np.zeros((1, 1, 8, 1, 8))
    gt = np.ones((1, 1, 8, 1, 8))
    ground = {"mask": gt, "spacing": np.array([[0.1, 0.2, 0.3]])}
    r = m.calculate_batch(ground, {"prediction": pred})
    assert np.isnan(r[0])


def test_hausdorff_metric_uses_spacing_02():
    m = Hausdorff95(output_key="prediction", target_key="mask")
    pred = np.zeros((1, 1, 16, 1, 16))
    gt = np.zeros((1, 1, 16, 1, 16))
    pred[0, 0, 4:6, 0, 4:6] = 1
    gt[0, 0, 4:6, 0, 7:9] = 1
    ground = {"mask": gt, "spacing": np.array([[2.0, 99.0, 1.0]])}
    r = m.calculate_batch(ground, {"prediction": pred})
    expected = hd95(pred[0, 0, :, 0], gt[0, 0, :, 0],
                    voxelspacing=(2.0, 1.0), connectivity=3)
    np.testing.assert_allclose(r, [expected])
