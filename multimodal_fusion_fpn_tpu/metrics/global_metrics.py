"""Dataset-level global pixel metrics.

Parity with ``/root/reference/common/metrics.py:14-68``: computed over
the concatenation of all flattened prediction/ground-truth pixels at the
end of an evaluation run (``test_utils.py:41-49``).
"""

import numpy as np
from sklearn.metrics import (auc, average_precision_score, confusion_matrix,
                             f1_score, precision_recall_curve, roc_auc_score)


class GlobalMetric:
    def calculate(self, gt_values: np.ndarray,
                  pred_values: np.ndarray) -> float:
        raise NotImplementedError


class AUROC(GlobalMetric):
    def calculate(self, gt_values, pred_values) -> float:
        return roc_auc_score(gt_values, pred_values)


class AUPR(GlobalMetric):
    def calculate(self, gt_values, pred_values) -> float:
        precision, recall, _ = precision_recall_curve(gt_values, pred_values)
        return auc(recall, precision)


class AP(GlobalMetric):
    def calculate(self, gt_values, pred_values) -> float:
        return average_precision_score(gt_values, pred_values)


class F1(GlobalMetric):
    def calculate(self, gt_values, pred_values) -> float:
        return f1_score(gt_values, np.where(pred_values >= 0.5, 1.0, 0.0))


class ClassMetric(GlobalMetric):
    def calculate(self, gt_values, pred_values) -> float:
        tn, fp, fn, tp = confusion_matrix(
            gt_values, np.where(pred_values >= 0.5, 1.0, 0.0)).ravel()
        return self.get_metric(tn, fp, fn, tp)

    def get_metric(self, tn, fp, fn, tp) -> float:
        raise NotImplementedError


class Spec(ClassMetric):
    def get_metric(self, tn, fp, fn, tp) -> float:
        return tn / (tn + fp)


class Sens(ClassMetric):
    def get_metric(self, tn, fp, fn, tp) -> float:
        return tp / (tp + fn)


class Acc(ClassMetric):
    def get_metric(self, tn, fp, fn, tp) -> float:
        return (tp + tn) / (tp + tn + fp + fn)
