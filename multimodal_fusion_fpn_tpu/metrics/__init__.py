from multimodal_fusion_fpn_tpu.metrics.streaming import (  # noqa: F401
    BCE, Dice, Hausdorff, Hausdorff95, IoU, L1, L2, MSE, Metrics,
    Precision, Recall, WeightedL1)
from multimodal_fusion_fpn_tpu.metrics.global_metrics import (  # noqa: F401
    AP, AUPR, AUROC, Acc, F1, GlobalMetric, Sens, Spec)
from multimodal_fusion_fpn_tpu.metrics.hausdorff import hd, hd95  # noqa: F401
