from multimodal_fusion_fpn_tpu.data import transforms  # noqa: F401
from multimodal_fusion_fpn_tpu.data.abstract import AbstractDataset  # noqa: F401
from multimodal_fusion_fpn_tpu.data.hrf import HRF_SPEC_Dataset  # noqa: F401
from multimodal_fusion_fpn_tpu.data.vrc import VRC_Dataset  # noqa: F401
from multimodal_fusion_fpn_tpu.data.loader import DataLoader  # noqa: F401
