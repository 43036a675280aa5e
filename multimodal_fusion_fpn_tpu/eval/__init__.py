from multimodal_fusion_fpn_tpu.eval.configs import opt_factory  # noqa: F401
from multimodal_fusion_fpn_tpu.eval.noise import noise_classes  # noqa: F401
