from multimodal_fusion_fpn_tpu.models.arch_config import ArchSpec, load_arch_spec  # noqa: F401
from multimodal_fusion_fpn_tpu.models.zoo import model_factory, build_model  # noqa: F401
