from multimodal_fusion_fpn_tpu.train.configs import data_config_factory  # noqa: F401
