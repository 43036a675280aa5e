from multimodal_fusion_fpn_tpu.ops.pallas.projection import (  # noqa: F401
    fold_projection_params, projection_head_pallas)
