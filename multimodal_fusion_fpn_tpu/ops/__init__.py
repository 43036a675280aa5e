from multimodal_fusion_fpn_tpu.ops.upsample import upsample_nearest  # noqa: F401
from multimodal_fusion_fpn_tpu.ops.pooling import adaptive_max_pool  # noqa: F401
from multimodal_fusion_fpn_tpu.ops.interpolate import linear_resize  # noqa: F401
from multimodal_fusion_fpn_tpu.ops.resize import resize as host_resize  # noqa: F401
