from vittf_tpu.ops.resize import (  # noqa: F401
    resize_nearest,
    resize_linear,
    adaptive_avg_pool,
)
from vittf_tpu.ops.sampling import grid_sample_3d, sample_features3d  # noqa: F401
from vittf_tpu.ops.similarity import fused_similarity  # noqa: F401
from vittf_tpu.ops.attention import multi_head_attention  # noqa: F401
