from vittf_tpu.ops.resize import (  # noqa: F401
    resize_nearest,
    resize_linear,
    adaptive_avg_pool,
)
from vittf_tpu.ops.sampling import (  # noqa: F401
    grid_sample_2d,
    grid_sample_3d,
    rel_coords_from_abs,
    sample_features2d,
    sample_features3d,
)
from vittf_tpu.ops.similarity import fused_similarity, fused_similarity_m  # noqa: F401
from vittf_tpu.ops.attention import multi_head_attention  # noqa: F401
from vittf_tpu.ops.bilateral import (  # noqa: F401
    apply_bilateral_solver2d,
    apply_bilateral_solver3d,
)
from vittf_tpu.ops.bilateral_sparse import apply_bilateral_solver3d_rgb  # noqa: F401
from vittf_tpu.ops.connected import (  # noqa: F401
    connected_components,
    filter_similarity_largest_island,
    largest_component,
)
from vittf_tpu.ops.crop import crop_pad, write_crop_into  # noqa: F401
from vittf_tpu.ops.morphology import (  # noqa: F401
    binary_erosion,
    binary_fill_holes,
    filter_gauss_separated,
    filter_sobel_separated,
)
from vittf_tpu.ops.query import resample_topk, take_most_dissimilar  # noqa: F401
from vittf_tpu.ops.resize import resize_cubic  # noqa: F401
