from vittf_tpu.utils.tensor import (  # noqa: F401
    make_nd,
    make_3d,
    make_4d,
    make_5d,
    norm_minmax,
    norm_mean_std,
    IMAGENET_MEAN,
    IMAGENET_STD,
)
from vittf_tpu.utils.timer import Timer, StageTimings  # noqa: F401
