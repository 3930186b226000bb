from vittf_tpu.pipeline.features import (  # noqa: F401
    ExtractConfig,
    compute_im_sizes,
    extract_features,
)
from vittf_tpu.pipeline.ntf import (  # noqa: F401
    compute_similarities,
    fuse_predictions,
    upscale_prediction,
)
from vittf_tpu.pipeline.annotations import (  # noqa: F401
    annotations_from_labels,
    sample_both,
    sample_surface,
    sample_uniform,
)
from vittf_tpu.pipeline.evaluate import (  # noqa: F401
    confusion_matrix,
    evaluate_user_study,
    metrics_from_confusion,
    segmentation_metrics,
)
from vittf_tpu.pipeline.refine import refine_similarity  # noqa: F401
