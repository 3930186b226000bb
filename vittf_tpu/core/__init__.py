from vittf_tpu.core.io import (  # noqa: F401
    load_volume,
    load_features,
    load_annotations,
    save_array,
    save_features,
    save_similarities,
    ArtifactDir,
)
from vittf_tpu.core.synthetic import make_synthetic_volumes  # noqa: F401
