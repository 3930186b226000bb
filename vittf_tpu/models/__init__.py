from vittf_tpu.models.vit import (  # noqa: F401
    ViTConfig,
    init_vit_params,
    split_qkv,
    vit_forward,
    vit_forward_raw,
)
from vittf_tpu.models.dino import (  # noqa: F401
    ALL_ARCHS,
    DINO_ARCHS,
    DINOV2_ARCHS,
    convert_torch_state_dict,
    load_dino_checkpoint,
    resolve_model,
)
from vittf_tpu.models.cnn3d import (  # noqa: F401
    FeatureExtractorConfig,
    PAWSNetConfig,
    feature_extractor_forward,
    init_feature_extractor,
    init_pawsnet,
    pawsnet_forward,
)
