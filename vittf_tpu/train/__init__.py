from vittf_tpu.train.contrastive import (  # noqa: F401
    ContrastiveConfig,
    ContrastiveTrainer,
)
from vittf_tpu.train.dense import (  # noqa: F401
    DenseContrastiveConfig,
    DenseContrastiveTrainer,
)
from vittf_tpu.train.paws import PAWSConfig, PAWSTrainer  # noqa: F401
from vittf_tpu.train.intra_clr import IntraCLRConfig, IntraCLRTrainer  # noqa: F401
from vittf_tpu.train.probe import ProbeConfig, ProbeTrainer  # noqa: F401
from vittf_tpu.train.gather import gather_receptive_fields  # noqa: F401
from vittf_tpu.train.losses import (  # noqa: F401
    feature_std,
    infonce_loss,
    paws_loss,
    sharpen,
    snn,
    transform_paws_crops,
)
