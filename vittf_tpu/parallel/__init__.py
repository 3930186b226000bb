from vittf_tpu.parallel.mesh import (  # noqa: F401
    make_mesh,
    shard_params,
    vit_param_shardings,
)
from vittf_tpu.parallel.extract import (  # noqa: F401
    extract_features_sharded,
    similarity_sharded,
)
