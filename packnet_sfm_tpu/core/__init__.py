from packnet_sfm_tpu.core.config import (
    ConfigNode,
    get_default_config,
    load_config,
    merge_config,
    parse_train_config,
)
