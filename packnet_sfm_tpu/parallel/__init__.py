from packnet_sfm_tpu.parallel.mesh import (
    make_mesh,
    replicate_sharding,
    batch_sharding,
    shard_batch,
)
