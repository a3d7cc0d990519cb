from transfusion_tpu.parallel.mesh import (
    make_mesh,
    param_partition_spec,
    shard_params,
    batch_sharding,
)
