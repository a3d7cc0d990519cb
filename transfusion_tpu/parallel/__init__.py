from transfusion_tpu.parallel.mesh import (
    make_mesh,
    initialize_distributed,
    order_devices_for_dcn,
    param_partition_spec,
    shard_params,
    batch_sharding,
)
