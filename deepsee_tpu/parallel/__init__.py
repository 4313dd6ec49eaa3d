from deepsee_tpu.parallel.mesh import (
    batch_spec,
    make_mesh,
    shard_batch,
    shard_system_variables,
    system_sharding,
)
