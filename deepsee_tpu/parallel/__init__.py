from deepsee_tpu.parallel.mesh import (
    batch_spec,
    host_local_variables,
    make_mesh,
    shard_batch,
    shard_system_variables,
    shard_train_state,
    system_sharding,
    train_state_shardings,
)
