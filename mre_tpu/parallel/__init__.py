from mre_tpu.parallel.mesh import (
    make_mesh,
    batch_sharding,
    replicated,
    table_sharding,
    shard_batch,
)
