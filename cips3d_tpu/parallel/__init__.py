from cips3d_tpu.parallel.mesh import (  # noqa: F401
    batch_sharded,
    make_mesh,
    replicated,
    shard_batch,
    shard_train_step,
)
