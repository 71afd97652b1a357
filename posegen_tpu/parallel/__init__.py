from posegen_tpu.parallel.mesh import (  # noqa: F401
    batch_pspecs,
    make_mesh,
    make_parallel_render,
    make_parallel_train_step,
    make_shardmap_render,
    make_shardmap_train_step,
    replicate,
    shard_batch,
)
