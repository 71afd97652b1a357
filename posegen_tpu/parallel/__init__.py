from posegen_tpu.parallel.mesh import (  # noqa: F401
    make_mesh,
    replicate,
    shard_batch,
    make_parallel_train_step,
    make_parallel_render,
)
