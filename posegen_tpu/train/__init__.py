from posegen_tpu.train.trainer import (  # noqa: F401
    TrainConfig,
    TrainState,
    create_train_state,
    make_train_step,
    nerf_optimizer,
    pose_optimizer,
)
from posegen_tpu.train import losses  # noqa: F401
