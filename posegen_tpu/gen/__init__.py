from posegen_tpu.gen.generators import (  # noqa: F401
    GenConfig,
    init_pose_generator,
    pose_generator_apply,
)
from posegen_tpu.gen.discriminators import (  # noqa: F401
    init_pos3d_discriminator,
    pos3d_discriminator_apply,
    init_pos2d_discriminator,
    pos2d_discriminator_apply,
)
