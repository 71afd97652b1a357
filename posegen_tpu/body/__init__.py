from posegen_tpu.body.lbs import (  # noqa: F401
    blend_shapes,
    vertices2joints,
    batch_rigid_transform,
    lbs,
)
from posegen_tpu.body.smpl import SMPLModel, load_smpl_model  # noqa: F401
