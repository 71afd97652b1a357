from posegen_tpu.body.lbs import (  # noqa: F401
    blend_shapes,
    vertices2joints,
    batch_rigid_transform,
    lbs,
)
from posegen_tpu.body.smpl import SMPLModel, load_smpl_model  # noqa: F401
from posegen_tpu.body.models import (  # noqa: F401
    FLAMEModel,
    MANOModel,
    SMPLXModel,
    SMPLX_JOINT_NAMES,
    VERTEX_IDS,
    load_flame_model,
    load_mano_model,
    load_smplx_model,
)
