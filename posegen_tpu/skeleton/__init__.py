from posegen_tpu.skeleton.skeleton import (  # noqa: F401
    Skeleton,
    SMPL_SKELETON,
    SMPL_SKELETON_EXTENDED,
    CANONICAL_SKELETON,
    MPI_3DHP_SKELETON,
    SMPL_REST_POSE,
    topological_levels,
)
from posegen_tpu.skeleton import rotations  # noqa: F401
from posegen_tpu.skeleton import kinematics  # noqa: F401
from posegen_tpu.skeleton import geometry  # noqa: F401
from posegen_tpu.skeleton import cameras  # noqa: F401
