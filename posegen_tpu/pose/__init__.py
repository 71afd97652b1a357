from posegen_tpu.pose.opt import (  # noqa: F401
    PoseOptConfig,
    init_pose_params,
    pose_apply,
    kp_reg_loss,
    get_kp_reg_loss,
    mpjpc_stat,
    temporal_loss,
    pose_params_to_pose_data,
)
