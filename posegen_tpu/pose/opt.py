"""Learnable per-frame pose refinement.

Capability parity with reference core/pose_opt.py (PoseOptLayer,
create_popt, get_kp_reg_loss, pose_ckpt_to_pose_data) rebuilt functionally:
the "layer" is a params pytree {'pelvis': (F, 3), 'bones': (F, J, D)} plus a
pure `pose_apply` that gathers the rows for a batch of frame indices and runs
level-parallel FK. Gradients flow from the photometric loss through the
embedders and FK into these params; a second optax optimizer (wrapped in
optax.MultiSteps to replicate the reference's `opt_pose_step` gradient
accumulation, reference trainer.py:478-484) updates them.

Multiview sharing (reference pose_opt.py:290-295): `kp_map` maps a dataset
frame index to the underlying shared pose row, so several cameras optimize
one pose.
"""

from __future__ import annotations

import dataclasses
from typing import Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from posegen_tpu.skeleton.kinematics import pose_to_kinematic
from posegen_tpu.skeleton.rotations import axisang_to_rot, rot_to_rot6d
from posegen_tpu.skeleton.skeleton import SMPL_SKELETON, Skeleton


@dataclasses.dataclass(frozen=True)
class PoseOptConfig:
    """Static pose-optimization settings (reference run_nerf.py opt_* flags)."""

    use_rot6d: bool = True
    opt_pelvis: bool = True
    depth: int = 0  # optimize only joints up to this tree depth (0 = all)
    opt_pose_tol: float = 0.0  # hinge tolerance on the anchor loss
    reg_type: str = "mse"  # 'mse' | 'l1' | 'rmse'


def init_pose_params(
    cfg: PoseOptConfig,
    bones: np.ndarray,
    kp3d: np.ndarray,
    skel: Skeleton = SMPL_SKELETON,
) -> Tuple[Dict[str, jax.Array], Dict[str, jax.Array]]:
    """Build (params, anchors) from estimated poses.

    bones: (F, J, 3) axis-angle estimates; kp3d: (F, J, 3) world joints —
    the pelvis param is kp3d[:, root] (reference create_popt pose_opt.py:14-83).
    Returns (trainable params, frozen anchor copies for the reg loss).
    """
    pelvis = np.asarray(kp3d)[:, skel.root_id].astype(np.float32)
    b = np.asarray(bones, dtype=np.float32)
    if cfg.use_rot6d:
        b = np.asarray(rot_to_rot6d(axisang_to_rot(jnp.asarray(b))))
    params = {"pelvis": jnp.asarray(pelvis), "bones": jnp.asarray(b)}
    # real copies, not aliases: anchors live alongside params in a (donatable)
    # train state, and XLA rejects donating one buffer twice
    anchors = jax.tree_util.tree_map(jnp.copy, params)
    return params, anchors


def pose_apply(
    params: Dict[str, jax.Array],
    idx: jax.Array,
    rest_pose: jax.Array,
    skel: Skeleton = SMPL_SKELETON,
    kp_map: Optional[jax.Array] = None,
) -> Tuple[jax.Array, jax.Array, jax.Array, jax.Array]:
    """Gather pose rows for frame indices and run FK.

    idx: (B,) dataset frame indices. kp_map: optional (N_dataset,) mapping to
    shared pose rows. Returns (kps (B,J,3), bones, skts, l2ws).
    """
    if kp_map is not None:
        idx = jnp.take(kp_map, idx)
    pelvis = jnp.take(params["pelvis"], idx, axis=0)
    bones = jnp.take(params["bones"], idx, axis=0)
    kps, skts, l2ws, _ = pose_to_kinematic(bones, pelvis, rest_pose, skel)
    return kps, bones, skts, l2ws


def _reg(reg_type: str, diff: jax.Array) -> jax.Array:
    if reg_type == "mse":
        return diff**2
    if reg_type == "l1":
        return jnp.abs(diff)
    if reg_type == "rmse":
        return jnp.sqrt(jnp.maximum(diff**2, 1e-12))
    raise NotImplementedError(f"reg_type {reg_type!r}")


def kp_reg_loss(
    cfg: PoseOptConfig,
    params: Dict[str, jax.Array],
    anchors: Dict[str, jax.Array],
    idx: jax.Array,
    kp_map: Optional[jax.Array] = None,
) -> Tuple[jax.Array, jax.Array]:
    """Anchor-regularized (bone_loss, pelvis_loss) for a batch of frames
    (reference pose_opt.py:124-201): a hinge keeps poses within
    `opt_pose_tol` of the initial estimate without gradient inside the band.
    """
    if kp_map is not None:
        idx = jnp.take(kp_map, idx)
    b = jnp.take(params["bones"], idx, axis=0)
    b0 = jnp.take(anchors["bones"], idx, axis=0)
    p = jnp.take(params["pelvis"], idx, axis=0)
    p0 = jnp.take(anchors["pelvis"], idx, axis=0)

    bone_diff = _reg(cfg.reg_type, b - b0)
    if cfg.opt_pose_tol > 0.0:
        bone_diff = jnp.maximum(bone_diff - cfg.opt_pose_tol, 0.0)
    return jnp.mean(bone_diff), jnp.mean(_reg(cfg.reg_type, p - p0))


def temporal_loss(
    params: Dict[str, jax.Array],
    idx: jax.Array,
    n_frames: int,
) -> jax.Array:
    """Velocity smoothness between consecutive frames
    (reference trainer.py:384-443 temporal loss)."""
    nxt = jnp.minimum(idx + 1, n_frames - 1)
    db = jnp.take(params["bones"], nxt, axis=0) - jnp.take(params["bones"], idx, axis=0)
    dp = jnp.take(params["pelvis"], nxt, axis=0) - jnp.take(params["pelvis"], idx, axis=0)
    return jnp.mean(db**2) + jnp.mean(dp**2)


def pose_params_to_pose_data(
    params: Dict[str, jax.Array],
    rest_pose: jax.Array,
    skel: Skeleton = SMPL_SKELETON,
) -> Dict[str, np.ndarray]:
    """Export refined poses for the data layer
    (reference pose_ckpt_to_pose_data, pose_opt.py:523-581)."""
    kps, skts, l2ws, _ = pose_to_kinematic(
        params["bones"], params["pelvis"], rest_pose, skel
    )
    bones = params["bones"]
    if bones.shape[-1] == 6:  # rot6d params -> axis-angle bones
        from posegen_tpu.skeleton.rotations import rot6d_to_rot, rot_to_axisang

        bones = rot_to_axisang(rot6d_to_rot(bones))
    return {
        "kp3d": np.asarray(kps),
        "bones": np.asarray(bones),
        "skts": np.asarray(skts),
        "l2ws": np.asarray(l2ws),
    }
