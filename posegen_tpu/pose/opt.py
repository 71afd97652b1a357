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
    # Parsed for config parity; the reference TRAIN LOOP never reads it
    # (trainer._compute_kp_loss ignores opt_pose_type; the get_kp_reg_loss
    # family that would consume it, core/pose_opt.py:124, has no caller).
    # The full family is available below as get_kp_reg_loss.
    opt_pose_type: str = "B"
    ext_scale: float = 0.001  # for the MPJPC stat (reference --ext_scale)


def init_pose_params(
    cfg: PoseOptConfig,
    bones: np.ndarray,
    kp3d: np.ndarray,
    skel: Skeleton = SMPL_SKELETON,
    kp_map: Optional[np.ndarray] = None,
    kp_uidxs: Optional[np.ndarray] = None,
) -> Tuple[Dict[str, jax.Array], Dict[str, jax.Array]]:
    """Build (params, anchors) from estimated poses.

    bones: (F, J, 3) axis-angle estimates; kp3d: (F, J, 3) world joints —
    the pelvis param is kp3d[:, root] (reference create_popt pose_opt.py:14-83).

    Multiview (kp_map/kp_uidxs set — reference PoseOptLayer.init_kp_params,
    pose_opt.py:277-296): the pelvis AND root bone stay per-view (F rows)
    while the non-root bones are shared — one (U, J-1, D) table indexed by
    kp_map[frame]; several cameras then optimize one pose.

    Returns (trainable params, frozen anchor copies for the reg loss).
    """
    pelvis = np.asarray(kp3d)[:, skel.root_id].astype(np.float32)
    b = np.asarray(bones, dtype=np.float32)
    if cfg.use_rot6d:
        b = np.asarray(rot_to_rot6d(axisang_to_rot(jnp.asarray(b))))
    if kp_map is not None:
        params = {
            "pelvis": jnp.asarray(pelvis),
            "root_bones": jnp.asarray(b[:, skel.root_id]),
            "bones": jnp.asarray(b[np.asarray(kp_uidxs), skel.root_id + 1 :]),
        }
    else:
        params = {"pelvis": jnp.asarray(pelvis), "bones": jnp.asarray(b)}
    # real copies, not aliases: anchors live alongside params in a (donatable)
    # train state, and XLA rejects donating one buffer twice
    anchors = jax.tree_util.tree_map(jnp.copy, params)
    return params, anchors


def gather_pose_rows(
    params: Dict[str, jax.Array],
    idx: jax.Array,
    kp_map: Optional[jax.Array] = None,
) -> Tuple[jax.Array, jax.Array]:
    """(pelvis (B, 3), bones (B, J, D)) for frame indices, resolving the
    multiview layout (reference idx_to_params, pose_opt.py:322-333:
    per-view root bone + kp_map-shared non-root bones)."""
    pelvis = jnp.take(params["pelvis"], idx, axis=0)
    if "root_bones" in params:
        if kp_map is None:
            raise ValueError("multiview pose params need kp_map")
        rb = jnp.take(params["root_bones"], idx, axis=0)[:, None]
        other = jnp.take(params["bones"], jnp.take(kp_map, idx), axis=0)
        return pelvis, jnp.concatenate([rb, other], axis=1)
    return pelvis, jnp.take(params["bones"], idx, axis=0)


def pose_apply(
    params: Dict[str, jax.Array],
    idx: jax.Array,
    rest_pose: jax.Array,
    skel: Skeleton = SMPL_SKELETON,
    kp_map: Optional[jax.Array] = None,
) -> Tuple[jax.Array, jax.Array, jax.Array, jax.Array]:
    """Gather pose rows for frame indices and run FK.

    idx: (B,) dataset frame indices. kp_map: optional (N_dataset,) mapping
    to shared non-root bone rows (multiview layout, see init_pose_params).
    Returns (kps (B,J,3), bones, skts, l2ws).
    """
    pelvis, bones = gather_pose_rows(params, idx, kp_map)
    kps, skts, l2ws, _ = pose_to_kinematic(bones, pelvis, rest_pose, skel)
    return kps, bones, skts, l2ws


def _canon_bones(bones: jax.Array) -> jax.Array:
    """Bone params -> the representation the reference losses compare.

    rot6d params are orthonormalized through the rotation matrix and
    re-extracted (reference popt layer outputs `rots` and the loss compares
    `rots[..., :3, :2].flatten(-2)`, trainer.py:391-396) — NOT the raw 6d
    params. Axis-angle params are compared raw."""
    if bones.shape[-1] == 6:
        from posegen_tpu.skeleton.rotations import rot6d_to_rot, rot_to_rot6d

        return rot_to_rot6d(rot6d_to_rot(bones))
    return bones


def kp_reg_loss(
    cfg: PoseOptConfig,
    params: Dict[str, jax.Array],
    anchors: Dict[str, jax.Array],
    idx: jax.Array,
    kp_map: Optional[jax.Array] = None,
) -> jax.Array:
    """The pose-regularization loss the reference train loop ACTUALLY runs
    (trainer._compute_kp_loss, core/trainer.py:385-408): squared diff of
    orthonormalized rot6d bones (raw params when axis-angle), ROOT JOINT
    EXCLUDED, hinged at `opt_pose_tol` (zero loss + zero gradient inside the
    tolerance band), then .sum(-1).mean(). There is no pelvis term.

    `opt_pose_type` (B/BE/RD/RDE...) is accepted by the config for parity
    but is runtime-inert exactly as in the reference: get_kp_reg_loss —
    the only consumer — is never called there (see get_kp_reg_loss below).

    Returns the UNSCALED loss; the caller multiplies by opt_pose_coef.
    """
    _, b = gather_pose_rows(params, idx, kp_map)
    # anchors are created from axis-angle estimates via rot_to_rot6d(R), so
    # they are already orthonormal — no re-canonicalization needed
    _, b0 = gather_pose_rows(anchors, idx, kp_map)
    b = _canon_bones(b)

    kp_loss = ((b0 - b) ** 2)[:, 1:]  # exclude root (reference trainer.py:398)
    kp_loss = jnp.maximum(kp_loss - cfg.opt_pose_tol, 0.0)
    return jnp.sum(kp_loss, axis=-1).mean()


def mpjpc_stat(
    cfg: PoseOptConfig, kps: jax.Array, anchor_kps: jax.Array
) -> jax.Array:
    """Mean per-joint change vs the anchor estimate, in mm-ish units
    (reference trainer.py:438-440; anchors['kps'] are the dataset's kp3d)."""
    d = jnp.linalg.norm(jax.lax.stop_gradient(kps) - anchor_kps, axis=-1)
    return d.mean() / cfg.ext_scale


def temporal_loss(
    params: Dict[str, jax.Array],
    idx: jax.Array,
    temp_val: jax.Array,
    rest_pose: jax.Array,
    kps: jax.Array,
    bones: jax.Array,
    skel: Skeleton = SMPL_SKELETON,
    kp_map: Optional[jax.Array] = None,
) -> jax.Array:
    """Second-difference (velocity-change) smoothness penalty on bones AND
    FK joints, neighbors evaluated through the pose layer and detached,
    masked by per-frame temporal validity (reference trainer.py:410-436).

    kps/bones: the CURRENT batch FK joints and canonical bones (with
    gradient). temp_val: (B,) 1.0 where both the previous and next dataset
    frames are temporal neighbors in the same sequence. Returns the
    UNSCALED loss; the caller multiplies by temp_coef.
    """
    # frame count is the pelvis table's length: under --multiview the bones
    # table is the U-row shared table (U = F / n_views), not per-frame
    n = params["pelvis"].shape[0]
    prev_i = (idx - 1) % n  # torch negative indexing wraps (trainer.py:413)
    next_i = (idx + 1) % n
    pk, pb, _, _ = pose_apply(params, prev_i, rest_pose, skel, kp_map)
    nk, nb, _, _ = pose_apply(params, next_i, rest_pose, skel, kp_map)
    pb, nb = _canon_bones(pb), _canon_bones(nb)
    pk, pb, nk, nb = map(jax.lax.stop_gradient, (pk, pb, nk, nb))
    ang_vel = jnp.sum(((bones - pb) - (nb - bones)) ** 2, axis=-1)
    joint_vel = jnp.sum(((kps - pk) - (nk - kps)) ** 2, axis=-1)
    return ((ang_vel + joint_vel) * temp_val[..., None]).mean()


def get_kp_reg_loss(
    preds: Dict[str, jax.Array],
    regs: Dict[str, jax.Array],
    gts: Optional[Dict[str, jax.Array]] = None,
    opt_pose_coefs: float = 1.0,
    opt_pose_type: str = "B",
    opt_rot6d: bool = False,
    opt_pose_tol: float = 0.0,
    use_temp_loss: bool = False,
    use_temp_vel: bool = False,
    temp_coef: float = 0.05,
    ext_scale: float = 0.001,
    root_id: int = 0,
) -> Tuple[jax.Array, jax.Array, jax.Array, Optional[jax.Array]]:
    """The full opt_pose_type objective family — faithful re-expression of
    reference core/pose_opt.py:124-201 (get_kp_reg_loss).

    NOTE: this function is DEAD CODE in the reference — nothing calls it;
    the train loop uses trainer._compute_kp_loss (see kp_reg_loss above),
    which ignores opt_pose_type. It is provided as a library component so
    the objective family (B/BE/RD/RDE with an optional 'L1' substring,
    'E' = coefficient off the global terms: root bone + pelvis excluded)
    remains available, with golden parity vs the reference function.

    preds: current {'kps','bones','rots'}; regs: anchors of the same (+
    'temp_kps'/'temp_bones'/'temp_rots' stacked [prev; next] and
    'temp_valid'/'temp_valid_next' when use_temp_loss). Shapes (B, J, ...).
    Returns (kp_loss, temp_loss, mpjpc, kp_gt_dist).
    """
    kps, bones, rots = preds["kps"], preds["bones"], preds["rots"]
    reg_kps, reg_bones, reg_rots = regs["kps"], regs["bones"], regs["rots"]

    kp_sqr_diff = jnp.sum((reg_kps - kps) ** 2, axis=-1)

    def mse(a, b):
        return (a - b) ** 2

    def l1(a, b):
        return jnp.abs(a - b)

    loss_fn = l1 if "L1" in opt_pose_type else mse
    coef_on_global = "E" not in opt_pose_type

    if opt_rot6d:
        reg_bones = reg_rots[..., :3, :2].reshape(*reg_rots.shape[:-2], 6)

    if opt_pose_type.startswith("RD"):
        bone_loss = loss_fn(rots, reg_rots)
        pelv_loss = jnp.sum(loss_fn(reg_kps[:, root_id], kps[:, root_id]), axis=-1)
    elif opt_pose_type.startswith("B"):
        bone_loss = loss_fn(reg_bones, bones)
        pelv_loss = jnp.sum(loss_fn(reg_kps[:, root_id], kps[:, root_id]), axis=-1)
    else:
        raise NotImplementedError("Regularization target un-specified")

    # hinge: zero inside the tolerance band, (loss - tol) outside
    tol = opt_pose_tol
    loss_mask = (bone_loss > tol).astype(bone_loss.dtype)
    bone_loss = jnp.sum(loss_mask * (bone_loss - tol), axis=-1)

    if coef_on_global:
        kp_loss = (bone_loss.mean() + pelv_loss.mean()) * opt_pose_coefs
    else:
        kp_loss = bone_loss[:, root_id + 1:].mean() * opt_pose_coefs

    temp_loss = jnp.asarray(0.0)
    if use_temp_loss:
        nb = bones.shape[0]
        temp_valid = regs["temp_valid"]
        if opt_rot6d:
            tr = regs["temp_rots"]
            temp_bones = tr[..., :3, :2].reshape(*tr.shape[:-2], 6)
        else:
            temp_bones = regs["temp_bones"]
        temp_kps = regs["temp_kps"]
        assert nb * 2 == temp_bones.shape[0]
        prev_bones, next_bones = jnp.split(temp_bones, 2, axis=0)
        prev_kps, next_kps = jnp.split(temp_kps, 2, axis=0)

        if not use_temp_vel:
            temp_loss = jnp.sum(loss_fn(prev_bones, bones), axis=-1)
            temp_loss = (temp_loss * temp_valid[..., None]).mean() * temp_coef
        else:
            temp_valid_next = regs["temp_valid_next"]
            # both previous and next poses need to be valid
            temp_valid = (temp_valid_next + temp_valid) // 2
            ang_vel = jnp.sum(((bones - prev_bones) - (next_bones - bones)) ** 2, -1)
            joint_vel = jnp.sum(((kps - prev_kps) - (next_kps - kps)) ** 2, -1)
            temp_loss = ((ang_vel + joint_vel) * temp_valid[..., None]).mean()
            temp_loss = temp_loss * temp_coef
        kp_loss = kp_loss + temp_loss

    mpjpc = jnp.sqrt(jax.lax.stop_gradient(kp_sqr_diff)).mean() / ext_scale
    kp_gt_dist = None
    if gts is not None:
        kp_gt_dist = (
            jnp.linalg.norm(
                jax.lax.stop_gradient(kps) - gts["kps"], axis=-1
            ).mean()
            / ext_scale
        )
    return kp_loss, temp_loss, mpjpc, kp_gt_dist


def pose_params_to_pose_data(
    params: Dict[str, jax.Array],
    rest_pose: jax.Array,
    skel: Skeleton = SMPL_SKELETON,
    kp_map: Optional[jax.Array] = None,
) -> Dict[str, np.ndarray]:
    """Export refined poses for the data layer
    (reference pose_ckpt_to_pose_data, pose_opt.py:523-581). Multiview
    params are expanded back to per-frame rows via kp_map."""
    n = params["pelvis"].shape[0]
    _, bones_full = gather_pose_rows(params, jnp.arange(n), kp_map)
    kps, skts, l2ws, _ = pose_to_kinematic(
        bones_full, params["pelvis"], rest_pose, skel
    )
    bones = bones_full
    if bones.shape[-1] == 6:  # rot6d params -> axis-angle bones
        from posegen_tpu.skeleton.rotations import rot6d_to_rot, rot_to_axisang

        bones = rot_to_axisang(rot6d_to_rot(bones))
    return {
        "kp3d": np.asarray(kps),
        "bones": np.asarray(bones),
        "skts": np.asarray(skts),
        "l2ws": np.asarray(l2ws),
    }
