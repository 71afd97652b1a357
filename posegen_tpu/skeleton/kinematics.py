"""Forward kinematics — level-parallel, batched, jit-friendly.

The reference computes local-to-world joint transforms either with a python
loop over 24 joints (core/utils/skeleton_utils.py:334-376) or a hand-unrolled
batched chain (skeleton_utils.py:379-463, pose_opt.py:482-521). Here FK is a
static loop over *topological levels* (depth-9 for SMPL): each level applies
one batched (B, L, 4, 4) @ (B, L, 4, 4) matmul gathering parent transforms,
which XLA maps cleanly onto the MXU and keeps the graph shallow.
"""

from __future__ import annotations

from functools import partial
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from posegen_tpu.skeleton.rotations import axisang_to_rot, bones_to_rot
from posegen_tpu.skeleton.skeleton import (
    SMPL_REST_POSE,
    SMPL_SKELETON,
    Skeleton,
    topological_levels,
)


def _local_transforms(rots: jax.Array, rest_pose: jax.Array, parents: np.ndarray,
                      root_id: int) -> jax.Array:
    """Per-joint transform relative to the parent frame.

    rots: (..., J, 3, 3) joint rotations.
    rest_pose: (..., J, 3) rest joint locations (world units).
    Returns (..., J, 4, 4): [R | t_rel; 0 0 0 1] with t_rel = rest_j - rest_parent
    (the root keeps its absolute rest location, reference skeleton_utils.py:355).
    """
    J = rest_pose.shape[-2]
    parent_pos = jnp.take(rest_pose, jnp.asarray(parents), axis=-2)
    t_rel = rest_pose - parent_pos
    # root translation is its absolute rest position
    root_mask = (jnp.arange(J) == root_id)[..., None]
    t = jnp.where(root_mask, rest_pose, t_rel)
    top = jnp.concatenate([rots, t[..., None]], axis=-1)  # (..., J, 3, 4)
    bottom = jnp.zeros_like(top[..., :1, :]).at[..., 0, 3].set(1.0)
    return jnp.concatenate([top, bottom], axis=-2)


def fk_l2ws(
    rots: jax.Array,
    rest_pose: jax.Array,
    skel: Skeleton = SMPL_SKELETON,
) -> jax.Array:
    """Local-to-world 4x4 transforms for every joint.

    rots: (..., J, 3, 3) per-joint rotations (relative to parent).
    rest_pose: (..., J, 3) rest pose joint locations.
    Returns (..., J, 4, 4).

    Level-parallel composition: l2w[j] = l2w[parent[j]] @ local[j], processed
    one tree depth at a time with batched gathers/matmuls (static level index
    sets -> fully unrolled at trace time, no dynamic control flow).
    """
    parents = skel.parents()
    local = _local_transforms(rots, rest_pose, parents, skel.root_id)
    levels = topological_levels(skel)

    l2w = local  # level-0 (root) rows already correct
    for level in levels[1:]:
        idx = jnp.asarray(level)
        parent_idx = jnp.asarray([parents[j] for j in level])
        parent_tf = jnp.take(l2w, parent_idx, axis=-3)
        child_tf = jnp.take(local, idx, axis=-3)
        composed = parent_tf @ child_tf
        # scatter composed transforms back into the joint axis
        l2w = _scatter_joints(l2w, idx, composed)
    return l2w


def _scatter_joints(l2w: jax.Array, idx: jax.Array, vals: jax.Array) -> jax.Array:
    """Write vals into l2w at joint indices idx along axis -3."""
    if l2w.ndim == 3:
        return l2w.at[idx].set(vals)
    # batched: move joint axis to front for a single scatter
    return l2w.at[..., idx, :, :].set(vals)


def smpl_l2ws(
    pose: jax.Array,
    rest_pose: Optional[jax.Array] = None,
    scale: float | jax.Array = 1.0,
    skel: Skeleton = SMPL_SKELETON,
) -> jax.Array:
    """Axis-angle SMPL pose (..., J, 3) -> local-to-world transforms (..., J, 4, 4).

    Mirrors the behaviour of reference `get_smpl_l2ws` (skeleton_utils.py:334)
    but batched and level-parallel.
    """
    if rest_pose is None:
        rest_pose = jnp.asarray(SMPL_REST_POSE)
    rest_pose = jnp.asarray(rest_pose) * scale
    rest_pose = jnp.broadcast_to(rest_pose, (*pose.shape[:-1], 3))
    rots = axisang_to_rot(pose)
    return fk_l2ws(rots, rest_pose, skel)


def smpl_l2ws_from_rots(
    rots: jax.Array,
    rest_pose: Optional[jax.Array] = None,
    scale: float | jax.Array = 1.0,
    skel: Skeleton = SMPL_SKELETON,
) -> jax.Array:
    """Rotation-matrix variant (reference get_smpl_l2ws_torch axis_to_matrix=False)."""
    if rest_pose is None:
        rest_pose = jnp.asarray(SMPL_REST_POSE)
    rest_pose = jnp.asarray(rest_pose) * scale
    rest_pose = jnp.broadcast_to(rest_pose, (*rots.shape[:-2], 3))
    return fk_l2ws(rots, rest_pose, skel)


def pose_to_kinematic(
    bones: jax.Array,
    pelvis: jax.Array,
    rest_pose: jax.Array,
    skel: Skeleton = SMPL_SKELETON,
) -> Tuple[jax.Array, jax.Array, jax.Array, jax.Array]:
    """Full pose -> (kp3d, skts, l2ws, rots).

    bones: (..., J, 3|6) joint rotations (axis-angle or rot6d).
    pelvis: (..., 3) world translation added to every joint
      (reference pose_opt.py:372-445 adds pelvis to l2w translations).
    Returns (kps (...,J,3), skts = inverse(l2w) (...,J,4,4), l2ws, rots).
    """
    rots = bones_to_rot(bones)
    rest_pose = jnp.broadcast_to(jnp.asarray(rest_pose), (*rots.shape[:-2], 3))
    l2ws = fk_l2ws(rots, rest_pose, skel)
    l2ws = l2ws.at[..., :3, 3].add(pelvis[..., None, :])
    kps = l2ws[..., :3, 3]
    skts = invert_rigid(l2ws)
    return kps, skts, l2ws, rots


def invert_rigid(tf: jax.Array) -> jax.Array:
    """Closed-form inverse of rigid 4x4 transforms: [R|t]^-1 = [R^T | -R^T t]."""
    R = tf[..., :3, :3]
    t = tf[..., :3, 3:]
    Rt = jnp.swapaxes(R, -1, -2)
    top = jnp.concatenate([Rt, -Rt @ t], axis=-1)
    bottom = jnp.zeros_like(top[..., :1, :]).at[..., 0, 3].set(1.0)
    return jnp.concatenate([top, bottom], axis=-2)


def rest_pose_from_l2ws(l2ws: jax.Array, skel: Skeleton = SMPL_SKELETON) -> jax.Array:
    """Recover rest-pose joint positions from l2w matrices
    (reference skeleton_utils.py:465-482). Non-batched (J, 4, 4) input."""
    parents = skel.parents()
    kp = l2ws[:, :3, 3]
    rest = [None] * skel.n_joints
    rest[skel.root_id] = l2ws[skel.root_id, :3, 3]
    for level in topological_levels(skel)[1:]:
        for j in level:
            p = parents[j]
            rel = l2ws[p, :3, :3].T @ (kp[j] - kp[p])
            rest[j] = rest[p] + rel
    return jnp.stack(rest)


@partial(jax.jit, static_argnames=("skel",))
def batched_smpl_l2ws(pose: jax.Array, rest_pose: jax.Array, skel: Skeleton = SMPL_SKELETON) -> jax.Array:
    return smpl_l2ws(pose, rest_pose, skel=skel)
