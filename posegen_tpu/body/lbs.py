"""Linear blend skinning in pure JAX.

Capability parity with the reference's vendored SMPL-X library
(smplx/smplx/lbs.py:152-374: `lbs`, `blend_shapes`, `vertices2joints`,
`batch_rigid_transform`) rebuilt as batched einsums + a level-parallel
kinematic chain — every op is a large matmul the MXU tiles natively, and the
whole skinning pipeline jits into one fused program.
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

from posegen_tpu.skeleton.rotations import axisang_to_rot


def blend_shapes(betas: jax.Array, shape_disps: jax.Array) -> jax.Array:
    """Per-vertex displacement from shape coefficients.

    betas: (B, n_betas); shape_disps: (V, 3, n_betas) -> (B, V, 3).
    """
    return jnp.einsum("bl,vcl->bvc", betas, shape_disps)


def vertices2joints(J_regressor: jax.Array, vertices: jax.Array) -> jax.Array:
    """Regress joint locations from mesh vertices: (J, V), (B, V, 3) -> (B, J, 3)."""
    return jnp.einsum("jv,bvc->bjc", J_regressor, vertices)


def _levels_from_parents(parents: np.ndarray) -> Tuple[Tuple[int, ...], ...]:
    parents = np.asarray(parents)
    depth = np.zeros(len(parents), np.int64)
    for j in range(1, len(parents)):
        depth[j] = depth[parents[j]] + 1
    return tuple(
        tuple(np.flatnonzero(depth == d)) for d in range(int(depth.max()) + 1)
    )


def batch_rigid_transform(
    rot_mats: jax.Array,
    joints: jax.Array,
    parents: np.ndarray,
) -> Tuple[jax.Array, jax.Array]:
    """Forward kinematics for the skinning chain.

    rot_mats: (B, J, 3, 3); joints: (B, J, 3) rest locations; parents[0] == -1
    or 0. Returns (posed_joints (B, J, 3), rel_transforms (B, J, 4, 4)) where
    rel_transforms map rest-pose-relative coordinates to posed space
    (A_k = G_k - pack(G_k @ j_k), the standard SMPL formulation; mirrors
    smplx/smplx/lbs.py:345-374 but level-parallel instead of a J-step loop).
    """
    B, J = joints.shape[:2]
    parents = np.asarray(parents).copy()
    parents[0] = 0

    rel_joints = joints - jnp.take(joints, jnp.asarray(parents), axis=1)
    rel_joints = rel_joints.at[:, 0].set(joints[:, 0])

    top = jnp.concatenate([rot_mats, rel_joints[..., None]], axis=-1)  # (B,J,3,4)
    bottom = jnp.zeros((B, J, 1, 4), joints.dtype).at[..., 0, 3].set(1.0)
    local = jnp.concatenate([top, bottom], axis=-2)  # (B, J, 4, 4)

    g = local
    for level in _levels_from_parents(parents)[1:]:
        idx = jnp.asarray(level)
        pidx = jnp.asarray([parents[j] for j in level])
        composed = jnp.take(g, pidx, axis=1) @ jnp.take(local, idx, axis=1)
        g = g.at[:, idx].set(composed)

    posed_joints = g[..., :3, 3]
    # A = G - pack(G @ j): subtract the rest-joint-induced translation
    gj = jnp.einsum("njxy,njy->njx", g[..., :3, :3], joints)
    rel = g.at[..., :3, 3].add(-gj)
    return posed_joints, rel


def lbs(
    betas: jax.Array,
    pose: jax.Array,
    v_template: jax.Array,
    shapedirs: jax.Array,
    posedirs: jax.Array,
    J_regressor: jax.Array,
    parents: np.ndarray,
    lbs_weights: jax.Array,
    pose2rot: bool = True,
) -> Tuple[jax.Array, jax.Array]:
    """Full SMPL skinning (mirrors smplx/smplx/lbs.py:152-248).

    betas: (B, n_betas); pose: (B, J*3) axis-angle or (B, J, 3, 3) rotmats;
    v_template: (V, 3); shapedirs: (V, 3, n_betas); posedirs: (P, V*3) with
    P = 9*(J-1); J_regressor: (J, V); lbs_weights: (V, J).
    Returns (vertices (B, V, 3), joints (B, J, 3)).
    """
    B = betas.shape[0]
    J = J_regressor.shape[0]

    v_shaped = v_template[None] + blend_shapes(betas, shapedirs)
    j_rest = vertices2joints(J_regressor, v_shaped)

    if pose2rot:
        rot_mats = axisang_to_rot(pose.reshape(B, J, 3))
    else:
        rot_mats = pose.reshape(B, J, 3, 3)

    # pose blendshapes from the non-root rotations' deviation from identity
    eye = jnp.eye(3, dtype=v_template.dtype)
    pose_feature = (rot_mats[:, 1:] - eye).reshape(B, -1)  # (B, 9*(J-1))
    pose_offsets = (pose_feature @ posedirs).reshape(B, -1, 3)
    v_posed = v_shaped + pose_offsets

    posed_joints, A = batch_rigid_transform(rot_mats, j_rest, parents)

    # skinning: per-vertex blended transform
    T = jnp.einsum("vj,njxy->nvxy", lbs_weights, A)  # (B, V, 4, 4)
    v_hom = jnp.concatenate(
        [v_posed, jnp.ones((B, v_posed.shape[1], 1), v_posed.dtype)], axis=-1
    )
    verts = jnp.einsum("nvxy,nvy->nvx", T, v_hom)[..., :3]
    return verts, posed_joints
