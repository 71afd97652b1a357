import numpy as np
import jax.numpy as jnp
from scipy.spatial.transform import Rotation as ScipyRotation

from posegen_tpu.skeleton import kinematics as K
from posegen_tpu.skeleton.skeleton import (
    SMPL_REST_POSE,
    SMPL_SKELETON,
    topological_levels,
)


def naive_smpl_l2ws(pose, rest_pose, parents, root_id=0):
    """Golden model: per-joint python-loop FK (the algorithm of reference
    get_smpl_l2ws, skeleton_utils.py:334-376), implemented independently."""
    J = rest_pose.shape[0]
    rots = ScipyRotation.from_rotvec(pose).as_matrix()
    l2ws = [None] * J

    def homo(R, t):
        m = np.eye(4, dtype=np.float64)
        m[:3, :3] = R
        m[:3, 3] = t
        return m

    l2ws[root_id] = homo(rots[root_id], rest_pose[root_id])
    # process joints in order; SMPL ordering guarantees parent < child
    for j in range(J):
        if j == root_id:
            continue
        p = parents[j]
        rel = homo(rots[j], rest_pose[j] - rest_pose[p])
        l2ws[j] = l2ws[p] @ rel
    return np.stack(l2ws)


def test_topological_levels_cover_all_joints():
    levels = topological_levels(SMPL_SKELETON)
    flat = sorted(j for lvl in levels for j in lvl)
    assert flat == list(range(24))
    assert levels[0] == (SMPL_SKELETON.root_id,)
    # every joint's parent lives in an earlier level
    depth = {j: d for d, lvl in enumerate(levels) for j in lvl}
    for j, p in enumerate(SMPL_SKELETON.joint_trees):
        if j != SMPL_SKELETON.root_id:
            assert depth[p] < depth[j]


def test_fk_matches_naive_loop(rng):
    pose = rng.normal(size=(24, 3)).astype(np.float32) * 0.5
    ours = np.asarray(K.smpl_l2ws(jnp.asarray(pose)))
    ref = naive_smpl_l2ws(pose, SMPL_REST_POSE, SMPL_SKELETON.parents())
    np.testing.assert_allclose(ours, ref, atol=1e-5)


def test_fk_batched(rng):
    pose = rng.normal(size=(5, 24, 3)).astype(np.float32) * 0.5
    ours = np.asarray(K.smpl_l2ws(jnp.asarray(pose)))
    assert ours.shape == (5, 24, 4, 4)
    for b in range(5):
        ref = naive_smpl_l2ws(pose[b], SMPL_REST_POSE, SMPL_SKELETON.parents())
        np.testing.assert_allclose(ours[b], ref, atol=1e-5)


def test_fk_scale(rng):
    pose = rng.normal(size=(24, 3)).astype(np.float32) * 0.3
    scale = 0.37
    ours = np.asarray(K.smpl_l2ws(jnp.asarray(pose), scale=scale))
    ref = naive_smpl_l2ws(pose, SMPL_REST_POSE * scale, SMPL_SKELETON.parents())
    np.testing.assert_allclose(ours, ref, atol=1e-5)


def test_invert_rigid(rng):
    pose = rng.normal(size=(3, 24, 3)).astype(np.float32) * 0.5
    l2ws = K.smpl_l2ws(jnp.asarray(pose))
    skts = np.asarray(K.invert_rigid(l2ws))
    prod = skts @ np.asarray(l2ws)
    eye = np.broadcast_to(np.eye(4), prod.shape)
    np.testing.assert_allclose(prod, eye, atol=1e-5)


def test_pose_to_kinematic(rng):
    bones = rng.normal(size=(2, 24, 3)).astype(np.float32) * 0.4
    pelvis = rng.normal(size=(2, 3)).astype(np.float32)
    rest = jnp.asarray(SMPL_REST_POSE)
    kps, skts, l2ws, rots = K.pose_to_kinematic(jnp.asarray(bones), jnp.asarray(pelvis), rest)
    assert kps.shape == (2, 24, 3)
    assert skts.shape == (2, 24, 4, 4)
    # kps equal the l2w translations; pelvis offset applied to root
    np.testing.assert_allclose(np.asarray(l2ws[..., :3, 3]), np.asarray(kps), atol=1e-6)
    ref = naive_smpl_l2ws(bones[0], SMPL_REST_POSE, SMPL_SKELETON.parents())
    np.testing.assert_allclose(
        np.asarray(kps[0]), ref[:, :3, 3] + pelvis[0], atol=1e-5
    )
    # skts transform kps to their local origin
    kp_h = np.concatenate([np.asarray(kps), np.ones((2, 24, 1))], axis=-1)
    local = np.einsum("bjkl,bjl->bjk", np.asarray(skts), kp_h)
    np.testing.assert_allclose(local[..., :3], 0.0, atol=1e-5)


def test_rest_pose_from_l2ws_roundtrip(rng):
    # zero pose -> rest pose recovered exactly
    pose = np.zeros((24, 3), dtype=np.float32)
    l2ws = K.smpl_l2ws(jnp.asarray(pose))
    rest = np.asarray(K.rest_pose_from_l2ws(np.asarray(l2ws)))
    np.testing.assert_allclose(rest, SMPL_REST_POSE, atol=1e-5)
