"""SMPL LBS tests: blendshapes, rigid transform chain, skinning invariants."""

import jax
import jax.numpy as jnp
import numpy as np

from posegen_tpu.body.lbs import batch_rigid_transform, blend_shapes, lbs, vertices2joints
from posegen_tpu.body.smpl import make_random_model
from posegen_tpu.skeleton.rotations import axisang_to_rot


def test_blend_shapes_linear(rng):
    V, nb = 10, 4
    dirs = jnp.asarray(rng.standard_normal((V, 3, nb)).astype(np.float32))
    b1 = jnp.asarray(rng.standard_normal((2, nb)).astype(np.float32))
    out1 = blend_shapes(b1, dirs)
    out2 = blend_shapes(2.0 * b1, dirs)
    np.testing.assert_allclose(np.asarray(out2), 2 * np.asarray(out1), rtol=1e-5)


def test_vertices2joints(rng):
    verts = jnp.asarray(rng.standard_normal((3, 8, 3)).astype(np.float32))
    reg = jnp.zeros((2, 8)).at[0, 0].set(1.0).at[1, 3].set(1.0)
    j = vertices2joints(reg, verts)
    np.testing.assert_allclose(np.asarray(j[:, 0]), np.asarray(verts[:, 0]))
    np.testing.assert_allclose(np.asarray(j[:, 1]), np.asarray(verts[:, 3]))


def test_rigid_transform_identity(rng):
    J = 5
    parents = np.array([0, 0, 1, 1, 3])
    joints = jnp.asarray(rng.standard_normal((2, J, 3)).astype(np.float32))
    eye = jnp.broadcast_to(jnp.eye(3), (2, J, 3, 3))
    posed, rel = batch_rigid_transform(eye, joints, parents)
    np.testing.assert_allclose(np.asarray(posed), np.asarray(joints), atol=1e-5)
    # identity pose -> rel transforms are identity (A = G - pack(Gj) = I when G
    # is pure translation to the rest joint)
    np.testing.assert_allclose(
        np.asarray(rel), np.broadcast_to(np.eye(4), (2, J, 4, 4)), atol=1e-5
    )


def test_rigid_transform_root_rotation(rng):
    """Rotating only the root rigidly rotates all posed joints about it."""
    J = 4
    parents = np.array([0, 0, 1, 2])
    joints = jnp.asarray(rng.standard_normal((1, J, 3)).astype(np.float32))
    aa = jnp.zeros((1, J, 3)).at[0, 0].set(jnp.asarray([0.0, np.pi / 2, 0.0]))
    rots = axisang_to_rot(aa)
    posed, _ = batch_rigid_transform(rots, joints, parents)
    R = np.asarray(axisang_to_rot(jnp.asarray([0.0, np.pi / 2, 0.0])))
    expect = (np.asarray(joints[0]) - np.asarray(joints[0, 0])) @ R.T + np.asarray(
        joints[0, 0]
    )
    np.testing.assert_allclose(np.asarray(posed[0]), expect, atol=1e-5)


def test_lbs_zero_pose_returns_shaped_template():
    model = make_random_model()
    B = 2
    betas = jnp.zeros((B, 4))
    pose = jnp.zeros((B, model.n_joints * 3))
    verts, joints = lbs(
        betas, pose, model.v_template, model.shapedirs, model.posedirs,
        model.J_regressor, model.parents, model.lbs_weights,
    )
    np.testing.assert_allclose(
        np.asarray(verts[0]), np.asarray(model.v_template), atol=1e-5
    )
    np.testing.assert_allclose(
        np.asarray(joints),
        np.asarray(vertices2joints(model.J_regressor, verts)),
        atol=1e-4,
    )


def test_lbs_betas_move_vertices():
    model = make_random_model()
    betas = jnp.ones((1, 4)) * 2.0
    pose = jnp.zeros((1, model.n_joints * 3))
    verts, _ = lbs(
        betas, pose, model.v_template, model.shapedirs, model.posedirs,
        model.J_regressor, model.parents, model.lbs_weights,
    )
    delta = np.asarray(verts[0]) - np.asarray(model.v_template)
    expect = np.asarray(blend_shapes(betas, model.shapedirs))[0]
    np.testing.assert_allclose(delta, expect, atol=1e-4)


def test_smpl_model_call_and_transl():
    model = make_random_model()
    B = 3
    out = model(
        betas=jnp.zeros((B, 4)),
        body_pose=jnp.zeros((B, (model.n_joints - 1) * 3)),
        transl=jnp.ones((B, 3)),
    )
    assert out["vertices"].shape == (B, model.n_vertices, 3)
    assert out["joints"].shape == (B, model.n_joints, 3)
    np.testing.assert_allclose(
        np.asarray(out["vertices"][0]) - np.asarray(model.v_template),
        1.0,
        atol=1e-5,
    )


def test_smpl_rotmat_input_matches_axisang(rng):
    model = make_random_model()
    aa = (rng.standard_normal((2, model.n_joints, 3)) * 0.3).astype(np.float32)
    out_aa = model(
        betas=jnp.zeros((2, 4)),
        body_pose=jnp.asarray(aa[:, 1:].reshape(2, -1)),
        global_orient=jnp.asarray(aa[:, 0]),
    )
    rots = axisang_to_rot(jnp.asarray(aa))
    out_rm = model(
        betas=jnp.zeros((2, 4)),
        body_pose=rots[:, 1:],
        global_orient=rots[:, :1],
        pose2rot=False,
    )
    np.testing.assert_allclose(
        np.asarray(out_aa["vertices"]), np.asarray(out_rm["vertices"]), atol=1e-4
    )


def test_smpl_model_is_jittable():
    model = make_random_model()

    @jax.jit
    def f(m, betas, pose):
        return m(betas, pose)["joints"]

    j = f(model, jnp.zeros((1, 4)), jnp.zeros((1, (model.n_joints - 1) * 3)))
    assert j.shape == (1, model.n_joints, 3)
