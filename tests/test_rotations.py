import numpy as np
import jax.numpy as jnp
from scipy.spatial.transform import Rotation as ScipyRotation

from posegen_tpu.skeleton import rotations as R


def test_axisang_to_rot_matches_scipy(rng):
    aa = rng.normal(size=(64, 3)).astype(np.float32)
    ours = np.asarray(R.axisang_to_rot(jnp.asarray(aa)))
    ref = ScipyRotation.from_rotvec(aa).as_matrix()
    np.testing.assert_allclose(ours, ref, atol=1e-5)


def test_axisang_to_rot_small_angles(rng):
    aa = rng.normal(size=(16, 3)).astype(np.float32) * 1e-8
    ours = np.asarray(R.axisang_to_rot(jnp.asarray(aa)))
    ref = ScipyRotation.from_rotvec(aa.astype(np.float64)).as_matrix()
    np.testing.assert_allclose(ours, ref, atol=1e-6)
    assert np.all(np.isfinite(ours))


def test_rot_axisang_roundtrip(rng):
    aa = rng.normal(size=(32, 3)).astype(np.float32)
    # keep |angle| < pi for unique representation
    aa = aa / np.linalg.norm(aa, axis=-1, keepdims=True) * rng.uniform(0.01, 3.0, (32, 1))
    rot = R.axisang_to_rot(jnp.asarray(aa))
    back = np.asarray(R.rot_to_axisang(rot))
    np.testing.assert_allclose(back, aa, atol=1e-4)


def test_quat_matches_scipy(rng):
    aa = rng.normal(size=(32, 3)).astype(np.float32)
    ours = np.asarray(R.axisang_to_quat(jnp.asarray(aa)))  # (w, x, y, z)
    ref = ScipyRotation.from_rotvec(aa).as_quat()  # (x, y, z, w)
    ref_wxyz = np.concatenate([ref[:, 3:], ref[:, :3]], axis=-1)
    sign = np.sign(np.sum(ours * ref_wxyz, axis=-1, keepdims=True))
    np.testing.assert_allclose(ours, ref_wxyz * sign, atol=1e-5)


def test_rot6d_roundtrip(rng):
    aa = rng.normal(size=(32, 3)).astype(np.float32)
    rot = np.asarray(R.axisang_to_rot(jnp.asarray(aa)))
    six = R.rot_to_rot6d(jnp.asarray(rot))
    assert six.shape == (32, 6)
    back = np.asarray(R.rot6d_to_rot(six))
    np.testing.assert_allclose(back, rot, atol=1e-5)


def test_rot6d_gram_schmidt_normalizes(rng):
    x = rng.normal(size=(16, 6)).astype(np.float32)
    rot = np.asarray(R.rot6d_to_rot(jnp.asarray(x)))
    eye = np.broadcast_to(np.eye(3), rot.shape)
    np.testing.assert_allclose(rot @ np.swapaxes(rot, -1, -2), eye, atol=1e-5)
    np.testing.assert_allclose(np.linalg.det(rot), 1.0, atol=1e-5)


def test_bones_to_rot_dispatch(rng):
    aa = rng.normal(size=(4, 3)).astype(np.float32)
    six = rng.normal(size=(4, 6)).astype(np.float32)
    assert R.bones_to_rot(jnp.asarray(aa)).shape == (4, 3, 3)
    assert R.bones_to_rot(jnp.asarray(six)).shape == (4, 3, 3)
