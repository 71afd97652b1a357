import numpy as np
import jax.numpy as jnp

from posegen_tpu.skeleton import geometry as G
from posegen_tpu.skeleton import cameras as C
from posegen_tpu.skeleton.skeleton import SMPL_REST_POSE, SMPL_SKELETON


def test_bounding_cylinder_contains_all_joints(rng):
    kp = SMPL_REST_POSE[None] + rng.normal(size=(4, 24, 3)).astype(np.float32) * 0.05
    cyl = G.get_kp_bounding_cylinder(kp, skel=SMPL_SKELETON, ext_scale=0.001, head="-y")
    assert cyl.shape == (4, 5)
    for b in range(4):
        cx, cz, r, top, bot = cyl[b]
        d = np.linalg.norm(kp[b][:, [0, 2]] - np.array([cx, cz]), axis=-1)
        assert np.all(d <= r + 1e-6)
        # head='-y': flip=-1, so top <= y-values <= bot numerically inverted
        assert np.all(kp[b][:, 1] >= top - 1e-6) or np.all(kp[b][:, 1] <= top + 1e-6)


def test_cylinder_head_z(rng):
    kp = rng.normal(size=(24, 3)).astype(np.float32)
    cyl = G.get_kp_bounding_cylinder(kp, skel=SMPL_SKELETON, head="z")
    cx, cy, r, top, bot = cyl
    d = np.linalg.norm(kp[:, [0, 1]] - np.array([cx, cy]), axis=-1)
    assert np.all(d <= r + 1e-6)
    assert top >= kp[:, 2].max() and bot <= kp[:, 2].min()


def test_cylinder_to_box_2d_bounds_projection(rng):
    kp = SMPL_REST_POSE * 0.25  # fit within the FOV
    cyl = G.get_kp_bounding_cylinder(kp, skel=SMPL_SKELETON, ext_scale=0.001, head="-y")
    H = W = 512
    focal = 500.0
    # camera 3 units along +z in NeRF convention looking at origin
    c2w = np.eye(4, dtype=np.float32)
    c2w[2, 3] = 3.0
    w2c = C.nerf_c2w_to_extrinsic(c2w)
    tl, br, pts2d = G.cylinder_to_box_2d(cyl, [H, W, focal], w2c)
    assert tl.shape == (2,) and br.shape == (2,)
    assert 0 <= tl[0] <= br[0] <= W - 1
    assert 0 <= tl[1] <= br[1] <= H - 1
    # joints projected into the image land inside the box
    joints_2d = C.world_to_cam(kp, w2c, H, W, focal)
    assert np.all(joints_2d[:, 0] >= tl[0] - 1)
    assert np.all(joints_2d[:, 0] <= br[0] + 1)
    assert np.all(joints_2d[:, 1] >= tl[1] - 1)
    assert np.all(joints_2d[:, 1] <= br[1] + 1)


def test_swap_mat_involution(rng):
    m = rng.normal(size=(4, 4)).astype(np.float32)
    np.testing.assert_allclose(C.swap_mat(C.swap_mat(m)), m, atol=1e-6)


def test_c2w_extrinsic_roundtrip(rng):
    # build a proper rigid c2w
    from scipy.spatial.transform import Rotation as SR

    c2w = np.eye(4, dtype=np.float32)
    c2w[:3, :3] = SR.random(random_state=0).as_matrix()
    c2w[:3, 3] = rng.normal(size=3)
    ext = C.nerf_c2w_to_extrinsic(c2w)
    back = C.nerf_extrinsic_to_c2w(ext)
    np.testing.assert_allclose(back, c2w, atol=1e-5)


def test_get_rays_consistency(rng):
    H, W, focal = 12, 16, 20.0
    c2w = np.eye(4, dtype=np.float32)
    c2w[:3, 3] = [0.5, -0.2, 2.0]
    ro_np, rd_np = C.get_rays_np(H, W, focal, c2w)
    ro_j, rd_j = C.get_rays(H, W, focal, jnp.asarray(c2w))
    np.testing.assert_allclose(np.asarray(ro_j), ro_np, atol=1e-6)
    np.testing.assert_allclose(np.asarray(rd_j), rd_np, atol=1e-6)
    # central pixel looks along -z (integer pixel coords, no half-pixel offset)
    np.testing.assert_allclose(rd_np[H // 2, W // 2], [0.0, 0.0, -1.0], atol=1e-6)


def test_per_joint_coords_aligned_with_parent_direction():
    coords = G.get_per_joint_coords(SMPL_REST_POSE, SMPL_SKELETON)
    assert coords.shape == (24, 3, 3)
    for i, p in enumerate(SMPL_SKELETON.joint_trees):
        if i == SMPL_SKELETON.root_id:
            continue
        vec = SMPL_REST_POSE[p] - SMPL_REST_POSE[i]
        vec = vec / (np.linalg.norm(vec) + 1e-5)
        # z-axis of the frame aligns with the parent direction
        np.testing.assert_allclose(coords[i, 2], vec, atol=1e-4)
        # orthonormality
        np.testing.assert_allclose(coords[i] @ coords[i].T, np.eye(3), atol=1e-5)
