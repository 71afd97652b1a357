"""SPIN -> NeRF data conversion tests."""

import os

import jax.numpy as jnp
import numpy as np
import pytest

from posegen_tpu.data.spin import (
    convert_crop_cam_to_orig_img_and_focal,
    keypoints_from_spin,
    pred_cams_to_orig_cam_params,
    process_spin_data,
)
from posegen_tpu.skeleton.cameras import nerf_c2w_to_extrinsic, world_to_cam
from posegen_tpu.skeleton.rotations import axisang_to_rot


def test_crop_cam_conversion_identity_box():
    """A full-image square bbox keeps the focal and recovers cz = 2f/(res*s)."""
    cam = np.array([[1.0, 0.1, -0.2]])
    bbox = np.array([[256.0, 256.0, 512.0]])  # centered, full 512 image
    out = convert_crop_cam_to_orig_img_and_focal(cam, bbox, 512, 512)
    f, tx, ty, cz = out[0]
    assert f == pytest.approx(5000.0 * 512 / 224)
    assert cz == pytest.approx(2 * 5000.0 / (224 * 1.0))
    # centered box -> translation = cam offsets
    assert tx == pytest.approx(0.1)
    assert ty == pytest.approx(-0.2)


def test_keypoints_from_spin_shapes(rng):
    n = 3
    aa = (rng.standard_normal((n, 24, 3)) * 0.2).astype(np.float32)
    rot_mats = np.asarray(axisang_to_rot(jnp.asarray(aa)))
    joints = rng.standard_normal((n, 49, 3)).astype(np.float32)
    from posegen_tpu.skeleton.skeleton import SMPL_REST_POSE

    kp3d, bones, skts, rest, scale = keypoints_from_spin(
        joints, rot_mats, SMPL_REST_POSE.copy()
    )
    assert kp3d.shape == (n, 24, 3)
    assert bones.shape == (n, 24, 3)
    assert skts.shape == (n, 24, 4, 4)
    # axis-angle roundtrip: recovered bones reproduce the input rotations
    np.testing.assert_allclose(
        np.asarray(axisang_to_rot(jnp.asarray(bones))), rot_mats, atol=1e-4
    )
    # skts invert l2ws: skt @ kp == 0 for each joint's own frame
    hom = np.concatenate([kp3d, np.ones((n, 24, 1))], -1)
    local = np.einsum("njab,njb->nja", skts, hom)
    np.testing.assert_allclose(local[..., :3], 0.0, atol=1e-4)
    # rest pose scaled to the reference bone length (ext_scale=1)
    assert scale == pytest.approx(1.0, abs=1e-5)


def test_spin_camera_roundtrip(rng):
    """Full pipeline: a subject at the converted camera projects inside the
    image with the computed focal."""
    n = 2
    aa = (rng.standard_normal((n, 24, 3)) * 0.2).astype(np.float32)
    rot_mats = np.asarray(axisang_to_rot(jnp.asarray(aa)))
    betas = np.zeros((n, 10), np.float32)
    joints = np.tile(np.zeros((1, 49, 3), np.float32), (n, 1, 1))
    cams = np.array([[0.9, 0.0, 0.1], [1.1, -0.05, 0.0]], np.float32)
    bboxes = np.array([[250.0, 260.0, 300.0], [256.0, 256.0, 400.0]], np.float32)

    out = process_spin_data(betas, cams, joints, rot_mats, bboxes, res=512)
    assert out["c2ws"].shape == (n, 4, 4)
    assert np.all(out["focals"] > 0)
    assert out["cyls"].shape == (n, 5)

    for i in range(n):
        ext = nerf_c2w_to_extrinsic(out["c2ws"][i])
        pix = world_to_cam(out["kp3d"][i], ext, 512, 512, out["focals"][i])
        inside = (pix >= -100) & (pix < 612)
        assert inside.mean() > 0.9, f"joints project far outside: {pix}"


@pytest.mark.slow
def test_process_spin_data_matches_reference(tmp_path, monkeypatch):
    """Golden cross-validation: our SPIN->pose-data conversion matches the
    actual reference processor (core/process_spin.process_spin_data, torch
    CPU via shims) on the same inputs + the same random-weights SMPL pkl."""
    import pickle
    import sys

    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    import reference_shims

    reference_shims.install()

    # random-weights SMPL pkl with the real topology size (vendored smplx's
    # vertex selector indexes vertices up to id 6787)
    rng = np.random.default_rng(11)
    V, J = 6890, 24
    parents = np.zeros(J, np.int64)
    for j in range(1, J):
        parents[j] = rng.integers(0, j)
    kintree = np.stack([parents.astype(np.uint32), np.arange(J, dtype=np.uint32)])
    kintree[0, 0] = np.uint32(4294967295)
    J_reg = rng.random((J, V))
    J_reg /= J_reg.sum(1, keepdims=True)
    w = np.exp(rng.standard_normal((V, J)) * 2)
    data = {
        "v_template": rng.standard_normal((V, 3)) * 0.1,
        "shapedirs": rng.standard_normal((V, 3, 10)) * 0.01,
        "posedirs": rng.standard_normal((V, 3, 9 * (J - 1))) * 0.001,
        "J_regressor": J_reg,
        "kintree_table": kintree,
        "weights": w / w.sum(1, keepdims=True),
        "f": rng.integers(0, V, (100, 3)).astype(np.int64),
    }
    (tmp_path / "smpl").mkdir()
    with open(tmp_path / "smpl" / "SMPL_NEUTRAL.pkl", "wb") as f:
        pickle.dump(data, f)

    N = 4
    betas = (rng.standard_normal((N, 10)) * 0.3).astype(np.float32)
    joints = (rng.standard_normal((N, 49, 3)) * 0.3).astype(np.float32)
    aa = (rng.standard_normal((N, 24, 3)) * 0.3).astype(np.float32)
    cameras = np.stack(
        [rng.uniform(0.7, 1.1, N), rng.normal(0, 0.1, N), rng.normal(0, 0.1, N)], -1
    ).astype(np.float32)
    bboxes = np.stack(
        [rng.uniform(200, 300, N), rng.uniform(200, 300, N), rng.uniform(150, 250, N)],
        -1,
    ).astype(np.float32)

    import jax.numpy as jnp

    from posegen_tpu.skeleton.rotations import axisang_to_rot

    rot_mats = np.asarray(axisang_to_rot(jnp.asarray(aa))).astype(np.float32)

    # reference (hard-codes the pkl path relative to cwd)
    import torch

    monkeypatch.chdir(tmp_path)
    from core.process_spin import process_spin_data as ref_process

    ref = ref_process(
        torch.from_numpy(betas), torch.from_numpy(cameras),
        torch.from_numpy(joints), torch.from_numpy(rot_mats),
        torch.from_numpy(bboxes), res=512, ext_scale=0.001,
    )

    from posegen_tpu.body.smpl import load_smpl_model
    from posegen_tpu.data.spin import process_spin_data

    model = load_smpl_model(str(tmp_path / "smpl" / "SMPL_NEUTRAL.pkl"))
    ours = process_spin_data(
        betas, cameras, joints, rot_mats, bboxes,
        smpl_model=model, res=512, ext_scale=0.001,
    )

    for key, atol in (
        ("rest_pose", 1e-5), ("kp3d", 1e-4), ("bones", 1e-4), ("skts", 5e-3),
        ("cyls", 1e-3), ("c2ws", 1e-4), ("focals", 1e-2),
    ):
        a, b = np.asarray(ref[key]), np.asarray(ours[key])
        assert a.shape == b.shape, (key, a.shape, b.shape)
        np.testing.assert_allclose(a, b, rtol=1e-5, atol=atol, err_msg=key)
    np.testing.assert_allclose(ref["pose_scale"], ours["pose_scale"], rtol=1e-5)
