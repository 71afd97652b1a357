"""Eval harness + imutils + dataset-loader tests (synthetic annotations)."""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from posegen_tpu.body.smpl import make_random_model
from posegen_tpu.data.imutils import crop, flip_kp, flip_pose, normalize_for_spin
from posegen_tpu.data.loaders import pose_block_from_bones, process_surreal
from posegen_tpu.evals.harness import PoseEvalDataset, SpinEvaluator, pw3d_dataset
from posegen_tpu.gen.hmr import init_hmr


def _write_annots(tmp_path, img_dir, n=4, res=64):
    import imageio.v2 as imageio

    rng = np.random.default_rng(0)
    os.makedirs(img_dir, exist_ok=True)
    names = []
    for i in range(n):
        name = f"img_{i:03d}.png"
        imageio.imwrite(
            os.path.join(img_dir, name),
            rng.integers(0, 255, (res, res, 3), dtype=np.uint8),
        )
        names.append(name)
    np.savez(
        tmp_path / "seq.npz",
        imgname=np.array(names),
        center=np.full((n, 2), res / 2, np.float32),
        scale=np.full((n,), res / 200.0, np.float32),
        pose=(rng.standard_normal((n, 72)) * 0.2).astype(np.float32),
        shape=np.zeros((n, 10), np.float32),
        gender=np.array(["m", "f", "m", "f"][:n]),
    )
    return str(tmp_path / "seq.npz")


def test_pose_eval_dataset(tmp_path):
    img_dir = str(tmp_path / "imgs")
    annot = _write_annots(tmp_path, img_dir)
    ds = PoseEvalDataset([annot], img_dir, res=32)
    assert len(ds) == 4
    item = ds[0]
    assert item["image"].shape == (32, 32, 3)
    assert item["pose"].shape == (72,)
    assert list(ds.genders) == [0, 1, 0, 1]
    batches = list(ds.batches(batch_size=3))
    assert batches[0]["image"].shape == (3, 32, 32, 3)
    # pw3d_dataset dispatch picks up loose npz files
    ds2 = pw3d_dataset(str(tmp_path), img_dir, res=32)
    assert len(ds2) == 4


@pytest.mark.slow
def test_spin_evaluator_runs(tmp_path):
    img_dir = str(tmp_path / "imgs")
    annot = _write_annots(tmp_path, img_dir, n=2)
    ds = PoseEvalDataset([annot], img_dir, res=64)

    # tiny stand-in SMPL with 24 joints so pose vectors fit
    model = make_random_model(n_vertices=32, n_joints=24, n_betas=10)
    rng = np.random.default_rng(1)
    J_reg = rng.uniform(0, 1, (17, 32)).astype(np.float32)
    J_reg /= J_reg.sum(-1, keepdims=True)

    hmr_params, hmr_state = init_hmr(jax.random.PRNGKey(0))
    ev = SpinEvaluator(hmr_params, hmr_state, model, J_regressor=J_reg)
    results = ev.inference(ds.batches(batch_size=2))
    for k in ("mpjpe", "pa_mpjpe", "pck", "posed_mesh_error", "unposed_mesh_error"):
        assert np.isfinite(results[k]), k
    assert results["pa_mpjpe"] <= results["mpjpe"] + 1e-6


def test_crop_and_flips(rng):
    img = rng.integers(0, 255, (100, 80, 3), dtype=np.uint8)
    c = crop(img, center=(40, 50), scale=0.5, res=(64, 64))
    assert c.shape == (64, 64, 3)
    x = normalize_for_spin(c)
    assert x.dtype == np.float32 and abs(float(x.mean())) < 3.0

    kp = rng.standard_normal((24, 3)).astype(np.float32)
    f = flip_kp(kp)
    np.testing.assert_allclose(f[1], kp[2] * np.array([-1, 1, 1]))  # hips swap

    pose = rng.standard_normal((72,)).astype(np.float32)
    fp = flip_pose(pose)
    assert fp.shape == (72,)
    np.testing.assert_allclose(flip_pose(fp), pose, atol=1e-6)  # involution


def test_pose_block_and_surreal_processing(tmp_path, rng):
    n = 3
    bones = (rng.standard_normal((n, 24, 3)) * 0.2).astype(np.float32)
    block = pose_block_from_bones(bones, head="z")
    assert block["kp3d"].shape == (n, 24, 3)
    assert np.isfinite(block["skts"]).all()

    imgs = rng.integers(0, 255, (n, 32, 32, 3), dtype=np.uint8)
    masks = rng.integers(0, 2, (n, 32, 32, 1), dtype=np.uint8)
    joints3d = rng.standard_normal((n, 24, 3)).astype(np.float32) * 0.01
    c2ws = np.broadcast_to(np.eye(4, dtype=np.float32), (n, 4, 4))
    path = process_surreal(
        str(tmp_path / "s.h5"), imgs, masks, bones, joints3d, c2ws,
        focals=np.full(n, 50.0, np.float32),
        kp_idxs=np.arange(n), cam_idxs=np.arange(n),
    )
    from posegen_tpu.data.h5dataset import H5RayDataset

    ds = H5RayDataset(path, n_rays_per_image=8)
    s = ds.sample_image(0)
    assert s["rays_o"].shape == (8, 3)
    ds.close()
