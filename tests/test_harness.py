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


def _tiny_evaluator():
    model = make_random_model(n_vertices=32, n_joints=24, n_betas=10)
    rng = np.random.default_rng(1)
    J_reg = rng.uniform(0, 1, (17, 32)).astype(np.float32)
    J_reg /= J_reg.sum(-1, keepdims=True)
    hmr_params, hmr_state = init_hmr(jax.random.PRNGKey(0))
    return SpinEvaluator(hmr_params, hmr_state, model, J_regressor=J_reg)


def test_ski_dataset_real_schema(tmp_path):
    """SKI labels.h5 (seq/cam/frame/2D/3D) + image tree in the real layout
    (reference ski_dataset, render_3dpw_testset.py:1963-2000)."""
    import h5py
    import imageio.v2 as imageio

    from posegen_tpu.evals.harness import SKI_PRED_J14, SkiDataset

    rng = np.random.default_rng(2)
    n = 3
    root = tmp_path / "ski" / "test"
    seqs, cams, frames = [1, 1, 2], [0, 3, 1], [5, 6, 2]
    for s, c, fr in zip(seqs, cams, frames):
        d = root / f"seq_{s:03d}" / f"cam_{c:02d}"
        d.mkdir(parents=True, exist_ok=True)
        imageio.imwrite(
            d / f"image_{fr:06d}.png",
            rng.integers(0, 255, (48, 48, 3), dtype=np.uint8),
        )
    with h5py.File(root / "labels.h5", "w") as f:
        f["seq"] = np.asarray(seqs)
        f["cam"] = np.asarray(cams)
        f["frame"] = np.asarray(frames)
        f["3D"] = rng.standard_normal((n, 17 * 3)).astype(np.float32)
        f["2D"] = rng.uniform(0, 1, (n, 17 * 2)).astype(np.float32)

    ds = SkiDataset(str(tmp_path / "ski"), split="test", res=32)
    assert len(ds) == n
    item = ds[0]
    assert item["image"].shape == (32, 32, 3)
    assert item["pose_3d"].shape == (14, 3)

    results = _tiny_evaluator().inference_joints(
        ds.batches(batch_size=2), pred_select=SKI_PRED_J14
    )
    assert np.isfinite(results["mpjpe"]) and np.isfinite(results["pa_mpjpe"])
    assert results["pa_mpjpe"] <= results["mpjpe"] + 1e-6


def _make_ski_tree(tmp_path, split="test", n=3, res=48, seed=2):
    import h5py
    import imageio.v2 as imageio

    rng = np.random.default_rng(seed)
    root = tmp_path / "ski" / split
    seqs, cams, frames = [1, 1, 2][:n], [0, 3, 1][:n], [5, 6, 2][:n]
    for s, c, fr in zip(seqs, cams, frames):
        d = root / f"seq_{s:03d}" / f"cam_{c:02d}"
        d.mkdir(parents=True, exist_ok=True)
        imageio.imwrite(
            d / f"image_{fr:06d}.png",
            rng.integers(0, 255, (res, res, 3), dtype=np.uint8),
        )
    with h5py.File(root / "labels.h5", "w") as f:
        f["seq"] = np.asarray(seqs)
        f["cam"] = np.asarray(cams)
        f["frame"] = np.asarray(frames)
        f["3D"] = rng.standard_normal((n, 17 * 3)).astype(np.float32)
        f["2D"] = rng.uniform(0, 1, (n, 17 * 2)).astype(np.float32)
    return str(tmp_path / "ski")


def test_train_ski_step_and_driver(tmp_path):
    """SKI fine-tuning (reference train_ski, render_3dpw_testset.py:
    2659-2775): the mesh-regressed scale-matched loss takes a BN-frozen
    gradient step and the driver runs an epoch over the SKI train split."""
    from posegen_tpu.gen.spin_driver import train_ski
    from posegen_tpu.gen.spin_train import make_ski_finetune_step, ski_pose_loss

    root = _make_ski_tree(tmp_path, split="train2/train", res=32)
    model = make_random_model(n_vertices=32, n_joints=24, n_betas=10)
    rng = np.random.default_rng(1)
    J_reg = rng.uniform(0, 1, (17, 32)).astype(np.float32)
    J_reg /= J_reg.sum(-1, keepdims=True)
    hmr_params, hmr_state = init_hmr(jax.random.PRNGKey(0))

    # loss is finite + scale-invariant in the prediction's global scale
    rotmat = jnp.tile(jnp.eye(3)[None, None], (2, 24, 1, 1))
    betas = jnp.zeros((2, 10))
    gt = jnp.asarray(rng.standard_normal((2, 14, 3)), jnp.float32)
    loss, per = ski_pose_loss(rotmat, betas, gt, model, jnp.asarray(J_reg))
    assert np.isfinite(float(loss)) and per.shape == (2,)

    params2, history = train_ski(
        hmr_params, hmr_state, root, model, J_reg,
        epochs=1, batch_size=3, res=32,
        ckpt_dir=str(tmp_path / "ckpts"),
        evaluator=lambda p, s: {"probe": 1.0},
    )
    assert np.isfinite(history[0]["ski_loss"])
    assert history[0]["eval"] == {"probe": 1.0}
    assert os.path.exists(tmp_path / "ckpts" / "spin_ski_000.npz")
    # the step actually moved the trainable weights
    leaves0 = jax.tree_util.tree_leaves(hmr_params)
    leaves1 = jax.tree_util.tree_leaves(params2)
    assert any(
        not np.allclose(a, b) for a, b in zip(leaves0, leaves1)
    )


def test_hp3d_dataset_real_schema(tmp_path):
    """3DHP in the SPIN dataset-extras npz schema (imgname/center/scale/S)
    (reference BaseDataset, render_3dpw_testset.py:2087-2170)."""
    import imageio.v2 as imageio

    from posegen_tpu.evals.harness import H36M_TO_J17, Hp3dDataset

    rng = np.random.default_rng(3)
    n, res = 3, 48
    img_dir = tmp_path / "imgs"
    img_dir.mkdir()
    names = []
    for i in range(n):
        name = f"S1_Seq1_{i}.jpg"
        imageio.imwrite(
            img_dir / name, rng.integers(0, 255, (res, res, 3), dtype=np.uint8)
        )
        names.append(name)
    np.savez(
        tmp_path / "mpi_inf_3dhp_valid.npz",
        imgname=np.array(names),
        center=np.full((n, 2), res / 2, np.float32),
        scale=np.full((n,), res / 200.0, np.float32),
        S=rng.standard_normal((n, 24, 4)).astype(np.float32),
    )
    ds = Hp3dDataset(str(tmp_path / "mpi_inf_3dhp_valid.npz"), str(img_dir), res=32)
    assert len(ds) == n
    assert ds[0]["pose_3d"].shape == (17, 3)
    results = _tiny_evaluator().inference_joints(
        ds.batches(batch_size=2), pred_select=H36M_TO_J17
    )
    assert np.isfinite(results["mpjpe"])


def test_agora_dataset_and_export(tmp_path):
    """AGORA images + HRNet pkl; exports submission-format prediction pkls
    (reference agora_dataset :1917 / evaluate_agora :2920)."""
    import pickle

    import imageio.v2 as imageio

    from posegen_tpu.evals.harness import AgoraDataset

    rng = np.random.default_rng(4)
    img_dir = tmp_path / "agora"
    img_dir.mkdir()
    entries = []
    for i in range(2):
        name = f"ag_{i}.png"
        imageio.imwrite(
            img_dir / name, rng.integers(0, 255, (64, 64, 3), dtype=np.uint8)
        )
        entries.append({
            "image_name": name,
            "2dpose": rng.uniform(10, 50, (1, 17, 2)).astype(np.float32),
        })
    with open(tmp_path / "dets.pkl", "wb") as f:
        pickle.dump(entries, f)

    ds = AgoraDataset(str(img_dir), str(tmp_path / "dets.pkl"), res=32)
    assert len(ds) == 2
    assert ds[0]["image"].shape == (32, 32, 3)

    out_dir = str(tmp_path / "predictions")
    n = _tiny_evaluator().export_agora_predictions(ds, out_dir)
    assert n == 2
    with open(os.path.join(out_dir, "ag_0_personId_0.pkl"), "rb") as f:
        pred = pickle.load(f)
    assert set(pred) == {"joints", "verts", "allSmplJoints3d"}
    assert pred["allSmplJoints3d"].shape == (24, 3)
