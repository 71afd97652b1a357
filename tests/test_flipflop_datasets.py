"""FlipFlop scheduler + gen dataset tests."""

import os

import numpy as np
import pytest

from posegen_tpu.gen.datasets import (
    MixedSpinDataset,
    MPIIPoseDataset,
    RenderedPoseDataset,
    load_amass_pool,
    load_target_2d,
    pose_batches,
)
from posegen_tpu.pose.flipflop import FlipFlopConfig, PoseOptFlipFlop


def test_flipflop_alternates():
    ff = PoseOptFlipFlop(FlipFlopConfig(opt_pose_interval=5), n_kps=4)
    actives = [ff.step(i) for i in range(15)]
    nerf = [a[0] for a in actives]
    pose = [a[1] for a in actives]
    # starts NeRF-only, flips every 5
    assert nerf[:5] == [True] * 5 and pose[:5] == [False] * 5
    assert pose[5:10] == [True] * 5 and nerf[5:10] == [False] * 5
    assert nerf[10:15] == [True] * 5


def test_flipflop_warmup_stop_joint():
    ff = PoseOptFlipFlop(
        FlipFlopConfig(opt_pose_joint=True, opt_pose_warmup=3, opt_pose_stop=8,
                       opt_pose_interval=0),
        n_kps=4,
    )
    assert ff.step(0) == (True, False)  # warmup: pose off
    assert ff.step(4) == (True, True)
    assert ff.step(9) == (True, False)  # past stop


def test_flipflop_loss_tracker():
    ff = PoseOptFlipFlop(FlipFlopConfig(), n_kps=4)
    ff.accumulate_loss(np.array([1.0, 2.0, 3.0]), np.array([0, 0, 2]))
    # frame 0 got 2 rays summing 3.0; CMA update from init 10
    assert ff.kp_loss_tracker[0] < 10.0
    assert ff.worst_frames(1)[0] in (1, 3)  # untouched frames stay at 10


def test_amass_pool_and_batches(tmp_path, rng):
    poses = rng.standard_normal((100, 72)).astype(np.float32)
    np.savez(tmp_path / "amass.npz", pose3d=poses)
    pool = load_amass_pool(str(tmp_path / "amass.npz"), subsample=10)
    assert pool.shape == (10, 24, 3)
    batches = list(pose_batches(pool, 4))
    assert len(batches) == 2 and batches[0].shape == (4, 24, 3)

    np.savez(tmp_path / "t2d.npz", pose2d=rng.standard_normal((3, 24, 2)).astype(np.float32))
    t2d = load_target_2d(str(tmp_path / "t2d.npz"), repeats=5)
    assert t2d.shape == (15, 24, 2)


def test_rendered_and_mixed_datasets(tmp_path, rng):
    import imageio.v2 as imageio

    out = tmp_path / "render_output"
    (out / "image").mkdir(parents=True)
    n = 4
    bones = (rng.standard_normal((n, 24, 3)) * 0.2).astype(np.float32)
    np.save(out / "poses_axis_angles0.npy", bones)
    for i in range(n):
        imageio.imwrite(
            out / "image" / f"{i:05d}.png",
            rng.integers(0, 255, (128, 128, 3), dtype=np.uint8),
        )
    ds = RenderedPoseDataset(str(out), crop=(16, 112), res=32)
    assert len(ds) == n
    item = ds[1]
    assert item["image"].shape == (32, 32, 3)
    assert item["pose"].shape == (24, 3)
    b = next(ds.batches(batch_size=2))
    assert b["image"].shape == (2, 32, 32, 3)

    # MPII annots
    img_dir = tmp_path / "mpii"
    img_dir.mkdir()
    names = []
    for i in range(2):
        name = f"m{i}.png"
        imageio.imwrite(img_dir / name, rng.integers(0, 255, (96, 96, 3), dtype=np.uint8))
        names.append(name)
    np.savez(
        tmp_path / "mpii.npz",
        pose=(rng.standard_normal((2, 72)) * 0.2).astype(np.float32),
        imgname=np.array(names),
        center=np.full((2, 2), 48.0, np.float32),
        scale=np.full((2,), 0.4, np.float32),
    )
    mpii = MPIIPoseDataset(str(tmp_path / "mpii.npz"), str(img_dir), res=32)
    assert mpii[0]["image"].shape == (32, 32, 3)

    mixed = MixedSpinDataset(mpii, ds, frac=2)
    assert len(mixed) > 0
    a, b2 = mixed[0], mixed[1]  # mpii then nerf
    assert a["pose"].shape == (24, 3) and b2["pose"].shape == (24, 3)


def test_amass_pool_fallback_key(tmp_path, rng):
    """npz without a 'pose3d' key falls back to its first array (matching
    load_target_2d) instead of crashing on a 0-d object array."""
    poses = rng.standard_normal((40, 72)).astype(np.float32)
    np.savez(tmp_path / "amass2.npz", poses=poses)
    pool = load_amass_pool(str(tmp_path / "amass2.npz"), subsample=10)
    assert pool.shape == (4, 24, 3)
    # plain .npy also accepted
    np.save(tmp_path / "amass3.npy", poses)
    pool = load_amass_pool(str(tmp_path / "amass3.npy"), subsample=10)
    assert pool.shape == (4, 24, 3)


def test_rendered_dataset_warns_on_stale_sink(tmp_path, rng):
    """A reused output_dir (more pose rows than pngs) warns loudly about
    possibly mismatched (image, pose) pairs."""
    import warnings

    import imageio.v2 as imageio

    out = tmp_path / "render_output"
    (out / "image").mkdir(parents=True)
    np.save(out / "poses_axis_angles0.npy",
            (rng.standard_normal((6, 24, 3)) * 0.2).astype(np.float32))
    for i in range(2):  # fewer pngs than pose rows
        imageio.imwrite(
            out / "image" / f"{i:05d}.png",
            rng.integers(0, 255, (64, 64, 3), dtype=np.uint8),
        )
    with warnings.catch_warnings(record=True) as w:
        warnings.simplefilter("always")
        ds = RenderedPoseDataset(str(out), crop=(8, 56), res=32)
    assert len(ds) == 2
    assert any("stale" in str(x.message) for x in w)
