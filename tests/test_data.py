"""Data layer tests: H5 schema, pixel sampling, loader batches, catalog."""

import numpy as np
import pytest

from posegen_tpu.data.catalog import DataConfig, load_data
from posegen_tpu.data.h5dataset import ConcatRayDataset, H5RayDataset, RayBatchLoader
from posegen_tpu.data.synthetic import make_synthetic_h5
from posegen_tpu.data.writer import dilate_masks


@pytest.fixture(scope="module")
def h5_path(tmp_path_factory):
    p = tmp_path_factory.mktemp("data") / "demo.h5"
    return make_synthetic_h5(str(p), n_images=6, H=48, W=48)


def test_dilate_masks():
    m = np.zeros((1, 9, 9, 1), np.uint8)
    m[0, 4, 4, 0] = 1
    d = dilate_masks(m, kernel=3, iters=1)
    assert d.sum() == 9  # 3x3 neighborhood


def test_dataset_sample_shapes(h5_path):
    ds = H5RayDataset(h5_path, n_rays_per_image=32)
    s = ds.sample_image(0)
    assert s["rays_o"].shape == (32, 3)
    assert s["rays_d"].shape == (32, 3)
    assert s["target_s"].shape == (32, 3)
    # pose arrays are per-image rows (one row per sampled image)
    assert s["skts"].shape == (1, 24, 4, 4)
    assert s["cyls"].shape == (1, 5)
    assert s["kp_idx"].shape == (1,)  # per image GROUP
    # sampled pixels mostly on the person (dilated mask)
    assert s["fgs"].mean() > 0.4
    ds.close()


def test_rays_hit_subject(h5_path):
    """Sampled rays must pass near the subject's cylinder (geometry check)."""
    ds = H5RayDataset(h5_path, n_rays_per_image=64)
    s = ds.sample_image(2)
    cyl = s["cyls"][0]
    center = np.array([cyl[0], 0.0, cyl[1]])
    o, d = s["rays_o"], s["rays_d"]
    # distance from cylinder axis (xz only) at closest approach
    oc = (center - o)[:, [0, 2]]
    dd = d[:, [0, 2]]
    t = np.sum(oc * dd, -1) / np.maximum(np.sum(dd * dd, -1), 1e-9)
    closest = o[:, [0, 2]] + dd * t[:, None] - center[[0, 2]]
    dist = np.linalg.norm(closest, axis=-1)
    assert np.quantile(dist, 0.8) < cyl[2] * 1.5, "rays don't aim at the subject"
    ds.close()


def test_patch_and_box_sampling(h5_path):
    ds = H5RayDataset(h5_path, n_rays_per_image=36, patch_size=3)
    s = ds.sample_image(0)
    assert s["rays_o"].shape[0] == 36
    ds2 = H5RayDataset(h5_path, n_rays_per_image=32, n_box_rays=8)
    s2 = ds2.sample_image(0)
    assert s2["rays_o"].shape[0] == 32
    ds.close(), ds2.close()


def test_loader_batches(h5_path):
    ds = H5RayDataset(h5_path, n_rays_per_image=16)
    loader = RayBatchLoader(ds, n_images_per_batch=4)
    b = loader.make_batch()
    assert b["rays_o"].shape == (64, 3)
    assert b["cam_idxs"].shape == (64, 1)
    # prefetch thread path
    it = iter(loader)
    b2 = next(it)
    assert b2["rays_o"].shape == (64, 3)
    loader.close()
    ds.close()


def test_concat_dataset(h5_path, tmp_path):
    p2 = make_synthetic_h5(str(tmp_path / "s2.h5"), n_images=4, H=48, W=48, seed=3)
    ds = ConcatRayDataset([H5RayDataset(h5_path, 8), H5RayDataset(p2, 8)])
    assert ds.n_images == 10
    s = ds.sample_image(7)  # second subject, local idx 1
    assert int(s["subject_idxs"][0]) == 1
    assert int(s["kp_idx"][0]) >= 6  # offset past subject 0's poses


def test_load_data_dispatch(tmp_path):
    cfg = DataConfig(
        dataset="synthetic",
        subject="demo",
        data_root=str(tmp_path),
        n_rand=64,
        n_sample_images=4,
        num_val_images=2,
    )
    loader, render_data, attrs = load_data(cfg)
    b = loader.make_batch()
    assert b["rays_o"].shape == (64, 3)
    assert render_data["imgs"].shape[0] == 2
    assert attrs["n_framecodes"] >= 1
    assert attrs["rest_pose"].shape == (24, 3)


def test_refined_pose_load(h5_path, tmp_path):
    """PoseRefinedDataset analog: poses overwritten from a pose ckpt."""
    ds0 = H5RayDataset(h5_path, 8)
    n_kp = ds0.kp3d.shape[0]
    refined = {
        "pose_params//pelvis": ds0.kp3d[:, 0] + 0.1,
        "pose_params//bones": ds0.bones * 0.5,
    }
    p = tmp_path / "pose.ckpt.npz"
    np.savez(p, **refined)
    ds = H5RayDataset(h5_path, 8, load_refined=str(p))
    assert not np.allclose(ds.kp3d, ds0.kp3d)
    assert np.allclose(ds.bones, ds0.bones * 0.5)
    s = ds.sample_image(0)
    assert np.isfinite(s["skts"]).all()
    ds.close(), ds0.close()


def test_multi_subject_training_batches(h5_path, tmp_path):
    """ConcatRayDataset batches train end-to-end (framecode offsets intact)."""
    import jax
    import jax.numpy as jnp

    from posegen_tpu.data.catalog import DataConfig, load_data
    from posegen_tpu.data.synthetic import make_synthetic_h5
    from posegen_tpu.render.raycast import RaycastConfig, init_raycaster
    from posegen_tpu.train.trainer import TrainConfig, create_train_state, make_train_step

    # build a second subject next to the shared module-scoped one
    import os, shutil

    root = tmp_path / "data" / "synthetic"
    root.mkdir(parents=True)
    shutil.copy(h5_path, root / "demo.h5")
    make_synthetic_h5(str(root / "s2.h5"), n_images=4, H=48, W=48, seed=9)
    from posegen_tpu.data.catalog import DATASET_CATALOG

    DATASET_CATALOG["synthetic"]["s2"] = "synthetic/s2.h5"
    try:
        dcfg = DataConfig(
            dataset="synthetic", data_root=str(tmp_path / "data"),
            n_rand=64, n_sample_images=4, multi_subjects=("demo", "s2"),
        )
        loader, _, attrs = load_data(dcfg)
        b = loader.make_batch()
        assert "subject_idxs" in b
        assert b["kp3d"].shape[0] == 4  # grouped pose rows

        cfg = RaycastConfig(
            N_samples=8, N_importance=4, netdepth=2, netwidth=32,
            opt_framecode=True, n_framecodes=attrs["n_framecodes"],
        )
        tcfg = TrainConfig()
        state = create_train_state(init_raycaster(jax.random.PRNGKey(0), cfg), tcfg)
        step = jax.jit(make_train_step(cfg, tcfg))
        batch = {k: jnp.asarray(v) for k, v in b.items() if k != "subject_idxs"}
        state, stats = step(state, batch, jax.random.PRNGKey(0))
        assert np.isfinite(float(stats["total_loss"]))
        loader.close()
    finally:
        DATASET_CATALOG["synthetic"].pop("s2", None)


def test_loader_multiprocess(tmp_path):
    """num_workers > 0 builds batches in worker processes (the reference's
    DataLoader(num_workers=16), load_data.py:78): same schema/shapes as the
    in-process path, clean shutdown."""
    from posegen_tpu.data.h5dataset import H5RayDataset, RayBatchLoader
    from posegen_tpu.data.synthetic import make_synthetic_h5

    path = str(tmp_path / "d.h5")
    make_synthetic_h5(path, n_images=6, H=32, W=32)

    ds = H5RayDataset(path, n_rays_per_image=16)
    ref_loader = RayBatchLoader(ds, n_images_per_batch=4, seed=0)
    ref_batch = ref_loader.make_batch()

    # the loader caps workers at cpu_count - 1 (and would fall back to the
    # thread path on this 1-core host); pretend we have cores so the actual
    # worker-process machinery runs
    import os

    real_cpu_count = os.cpu_count
    os.cpu_count = lambda: 4
    mp_loader = RayBatchLoader(
        H5RayDataset(path, n_rays_per_image=16),
        n_images_per_batch=4, seed=0, num_workers=2,
    )
    try:
        it = iter(mp_loader)
        assert len(mp_loader._procs) == 2, "worker processes did not start"
        batches = [next(it) for _ in range(5)]
    finally:
        mp_loader.close()
        os.cpu_count = real_cpu_count

    for b in batches:
        assert set(b) == set(ref_batch)
        for k in b:
            assert b[k].shape == ref_batch[k].shape, k
            assert np.isfinite(np.asarray(b[k], np.float32)).all(), k
    ref_loader.close()


def test_camera_subset(h5_path):
    """--camera trains on one camera's images only (reference --camera /
    load_h36m camera_name variants): metadata remapped, pixel reads follow
    the original file rows."""
    full = H5RayDataset(h5_path, n_rays_per_image=8)
    cam = int(full.cam_idxs[2])
    n_expect = int((full.cam_idxs == cam).sum())

    sub = H5RayDataset(h5_path, n_rays_per_image=8, camera=cam)
    assert sub.n_images == n_expect
    assert (sub.cam_idxs == cam).all()
    s = sub.sample_image(0)
    assert np.isfinite(s["rays_o"]).all()
    # the subset's image 0 must be the file row of the first matching image
    row = int(np.flatnonzero(full.cam_idxs == cam)[0])
    np.testing.assert_array_equal(sub.c2ws[0], full.c2ws[row])
    rd = sub.get_render_data([0])
    f_rd = full.get_render_data([row])
    np.testing.assert_array_equal(rd["imgs"], f_rd["imgs"])
    with pytest.raises(ValueError, match="selects no images"):
        H5RayDataset(h5_path, n_rays_per_image=8, camera=10**6)
    sub.close(), full.close()


def test_subset_kps_selection(tmp_path, rng):
    """--rand_train_kps analog: training restricted to a kp-index subset
    (reference SurrealDataset N_rand_kps side-files, load_surreal.py:320-364)."""
    import numpy as np

    from posegen_tpu.data.h5dataset import H5RayDataset
    from posegen_tpu.data.synthetic import make_synthetic_h5

    path = make_synthetic_h5(str(tmp_path / "s.h5"), n_images=8, H=32, W=32)
    keys = np.asarray([1, 3, 5])
    np.save(tmp_path / "subset.npy", keys)
    ds = H5RayDataset(
        path, n_rays_per_image=8, subset_kps=str(tmp_path / "subset.npy")
    )
    assert ds.n_images == 3
    assert set(ds.kp_idxs.tolist()) <= set(keys.tolist())
    # sampling works through the remap (both fast and slow paths)
    out = ds.sample_image(0)
    assert out["rays_o"].shape == (8, 3)
    fast = ds.sample_batch(np.asarray([0, 1, 2]), seed=0)
    if fast is not None:
        assert fast["kp_idx"].tolist() == ds.kp_idxs.tolist()
    ds.close()


def test_concat_dataset_fast_batch(tmp_path, rng):
    """ConcatRayDataset routes batches through the children's zero-copy
    native path with kp/cam offsets and subject ids preserved."""
    import numpy as np

    from posegen_tpu.data.h5dataset import ConcatRayDataset, H5RayDataset
    from posegen_tpu.data.synthetic import make_synthetic_h5

    ds = ConcatRayDataset([
        H5RayDataset(
            make_synthetic_h5(str(tmp_path / f"c{i}.h5"), n_images=4, H=32, W=32),
            n_rays_per_image=8,
        )
        for i in range(2)
    ])
    idxs = np.asarray([0, 5, 3, 7])  # mixed children, arbitrary order
    fast = ds.sample_batch(idxs, seed=11)
    assert fast is not None
    slow_parts = [ds.sample_image(int(i)) for i in idxs]
    slow = {k: np.concatenate([p[k] for p in slow_parts]) for k in slow_parts[0]}
    assert set(fast) == set(slow)
    for k in ("kp_idx", "cam_idxs", "subject_idxs", "kp3d", "skts", "temp_val"):
        np.testing.assert_array_equal(fast[k], slow[k], err_msg=k)
    assert fast["rays_o"].shape == slow["rays_o"].shape


def test_multihost_loader_sharding(h5_path):
    """Multi-host input sharding (the DCN role on pods; the reference is
    single-process): hosts share one global permutation and take disjoint
    strided slices, so each epoch's images are partitioned across hosts;
    pixel RNG streams are host-distinct; single-host behavior unchanged."""
    ds = H5RayDataset(h5_path, 4)
    n = ds.n_images  # 6

    l0 = RayBatchLoader(ds, n_images_per_batch=3, seed=7,
                        process_index=0, process_count=2)
    l1 = RayBatchLoader(ds, n_images_per_batch=3, seed=7,
                        process_index=1, process_count=2)
    i0, i1 = l0._next_idxs(), l1._next_idxs()
    # one global epoch (6 images) split 3/3, disjoint, covering everything
    assert set(i0) | set(i1) == set(range(n))
    assert set(i0) & set(i1) == set()
    # next epoch partitions again
    j0, j1 = l0._next_idxs(), l1._next_idxs()
    assert set(j0) & set(j1) == set()

    # host-distinct pixel streams: same image set, different rays
    b0 = l0._batch_for(np.arange(3), l0.rng)
    b1 = l1._batch_for(np.arange(3), l1.rng)
    assert b0["rays_o"].shape == b1["rays_o"].shape
    assert not np.allclose(b0["target_s"], b1["target_s"])

    # single-host path: two identically-seeded loaders stay identical
    a = RayBatchLoader(ds, n_images_per_batch=3, seed=7)
    b = RayBatchLoader(ds, n_images_per_batch=3, seed=7)
    np.testing.assert_array_equal(a._next_idxs(), b._next_idxs())
    with pytest.raises(ValueError):
        RayBatchLoader(ds, process_index=2, process_count=2)
    ds.close()


def test_n_cams_subset(h5_path):
    """--N_cams keeps the reference's fixed camera trio [0, 3, 6]
    (load_surreal.py:364 selected_cams) instead of only warning."""
    ds_all = H5RayDataset(h5_path, 8)
    ds3 = H5RayDataset(h5_path, 8, n_cams=3)
    # synthetic demo: cam_idxs = arange(6) -> cams {0, 3} survive
    assert set(ds3.cam_idxs.tolist()) == (
        set(ds_all.cam_idxs.tolist()) & {0, 3, 6}
    )
    assert ds3.n_images < ds_all.n_images
    s = ds3.sample_image(0)
    assert np.isfinite(s["rays_o"]).all()
    # n_cams >= total cameras is a no-op
    ds_full = H5RayDataset(h5_path, 8, n_cams=99)
    assert ds_full.n_images == ds_all.n_images
    for d in (ds_all, ds3, ds_full):
        d.close()


def test_use_val_split(h5_path, tmp_path):
    """--use_val: h36m-style sequence-prefix train/val split (reference
    load_h36m.py:384-417 val_sets) and catalog routing of held-out views."""
    import shutil

    import h5py

    p = tmp_path / "data" / "synthetic" / "uv.h5"
    p.parent.mkdir(parents=True)
    shutil.copy(h5_path, p)
    with h5py.File(p, "r+") as f:
        paths = [
            f"images/{'Walking-1' if i % 3 == 0 else 'Directions-1'}/{i:04d}.png"
            for i in range(6)
        ]
        f["img_paths"] = np.array([s.encode() for s in paths])

    tr = H5RayDataset(str(p), 8, split="train")
    va = H5RayDataset(str(p), 8, split="val")
    plain = H5RayDataset(str(p), 8)
    assert plain.n_images == 6
    assert tr.n_images == 4 and va.n_images == 2
    assert set(tr._img_map) & set(va._img_map) == set()
    assert set(tr._img_map) | set(va._img_map) == set(range(6))
    s = tr.sample_image(0)
    assert np.isfinite(s["rays_o"]).all()
    for d in (tr, va, plain):
        d.close()

    # catalog: training draws from the train split, held-out render views
    # come from the val split
    from posegen_tpu.data.catalog import DATASET_CATALOG, DataConfig, load_data

    DATASET_CATALOG["synthetic"]["uv"] = "synthetic/uv.h5"
    try:
        loader, render_data, attrs = load_data(DataConfig(
            dataset="synthetic", subject="uv", data_root=str(tmp_path / "data"),
            n_rand=32, n_sample_images=2, use_val=True, num_val_images=2,
        ))
        assert attrs["n_images"] == 4  # trains on the train split
        assert render_data["imgs"].shape[0] == 2  # val views held out
        b = loader.make_batch()
        assert b["rays_o"].shape == (32, 3)
        # the split needs img_paths: a plain H5 errors loudly
        with pytest.raises(ValueError, match="img_paths"):
            H5RayDataset(h5_path, 8, split="train")
    finally:
        DATASET_CATALOG["synthetic"].pop("uv", None)
