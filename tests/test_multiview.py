"""Multiview pose sharing: golden parity vs reference load_h36m machinery
+ the multiview PoseOptLayer layout end-to-end."""

import sys

import h5py
import jax
import jax.numpy as jnp
import numpy as np
import pytest

sys.path.insert(0, "tests")
import reference_shims

reference_shims.install()

from posegen_tpu.data.multiview import (
    create_kp_mapping,
    find_motion_set,
    map_data_to_n_views,
)
from posegen_tpu.pose.opt import (
    PoseOptConfig,
    gather_pose_rows,
    init_pose_params,
    kp_reg_loss,
    pose_apply,
    pose_params_to_pose_data,
)
from posegen_tpu.skeleton.skeleton import SMPL_REST_POSE


def _img_paths(n_sets=2, n_views=4, n_frames=3):
    paths = []
    for s in range(n_sets):
        for v in range(n_views):
            for f in range(n_frames):
                paths.append(f"S9/Set{s}/cam{v}/{f:05d}.jpg".encode())
    return paths


def test_motion_set_and_kp_mapping_match_reference():
    """find_motion_set / create_kp_mapping == reference load_h36m.py:251-288
    on shared synthetic path lists."""
    from core.load_h36m import create_kp_mapping as ref_ckm
    from core.load_h36m import find_motion_set as ref_fms

    paths = _img_paths()
    rd, rc, ri = ref_fms(paths)
    od, oc, oi = find_motion_set(paths)
    assert list(rd.keys()) == [k.encode() if isinstance(k, str) else k for k in od]
    assert list(rc.values()) == list(oc.values())
    np.testing.assert_array_equal(ri, oi)

    r_map, r_uidx = ref_ckm(rd, rc, ri, n_views=4)
    o_map, o_uidx = create_kp_mapping(od, oc, oi, n_views=4)
    np.testing.assert_array_equal(r_map, o_map)
    np.testing.assert_array_equal(r_uidx, o_uidx)


def test_map_data_to_n_views_matches_reference(rng):
    """Full remap (kp averaging + skts rebuild) == reference
    map_data_to_n_views (load_h36m.py:306-345) on shared inputs."""
    from core.load_h36m import map_data_to_n_views as ref_map

    paths = _img_paths()
    n = len(paths)
    rest = SMPL_REST_POSE.astype(np.float32)
    bones = (rng.standard_normal((n, 24, 3)) * 0.2).astype(np.float32)
    kp3d = np.tile(rest[None], (n, 1, 1)) + rng.standard_normal(
        (n, 24, 3)
    ).astype(np.float32) * 0.05

    r_map, r_uidx, r_kp, r_bones, r_skts = ref_map(paths, kp3d.copy(), bones.copy(), rest)
    o_map, o_uidx, o_kp, o_bones, o_skts = map_data_to_n_views(
        paths, kp3d.copy(), bones.copy(), rest
    )
    np.testing.assert_array_equal(r_map, o_map)
    np.testing.assert_array_equal(r_uidx, o_uidx)
    np.testing.assert_allclose(o_kp, r_kp, atol=1e-5)
    np.testing.assert_allclose(o_bones, r_bones, atol=1e-5)
    np.testing.assert_allclose(o_skts, r_skts, atol=2e-4)


def test_multiview_pose_params_layout(rng):
    """The multiview param layout (per-view pelvis + root bone, shared
    non-root bones — reference PoseOptLayer.init_kp_params/idx_to_params,
    pose_opt.py:277-333) gathers and FKs identically to the equivalent
    full-table layout."""
    n, u = 8, 2
    kp_map = np.asarray([0, 1, 0, 1, 0, 1, 0, 1])
    kp_uidxs = np.asarray([0, 1])
    bones = (rng.standard_normal((n, 24, 3)) * 0.2).astype(np.float32)
    # non-root bones identical within a shared pose (as after averaging)
    for i in range(n):
        bones[i, 1:] = bones[kp_uidxs[kp_map[i]], 1:]
    kp3d = np.tile(SMPL_REST_POSE[None], (n, 1, 1)).astype(np.float32)
    kp3d += rng.standard_normal(kp3d.shape).astype(np.float32) * 0.05

    pcfg = PoseOptConfig(use_rot6d=True)
    mv_params, mv_anchors = init_pose_params(
        pcfg, bones, kp3d, kp_map=kp_map, kp_uidxs=kp_uidxs
    )
    assert mv_params["bones"].shape == (u, 23, 6)
    assert mv_params["root_bones"].shape == (n, 6)
    full_params, _ = init_pose_params(pcfg, bones, kp3d)

    idx = jnp.asarray([3, 0, 7, 2])
    km = jnp.asarray(kp_map)
    p_mv, b_mv = gather_pose_rows(mv_params, idx, km)
    p_f, b_f = gather_pose_rows(full_params, idx)
    np.testing.assert_allclose(np.asarray(b_mv), np.asarray(b_f), atol=1e-6)
    np.testing.assert_allclose(np.asarray(p_mv), np.asarray(p_f), atol=1e-6)

    rest = jnp.asarray(SMPL_REST_POSE)
    kps_mv, _, skts_mv, _ = pose_apply(mv_params, idx, rest, kp_map=km)
    kps_f, _, skts_f, _ = pose_apply(full_params, idx, rest)
    np.testing.assert_allclose(np.asarray(kps_mv), np.asarray(kps_f), atol=1e-5)

    # anchor loss: zero at anchor; gradient reaches the SHARED table
    assert float(kp_reg_loss(pcfg, mv_params, mv_anchors, idx, km)) < 1e-10
    g = jax.grad(
        lambda p: kp_reg_loss(
            pcfg,
            {**p, "bones": p["bones"] + 0.1},
            mv_anchors, idx, km,
        )
    )(mv_params)
    assert float(jnp.abs(g["bones"]).max()) > 0

    # export expands back to per-frame rows
    data = pose_params_to_pose_data(mv_params, rest, kp_map=km)
    assert data["kp3d"].shape == (n, 24, 3)


def test_multiview_dataset_and_train_step(rng, tmp_path):
    """--multiview end-to-end: H5 with img_paths -> dataset kp_map ->
    pose-opt train step updates the shared bone table."""
    from posegen_tpu.data.h5dataset import H5RayDataset
    from posegen_tpu.data.synthetic import make_synthetic_h5
    from posegen_tpu.render.raycast import RaycastConfig, init_raycaster
    from posegen_tpu.train.trainer import (
        TrainConfig, create_train_state, make_train_step,
    )

    n_sets, n_views, n_frames = 1, 4, 2
    path = make_synthetic_h5(
        str(tmp_path / "mv.h5"), n_images=n_sets * n_views * n_frames, H=32, W=32
    )
    with h5py.File(path, "a") as f:
        f.create_dataset(
            "img_paths", data=np.asarray(_img_paths(n_sets, n_views, n_frames))
        )
    ds = H5RayDataset(path, n_rays_per_image=16, multiview=True)
    assert ds.kp_map is not None and ds.kp_map.shape == (8,)
    assert ds.kp_uidxs.shape == (n_frames,)
    # non-root joints shared across views of the same unique pose
    same = ds.kp_map == ds.kp_map[0]
    spread = np.abs(ds.bones[same][:, 1:] - ds.bones[same][0:1, 1:]).max()
    assert spread < 1e-6, spread

    cfg = RaycastConfig(N_samples=6, N_importance=0, netdepth=2, netwidth=32,
                        multires=4, multires_views=0)
    tcfg = TrainConfig(opt_pose=True, opt_pose_step=1)
    variables = init_raycaster(jax.random.PRNGKey(0), cfg)
    pcfg = PoseOptConfig(use_rot6d=True)
    pose_params, anchors = init_pose_params(
        pcfg, ds.bones, ds.kp3d, kp_map=ds.kp_map, kp_uidxs=ds.kp_uidxs
    )
    state = create_train_state(variables, tcfg, pose_params, anchors)
    step = jax.jit(make_train_step(
        cfg, tcfg, pcfg, rest_pose=jnp.asarray(ds.rest_pose),
        kp_map=jnp.asarray(ds.kp_map), n_frames=8,
    ))
    batch = ds.sample_batch(np.asarray([0, 4, 1, 5]), seed=3)
    batch = {k: jnp.asarray(v) for k, v in batch.items()}
    b0 = np.asarray(state.pose_params["bones"])
    state, stats = step(state, batch, jax.random.PRNGKey(1))
    assert np.isfinite(float(stats["total_loss"]))
    assert not np.allclose(np.asarray(state.pose_params["bones"]), b0), (
        "shared multiview bone table did not update"
    )
    ds.close()


def test_multiview_temporal_loss_uses_frame_count(rng):
    """temporal_loss neighbor wrap must use the FRAME count (pelvis rows),
    not the shared bone table's U rows: for every batch index the multiview
    layout must produce the same loss as the equivalent full-table layout
    (regression: idx >= U used to wrap against unrelated frames)."""
    from posegen_tpu.pose.opt import temporal_loss

    n, u = 8, 2
    kp_map = np.asarray([0, 1, 0, 1, 0, 1, 0, 1])
    kp_uidxs = np.asarray([0, 1])
    bones = (rng.standard_normal((n, 24, 3)) * 0.2).astype(np.float32)
    for i in range(n):
        bones[i, 1:] = bones[kp_uidxs[kp_map[i]], 1:]
    kp3d = np.tile(SMPL_REST_POSE[None], (n, 1, 1)).astype(np.float32)
    kp3d += rng.standard_normal(kp3d.shape).astype(np.float32) * 0.05

    pcfg = PoseOptConfig(use_rot6d=True)
    mv_params, _ = init_pose_params(
        pcfg, bones, kp3d, kp_map=kp_map, kp_uidxs=kp_uidxs
    )
    full_params, _ = init_pose_params(pcfg, bones, kp3d)

    rest = jnp.asarray(SMPL_REST_POSE)
    km = jnp.asarray(kp_map)
    temp_val = jnp.ones((4,), jnp.float32)
    # indices beyond U=2, including the wrap edges 0 and n-1
    idx = jnp.asarray([5, 7, 0, 3])

    kps_f, bones_f, _, _ = pose_apply(full_params, idx, rest)
    loss_full = temporal_loss(
        full_params, idx, temp_val, rest, kps_f, bones_f
    )
    kps_mv, bones_mv, _, _ = pose_apply(mv_params, idx, rest, kp_map=km)
    loss_mv = temporal_loss(
        mv_params, idx, temp_val, rest, kps_mv, bones_mv, kp_map=km
    )
    np.testing.assert_allclose(
        float(loss_mv), float(loss_full), rtol=1e-5,
        err_msg="multiview temporal_loss diverged from the full-table layout",
    )


def test_load_refined_multiview_roundtrip(rng, tmp_path):
    """--load_refined must round-trip a MULTIVIEW pose checkpoint
    ({pelvis, root_bones, bones-with-U-rows}) through the dataset
    (regression: root_bones was dropped and the U-row table frame-indexed)."""
    from posegen_tpu.data.h5dataset import H5RayDataset
    from posegen_tpu.data.synthetic import make_synthetic_h5

    n_sets, n_views, n_frames = 1, 4, 2
    n = n_sets * n_views * n_frames
    path = make_synthetic_h5(str(tmp_path / "mv.h5"), n_images=n, H=32, W=32)
    with h5py.File(path, "a") as f:
        f.create_dataset(
            "img_paths", data=np.asarray(_img_paths(n_sets, n_views, n_frames))
        )

    ds0 = H5RayDataset(path, n_rays_per_image=16, multiview=True)
    pcfg = PoseOptConfig(use_rot6d=True)
    mv_params, _ = init_pose_params(
        pcfg, ds0.bones, ds0.kp3d, kp_map=ds0.kp_map, kp_uidxs=ds0.kp_uidxs
    )
    # refine: nudge the shared table + per-view root rows
    mv_params = {
        "pelvis": mv_params["pelvis"] + 0.01,
        "root_bones": mv_params["root_bones"] + 0.02,
        "bones": mv_params["bones"] + 0.03,
    }
    ckpt = str(tmp_path / "00000010.pose.npz")
    np.savez(
        ckpt,
        **{f"pose_params//{k}": np.asarray(v) for k, v in mv_params.items()},
    )
    rest = jnp.asarray(ds0.rest_pose)
    expect = pose_params_to_pose_data(
        {k: jnp.asarray(v) for k, v in mv_params.items()},
        rest, kp_map=jnp.asarray(ds0.kp_map),
    )
    ds0.close()

    ds = H5RayDataset(
        path, n_rays_per_image=16, multiview=True, load_refined=ckpt
    )
    np.testing.assert_allclose(
        np.asarray(ds.kp3d), expect["kp3d"], atol=1e-5,
        err_msg="refined multiview poses did not round-trip",
    )
    np.testing.assert_allclose(np.asarray(ds.bones), expect["bones"], atol=1e-5)
    ds.close()
