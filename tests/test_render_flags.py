"""Render-surface flag parity: framecode selection, refined poses,
GT/video/no-save outputs, background-composited + render_factor val eval,
multi-subject render selection (reference run_render.py:28-82 flags and
run_nerf.py:557-604 val conventions)."""

import os

import numpy as np
import pytest

import jax
import jax.numpy as jnp


@pytest.fixture
def rng():
    return np.random.default_rng(0)


def _make_ctx(rng, cam=None):
    from posegen_tpu.render.raycast import PoseCtx
    from posegen_tpu.skeleton.geometry import get_kp_bounding_cylinder
    from posegen_tpu.skeleton.kinematics import invert_rigid, smpl_l2ws

    bones = jnp.asarray(rng.standard_normal((1, 24, 3)) * 0.2, jnp.float32)
    l2ws = smpl_l2ws(bones)
    kps = l2ws[..., :3, 3]
    return PoseCtx(
        kps=kps,
        skts=invert_rigid(l2ws),
        bones=bones,
        cyls=get_kp_bounding_cylinder(kps),
        cam_idxs=cam,
    )


def test_render_image_framecode_semantics(rng):
    """render_image uses the REAL per-frame code when ctx carries one and
    the mean code when it does not (reference render_testset cams=cam_idxs,
    run_nerf.py:574; Optcodes idx<0 mean, networks/embedding.py:17-33)."""
    from posegen_tpu.render.image import render_image
    from posegen_tpu.render.raycast import RaycastConfig, init_raycaster

    cfg = RaycastConfig(
        N_samples=8, N_importance=0, netdepth=2, netwidth=32,
        multires=3, multires_views=2, opt_framecode=True, n_framecodes=4,
    )
    params = init_raycaster(jax.random.PRNGKey(0), cfg)
    # lift density so rays accumulate color (codes feed the rgb head only)
    params["coarse"]["alpha_linear"]["b"] = (
        params["coarse"]["alpha_linear"]["b"] + 2.0
    )
    # make the codes LARGE so they dominate the rgb head
    params["coarse"]["framecodes"] = jnp.asarray(
        rng.standard_normal(params["coarse"]["framecodes"].shape) * 3.0,
        jnp.float32,
    )
    c2w = np.eye(4, dtype=np.float32)
    c2w[2, 3] = 2.5

    def render(cam):
        ctx = _make_ctx(np.random.default_rng(0), cam=cam)
        return render_image(cfg, params, 32, 32, 40.0, c2w, ctx, chunk=512)["rgb"]

    rgb_mean = render(None)
    rgb_c0 = render(np.asarray([[0]], np.int32))
    rgb_c3 = render(np.asarray([[3]], np.int32))
    assert np.isfinite(rgb_mean).all()
    # distinct codes give distinct renders; mean differs from both
    assert np.abs(rgb_c0 - rgb_c3).max() > 1e-4
    assert np.abs(rgb_mean - rgb_c0).max() > 1e-4
    # deterministic: same code twice is identical
    np.testing.assert_array_equal(rgb_c0, render(np.asarray([[0]], np.int32)))


def test_evaluate_testset_bg_and_render_factor(rng, tmp_path):
    """Val eval composites GT over the stored backgrounds and honors
    render_factor (render at H//f, bilinear-upsample for metrics) —
    reference run_nerf.py:580-584 + evaluation_helpers.py:309-313."""
    from posegen_tpu.cli.run_nerf import evaluate_testset
    from posegen_tpu.render.raycast import RaycastConfig, init_raycaster
    from posegen_tpu.skeleton.geometry import get_kp_bounding_cylinder
    from posegen_tpu.skeleton.kinematics import invert_rigid, smpl_l2ws
    from posegen_tpu.train.trainer import TrainConfig, create_train_state

    cfg = RaycastConfig(N_samples=8, N_importance=0, netdepth=2, netwidth=32,
                        multires=3, multires_views=2)
    state = create_train_state(
        init_raycaster(jax.random.PRNGKey(0), cfg), TrainConfig()
    )
    H = W = 32
    n = 2
    bones = rng.standard_normal((n, 24, 3)).astype(np.float32) * 0.2
    l2ws = np.asarray(smpl_l2ws(jnp.asarray(bones)))
    kps = l2ws[..., :3, 3]
    c2w = np.eye(4, dtype=np.float32)
    c2w[2, 3] = 2.5
    render_data = {
        "hwf": (H, W, 40.0),
        "imgs": rng.random((n, H, W, 3)).astype(np.float32),
        "masks": (rng.random((n, H, W, 1)) > 0.5).astype(np.float32),
        "bkgds": rng.random((n, H, W, 3)).astype(np.float32),
        "c2ws": np.broadcast_to(c2w, (n, 4, 4)).copy(),
        "focals": np.full((n,), 40.0, np.float32),
        "kp3d": kps,
        "bones": bones,
        "skts": np.asarray(invert_rigid(jnp.asarray(l2ws))),
        "cyls": np.asarray(get_kp_bounding_cylinder(jnp.asarray(kps))),
        "cam_idxs": np.arange(n),
    }
    metrics, rgbs = evaluate_testset(
        cfg, state, render_data, chunk=512, render_factor=2
    )
    assert rgbs.shape == (n, H, W, 3)  # upsampled back to GT resolution
    assert np.isfinite(rgbs).all() and np.isfinite(metrics["psnr"])
    # the background must appear in the GT comparison: against an all-black
    # render, PSNR vs bg-composited GT differs from PSNR vs masked-only GT
    m0, _ = evaluate_testset(cfg, state, render_data, chunk=512)
    rd = dict(render_data)
    rd.pop("bkgds")
    m1, _ = evaluate_testset(cfg, state, rd, chunk=512)
    assert abs(m0["psnr"] - m1["psnr"]) > 1e-4


def _tiny_trained_run(tmp_path, extra_args=()):
    """Random-init checkpoint + args.txt on the synthetic demo dataset."""
    from posegen_tpu.cli.config import (
        args_to_raycast_config, args_to_train_config, dump_args,
        nerf_config_parser, parse_with_config,
    )
    from posegen_tpu.render.raycast import init_raycaster
    from posegen_tpu.train.checkpoints import save_checkpoint
    from posegen_tpu.train.trainer import create_train_state

    args = parse_with_config(
        nerf_config_parser(),
        ["--config", "configs/synthetic/demo.txt",
         "--basedir", str(tmp_path / "logs"),
         "--data_root", str(tmp_path / "data"), *extra_args],
    )
    log_dir = str(tmp_path / "logs" / args.expname)
    dump_args(log_dir, args)
    # materialize the dataset (run_render loads it through the catalog)
    from posegen_tpu.cli.config import args_to_data_config
    from posegen_tpu.data.catalog import load_data

    _, render_data, attrs = load_data(args_to_data_config(args))
    cfg = args_to_raycast_config(
        args, n_framecodes=attrs["n_framecodes"] if args.opt_framecode else 0
    )
    state = create_train_state(
        init_raycaster(jax.random.PRNGKey(0), cfg), args_to_train_config(args)
    )
    ckpt = save_checkpoint(log_dir, state, step=1)
    return log_dir, ckpt, attrs


@pytest.mark.slow
def test_run_render_gt_video_nosave(tmp_path):
    """--save_gt writes GT frames, a render_rgb video is always written,
    --no_save skips the frame/video outputs but keeps eval
    (reference run_render.py:1026-1050, :1032)."""
    from posegen_tpu.cli.run_render import run_render

    log_dir, ckpt, _ = _tiny_trained_run(tmp_path)
    base = [
        "--nerf_args", os.path.join(log_dir, "args.txt"), "--ckptpath", ckpt,
        "--outputdir", str(tmp_path / "ro"), "--render_type", "val",
        "--chunk", "2048",
    ]
    out = run_render(base + ["--runname", "full", "--save_gt", "--fps", "2",
                             "--eval"])
    assert os.path.exists(os.path.join(out, "image", "00000.png"))
    assert os.path.exists(os.path.join(out, "gt", "00000.png"))
    assert os.path.exists(os.path.join(out, "psnr.txt"))
    assert os.path.exists(os.path.join(out, "render_rgb.mp4")) or os.path.exists(
        os.path.join(out, "render_rgb.gif")
    )

    out2 = run_render(base + ["--runname", "quiet", "--no_save", "--eval"])
    assert os.path.exists(os.path.join(out2, "psnr.txt"))  # eval still ran
    assert not os.path.exists(os.path.join(out2, "image"))
    assert not os.path.exists(os.path.join(out2, "render_rgb.gif"))


@pytest.mark.slow
def test_run_render_refined_and_selected_framecode(tmp_path):
    """--render_refined renders from the checkpoint's poseopt state and
    --selected_framecode forces a per-frame code (reference run_render.py:
    136-152, :275-276)."""
    import jax.numpy as jnp

    from posegen_tpu.cli.config import (
        args_to_data_config, args_to_raycast_config, args_to_train_config,
        dump_args, nerf_config_parser, parse_with_config,
    )
    from posegen_tpu.cli.run_render import run_render
    from posegen_tpu.data.catalog import load_data
    from posegen_tpu.pose.opt import PoseOptConfig, init_pose_params
    from posegen_tpu.render.raycast import init_raycaster
    from posegen_tpu.train.checkpoints import save_checkpoint
    from posegen_tpu.train.trainer import create_train_state

    args = parse_with_config(
        nerf_config_parser(),
        ["--config", "configs/synthetic/demo.txt",
         "--basedir", str(tmp_path / "logs"),
         "--data_root", str(tmp_path / "data"),
         "--opt_framecode", "--opt_pose"],
    )
    log_dir = str(tmp_path / "logs" / args.expname)
    dump_args(log_dir, args)
    _, render_data, attrs = load_data(args_to_data_config(args))
    cfg = args_to_raycast_config(args, n_framecodes=attrs["n_framecodes"])
    pose_params, anchors = init_pose_params(
        PoseOptConfig(), attrs["bones"], attrs["kp3d"]
    )
    # refined poses deviate visibly from the H5 poses
    pose_params = {
        "pelvis": pose_params["pelvis"] + 0.05,
        "bones": pose_params["bones"] + 0.1,
    }
    state = create_train_state(
        init_raycaster(jax.random.PRNGKey(0), cfg), args_to_train_config(args),
        {k: jnp.asarray(v) for k, v in pose_params.items()}, anchors,
    )
    ckpt = save_checkpoint(log_dir, state, step=1)

    base = [
        "--nerf_args", os.path.join(log_dir, "args.txt"), "--ckptpath", ckpt,
        "--outputdir", str(tmp_path / "ro"), "--render_type", "val",
        "--chunk", "2048", "--no_save",
    ]

    def img(extra, name):
        out = run_render(base + ["--runname", name] + extra + ["--eval"])
        return float(np.loadtxt(os.path.join(out, "psnr.txt")).reshape(-1)[-1])

    p_plain = img([], "plain")
    p_refined = img(["--render_refined"], "refined")
    p_code = img(["--selected_framecode", "1"], "code1")
    # refined poses and a forced framecode both change the render -> the
    # val PSNR against the fixed GT moves
    assert p_plain != p_refined
    assert p_plain != p_code


def test_load_data_subject_idx(tmp_path, rng):
    """--subject_idx selects which subject's views a multi-subject model
    renders, with globally-offset framecode rows (reference run_render.py:
    282-284 + ConcatH5Dataset cam offsets)."""
    from posegen_tpu.data.catalog import DATASET_CATALOG, DataConfig, load_data
    from posegen_tpu.data.synthetic import make_synthetic_h5

    root = tmp_path / "data" / "synthetic"
    root.mkdir(parents=True)
    make_synthetic_h5(str(root / "demo.h5"), n_images=4, H=48, W=48, seed=1)
    make_synthetic_h5(str(root / "sB.h5"), n_images=4, H=48, W=48, seed=2)
    DATASET_CATALOG["synthetic"]["sB"] = "synthetic/sB.h5"
    try:
        mk = lambda si: DataConfig(
            dataset="synthetic", data_root=str(tmp_path / "data"),
            n_rand=64, n_sample_images=4, multi_subjects=("demo", "sB"),
            num_val_images=2, subject_idx=si,
        )
        _, rd0, _ = load_data(mk(0))
        _, rd1, _ = load_data(mk(1))
        assert not np.allclose(rd0["imgs"], rd1["imgs"])
        # subject 1's framecode AND pose rows sit after subject 0's (the
        # same offsets training batches get; --render_refined indexes the
        # concatenated refined-pose table with these)
        assert rd1["cam_idxs"].min() >= rd0["cam_idxs"].max() + 1
        assert rd1["kp_idxs"].min() >= rd0["kp_idxs"].max() + 1
        with pytest.raises(ValueError):
            load_data(mk(2))
    finally:
        DATASET_CATALOG["synthetic"].pop("sB", None)


def test_render_image_multichip_framecodes(rng):
    """Per-frame codes survive the shard_map render path: an 8-device CPU
    mesh render with ctx.cam_idxs matches single-device, and differs from
    the mean-code render (reference DataParallel rendered with
    cams=cam_idxs too, run_nerf.py:574)."""
    from posegen_tpu.parallel.mesh import auto_render_fn
    from posegen_tpu.render.image import render_image
    from posegen_tpu.render.raycast import RaycastConfig, init_raycaster

    assert jax.device_count() == 8
    cfg = RaycastConfig(
        N_samples=8, N_importance=0, netdepth=2, netwidth=32,
        multires=3, multires_views=2, opt_framecode=True, n_framecodes=4,
    )
    params = init_raycaster(jax.random.PRNGKey(0), cfg)
    params["coarse"]["alpha_linear"]["b"] = (
        params["coarse"]["alpha_linear"]["b"] + 2.0
    )
    params["coarse"]["framecodes"] = jnp.asarray(
        rng.standard_normal(params["coarse"]["framecodes"].shape) * 3.0,
        jnp.float32,
    )
    c2w = np.eye(4, dtype=np.float32)
    c2w[2, 3] = 2.5
    cam = np.asarray([[2]], np.int32)
    ctx_code = _make_ctx(np.random.default_rng(0), cam=cam)
    ctx_mean = _make_ctx(np.random.default_rng(0), cam=None)

    single = render_image(cfg, params, 32, 32, 40.0, c2w, ctx_code, chunk=256)
    render_fn, chunk = auto_render_fn(cfg, 256)
    assert render_fn is not None
    multi = render_image(
        cfg, params, 32, 32, 40.0, c2w, ctx_code, chunk=chunk,
        render_fn=render_fn,
    )
    np.testing.assert_allclose(multi["rgb"], single["rgb"], rtol=1e-3, atol=1e-4)
    multi_mean = render_image(
        cfg, params, 32, 32, 40.0, c2w, ctx_mean, chunk=chunk,
        render_fn=render_fn,
    )
    assert np.abs(multi_mean["rgb"] - multi["rgb"]).max() > 1e-4


def test_evaluate_testset_out_of_range_framecode(rng):
    """A held-out view whose cam idx has no trained framecode row renders
    with the mean code instead of a clamped arbitrary row (--use_val +
    --opt_framecode)."""
    from posegen_tpu.cli.run_nerf import evaluate_testset
    from posegen_tpu.render.raycast import RaycastConfig, init_raycaster
    from posegen_tpu.skeleton.geometry import get_kp_bounding_cylinder
    from posegen_tpu.skeleton.kinematics import invert_rigid, smpl_l2ws
    from posegen_tpu.train.trainer import TrainConfig, create_train_state

    cfg = RaycastConfig(N_samples=8, N_importance=0, netdepth=2, netwidth=32,
                        multires=3, multires_views=2,
                        opt_framecode=True, n_framecodes=3)
    state = create_train_state(
        init_raycaster(jax.random.PRNGKey(0), cfg), TrainConfig()
    )
    state.params["coarse"]["framecodes"] = jnp.asarray(
        rng.standard_normal((3, 16)) * 3.0, jnp.float32
    )
    # lift density out of the ReLU dead zone so rays accumulate color
    state.params["coarse"]["alpha_linear"]["b"] = (
        state.params["coarse"]["alpha_linear"]["b"] + 2.0
    )
    H = W = 24
    bones = rng.standard_normal((1, 24, 3)).astype(np.float32) * 0.2
    l2ws = np.asarray(smpl_l2ws(jnp.asarray(bones)))
    kps = l2ws[..., :3, 3]
    c2w = np.eye(4, dtype=np.float32)
    c2w[2, 3] = 2.5
    rd = {
        "hwf": (H, W, 30.0),
        "imgs": rng.random((1, H, W, 3)).astype(np.float32),
        "masks": np.ones((1, H, W, 1), np.float32),
        "c2ws": c2w[None],
        "focals": np.full((1,), 30.0, np.float32),
        "kp3d": kps, "bones": bones,
        "skts": np.asarray(invert_rigid(jnp.asarray(l2ws))),
        "cyls": np.asarray(get_kp_bounding_cylinder(jnp.asarray(kps))),
        "cam_idxs": np.asarray([7]),  # val view past the 3-row code table
    }
    m_oob, rgb_oob = evaluate_testset(cfg, state, rd, chunk=256)
    assert np.isfinite(rgb_oob).all()
    # identical to an explicit mean-code render, NOT to the clamped row 2
    rd_last = dict(rd, cam_idxs=np.asarray([2]))
    _, rgb_last = evaluate_testset(cfg, state, rd_last, chunk=256)
    assert np.abs(rgb_oob - rgb_last).max() > 1e-5
