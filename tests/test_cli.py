"""CLI tests: config round-trip, train driver, render driver, mesh export."""

import os

import numpy as np
import pytest

from posegen_tpu.cli.config import (
    dump_args,
    nerf_config_parser,
    parse_config_file,
    parse_with_config,
    txt_to_argstring,
)


def test_config_file_parsing(tmp_path):
    cfg = tmp_path / "c.txt"
    cfg.write_text("expname = foo\nN_rand = 128\nuse_cutoff = True\n# comment\n")
    args = parse_with_config(nerf_config_parser(), ["--config", str(cfg)])
    assert args.expname == "foo"
    assert args.N_rand == 128
    assert args.use_cutoff is True
    # CLI overrides config
    args2 = parse_with_config(
        nerf_config_parser(), ["--config", str(cfg), "--N_rand", "64"]
    )
    assert args2.N_rand == 64


def test_args_txt_roundtrip(tmp_path):
    args = parse_with_config(nerf_config_parser(), ["--expname", "rt", "--opt_pose"])
    dump_args(str(tmp_path), args)
    argv = txt_to_argstring(str(tmp_path / "args.txt"))
    args2, _ = nerf_config_parser().parse_known_args(argv)
    assert args2.expname == "rt"
    assert args2.opt_pose is True
    assert args2.N_rand == args.N_rand


def test_reference_configs_parse():
    import glob

    for cfg in sorted(glob.glob("configs/*/*.txt")):
        args = parse_with_config(nerf_config_parser(), ["--config", cfg])
        assert args.N_samples in (12, 64, 96), cfg
    args = parse_with_config(
        nerf_config_parser(), ["--config", "configs/surreal/surreal_single.txt"]
    )
    assert args.single_net and args.N_importance == 48


def test_sched_trajectory_log(tmp_path):
    """Training writes sched.txt with the tau/LR trajectories (the
    long-horizon schedule evidence the 150k soak relies on); values follow
    the reference anneal/decay formulas."""
    from posegen_tpu.cli.run_nerf import train

    log_dir = train([
        "--config", "configs/synthetic/demo.txt",
        "--basedir", str(tmp_path / "logs"),
        "--data_root", str(tmp_path / "data"),
        "--n_iters", "4", "--i_weights", "0", "--i_testset", "0",
        "--i_print", "2", "--N_rand", "32", "--n_devices", "1",
    ])
    lines = open(os.path.join(log_dir, "sched.txt")).read().splitlines()
    assert len(lines) == 2
    row = dict(kv.split("=") for kv in lines[-1].split("\t")[1:])
    assert lines[-1].startswith("4\t")
    # demo config: lrate 5e-3, decay 250 (x1000 units); tau init 20, 10x
    # per cutoff_step*250000... the anneal has moved off exactly 20
    # %.6g formatting granularity bounds the match at ~1e-8
    assert abs(float(row["lrate"]) - 5e-3 * 0.1 ** (4 / 250000)) < 1e-7
    assert 20.0 < float(row["tau"]) < 20.01


@pytest.mark.slow
def test_train_and_render_cli(tmp_path):
    """The full CLI slice: train 60 iters on synthetic, then run_render val
    with eval, then mesh extraction — all from the dumped args.txt."""
    from posegen_tpu.cli.run_nerf import train

    log_dir = train([
        "--config", "configs/synthetic/demo.txt",
        "--basedir", str(tmp_path / "logs"),
        "--data_root", str(tmp_path / "data"),
        "--n_iters", "60", "--i_weights", "60", "--i_testset", "60",
        "--i_print", "30", "--N_rand", "128", "--n_devices", "1",
    ])
    assert os.path.exists(os.path.join(log_dir, "args.txt"))
    ckpts = [f for f in os.listdir(log_dir) if f.endswith(".ckpt.npz")]
    assert ckpts, "no checkpoint written"
    assert os.path.exists(os.path.join(log_dir, "psnr.txt"))

    from posegen_tpu.cli.run_render import run_render

    out_dir = run_render([
        "--nerf_args", os.path.join(log_dir, "args.txt"),
        "--ckptpath", os.path.join(log_dir, sorted(ckpts)[-1]),
        "--outputdir", str(tmp_path / "render_output"),
        "--runname", "val_test", "--render_type", "val", "--eval",
        "--chunk", "2048",
    ])
    assert os.path.exists(os.path.join(out_dir, "image", "00000.png"))
    assert os.path.exists(os.path.join(out_dir, "psnr.txt"))

    out_dir2 = run_render([
        "--nerf_args", os.path.join(log_dir, "args.txt"),
        "--ckptpath", os.path.join(log_dir, sorted(ckpts)[-1]),
        "--outputdir", str(tmp_path / "render_output"),
        "--runname", "mesh_test", "--render_type", "mesh",
        "--mesh_res", "24", "--mesh_thres", "5.0",
    ])
    assert os.path.exists(os.path.join(out_dir2, "mesh.ply"))


def test_marching_tetrahedra_sphere():
    from posegen_tpu.render.mesh import marching_tetrahedra, save_ply

    n = 24
    t = np.linspace(-1, 1, n)
    x, y, z = np.meshgrid(t, t, t, indexing="ij")
    field = 0.5**2 - (x**2 + y**2 + z**2)  # inside sphere > 0
    verts, faces = marching_tetrahedra(field, iso=0.0, origin=(-1, -1, -1),
                                       spacing=2.0 / (n - 1))
    assert len(verts) > 100 and len(faces) > 100
    r = np.linalg.norm(verts, axis=-1)
    np.testing.assert_allclose(r, 0.5, atol=0.08)


def test_gan_cli_smoke(tmp_path):
    from posegen_tpu.cli.run_gan import main

    trainer = main([
        "--epochs", "1", "--batch_size", "8", "--seed", "0",
        "--outputdir", str(tmp_path), "--runname", "smoke",
    ])
    assert trainer.iter_num > 0


@pytest.mark.slow
def test_render_modes(tmp_path):
    """animate / poserot / selected / bullet / interpolate modes all render."""
    import jax

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
         "--basedir", str(tmp_path / "logs"), "--data_root", str(tmp_path / "data")],
    )
    log_dir = str(tmp_path / "logs" / args.expname)
    dump_args(log_dir, args)
    cfg = args_to_raycast_config(args)
    state = create_train_state(
        init_raycaster(jax.random.PRNGKey(0), cfg), args_to_train_config(args)
    )
    ckpt = save_checkpoint(log_dir, state, step=1)

    from posegen_tpu.cli.run_render import run_render

    for mode, extra in (
        ("poserot", ["--bullet_n", "2"]),
        ("selected", ["--selected_idxs", "0", "3"]),
        ("animate", ["--selected_idxs", "0", "1", "2"]),
    ):
        out = run_render([
            "--nerf_args", os.path.join(log_dir, "args.txt"),
            "--ckptpath", ckpt,
            "--outputdir", str(tmp_path / "ro"), "--runname", mode,
            "--render_type", mode, "--chunk", "2048",
        ] + extra)
        assert os.path.exists(os.path.join(out, "image", "00000.png")), mode


@pytest.mark.slow
def test_render_bubble_and_correction(tmp_path):
    """bubble (camera wobble) and correction (init->refined morph) modes
    (reference run_render.py:805-870 load_bubble, :484-515 load_correction)."""
    import jax
    import jax.numpy as jnp

    from posegen_tpu.cli.config import (
        args_to_raycast_config, args_to_train_config, dump_args,
        nerf_config_parser, parse_with_config,
    )
    from posegen_tpu.cli.run_render import run_render
    from posegen_tpu.pose.opt import PoseOptConfig, init_pose_params
    from posegen_tpu.render.raycast import init_raycaster
    from posegen_tpu.train.checkpoints import save_checkpoint, save_pose_checkpoint
    from posegen_tpu.train.trainer import create_train_state

    args = parse_with_config(
        nerf_config_parser(),
        ["--config", "configs/synthetic/demo.txt",
         "--basedir", str(tmp_path / "logs"), "--data_root", str(tmp_path / "data")],
    )
    log_dir = str(tmp_path / "logs" / args.expname)
    dump_args(log_dir, args)
    cfg = args_to_raycast_config(args)

    # a refined-pose checkpoint derived from the synthetic dataset's poses
    from posegen_tpu.cli.config import args_to_data_config
    from posegen_tpu.data.catalog import load_data

    _, render_data, attrs = load_data(args_to_data_config(args))
    pose_params, anchors = init_pose_params(
        PoseOptConfig(), attrs["bones"], attrs["kp3d"]
    )
    pose_params = {
        "pelvis": pose_params["pelvis"] + 0.01,
        "bones": pose_params["bones"] + 0.05,
    }
    tcfg = args_to_train_config(args)
    state = create_train_state(
        init_raycaster(jax.random.PRNGKey(0), cfg), tcfg,
        {k: jnp.asarray(v) for k, v in pose_params.items()}, anchors,
    )
    ckpt = save_checkpoint(log_dir, state, step=1)
    pose_ckpt = save_pose_checkpoint(log_dir, state, step=1)

    out = run_render([
        "--nerf_args", os.path.join(log_dir, "args.txt"), "--ckptpath", ckpt,
        "--outputdir", str(tmp_path / "ro"), "--runname", "bub",
        "--render_type", "bubble", "--n_step", "2", "--chunk", "2048",
        "--save_extras",
    ])
    assert os.path.exists(os.path.join(out, "image", "00001.png"))
    for extra in ("acc", "disp", "skel"):
        assert os.path.exists(os.path.join(out, extra, "00000.png")), extra

    out = run_render([
        "--nerf_args", os.path.join(log_dir, "args.txt"), "--ckptpath", ckpt,
        "--outputdir", str(tmp_path / "ro"), "--runname", "corr",
        "--render_type", "correction", "--n_step", "2", "--chunk", "2048",
        "--refined_ckpt", pose_ckpt, "--selected_idxs", "0",
    ])
    assert os.path.exists(os.path.join(out, "image", "00001.png"))


@pytest.mark.slow
def test_i_video_writes_gifs(tmp_path):
    """--i_video renders a bullet-time turn-around to rgb/disp GIFs
    (reference i_video render_poses videos, run_nerf.py:557-604)."""
    from posegen_tpu.cli.run_nerf import train

    log_dir = train([
        "--config", "configs/synthetic/demo.txt",
        "--basedir", str(tmp_path / "logs"),
        "--data_root", str(tmp_path / "data"),
        "--n_iters", "4", "--i_weights", "4", "--i_testset", "4",
        "--i_video", "4", "--i_print", "4", "--N_rand", "64",
        "--n_devices", "1",
    ])
    assert os.path.exists(os.path.join(log_dir, "spiral_000004_rgb.gif"))
    assert os.path.exists(os.path.join(log_dir, "spiral_000004_disp.gif"))


@pytest.mark.slow
def test_no_poseopt_reload(tmp_path, capsys):
    """--no_poseopt_reload resumes NeRF weights but restarts pose state
    from the dataset estimates (reference create_popt, pose_opt.py:51-60)."""
    from posegen_tpu.cli.run_nerf import train

    base = [
        "--config", "configs/synthetic/demo.txt",
        "--basedir", str(tmp_path / "logs"),
        "--data_root", str(tmp_path / "data"),
        "--i_weights", "2", "--i_print", "2", "--N_rand", "64",
        "--n_devices", "1", "--opt_pose", "--opt_pose_step", "1",
        "--opt_pose_lrate", "0.01",
    ]
    train(base + ["--n_iters", "2"])
    capsys.readouterr()
    train(base + ["--n_iters", "4", "--no_poseopt_reload"])
    out = capsys.readouterr().out
    assert "poseopt state NOT restored" in out
