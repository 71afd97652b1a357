"""render_testset CLI smoke test (tiny NeRF + synthetic annotations)."""

import os

import jax
import numpy as np
import pytest


@pytest.mark.slow
def test_render_testset_cli(tmp_path, rng):
    # train nothing: dump a fresh tiny model as a "trained run"
    from posegen_tpu.cli.config import dump_args, nerf_config_parser, parse_with_config
    from posegen_tpu.render.raycast import init_raycaster
    from posegen_tpu.cli.config import args_to_raycast_config, args_to_train_config
    from posegen_tpu.train.checkpoints import save_checkpoint
    from posegen_tpu.train.trainer import create_train_state

    args = parse_with_config(
        nerf_config_parser(),
        ["--netdepth", "2", "--netwidth", "32", "--N_samples", "8",
         "--N_importance", "0", "--expname", "tiny"],
    )
    log_dir = str(tmp_path / "logs")
    dump_args(log_dir, args)
    cfg = args_to_raycast_config(args)
    state = create_train_state(
        init_raycaster(jax.random.PRNGKey(0), cfg), args_to_train_config(args)
    )
    ckpt = save_checkpoint(log_dir, state, step=1)

    # 3DPW-style annotation npz
    annot_dir = tmp_path / "annots"
    annot_dir.mkdir()
    np.savez(
        annot_dir / "seq.npz",
        pose=(rng.standard_normal((5, 72)) * 0.2).astype(np.float32),
    )

    from posegen_tpu.cli.render_testset import main

    out = main([
        "--nerf_args", os.path.join(log_dir, "args.txt"),
        "--ckptpath", ckpt,
        "--annot_dir", str(annot_dir),
        "--outputdir", str(tmp_path / "out"),
        "--render_hw", "64", "--max_poses", "3",
    ])
    assert os.path.exists(os.path.join(out, "image", "00002.png"))
    assert np.load(os.path.join(out, "poses.npy")).shape == (3, 24, 3)
