"""Config system: argparse + reference-style text config files.

Capability parity with the reference's configargparse usage
(run_nerf.py:186-490 config_parser; configs/*/*.txt with `key = value`
lines; the dumped-args round trip `txt_to_argstring`,
evaluation_helpers.py:221-255). Implemented on stdlib argparse: `--config
FILE` lines become defaults, CLI flags override, and every run dumps
`args.txt` + `config.txt` into its log dir for exact re-parsing by the
render CLIs.
"""

from __future__ import annotations

import argparse
import os
import shutil
from typing import Dict, List, Optional, Sequence


def parse_config_file(path: str) -> Dict[str, str]:
    """Read `key = value` lines (configargparse text format)."""
    out: Dict[str, str] = {}
    with open(path) as f:
        for line in f:
            line = line.strip()
            if not line or line.startswith("#"):
                continue
            if "=" in line:
                k, v = line.split("=", 1)
                out[k.strip()] = v.strip()
    return out


def _coerce(parser: argparse.ArgumentParser, key: str, raw: str):
    for action in parser._actions:
        if action.dest == key:
            if isinstance(action, (argparse._StoreTrueAction, argparse._StoreFalseAction)):
                return raw.lower() in ("true", "1", "yes")
            if action.nargs in ("+", "*") or isinstance(action.nargs, int):
                typ = action.type or str
                return [typ(v) for v in raw.split()]
            return (action.type or str)(raw)
    raise KeyError(f"unknown config key {key!r}")


def parse_with_config(
    parser: argparse.ArgumentParser, argv: Optional[Sequence[str]] = None
) -> argparse.Namespace:
    """Two-pass parse: --config file sets defaults, CLI overrides."""
    pre = argparse.ArgumentParser(add_help=False)
    pre.add_argument("--config", type=str, default=None)
    pre_args, _ = pre.parse_known_args(argv)
    if pre_args.config:
        cfg = parse_config_file(pre_args.config)
        defaults = {k: _coerce(parser, k, v) for k, v in cfg.items()}
        parser.set_defaults(**defaults)
    if not any(a.dest == "config" for a in parser._actions):
        parser.add_argument("--config", type=str, default=None)
    return parser.parse_args(argv)


def dump_args(log_dir: str, args: argparse.Namespace) -> None:
    """Write args.txt (+ copy config.txt) like reference run_nerf.py:504-516."""
    os.makedirs(log_dir, exist_ok=True)
    with open(os.path.join(log_dir, "args.txt"), "w") as f:
        for k in sorted(vars(args)):
            f.write(f"{k} = {getattr(args, k)}\n")
    if getattr(args, "config", None):
        shutil.copy(args.config, os.path.join(log_dir, "config.txt"))


def txt_to_argstring(path: str, ignore: Sequence[str] = ("config",)) -> List[str]:
    """args.txt -> argv list (reference evaluation_helpers.py:221-255)."""
    argv: List[str] = []
    for k, v in parse_config_file(path).items():
        if k in ignore or v == "None":
            continue
        if v in ("True", "False"):
            if v == "True":
                argv.append(f"--{k}")
            continue
        if v.startswith("[") and v.endswith("]"):
            items = v[1:-1].replace(",", " ").replace("'", "").split()
            if not items:
                continue
            argv.append(f"--{k}")
            argv.extend(items)
            continue
        argv.extend([f"--{k}", v])
    return argv


def nerf_config_parser() -> argparse.ArgumentParser:
    """The training CLI's flag set (reference run_nerf.py:186-490, trimmed to
    the flags the TPU rebuild implements; names kept identical)."""
    p = argparse.ArgumentParser("posegen_tpu.run_nerf", add_help=True)
    # experiment
    p.add_argument("--expname", type=str, default="exp")
    p.add_argument("--basedir", type=str, default="./logs")
    p.add_argument("--seed", type=int, default=0)
    # data
    p.add_argument("--dataset_type", type=str, default="synthetic")
    p.add_argument("--subject", type=str, default="demo")
    p.add_argument("--data_root", type=str, default="data")
    p.add_argument("--N_rand", type=int, default=3072)
    p.add_argument("--N_sample_images", type=int, default=64)
    p.add_argument("--patch_size", type=int, default=1)
    p.add_argument("--mask_image", action="store_true")
    p.add_argument("--white_bkgd", action="store_true")
    p.add_argument("--load_refined", type=str, default=None)
    p.add_argument("--num_workers", type=int, default=2)
    # model
    p.add_argument("--netdepth", type=int, default=8)
    p.add_argument("--netwidth", type=int, default=256)
    p.add_argument("--multires", type=int, default=7)
    p.add_argument("--multires_views", type=int, default=4)
    p.add_argument("--multires_bones", type=int, default=0)
    p.add_argument("--use_cutoff", action="store_true")
    p.add_argument("--cutoff_viewdir", action="store_true")
    p.add_argument("--cutoff_inputs", action="store_true")
    p.add_argument("--cutoff_mm", type=float, default=500.0)
    p.add_argument("--opt_framecode", action="store_true")
    p.add_argument("--framecode_size", type=int, default=16)
    p.add_argument("--kp_dist_type", type=str, default="reldist")
    p.add_argument("--view_type", type=str, default="relray")
    p.add_argument("--bone_type", type=str, default="reldir")
    p.add_argument("--density_type", type=str, default="relu")
    # rendering
    p.add_argument("--N_samples", type=int, default=64)
    p.add_argument("--N_importance", type=int, default=16)
    p.add_argument("--single_net", action="store_true")
    p.add_argument("--perturb", type=float, default=1.0)
    p.add_argument("--raw_noise_std", type=float, default=0.0)
    p.add_argument("--chunk", type=int, default=4096)
    # training
    p.add_argument("--n_iters", type=int, default=150000)
    p.add_argument("--lrate", type=float, default=5e-4)
    p.add_argument("--lrate_decay", type=int, default=500)
    p.add_argument("--loss_fn", type=str, default="MSE")
    p.add_argument("--use_temp_loss", action="store_true")
    p.add_argument("--temp_coef", type=float, default=0.05)
    # pose optimization
    p.add_argument("--opt_pose", action="store_true")
    p.add_argument("--opt_rot6d", action="store_true")
    p.add_argument("--opt_pose_lrate", type=float, default=5e-4)
    p.add_argument("--opt_pose_lrate_decay", type=int, default=2)
    p.add_argument("--opt_pose_step", type=int, default=20)
    p.add_argument("--opt_pose_coef", type=float, default=2.0)
    p.add_argument("--opt_pose_tol", type=float, default=0.0)
    # logging / checkpoints
    p.add_argument("--i_print", type=int, default=100)
    p.add_argument("--i_weights", type=int, default=10000)
    p.add_argument("--i_testset", type=int, default=10000)
    p.add_argument("--no_reload", action="store_true")
    p.add_argument("--ft_path", type=str, default=None)
    # distributed
    p.add_argument("--n_devices", type=int, default=0, help="0 = all")
    return p


def args_to_raycast_config(args, n_framecodes: int = 0):
    from posegen_tpu.render.raycast import RaycastConfig

    return RaycastConfig(
        kp_dist_type=args.kp_dist_type,
        view_type=args.view_type,
        bone_type=args.bone_type,
        multires=args.multires,
        multires_views=args.multires_views,
        multires_bones=args.multires_bones,
        use_cutoff=args.use_cutoff,
        cutoff_viewdir=args.cutoff_viewdir,
        cutoff_inputs=args.cutoff_inputs,
        opt_framecode=args.opt_framecode,
        framecode_ch=args.framecode_size,
        n_framecodes=n_framecodes,
        netdepth=args.netdepth,
        netwidth=args.netwidth,
        N_samples=args.N_samples,
        N_importance=args.N_importance,
        single_net=args.single_net,
        perturb=args.perturb,
        raw_noise_std=args.raw_noise_std,
        density_type=args.density_type,
    )


def args_to_train_config(args):
    from posegen_tpu.train.trainer import TrainConfig

    return TrainConfig(
        lrate=args.lrate,
        lrate_decay=args.lrate_decay,
        loss_fn=args.loss_fn,
        rays_per_image=max(args.N_rand // max(args.N_sample_images, 1), 1),
        opt_pose=args.opt_pose,
        opt_pose_lrate=args.opt_pose_lrate,
        opt_pose_lrate_decay=args.opt_pose_lrate_decay,
        opt_pose_step=args.opt_pose_step,
        opt_pose_coef=args.opt_pose_coef,
        use_temp_loss=args.use_temp_loss,
        temp_coef=args.temp_coef,
    )


def args_to_data_config(args):
    from posegen_tpu.data.catalog import DataConfig

    return DataConfig(
        dataset=args.dataset_type,
        subject=args.subject,
        data_root=args.data_root,
        n_rand=args.N_rand,
        n_sample_images=args.N_sample_images,
        patch_size=args.patch_size,
        mask_image=args.mask_image,
        white_bkgd=args.white_bkgd,
        load_refined=args.load_refined,
        seed=args.seed,
    )
