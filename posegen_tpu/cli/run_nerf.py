"""Training CLI: `python -m posegen_tpu.cli.run_nerf --config configs/...txt`.

Capability parity with reference run_nerf.py train() (:493-627): data ->
raycaster -> train loop with periodic val renders (PSNR/SSIM to tensorboard
+ txt), checkpoints with auto-resume, args dumping. TPU-first: the step is
one jitted function, the loader prefetches on the host, and val rendering
reuses a single compiled render.
"""

from __future__ import annotations

import os
import time
from typing import Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from posegen_tpu.cli.config import (
    args_to_data_config,
    args_to_raycast_config,
    args_to_train_config,
    dump_args,
    nerf_config_parser,
    parse_with_config,
    validate_args,
)


def evaluate_testset(
    cfg, state, render_data, chunk: int = 4096, mesh=None, render_factor: int = 0
):
    """Render held-out views and compute PSNR/SSIM
    (reference render_testset + evaluate_metric, run_nerf.py:557-604).

    Matches the reference's val conventions: real per-frame codes when
    opt_framecode (cams_val, run_nerf.py:574), GT composited over the
    stored backgrounds when the H5 has them (masked_gts, :580-584), and
    render_factor > 0 renders at H//f then bilinear-upsamples back to GT
    resolution for the metrics (evaluation_helpers.py:309-313).

    mesh: optional device mesh — val rays are then sharded across chips via
    the shard_map fused render (each device renders chunk/n_devices rays)."""
    from posegen_tpu.evals.image import evaluate_metric
    from posegen_tpu.kernels.field import supports_fused_config
    from posegen_tpu.render.image import render_image
    from posegen_tpu.render.raycast import PoseCtx

    if not supports_fused_config(cfg):
        # same clamp as auto_render_fn: the XLA fallback materializes the
        # per-point encodings (~350 KB/ray) — a 32k-ray chunk OOMs HBM
        chunk = min(chunk, 8192)
    render_fn = None
    if mesh is not None and mesh.size > 1:
        from posegen_tpu.parallel.mesh import make_shardmap_render_cam

        chunk = chunk - (chunk % mesh.size) or mesh.size
        render_fn = make_shardmap_render_cam(cfg, mesh, chunk)

    params = {**state.params, **state.embeds}
    H, W, _ = render_data["hwf"]
    RH, RW = (H, W) if render_factor <= 0 else (H // render_factor, W // render_factor)
    bgs = render_data.get("bkgds")
    rgbs, gts = [], []
    for i in range(render_data["imgs"].shape[0]):
        ci = int(render_data["cam_idxs"][i])
        # a genuinely held-out view (--use_val) may carry a cam idx with no
        # trained framecode row: render it with the mean code instead of
        # letting the gather clamp to an arbitrary trained row
        use_code = cfg.opt_framecode and 0 <= ci < max(cfg.n_framecodes, 1)
        ctx = PoseCtx(
            kps=render_data["kp3d"][i : i + 1],
            skts=render_data["skts"][i : i + 1],
            bones=render_data["bones"][i : i + 1],
            cyls=render_data["cyls"][i : i + 1],
            cam_idxs=np.asarray([[ci]], np.int32) if use_code else None,
        )
        focal = float(np.ravel(render_data["focals"])[min(i, np.ravel(render_data["focals"]).size - 1)])
        bg = None
        if bgs is not None:
            bg = bgs[min(i, len(bgs) - 1)]
            if render_factor > 0:
                import jax.image

                bg = np.asarray(
                    jax.image.resize(bg, (RH, RW, 3), "bilinear"), np.float32
                )
        out = render_image(
            cfg, params, RH, RW, focal / max(render_factor, 1),
            render_data["c2ws"][i], ctx, chunk=chunk, render_fn=render_fn,
            bg=bg,
        )
        rgb = out["rgb"]
        if render_factor > 0:
            import jax.image

            rgb = np.asarray(jax.image.resize(rgb, (H, W, 3), "bilinear"), np.float32)
        rgbs.append(rgb)
        mask = render_data["masks"][i]
        if mask.ndim == 2:
            mask = mask[..., None]
        gt = render_data["imgs"][i] * mask
        if bgs is not None:
            gt = gt + (1.0 - mask) * bgs[min(i, len(bgs) - 1)]
        gts.append(gt)
    metrics = evaluate_metric(np.stack(rgbs), np.stack(gts))
    return {k: float(np.mean(v)) for k, v in metrics.items()}, np.stack(rgbs)


def save_spiral_video(
    cfg, state, render_data, log_dir: str, step: int,
    n_frames: int = 10, factor: int = 2, chunk: int = 8192,
) -> str:
    """Bullet-time turn-around of val pose 0 written as rgb + disp GIFs
    (reference i_video render_poses mp4s, run_nerf.py:557-604 — format
    adapted: no ffmpeg in this image)."""
    import imageio.v2 as imageio

    from posegen_tpu.cli.run_render import _bullet_c2ws
    from posegen_tpu.render.image import render_path
    from posegen_tpu.render.raycast import PoseCtx

    params = {**state.params, **state.embeds}
    H, W, focal = render_data["hwf"]
    H, W, focal = H // factor, W // factor, float(np.ravel(focal)[0]) / factor
    kp0 = np.asarray(render_data["kp3d"])[0, 0]
    dist = float(np.linalg.norm(np.asarray(render_data["c2ws"])[0][:3, 3] - kp0))
    c2ws = _bullet_c2ws(kp0, dist, n_frames)
    ctx = PoseCtx(
        kps=render_data["kp3d"][:1], skts=render_data["skts"][:1],
        bones=render_data["bones"][:1], cyls=render_data["cyls"][:1],
    )
    from posegen_tpu.parallel.mesh import auto_render_fn

    # u8 GIF output: f16 readback is free accuracy-wise
    render_fn, chunk = auto_render_fn(cfg, chunk, half_readback=True)
    out = render_path(
        cfg, params, c2ws, (H, W, focal), [ctx], chunk=chunk,
        render_fn=render_fn, half_readback=True,
    )
    rgb_path = os.path.join(log_dir, f"spiral_{step:06d}_rgb.gif")
    imageio.mimwrite(
        rgb_path, (np.clip(out["rgbs"], 0, 1) * 255).astype(np.uint8), fps=5,
        loop=0,
    )
    disp = out["disps"] / max(float(out["disps"].max()), 1e-8)
    imageio.mimwrite(
        os.path.join(log_dir, f"spiral_{step:06d}_disp.gif"),
        (np.clip(disp, 0, 1) * 255).astype(np.uint8), fps=5, loop=0,
    )
    return rgb_path


def train(argv: Optional[Sequence[str]] = None) -> str:
    args = parse_with_config(nerf_config_parser(), argv)
    validate_args(args)
    log_dir = os.path.join(args.basedir, args.expname)
    dump_args(log_dir, args)

    from posegen_tpu.data.catalog import load_data
    from posegen_tpu.pose.opt import PoseOptConfig, init_pose_params
    from posegen_tpu.render.raycast import init_raycaster
    from posegen_tpu.train.checkpoints import (
        latest_checkpoint,
        load_checkpoint,
        save_checkpoint,
    )
    from posegen_tpu.train.trainer import create_train_state, make_train_step

    dcfg = args_to_data_config(args)
    # multi-host pods: each host draws a disjoint image shard per epoch
    # (the reference is single-process; this is the DCN input-sharding role)
    dcfg.process_index = jax.process_index()
    dcfg.process_count = jax.process_count()
    loader, render_data, attrs = load_data(dcfg)
    cfg = args_to_raycast_config(args, n_framecodes=attrs["n_framecodes"])
    tcfg = args_to_train_config(args)

    variables = init_raycaster(
        jax.random.PRNGKey(args.seed), cfg, cutoff_mm=args.cutoff_mm,
        ext_scale=attrs["ext_scale"],
    )
    pose_params = anchors = None
    pcfg = None
    kp_map = attrs.get("kp_map")
    if kp_map is not None:
        kp_map = jnp.asarray(kp_map)
    if args.opt_pose:
        pcfg = PoseOptConfig(
            use_rot6d=args.opt_rot6d, opt_pose_tol=args.opt_pose_tol,
            opt_pose_type=args.opt_pose_type, ext_scale=args.ext_scale,
        )
        pose_params, anchors = init_pose_params(
            pcfg, attrs["bones"], attrs["kp3d"],
            kp_map=attrs.get("kp_map"), kp_uidxs=attrs.get("kp_uidxs"),
        )
        if args.init_poseopt:
            # initialize the poseopt layer from a specific checkpoint
            # (reference --init_poseopt, pose_opt.py:212)
            from posegen_tpu.train.checkpoints import load_pose_params

            pose_params = load_pose_params(args.init_poseopt)
            print(f"initialized pose params from {args.init_poseopt}")
            if args.use_ckpt_anchor:
                # anchor the reg loss to the CHECKPOINT's poses instead of
                # the dataset estimates (reference pose_opt.py:62-67)
                anchors = jax.tree_util.tree_map(jnp.copy, pose_params)
    state = create_train_state(variables, tcfg, pose_params, anchors)

    # auto-resume (reference raycasters.py:124-142)
    start = 0
    if not args.no_reload:
        ckpt = args.ft_path or latest_checkpoint(log_dir)
        if ckpt:
            fresh_pose = (state.pose_params, state.pose_anchors)
            state = load_checkpoint(ckpt, state)
            if args.no_poseopt_reload and state.pose_params is not None:
                # keep NeRF weights from the ckpt but restart poses (and
                # their optimizer/anchors) from the dataset estimates
                # (reference create_popt skips the poseopt restore,
                # pose_opt.py:51-60)
                fresh = create_train_state(
                    {**state.params, **state.embeds}, tcfg, *fresh_pose
                )
                state = state._replace(
                    pose_params=fresh.pose_params,
                    pose_anchors=fresh.pose_anchors,
                    pose_opt_state=fresh.pose_opt_state,
                )
                print("poseopt state NOT restored (--no_poseopt_reload)")
            if args.finetune:
                # fine-tune: weights only — fresh optimizer + step counter
                # (reference --finetune, raycasters.py:140-141)
                fresh = create_train_state(
                    {**state.params, **state.embeds}, tcfg,
                    state.pose_params, state.pose_anchors,
                )
                state = fresh
            else:
                start = int(state.step)
            print(f"resumed from {ckpt} at step {start}")

    rest_pose = jnp.asarray(attrs["rest_pose"])
    if args.n_devices != 1 and jax.device_count() > 1:
        # Multi-chip: the full train step runs per-device under shard_map
        # (fused Pallas kernels per chip, pmean over ICI), with whole image
        # groups sharded alongside their rays. Replaces reference
        # nn.DataParallel (core/raycasters.py:157).
        from posegen_tpu.parallel.mesh import (
            make_mesh, make_shardmap_train_step, replicate, shard_batch,
        )

        mesh = make_mesh(args.n_devices or None)
        if args.N_sample_images % mesh.size != 0:
            raise SystemExit(
                f"--N_sample_images ({args.N_sample_images}) must be a "
                f"multiple of the device count ({mesh.size}) so each chip "
                f"gets whole image groups"
            )
        state = replicate(state, mesh)
        pstep = make_shardmap_train_step(
            cfg, tcfg, pcfg, mesh=mesh,
            rest_pose=rest_pose, kp_map=kp_map, n_frames=attrs["n_kps"],
        )
        prep = lambda b: shard_batch(b, mesh)
    else:
        mesh = None
        step_fn = make_train_step(
            cfg, tcfg, pcfg, rest_pose=rest_pose, kp_map=kp_map,
            n_frames=attrs["n_kps"],
        )
        pstep = jax.jit(step_fn, donate_argnums=(0,))
        prep = lambda b: {k: jnp.asarray(v) for k, v in b.items()}

    writer = None
    try:
        from torch.utils.tensorboard import SummaryWriter

        writer = SummaryWriter(log_dir)
    except Exception:
        pass

    key = jax.random.PRNGKey(args.seed)
    it = iter(loader)
    t0 = time.time()
    for i in range(start, args.n_iters):
        batch = prep(next(it))
        state, stats = pstep(state, batch, jax.random.fold_in(key, i))

        if args.i_print > 0 and (i + 1) % args.i_print == 0:
            s = {k: float(v) for k, v in stats.items()}
            rate = args.i_print / (time.time() - t0)
            t0 = time.time()
            print(
                f"iter {i + 1}: loss {s['total_loss']:.5f} psnr {s['psnr']:.2f} "
                f"({rate:.1f} it/s, {rate * args.N_rand:.0f} rays/s)"
            )
            if writer:
                for k, v in s.items():
                    writer.add_scalar(f"Train/{k}", v, i + 1)
            # schedule trajectories (tau anneal, BARF alpha, LR decay) — the
            # long-horizon behaviors the reference exercises at 150k-500k
            # steps (cutoff_embedder.py:181-190, trainer.py:175-192)
            sched = {
                "lrate": tcfg.lrate * tcfg.lrate_decay_rate
                ** ((i + 1) / (tcfg.lrate_decay * tcfg.decay_unit))
            }
            ek = state.embeds.get("embed_kp") or {}
            for name in ("tau", "alpha"):
                if name in ek:
                    sched[name] = float(np.asarray(ek[name]).reshape(-1)[0])
            if writer:
                for k, v in sched.items():
                    writer.add_scalar(f"Sched/{k}", v, i + 1)
            with open(os.path.join(log_dir, "sched.txt"), "a") as f:
                f.write(
                    f"{i + 1}\t"
                    + "\t".join(f"{k}={v:.6g}" for k, v in sorted(sched.items()))
                    + "\n"
                )

        if args.i_weights > 0 and (i + 1) % args.i_weights == 0:
            path = save_checkpoint(log_dir, state, step=i + 1)
            print(f"saved {path}")

        if args.opt_pose and args.i_pose_weights > 0 and (i + 1) % args.i_pose_weights == 0:
            from posegen_tpu.train.checkpoints import save_pose_checkpoint

            save_pose_checkpoint(log_dir, state, step=i + 1)

        if args.i_video > 0 and (i + 1) % args.i_video == 0:
            # render-poses video (reference run_nerf.py i_video mp4s; this
            # image has no ffmpeg/mp4 encoder, so the artifact is a GIF)
            try:
                save_spiral_video(cfg, state, render_data, log_dir, i + 1,
                                  factor=max(args.render_factor, 2))
            except Exception as e:  # video output must never kill training
                print(f"i_video render failed: {e}")

        if args.i_testset > 0 and (i + 1) % args.i_testset == 0:
            metrics, rgbs = evaluate_testset(
                cfg, state, render_data, args.chunk, mesh=mesh,
                render_factor=args.render_factor,
            )
            print(f"iter {i + 1} val: {metrics}")
            if writer:
                writer.add_scalar("Val/PSNR", metrics["psnr"], i + 1)
                writer.add_scalar("Val/SSIM", metrics["ssim"], i + 1)
            with open(os.path.join(log_dir, "psnr.txt"), "a") as f:
                f.write(f"{i + 1}\t{metrics['psnr']:.4f}\n")
            with open(os.path.join(log_dir, "ssim.txt"), "a") as f:
                f.write(f"{i + 1}\t{metrics['ssim']:.4f}\n")

    loader.close()
    save_checkpoint(log_dir, state, step=args.n_iters)
    return log_dir


if __name__ == "__main__":
    train()
