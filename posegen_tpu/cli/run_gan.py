"""GAN dataset-generation CLI: `python -m posegen_tpu.cli.run_gan ...`.

Capability parity with reference run_gan.py train() (:2259-2297): AMASS
pose pool -> PoseGenerator vs Pos3dDiscriminator with SPIN feedback through
a trained (resident) NeRF; optional SPIN fine-tuning afterwards. Pose data
comes from --amass_poses (npz/npy of (N, 24, 3) axis-angles, the reference's
1/10-subsampled AMASS pool, run_gan.py:2140-2154) or a synthetic pool for
smoke runs.
"""

from __future__ import annotations

import argparse
import os
from typing import Optional, Sequence

import numpy as np


def latest_gan_checkpoint(ckpt_dir: str) -> Optional[str]:
    """Newest gan_{epoch}.npz by numeric epoch (lexical order missorts
    epoch >= 1000 against the 3-digit-padded names). Non-conforming names
    (e.g. a hand-copied gan_best.npz) are skipped, not crashed on."""
    import glob
    import re

    paths = [
        p for p in glob.glob(os.path.join(ckpt_dir, "gan_*.npz"))
        if re.fullmatch(r"gan_(\d+)\.npz", os.path.basename(p))
    ]
    if not paths:
        return None
    return max(paths, key=lambda p: int(os.path.basename(p)[4:-4]))


def gan_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser("posegen_tpu.run_gan")
    p.add_argument("--nerf_args", type=str, default=None, help="trained args.txt")
    p.add_argument("--ckptpath", type=str, default=None, help="NeRF ckpt")
    p.add_argument("--spin_ckpt", type=str, default=None,
                   help="SPIN checkpoint: torch .pth (reference format) or "
                        "native .npz ({params,state} flat tree, the "
                        "tools/exp_mining.py spin_pretrained.npz format)")
    p.add_argument("--amass_poses", type=str, default=None)
    p.add_argument("--outputdir", type=str, default="render_output")
    p.add_argument("--runname", type=str, default="gan")
    p.add_argument("--epochs", type=int, default=50)
    p.add_argument("--batch_size", type=int, default=1024)
    p.add_argument("--lr_g", type=float, default=1e-4)
    p.add_argument("--lr_d", type=float, default=1e-4)
    p.add_argument("--lr_spin", type=float, default=5e-5,
                   help="SPIN fine-tune lr (reference run_gan.py:79,1871)")
    p.add_argument("--df", type=int, default=2)
    # parsed-but-dead reference flags, accepted with the same no-op
    # semantics (grep-verified: args.decay_epoch / args.max_norm / args.lr_p
    # have no consumer in the reference either — the grad clips at
    # run_gan.py:1175,2106 use the literal max_norm=1)
    p.add_argument("--decay_epoch", type=int, default=0)
    p.add_argument("--lr_p", type=float, default=1e-4)
    p.add_argument("--no_max", dest="max_norm", action="store_false")
    p.set_defaults(max_norm=True)
    p.add_argument("--rpi", type=int, default=20)
    p.add_argument("--feedback_every", type=int, default=5)
    p.add_argument("--feedback_start_epoch", type=int, default=2)
    p.add_argument("--render_hw", type=int, default=512)
    p.add_argument("--render_res", type=int, nargs="+", default=None,
                   help="(H, W) alias for --render_hw (reference run_gan.py"
                        ":91; square only here)")
    p.add_argument("--white_bkgd", action="store_true",
                   help="feedback renders on white (reference :97)")
    p.add_argument("--chunk", type=int, default=32768,
                   help="rays per render dispatch for the feedback renderer "
                        "(large chunks amortize tunneled-host dispatch; the "
                        "renderer clamps non-fused configs itself)")
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--train_spin_epochs", type=int, default=0)
    p.add_argument("--i_gan_ckpt", type=int, default=1,
                   help="save a resumable GAN checkpoint every N epochs (0 off)")
    p.add_argument("--probe_n", type=int, default=0,
                   help="poses per end-of-epoch hardness probe (0 off): "
                        "fixed inputs/noise -> generate, render, SPIN MPJPE; "
                        "appended to probe.jsonl in the run dir")
    p.add_argument("--no_resume", action="store_true",
                   help="ignore existing gan_ckpts and start fresh")
    return p


def load_pose_pool(path: Optional[str], seed: int = 0, n: int = 4096) -> np.ndarray:
    if path:
        data = np.load(path, allow_pickle=True)
        if hasattr(data, "files"):
            key = "poses" if "poses" in data.files else data.files[0]
            poses = np.asarray(data[key])
        else:
            poses = np.asarray(data)
        poses = poses.reshape(poses.shape[0], -1)[:, : 24 * 3].reshape(-1, 24, 3)
        return poses.astype(np.float32)
    rng = np.random.default_rng(seed)
    return (rng.standard_normal((n, 24, 3)) * 0.3).astype(np.float32)


def main(argv: Optional[Sequence[str]] = None):
    from posegen_tpu.cli.config import parse_with_config

    args = parse_with_config(gan_parser(), argv)

    import jax

    from posegen_tpu.gen.generators import GenConfig
    from posegen_tpu.gen.loop import GanLoopConfig, GanTrainer, NeRFRenderer

    renderer = None
    spin_params = spin_state = None
    if args.nerf_args and args.ckptpath:
        from posegen_tpu.cli.run_render import load_trained

        if args.render_res:
            if len(set(args.render_res)) != 1:
                raise SystemExit("--render_res: only square renders here; "
                                 "use --render_hw")
            args.render_hw = int(args.render_res[0])
        _, cfg, variables = load_trained(args.nerf_args, args.ckptpath)
        renderer = NeRFRenderer(
            cfg, variables, hw=args.render_hw, white_bkgd=args.white_bkgd,
            chunk=args.chunk,
        )

        from posegen_tpu.gen.hmr import import_torch_hmr, init_hmr

        spin_params, spin_state = init_hmr(jax.random.PRNGKey(args.seed + 2))
        if args.spin_ckpt and args.spin_ckpt.endswith(".npz"):
            # native checkpoint (tools/exp_mining.py pretrain format) — the
            # capstone run starts from the pretrained estimator without a
            # torch round-trip
            from posegen_tpu.train.checkpoints import _unflatten_into

            tree = _unflatten_into(
                {"params": spin_params, "state": spin_state},
                dict(np.load(args.spin_ckpt)),
            )
            spin_params, spin_state = tree["params"], tree["state"]
            print(f"loaded native SPIN checkpoint {args.spin_ckpt}")
        elif args.spin_ckpt:
            import torch

            ckpt = torch.load(args.spin_ckpt, map_location="cpu", weights_only=False)
            sd = ckpt.get("model_state_dict", ckpt.get("model", ckpt))
            spin_params, spin_state = import_torch_hmr(sd, spin_params, spin_state)

    pool = load_pose_pool(args.amass_poses, args.seed)
    steps_per_epoch = max(len(pool) // args.batch_size, 1)

    loop_cfg = GanLoopConfig(
        n_epochs=args.epochs, lr_g=args.lr_g, lr_d=args.lr_d, df=args.df,
        feedback_every=args.feedback_every,
        feedback_start_epoch=args.feedback_start_epoch,
        rpi=args.rpi, render_hw=args.render_hw,
        output_dir=os.path.join(args.outputdir, args.runname),
    )
    mesh = None
    if jax.device_count() > 1 and args.batch_size % jax.device_count() == 0:
        # data-parallel G/D/SPIN steps over all chips (parallel/gan.py);
        # the reference's GAN loop is single-GPU (run_gan.py:1956)
        from posegen_tpu.parallel.mesh import make_mesh

        mesh = make_mesh()
        print(f"data-parallel GAN over {mesh.size} devices")
    trainer = GanTrainer(
        loop_cfg, renderer, spin_params, spin_state,
        gen_cfg=GenConfig(), steps_per_epoch=steps_per_epoch, seed=args.seed,
        mesh=mesh,
    )

    # auto-resume: the reference loses its G/D state on interruption (it
    # persists only SPIN checkpoints, run_gan.py:1947); here the latest
    # gan_*.npz restores the full run (params, optimizers, PRNG, fake pool)
    ckpt_dir = os.path.join(args.outputdir, args.runname, "gan_ckpts")
    if not args.no_resume:
        latest = latest_gan_checkpoint(ckpt_dir)
        if latest:
            trainer.load_checkpoint(latest)
            print(f"resumed from {latest} (epoch {trainer.epoch})")

    import json as _json
    import time as _time

    run_dir = os.path.join(args.outputdir, args.runname)
    probe_real = probe_key = None
    if args.probe_n > 0 and renderer is not None and spin_params is not None:
        # fixed probe inputs: held-out pool rows + a fixed noise key, so the
        # per-epoch hardness numbers are comparable across the whole run
        prng = np.random.default_rng(args.seed + 300)
        probe_real = pool[prng.integers(0, len(pool), (args.probe_n,))]
        probe_key = jax.random.PRNGKey(args.seed + 777)

    def _probe_and_log(epoch: int, stats, dt: float, n_iters: int) -> None:
        os.makedirs(run_dir, exist_ok=True)
        rec = {"epoch": epoch, "iters": n_iters, "wall_s": round(dt, 1),
               **{k: round(float(v), 6) for k, v in stats.items()}}
        if probe_real is not None:
            from posegen_tpu.gen.loop import probe_hardness

            t0 = _time.time()
            rec["probe_mpjpe"] = round(
                probe_hardness(trainer, probe_real, probe_key), 6
            )
            rec["probe_s"] = round(_time.time() - t0, 1)
            print(f"  probe: {rec['probe_mpjpe']:.4f} MPJPE "
                  f"({rec['probe_s']:.1f} s)", flush=True)
        with open(os.path.join(run_dir, "epochs.jsonl"), "a") as f:
            f.write(_json.dumps(rec) + "\n")

    rng = np.random.default_rng(args.seed)
    for epoch in range(args.epochs):
        perm = rng.permutation(len(pool))
        if epoch < trainer.epoch:
            continue  # consumed by resume; replay the permutation stream
        batches = [
            pool[perm[i : i + args.batch_size]]
            for i in range(0, len(perm) - args.batch_size + 1, args.batch_size)
        ] or [pool]
        t0 = _time.time()
        stats = trainer.train_epoch(batches)
        dt = _time.time() - t0
        print(
            f"epoch {epoch}: {stats} "
            f"({dt:.1f} s, {len(batches) / dt:.2f} it/s)",
            flush=True,
        )
        _probe_and_log(epoch, stats, dt, len(batches))
        if args.i_gan_ckpt and (epoch + 1) % args.i_gan_ckpt == 0:
            path = trainer.save_checkpoint(
                os.path.join(ckpt_dir, f"gan_{epoch:03d}.npz")
            )
            print(f"saved {path}")
    trainer.flush_sink()

    if args.train_spin_epochs > 0 and spin_params is not None:
        from posegen_tpu.gen.spin_driver import train_spin

        spin_params, history = train_spin(
            spin_params, spin_state,
            render_dir=os.path.join(args.outputdir, args.runname),
            epochs=args.train_spin_epochs,
            ckpt_dir=os.path.join(args.outputdir, args.runname, "spin_ckpts"),
            seed=args.seed,
            mesh=mesh,
            lr=args.lr_spin,
        )
        print(f"SPIN fine-tuning done: {history[-1]}")
    return trainer


if __name__ == "__main__":
    main()
