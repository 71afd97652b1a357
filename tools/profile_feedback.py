"""Time one GAN feedback event on the real chip: rpi 512^2 renders + SPIN.

Measures the capstone run's dominant cost (reference run_gan.py:2041-2091
renders rpi=20 images every 5 G-iters) through the production path
(NeRFRenderer.render_poses -> render_images_pipelined + GanTrainer._spin_fwd),
before/after pipelining work.

    python -u tools/profile_feedback.py --rpi 20 --n 3 [--sink /tmp/sinktest]
"""

from __future__ import annotations

import argparse
import os
import sys
import time

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)


def main() -> None:
    p = argparse.ArgumentParser("profile_feedback")
    p.add_argument("--nerf_args", default="logs/flagship_demo/args.txt")
    p.add_argument("--ckptpath", default="logs/flagship_demo/00001500.ckpt.npz")
    p.add_argument("--rpi", type=int, default=20)
    p.add_argument("--n", type=int, default=3, help="timed repetitions")
    p.add_argument("--chunk", type=int, default=32768)
    p.add_argument("--hw", type=int, default=512)
    p.add_argument("--spin_ckpt", default="logs/mining/spin_pretrained.npz")
    p.add_argument("--sink", default=None,
                   help="also time the PNG dataset sink into this dir")
    args = p.parse_args()

    import jax
    import jax.numpy as jnp
    import numpy as np

    from posegen_tpu.cli.run_render import load_trained
    from posegen_tpu.gen.hmr import init_hmr
    from posegen_tpu.gen.loop import (
        FEEDBACK_EXTRINSIC,
        GanLoopConfig,
        GanTrainer,
        NeRFRenderer,
    )
    from posegen_tpu.skeleton.cameras import nerf_extrinsic_to_c2w
    from posegen_tpu.train.checkpoints import _unflatten_into

    print(f"devices: {jax.devices()}", flush=True)
    _, cfg, variables = load_trained(args.nerf_args, args.ckptpath)
    renderer = NeRFRenderer(cfg, variables, hw=args.hw, chunk=args.chunk)

    spin_params, spin_state = init_hmr(jax.random.PRNGKey(2))
    if os.path.exists(args.spin_ckpt):
        tree = _unflatten_into(
            {"params": spin_params, "state": spin_state},
            dict(np.load(args.spin_ckpt)),
        )
        spin_params, spin_state = tree["params"], tree["state"]

    loop_cfg = GanLoopConfig(rpi=args.rpi, render_hw=args.hw,
                             output_dir=args.sink)
    trainer = GanTrainer(loop_cfg, renderer, spin_params, spin_state)

    rng = np.random.default_rng(0)
    c2w = nerf_extrinsic_to_c2w(FEEDBACK_EXTRINSIC)

    for rep in range(args.n + 1):  # rep 0 = compile warmup
        bones = (rng.standard_normal((args.rpi, 24, 3)) * 0.15).astype(
            np.float32
        )
        t0 = time.time()
        imgs = renderer.render_poses(
            bones, np.broadcast_to(c2w, (args.rpi, 4, 4)),
            window=loop_cfg.crop if loop_cfg.feedback_crop else None,
        )
        t1 = time.time()
        joints = trainer._spin_fwd(spin_params, spin_state, jnp.asarray(imgs))
        jax.block_until_ready(joints)
        t2 = time.time()
        t3 = t2
        if args.sink:
            trainer._save_renders(imgs, bones)
            trainer.flush_sink()
            t3 = time.time()
        tag = "warmup" if rep == 0 else f"rep {rep}"
        print(
            f"[{tag}] render {args.rpi}x{args.hw}^2: {t1 - t0:.2f} s "
            f"({(t1 - t0) / args.rpi * 1e3:.0f} ms/img) | spin {t2 - t1:.2f} s"
            + (f" | sink+flush {t3 - t2:.2f} s" if args.sink else ""),
            flush=True,
        )
        if rep >= 1:
            per_ev = t3 - t0
            print(f"  -> feedback event total {per_ev:.2f} s; "
                  f"32 events/epoch = {32 * per_ev / 60:.1f} min/epoch",
                  flush=True)


if __name__ == "__main__":
    main()
