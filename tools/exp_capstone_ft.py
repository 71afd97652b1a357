"""Capstone phase 2: fine-tune SPIN on the capstone run's mined dataset and
report the easy / hard_gen / hard_nat split table at scale (VERDICT r4
item 1's second half; reference run_gan.py:1849-1952 train_spin +
:1551-1581 eval).

Inputs: the capstone sink (`render_output/capstone`: image/%05d.png +
poses_axis_angles{count}.npy blocks of rpi bones) and its latest gan_*.npz
(for the FINAL generator -> the hard_gen held-out split). Eval splits reuse
the round-4 exp_mining conventions EXACTLY (same draw() seeds, same
worst-quartile rule), so numbers are comparable with
logs/mining/summary_v5_reference_knobs_headline.json; split render dirs are
reused when present (e.g. /tmp/mining_v4) and re-rendered otherwise.

    python -u tools/exp_capstone_ft.py --sink render_output/capstone
"""

from __future__ import annotations

import argparse
import glob
import json
import os
import re
import sys
import time

import numpy as np

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)


def main() -> None:
    p = argparse.ArgumentParser("exp_capstone_ft")
    p.add_argument("--sink", default="render_output/capstone")
    p.add_argument("--nerf_args", default="logs/flagship_demo/args.txt")
    p.add_argument("--ckptpath", default="logs/flagship_demo/00001500.ckpt.npz")
    p.add_argument("--pretrained", default="logs/mining/spin_pretrained.npz")
    p.add_argument("--splits_dir", default="/tmp/mining_v4",
                   help="round-4 eval/control render dirs (re-rendered if absent)")
    p.add_argument("--ft_n", type=int, default=768)
    p.add_argument("--finetune_epochs", type=int, default=30)
    p.add_argument("--n_eval", type=int, default=48)
    p.add_argument("--n_pretrain", type=int, default=256,
                   help="round-4 pretrain count (fixes the eval draw offset)")
    p.add_argument("--pose_std", type=float, default=0.15)
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--out", default="logs/mining/capstone_finetune.json")
    args = p.parse_args()

    import jax
    import jax.numpy as jnp

    from posegen_tpu.cli.run_gan import latest_gan_checkpoint
    from posegen_tpu.cli.run_render import load_trained
    from posegen_tpu.gen.gan import SPIN_J14
    from posegen_tpu.gen.generators import GenConfig, pose_generator_apply
    from posegen_tpu.gen.hmr import hmr_apply, init_hmr
    from posegen_tpu.gen.loop import (
        FEEDBACK_EXTRINSIC,
        GanLoopConfig,
        GanTrainer,
        NeRFRenderer,
        fk_joints,
        prepare_spin_input,
    )
    from posegen_tpu.gen.spin_train import make_spin_finetune_step
    from posegen_tpu.skeleton.cameras import nerf_extrinsic_to_c2w
    from posegen_tpu.skeleton.kinematics import smpl_l2ws_from_rots
    from posegen_tpu.train.checkpoints import _unflatten_into

    J14 = jnp.asarray(SPIN_J14)
    c2w = nerf_extrinsic_to_c2w(FEEDBACK_EXTRINSIC)
    summary = {"args": vars(args)}

    def draw(seed: int, n: int) -> np.ndarray:
        rng_d = np.random.default_rng(seed)
        return (rng_d.standard_normal((n, 24, 3)) * args.pose_std).astype(
            np.float32
        )

    _, cfg, variables = load_trained(args.nerf_args, args.ckptpath)
    renderer = NeRFRenderer(cfg, variables, hw=512, chunk=32768)

    spin_params, spin_state = init_hmr(jax.random.PRNGKey(args.seed + 2))
    tree = _unflatten_into(
        {"params": spin_params, "state": spin_state},
        dict(np.load(args.pretrained)),
    )
    spin_params, spin_state = tree["params"], tree["state"]

    def render_set(bones: np.ndarray, out_dir: str) -> None:
        import imageio.v2 as imageio

        img_dir = os.path.join(out_dir, "image")
        os.makedirs(img_dir, exist_ok=True)
        c2ws = np.broadcast_to(c2w, (len(bones), 4, 4))
        n = 0
        for s in range(0, len(bones), 32):
            imgs = renderer.render_poses(bones[s : s + 32], c2ws[s : s + 32])
            for img in imgs:
                imageio.imwrite(
                    os.path.join(img_dir, f"{n:05d}.png"),
                    (np.clip(img, 0, 1) * 255).astype(np.uint8),
                )
                n += 1
        np.save(os.path.join(out_dir, "poses_axis_angles0.npy"), bones)

    def ensure_split(name: str, bones: np.ndarray) -> str:
        """Reuse a round-4 split render dir when its saved bones match this
        run's reproducible draw; otherwise render a fresh copy under the
        capstone's own eval dir (never overwrite the round-4 artifacts)."""
        d = os.path.join(args.splits_dir, name)
        npy = os.path.join(d, "poses_axis_angles0.npy")
        if os.path.exists(npy):
            saved = np.load(npy)
            if len(saved) == len(bones) and np.allclose(saved, bones, atol=1e-6):
                return d
        d = os.path.join(args.sink + "_eval", name)
        if not os.path.exists(os.path.join(d, "poses_axis_angles0.npy")):
            print(f"rendering split {name} ({len(bones)})", flush=True)
            render_set(bones, d)
        return d

    def load_images(img_dir: str, idxs) -> np.ndarray:
        import imageio.v2 as imageio

        xs = []
        for s in range(0, len(idxs), 32):
            block = np.stack([
                imageio.imread(os.path.join(img_dir, f"{i:05d}.png")) / 255.0
                for i in idxs[s : s + 32]
            ]).astype(np.float32)
            xs.append(np.asarray(prepare_spin_input(jnp.asarray(block))))
        return np.concatenate(xs)

    def mpjpe_per_sample(params, state, x, bones) -> np.ndarray:
        rotmat, _, _, _ = hmr_apply(params, state, x)
        pred = smpl_l2ws_from_rots(rotmat, scale=0.4)[..., :3, 3][:, J14]
        gt = fk_joints(jnp.asarray(bones))[:, J14]
        pred = pred - pred[:, :1]
        gt = gt - gt[:, :1]
        return np.asarray(jnp.mean(jnp.linalg.norm(pred - gt, axis=-1), axis=-1))

    def mpjpe_batched(params, state, x, bones) -> float:
        return float(np.mean(np.concatenate([
            mpjpe_per_sample(params, state, jnp.asarray(x[s : s + 32]),
                             bones[s : s + 32])
            for s in range(0, len(bones), 32)
        ])))

    # ---- mined sink: image idx <-> bone rows from the npy blocks ----------
    blocks = {}
    for path in glob.glob(os.path.join(args.sink, "poses_axis_angles*.npy")):
        m = re.fullmatch(r"poses_axis_angles(\d+)\.npy", os.path.basename(path))
        if m:
            blocks[int(m.group(1))] = np.load(path)
    assert blocks, f"no sink pose blocks under {args.sink}"
    sink_bones, sink_idx = [], []
    for start in sorted(blocks):
        b = blocks[start]
        sink_bones.append(b)
        sink_idx.extend(range(start, start + len(b)))
    sink_bones = np.concatenate(sink_bones)
    sink_idx = np.asarray(sink_idx)
    # keep only images actually on disk (the last event may be mid-write)
    on_disk = np.asarray([
        os.path.exists(os.path.join(args.sink, "image", f"{i:05d}.png"))
        for i in sink_idx
    ])
    sink_bones, sink_idx = sink_bones[on_disk], sink_idx[on_disk]
    summary["sink_size"] = int(len(sink_idx))
    print(f"mined sink: {len(sink_idx)} images", flush=True)

    rng = np.random.default_rng(args.seed + 42)
    sel = rng.choice(len(sink_idx), size=min(args.ft_n, len(sink_idx)),
                     replace=False)
    mined_bones = sink_bones[sel]
    x_mined = load_images(os.path.join(args.sink, "image"), sink_idx[sel])
    gt_mined = np.asarray(fk_joints(jnp.asarray(mined_bones)))

    # ---- final generator -> hard_gen split (exp_mining seed conventions) --
    loop_cfg = GanLoopConfig()
    trainer = GanTrainer(loop_cfg, None, seed=args.seed)
    gan_ckpt = latest_gan_checkpoint(os.path.join(args.sink, "gan_ckpts"))
    assert gan_ckpt, "no gan checkpoint in the sink"
    trainer.load_checkpoint(gan_ckpt)
    summary["gan_ckpt"] = gan_ckpt
    print(f"final generator from {gan_ckpt} (epoch {trainer.epoch})", flush=True)

    out_h, _ = pose_generator_apply(
        trainer.g_params, trainer.g_state, jax.random.PRNGKey(args.seed + 888),
        jnp.asarray(draw(args.seed + 999, args.n_eval)), trainer.gen_cfg,
    )
    hard_bones = np.asarray(out_h["pose_ba"])
    hard_dir = os.path.join(args.sink + "_eval", "hard_gen")
    render_set(hard_bones, hard_dir)
    x_hard = load_images(os.path.join(hard_dir, "image"),
                         np.arange(len(hard_bones)))

    # ---- easy + naturally-hard splits (round-4 draws, reused or re-made) --
    pool_pre = draw(args.seed + 100, args.n_pretrain + args.n_eval)
    eval_bones = pool_pre[args.n_pretrain :]
    eval_dir = ensure_split("eval", eval_bones)
    x_eval = load_images(os.path.join(eval_dir, "image"),
                         np.arange(len(eval_bones)))

    nat_pool = draw(args.seed + 1234, 4 * args.n_eval)
    nat_dir = ensure_split("eval_nat", nat_pool)
    x_nat_all = load_images(os.path.join(nat_dir, "image"),
                            np.arange(len(nat_pool)))
    errs_nat = np.concatenate([
        mpjpe_per_sample(spin_params, spin_state,
                         jnp.asarray(x_nat_all[s : s + 32]),
                         nat_pool[s : s + 32])
        for s in range(0, len(nat_pool), 32)
    ])
    worst = np.argsort(errs_nat)[-args.n_eval :]
    x_hard_nat, hard_nat_bones = x_nat_all[worst], nat_pool[worst]

    # ---- control: equal-size random-pose renders (exp_mining seed+400) ----
    ctrl_bones = draw(args.seed + 400, len(mined_bones))
    ctrl_dir = ensure_split("control", ctrl_bones)
    x_ctrl = load_images(os.path.join(ctrl_dir, "image"),
                         np.arange(len(ctrl_bones)))
    gt_ctrl = np.asarray(fk_joints(jnp.asarray(ctrl_bones)))

    summary["mined_set_mpjpe_pretrained"] = mpjpe_batched(
        spin_params, spin_state, x_mined, mined_bones
    )
    summary["control_set_mpjpe_pretrained"] = mpjpe_batched(
        spin_params, spin_state, x_ctrl, ctrl_bones
    )
    print(f"set hardness (pretrained): mined "
          f"{summary['mined_set_mpjpe_pretrained']:.4f} vs random "
          f"{summary['control_set_mpjpe_pretrained']:.4f}", flush=True)

    def eval_all(params) -> dict:
        return {
            "easy": mpjpe_batched(params, spin_state, x_eval, eval_bones),
            "hard_gen": mpjpe_batched(params, spin_state, x_hard, hard_bones),
            "hard_nat": mpjpe_batched(params, spin_state, x_hard_nat,
                                      hard_nat_bones),
        }

    summary["pretrained_eval"] = eval_all(spin_params)
    print(f"pretrained eval: {summary['pretrained_eval']}", flush=True)

    # ---- fine-tune mined vs control (reference lr_spin 5e-5) --------------
    def finetune(x, gt, tag):
        opt, step = make_spin_finetune_step(lr=5e-5, hinge=None)
        params = dict(spin_params)
        opt_state = opt.init(params)
        rng_l = np.random.default_rng(args.seed + 5)
        key = jax.random.PRNGKey(args.seed + 5)
        x_dev, gt_dev = jnp.asarray(x), jnp.asarray(gt)
        for epoch in range(args.finetune_epochs):
            perm = rng_l.permutation(len(x))
            losses = []
            for s in range(0, len(perm) - 32 + 1, 32):
                b = jnp.asarray(perm[s : s + 32])
                key, k = jax.random.split(key)
                params, opt_state, st = step(
                    params, spin_state, opt_state,
                    jnp.take(x_dev, b, axis=0), jnp.take(gt_dev, b, axis=0), k,
                )
                losses.append(float(st["spin_loss"]))
            if epoch % 10 == 0 or epoch == args.finetune_epochs - 1:
                print(f"[ft-{tag}] epoch {epoch}: loss {np.mean(losses):.5f}",
                      flush=True)
        return params

    results = {}
    for tag, (x_ft, gt_ft) in (("mined", (x_mined, gt_mined)),
                               ("control", (x_ctrl, gt_ctrl))):
        t0 = time.time()
        ft_params = finetune(x_ft, gt_ft, tag)
        results[tag] = eval_all(ft_params)
        print(f"fine-tuned on {tag}: {results[tag]} "
              f"({time.time() - t0:.0f} s)", flush=True)
    summary["finetune_eval_mpjpe"] = results

    os.makedirs(os.path.dirname(args.out), exist_ok=True)
    with open(args.out, "w") as f:
        json.dump(summary, f, indent=1)
    print(f"wrote {args.out}")


if __name__ == "__main__":
    main()
