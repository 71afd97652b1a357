"""Hard-pose-mining proof (VERDICT r3 next-round item 1).

The reference's reason to exist: generator poses -> NeRF renders -> frozen
SPIN's error is a reward steering the generator toward estimator failures
(run_gan.py:2041-2100); SPIN fine-tuned on the mined set improves
(:1849-1952). This experiment proves the loop does its job, in-image:

  Phase 1  Render a pretraining set + held-out eval split of random poses
           through the trained demo NeRF.
  Phase 2  Pretrain the HMR on the pretraining set until it has a real
           MPJPE signal on blob-person renders (eval MPJPE falls far below
           the random-init value).
  Phase 3  Two seeded GAN runs with the SAME frozen pretrained SPIN:
           feedback ON vs OFF. A fixed-noise probe periodically measures
           the mean SPIN error of generated poses for both runs; the ON
           run's sink accumulates the mined (image, pose) set, and an
           equal-size random-pose control set is rendered.
  Phase 4  Fine-tune two copies of the pretrained SPIN — on the mined set
           and on the random control — and evaluate both on the held-out
           split.

Writes {out}/summary.json with every curve/number for RESULTS.md.

Usage (chip):
  python tools/exp_mining.py --nerf_args logs/flagship_demo/args.txt \
      --ckptpath logs/flagship_demo/00001500.ckpt.npz --out /tmp/mining
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--nerf_args", required=True)
    p.add_argument("--ckptpath", required=True)
    p.add_argument("--out", default="/tmp/mining")
    p.add_argument("--n_pretrain", type=int, default=256)
    p.add_argument("--n_eval", type=int, default=64)
    p.add_argument("--pretrain_epochs", type=int, default=30)
    p.add_argument("--finetune_epochs", type=int, default=5)
    p.add_argument("--gan_epochs", type=int, default=12)
    p.add_argument("--batch_size", type=int, default=128)
    p.add_argument("--pool_n", type=int, default=2048)
    p.add_argument("--rpi", type=int, default=8)
    p.add_argument("--probe_every", type=int, default=16,
                   help="G-iters between fixed-noise hardness probes")
    p.add_argument("--probe_n", type=int, default=16)
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--render_hw", type=int, default=512)
    args = p.parse_args(argv)

    import jax
    import jax.numpy as jnp

    from posegen_tpu.cli.run_gan import load_pose_pool
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
    from posegen_tpu.gen.spin_driver import train_spin
    from posegen_tpu.skeleton.cameras import nerf_extrinsic_to_c2w
    from posegen_tpu.skeleton.kinematics import smpl_l2ws_from_rots

    os.makedirs(args.out, exist_ok=True)
    summary = {"args": vars(args)}

    _, cfg, variables = load_trained(args.nerf_args, args.ckptpath)
    renderer = NeRFRenderer(cfg, variables, hw=args.render_hw,
                            white_bkgd=False, chunk=32768)
    c2w = nerf_extrinsic_to_c2w(FEEDBACK_EXTRINSIC)
    J14 = jnp.asarray(SPIN_J14)

    def render_set(bones: np.ndarray, out_dir: str) -> None:
        """Render poses with the feedback camera into a sink-layout dir."""
        import imageio.v2 as imageio

        img_dir = os.path.join(out_dir, "image")
        os.makedirs(img_dir, exist_ok=True)
        c2ws = np.broadcast_to(c2w, (len(bones), 4, 4))
        bs = 32
        n = 0
        for s in range(0, len(bones), bs):
            imgs = renderer.render_poses(bones[s : s + bs], c2ws[s : s + bs])
            for img in imgs:
                imageio.imwrite(
                    os.path.join(img_dir, f"{n:05d}.png"),
                    (np.clip(img, 0, 1) * 255).astype(np.uint8),
                )
                n += 1
        np.save(os.path.join(out_dir, "poses_axis_angles0.npy"), bones)

    def spin_mpjpe(params, state, imgs: np.ndarray, bones: np.ndarray) -> float:
        """Mean root-centred 14-joint error of SPIN on rendered poses —
        the exact quantity the feedback reward maximizes (gen/gan.py:180-188)."""
        x = prepare_spin_input(jnp.asarray(imgs))
        rotmat, _, _, _ = hmr_apply(params, state, x)
        pred = smpl_l2ws_from_rots(rotmat, scale=0.4)[..., :3, 3][:, J14]
        gt = fk_joints(jnp.asarray(bones))[:, J14]
        pred = pred - pred[:, :1]
        gt = gt - gt[:, :1]
        return float(jnp.mean(jnp.linalg.norm(pred - gt, axis=-1)))

    def eval_on_dir(params, state, out_dir: str, bones: np.ndarray) -> float:
        import imageio.v2 as imageio

        img_dir = os.path.join(out_dir, "image")
        errs = []
        bs = 32
        for s in range(0, len(bones), bs):
            imgs = np.stack([
                imageio.imread(os.path.join(img_dir, f"{i:05d}.png")) / 255.0
                for i in range(s, min(s + bs, len(bones)))
            ]).astype(np.float32)
            errs.append(spin_mpjpe(params, state, imgs, bones[s : s + bs]))
        return float(np.mean(errs))

    # ---- Phase 1: pretrain + eval splits -----------------------------------
    t0 = time.time()
    pool_pre = load_pose_pool(None, seed=args.seed + 100,
                              n=args.n_pretrain + args.n_eval)
    pre_bones = pool_pre[: args.n_pretrain]
    eval_bones = pool_pre[args.n_pretrain :]
    pre_dir = os.path.join(args.out, "pretrain")
    eval_dir = os.path.join(args.out, "eval")
    if not os.path.exists(os.path.join(pre_dir, "poses_axis_angles0.npy")):
        render_set(pre_bones, pre_dir)
        render_set(eval_bones, eval_dir)
    print(f"phase 1 (splits rendered): {time.time() - t0:.0f} s")

    # ---- Phase 2: pretrain the HMR -----------------------------------------
    t0 = time.time()
    spin_params, spin_state = init_hmr(jax.random.PRNGKey(args.seed + 2))
    mpjpe_init = eval_on_dir(spin_params, spin_state, eval_dir, eval_bones)
    print(f"random-init SPIN eval MPJPE: {mpjpe_init:.4f}")

    pretrained_npz = os.path.join(args.out, "spin_pretrained.npz")
    if os.path.exists(pretrained_npz):
        from posegen_tpu.train.checkpoints import _unflatten_into

        tree = _unflatten_into(
            {"params": spin_params, "state": spin_state},
            dict(np.load(pretrained_npz)),
        )
        spin_params, spin_state = tree["params"], tree["state"]
    else:
        spin_params, _hist = train_spin(
            spin_params, spin_state, render_dir=pre_dir,
            epochs=args.pretrain_epochs, lr=1e-4, hinge=None,
            batch_size=min(32, args.n_pretrain),
            seed=args.seed,
        )
        from posegen_tpu.train.checkpoints import _flatten

        np.savez(pretrained_npz,
                 **_flatten({"params": spin_params, "state": spin_state}))
    mpjpe_pre = eval_on_dir(spin_params, spin_state, eval_dir, eval_bones)
    print(f"pretrained SPIN eval MPJPE: {mpjpe_pre:.4f} "
          f"(phase 2: {time.time() - t0:.0f} s)")
    summary["spin_eval_mpjpe_random_init"] = mpjpe_init
    summary["spin_eval_mpjpe_pretrained"] = mpjpe_pre

    # ---- Phase 3: GAN A/B, feedback ON vs OFF ------------------------------
    pool = load_pose_pool(None, seed=args.seed, n=args.pool_n)
    probe_real = load_pose_pool(None, seed=args.seed + 300, n=args.probe_n)
    probe_key = jax.random.PRNGKey(args.seed + 777)

    def probe(trainer) -> float:
        """Mean SPIN error on poses generated from FIXED noise/input — the
        hardness of the generator's current output distribution."""
        out, _ = pose_generator_apply(
            trainer.g_params, trainer.g_state, probe_key,
            jnp.asarray(probe_real), trainer.gen_cfg,
        )
        bones = np.asarray(out["pose_ba"])
        imgs = renderer.render_poses(
            bones, np.broadcast_to(c2w, (len(bones), 4, 4))
        )
        return spin_mpjpe(trainer.spin_params, trainer.spin_state, imgs, bones)

    steps_per_epoch = args.pool_n // args.batch_size
    curves = {}
    for tag, fb in (("feedback_on", True), ("feedback_off", False)):
        t0 = time.time()
        sink = os.path.join(args.out, "mined") if fb else None
        loop_cfg = GanLoopConfig(
            n_epochs=args.gan_epochs, df=2,
            feedback_every=5,
            feedback_start_epoch=(-1 if fb else 10**9),
            rpi=args.rpi, render_hw=args.render_hw,
            output_dir=sink,
        )
        trainer = GanTrainer(
            loop_cfg, renderer, spin_params, spin_state,
            gen_cfg=GenConfig(), steps_per_epoch=steps_per_epoch,
            seed=args.seed,
        )
        curve = []
        rng = np.random.default_rng(args.seed)
        for epoch in range(args.gan_epochs):
            trainer.epoch = epoch  # train_step is driven directly (not via
            #                        train_epoch) so probes can interleave
            perm = rng.permutation(len(pool))
            for s in range(0, len(perm) - args.batch_size + 1, args.batch_size):
                if trainer.iter_num % args.probe_every == 0:
                    curve.append((trainer.iter_num, probe(trainer)))
                    print(f"[{tag}] iter {trainer.iter_num}: "
                          f"probe MPJPE {curve[-1][1]:.4f}")
                stats = trainer.train_step(pool[perm[s : s + args.batch_size]])
            print(f"[{tag}] epoch {epoch}: {stats}")
        curve.append((trainer.iter_num, probe(trainer)))
        curves[tag] = curve
        print(f"[{tag}] done in {time.time() - t0:.0f} s; "
              f"final probe MPJPE {curve[-1][1]:.4f}")
    summary["probe_curves"] = curves

    # ---- equal-size random-pose control set --------------------------------
    from posegen_tpu.gen.datasets import RenderedPoseDataset

    mined_dir = os.path.join(args.out, "mined")
    mined_ds = RenderedPoseDataset(mined_dir)
    mined_bones = mined_ds.bones
    n_mined = len(mined_ds)
    assert n_mined > 0, "feedback-on run produced no mined renders"
    control_dir = os.path.join(args.out, "control")
    control_bones = load_pose_pool(None, seed=args.seed + 400, n=n_mined)
    if not os.path.exists(os.path.join(control_dir, "poses_axis_angles0.npy")):
        render_set(control_bones, control_dir)
    summary["n_mined"] = n_mined

    # hardness of each training set for the PRETRAINED estimator
    summary["mined_set_mpjpe_pretrained"] = eval_on_dir(
        spin_params, spin_state, mined_dir, mined_bones[:n_mined]
    )
    summary["control_set_mpjpe_pretrained"] = eval_on_dir(
        spin_params, spin_state, control_dir, control_bones
    )
    print(f"set hardness (pretrained SPIN): mined "
          f"{summary['mined_set_mpjpe_pretrained']:.4f} vs random "
          f"{summary['control_set_mpjpe_pretrained']:.4f}")

    # ---- Phase 4: fine-tune on mined vs control, eval held-out -------------
    results = {}
    for tag, d in (("mined", mined_dir), ("control", control_dir)):
        t0 = time.time()
        ft_params, _ = train_spin(
            dict(spin_params), spin_state, render_dir=d,
            epochs=args.finetune_epochs, lr=5e-5, hinge=None,
            batch_size=min(32, n_mined),  # drop-last batching needs bs <= n
            seed=args.seed + 5,
        )
        results[tag] = eval_on_dir(ft_params, spin_state, eval_dir, eval_bones)
        print(f"fine-tuned on {tag}: held-out MPJPE {results[tag]:.4f} "
              f"({time.time() - t0:.0f} s)")
    summary["finetune_eval_mpjpe"] = results

    with open(os.path.join(args.out, "summary.json"), "w") as f:
        json.dump(summary, f, indent=2)
    print(json.dumps(
        {k: v for k, v in summary.items() if k != "probe_curves"}, indent=2
    ))


if __name__ == "__main__":
    main()
