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
    p.add_argument("--pretrain_epochs", type=int, default=200)
    p.add_argument("--finetune_epochs", type=int, default=30)
    p.add_argument("--gan_epochs", type=int, default=12)
    p.add_argument("--batch_size", type=int, default=128)
    p.add_argument("--pool_n", type=int, default=2048)
    p.add_argument("--rpi", type=int, default=8)
    p.add_argument("--probe_every", type=int, default=16,
                   help="G-iters between fixed-noise hardness probes")
    p.add_argument("--probe_n", type=int, default=16)
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--render_hw", type=int, default=512)
    p.add_argument("--feedback_every", type=int, default=5,
                   help="reference cadence 5 (run_gan.py:2041); lower = "
                        "stronger mining signal per iteration")
    p.add_argument("--spin_coef", type=float, default=0.1,
                   help="reference 0.1 (run_gan.py:2099)")
    p.add_argument("--ft_n", type=int, default=288,
                   help="fine-tune set size (mined subsampled, control "
                        "rendered, both equal)")
    p.add_argument("--pose_std", type=float, default=0.3,
                   help="std of every random pose draw; keep at/below the "
                        "NeRF's training-pose std (0.15 for the demo "
                        "scene) or renders of out-of-range poses degrade "
                        "and poison the (image, pose) supervision")
    p.add_argument("--feedback_start_epoch", type=int, default=-1,
                   help="feedback active when epoch > this (reference 2: "
                        "the generator first settles near the pose pool, "
                        "so mined poses render cleanly)")
    p.add_argument("--pretrain_gen_n", type=int, default=0,
                   help="extra pretraining renders drawn from the INITIAL "
                        "(t=0) generator distribution — calibrates the "
                        "estimator on generator-made poses so the A/B "
                        "starts from low error and the feedback term has "
                        "headroom to push it up (avoids the ceiling effect "
                        "where every generated pose is saturated-hard)")
    args = p.parse_args(argv)

    import jax
    import jax.numpy as jnp

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
    from posegen_tpu.skeleton.cameras import nerf_extrinsic_to_c2w
    from posegen_tpu.skeleton.kinematics import smpl_l2ws_from_rots

    os.makedirs(args.out, exist_ok=True)
    summary = {"args": vars(args)}

    def draw(seed: int, n: int) -> np.ndarray:
        rng_d = np.random.default_rng(seed)
        return (rng_d.standard_normal((n, 24, 3)) * args.pose_std).astype(
            np.float32
        )

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
        return mpjpe_prepared(params, state, x, bones)

    def mpjpe_per_sample(params, state, x, bones) -> np.ndarray:
        rotmat, _, _, _ = hmr_apply(params, state, x)
        pred = smpl_l2ws_from_rots(rotmat, scale=0.4)[..., :3, 3][:, J14]
        gt = fk_joints(jnp.asarray(bones))[:, J14]
        pred = pred - pred[:, :1]
        gt = gt - gt[:, :1]
        return np.asarray(jnp.mean(jnp.linalg.norm(pred - gt, axis=-1), axis=-1))

    def mpjpe_prepared(params, state, x, bones) -> float:
        return float(np.mean(mpjpe_per_sample(params, state, x, bones)))

    def load_split(out_dir: str, bones: np.ndarray):
        """Read a rendered split ONCE -> (prepared (N,224,224,3) f32 on host,
        FK'd 24-joint GT). PNG decode + crop/resize/normalize happen here
        a single time; all training/eval then runs from memory (the
        dataset-driver path re-decodes per epoch — fine for the product
        loop, hopeless for a 200-epoch pretrain on a 1-core host)."""
        import imageio.v2 as imageio

        img_dir = os.path.join(out_dir, "image")
        xs = []
        for s in range(0, len(bones), 32):
            imgs = np.stack([
                imageio.imread(os.path.join(img_dir, f"{i:05d}.png")) / 255.0
                for i in range(s, min(s + 32, len(bones)))
            ]).astype(np.float32)
            xs.append(np.asarray(prepare_spin_input(jnp.asarray(imgs))))
        gt = np.asarray(fk_joints(jnp.asarray(bones)))
        return np.concatenate(xs), gt

    def train_spin_inmem(params, state, x, gt, epochs, lr, seed,
                         eval_xy=None, tag=""):
        """BN-frozen SPIN training over in-memory prepared crops (the same
        make_spin_finetune_step the product driver uses, minus the per-epoch
        PNG decode)."""
        from posegen_tpu.gen.spin_train import make_spin_finetune_step

        opt, step = make_spin_finetune_step(lr=lr, hinge=None)
        opt_state = opt.init(params)
        rng_l = np.random.default_rng(seed)
        key = jax.random.PRNGKey(seed)
        # device-resident dataset: per-step host->device traffic over the
        # tunneled link (19 MB/batch) dominated step time; an on-device
        # gather is free
        x_dev = jnp.asarray(x)
        gt_dev = jnp.asarray(gt)
        for epoch in range(epochs):
            perm = rng_l.permutation(len(x))
            losses = []
            for s in range(0, len(perm) - 32 + 1, 32):
                b = jnp.asarray(perm[s : s + 32])
                key, k = jax.random.split(key)
                params, opt_state, st = step(
                    params, state, opt_state, jnp.take(x_dev, b, axis=0),
                    jnp.take(gt_dev, b, axis=0), k,
                )
                losses.append(float(st["spin_loss"]))
            if epoch % 20 == 0 or epoch == epochs - 1:
                msg = f"[{tag}] epoch {epoch}: loss {np.mean(losses):.5f}"
                if eval_xy is not None:
                    msg += (f" eval MPJPE "
                            f"{mpjpe_prepared(params, state, *eval_xy):.4f}")
                print(msg, flush=True)
        return params

    def eval_on_dir(params, state, out_dir: str, bones: np.ndarray) -> float:
        x, _ = load_split(out_dir, bones)
        errs = [
            mpjpe_prepared(params, state, jnp.asarray(x[s : s + 32]),
                           bones[s : s + 32])
            for s in range(0, len(bones), 32)
        ]
        return float(np.mean(errs))

    # ---- Phase 1: pretrain + eval splits -----------------------------------
    t0 = time.time()
    pool_pre = draw(args.seed + 100, args.n_pretrain + args.n_eval)
    pre_bones = pool_pre[: args.n_pretrain]
    eval_bones = pool_pre[args.n_pretrain :]
    pre_dir = os.path.join(args.out, "pretrain")
    eval_dir = os.path.join(args.out, "eval")
    if not os.path.exists(os.path.join(pre_dir, "poses_axis_angles0.npy")):
        render_set(pre_bones, pre_dir)
        render_set(eval_bones, eval_dir)
    print(f"phase 1 (splits rendered): {time.time() - t0:.0f} s")

    # optional generator-distribution pretraining additions (t=0 generator,
    # the SAME init the A/B's GanTrainer will start from: PRNGKey(seed))
    if args.pretrain_gen_n > 0:
        from posegen_tpu.gen.generators import init_pose_generator

        gen_dir = os.path.join(args.out, "pretrain_gen")
        g0_params, g0_state = init_pose_generator(
            jax.random.PRNGKey(args.seed), GenConfig()
        )
        gen_in = draw(args.seed + 4242, args.pretrain_gen_n)
        out_g0, _ = pose_generator_apply(
            g0_params, g0_state, jax.random.PRNGKey(args.seed + 4242),
            jnp.asarray(gen_in), GenConfig(),
        )
        gen_pre_bones = np.asarray(out_g0["pose_ba"])
        if not os.path.exists(os.path.join(gen_dir, "poses_axis_angles0.npy")):
            render_set(gen_pre_bones, gen_dir)

    # ---- Phase 2: pretrain the HMR -----------------------------------------
    t0 = time.time()
    spin_params, spin_state = init_hmr(jax.random.PRNGKey(args.seed + 2))
    x_pre, gt_pre = load_split(pre_dir, pre_bones)
    if args.pretrain_gen_n > 0:
        x_g, gt_g = load_split(gen_dir, gen_pre_bones)
        x_pre = np.concatenate([x_pre, x_g])
        gt_pre = np.concatenate([gt_pre, gt_g])
    x_eval, _ = load_split(eval_dir, eval_bones)
    x_eval = jnp.asarray(x_eval)
    mpjpe_init = mpjpe_prepared(spin_params, spin_state, x_eval, eval_bones)
    print(f"random-init SPIN eval MPJPE: {mpjpe_init:.4f}", flush=True)

    pretrained_npz = os.path.join(args.out, "spin_pretrained.npz")
    if os.path.exists(pretrained_npz):
        from posegen_tpu.train.checkpoints import _unflatten_into

        tree = _unflatten_into(
            {"params": spin_params, "state": spin_state},
            dict(np.load(pretrained_npz)),
        )
        spin_params, spin_state = tree["params"], tree["state"]
    else:
        spin_params = train_spin_inmem(
            spin_params, spin_state, x_pre, gt_pre,
            epochs=args.pretrain_epochs, lr=3e-4, seed=args.seed,
            eval_xy=(x_eval, eval_bones), tag="pretrain",
        )
        from posegen_tpu.train.checkpoints import _flatten

        np.savez(pretrained_npz,
                 **_flatten({"params": spin_params, "state": spin_state}))
    mpjpe_pre = mpjpe_prepared(spin_params, spin_state, x_eval, eval_bones)
    print(f"pretrained SPIN eval MPJPE: {mpjpe_pre:.4f} "
          f"(phase 2: {time.time() - t0:.0f} s)", flush=True)
    summary["spin_eval_mpjpe_random_init"] = mpjpe_init
    summary["spin_eval_mpjpe_pretrained"] = mpjpe_pre

    # ---- Phase 3: GAN A/B, feedback ON vs OFF ------------------------------
    pool = draw(args.seed, args.pool_n)
    probe_real = draw(args.seed + 300, args.probe_n)
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
    on_trainer = None
    for tag, fb in (("feedback_on", True), ("feedback_off", False)):
        t0 = time.time()
        sink = os.path.join(args.out, "mined") if fb else None
        loop_cfg = GanLoopConfig(
            n_epochs=args.gan_epochs, df=2,
            feedback_every=args.feedback_every,
            feedback_start_epoch=(args.feedback_start_epoch if fb else 10**9),
            rpi=args.rpi, render_hw=args.render_hw,
            spin_coef=args.spin_coef,
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
                          f"probe MPJPE {curve[-1][1]:.4f}", flush=True)
                stats = trainer.train_step(pool[perm[s : s + args.batch_size]])
            print(f"[{tag}] epoch {epoch}: {stats}", flush=True)
        curve.append((trainer.iter_num, probe(trainer)))
        curves[tag] = curve
        print(f"[{tag}] done in {time.time() - t0:.0f} s; "
              f"final probe MPJPE {curve[-1][1]:.4f}", flush=True)
        if fb:
            on_trainer = trainer
    summary["probe_curves"] = curves

    # ---- equal-size sets: mined subsample vs random control ----------------
    from posegen_tpu.gen.datasets import RenderedPoseDataset

    mined_dir = os.path.join(args.out, "mined")
    mined_ds = RenderedPoseDataset(mined_dir)
    n_mined_total = len(mined_ds)
    assert n_mined_total > 0, "feedback-on run produced no mined renders"
    n_ft = min(args.ft_n, n_mined_total)
    # subsample the mined sink uniformly (spread over the whole run, not
    # just the early iterations)
    mined_sel = np.linspace(0, n_mined_total - 1, n_ft).astype(int)
    mined_bones = mined_ds.bones[mined_sel]
    control_dir = os.path.join(args.out, "control")
    control_bones = draw(args.seed + 400, n_ft)
    if len([f for f in os.listdir(os.path.join(control_dir, "image"))]
           if os.path.exists(os.path.join(control_dir, "image")) else []) < n_ft:
        render_set(control_bones, control_dir)
    summary["n_mined"] = n_mined_total
    summary["n_ft"] = n_ft

    def load_mined_subset():
        import imageio.v2 as imageio

        img_dir = os.path.join(mined_dir, "image")
        xs = []
        for s in range(0, n_ft, 32):
            imgs = np.stack([
                imageio.imread(
                    os.path.join(img_dir, f"{mined_sel[i]:05d}.png")
                ) / 255.0
                for i in range(s, min(s + 32, n_ft))
            ]).astype(np.float32)
            xs.append(np.asarray(prepare_spin_input(jnp.asarray(imgs))))
        return np.concatenate(xs), np.asarray(fk_joints(jnp.asarray(mined_bones)))

    # ---- hard held-out eval split: poses from the final feedback-on
    # generator at held-out noise (the failure modes mining targets) --------
    hard_dir = os.path.join(args.out, "eval_hard")
    out_h, _ = pose_generator_apply(
        on_trainer.g_params, on_trainer.g_state,
        jax.random.PRNGKey(args.seed + 888),
        jnp.asarray(draw(args.seed + 999, args.n_eval)),
        on_trainer.gen_cfg,
    )
    hard_bones = np.asarray(out_h["pose_ba"])
    render_set(hard_bones, hard_dir)
    x_hard, _ = load_split(hard_dir, hard_bones)
    x_hard = jnp.asarray(x_hard)

    # ---- naturally-hard eval split: worst-quartile RANDOM poses by
    # pretrained error (non-circular — nothing here came from the
    # generator; tests whether mined fine-tuning fixes the estimator's
    # own failure modes in the wild) ----------------------------------------
    nat_dir = os.path.join(args.out, "eval_nat")
    nat_pool = draw(args.seed + 1234, 4 * args.n_eval)
    if not os.path.exists(os.path.join(nat_dir, "poses_axis_angles0.npy")):
        render_set(nat_pool, nat_dir)
    x_nat_all, _ = load_split(nat_dir, nat_pool)
    errs_nat = np.concatenate([
        mpjpe_per_sample(spin_params, spin_state,
                         jnp.asarray(x_nat_all[s : s + 32]),
                         nat_pool[s : s + 32])
        for s in range(0, len(nat_pool), 32)
    ])
    worst = np.argsort(errs_nat)[-args.n_eval :]
    x_hard_nat = jnp.asarray(x_nat_all[worst])
    hard_nat_bones = nat_pool[worst]

    # hardness of each training set for the PRETRAINED estimator
    x_mined, gt_mined = load_mined_subset()
    x_ctrl, gt_ctrl = load_split(control_dir, control_bones)
    summary["mined_set_mpjpe_pretrained"] = mpjpe_prepared(
        spin_params, spin_state, jnp.asarray(x_mined), mined_bones
    )
    summary["control_set_mpjpe_pretrained"] = mpjpe_prepared(
        spin_params, spin_state, jnp.asarray(x_ctrl), control_bones
    )
    print(f"set hardness (pretrained SPIN): mined "
          f"{summary['mined_set_mpjpe_pretrained']:.4f} vs random "
          f"{summary['control_set_mpjpe_pretrained']:.4f}", flush=True)

    # ---- Phase 4: fine-tune on mined vs control; eval easy + hard splits ---
    def eval_all(params):
        return {
            "easy": mpjpe_prepared(params, spin_state, x_eval, eval_bones),
            "hard_gen": mpjpe_prepared(params, spin_state, x_hard, hard_bones),
            "hard_nat": mpjpe_prepared(
                params, spin_state, x_hard_nat, hard_nat_bones
            ),
        }

    summary["pretrained_eval"] = eval_all(spin_params)
    print(f"pretrained eval: {summary['pretrained_eval']}", flush=True)
    results = {}
    for tag, (x_ft, gt_ft) in (("mined", (x_mined, gt_mined)),
                               ("control", (x_ctrl, gt_ctrl))):
        t0 = time.time()
        ft_params = train_spin_inmem(
            dict(spin_params), spin_state, x_ft, gt_ft,
            epochs=args.finetune_epochs, lr=5e-5, seed=args.seed + 5,
            eval_xy=(x_eval, eval_bones), tag=f"ft-{tag}",
        )
        results[tag] = eval_all(ft_params)
        print(f"fine-tuned on {tag}: held-out MPJPE {results[tag]} "
              f"({time.time() - t0:.0f} s)", flush=True)
    summary["finetune_eval_mpjpe"] = results

    with open(os.path.join(args.out, "summary.json"), "w") as f:
        json.dump(summary, f, indent=2)
    print(json.dumps(
        {k: v for k, v in summary.items() if k != "probe_curves"}, indent=2
    ))


if __name__ == "__main__":
    main()
