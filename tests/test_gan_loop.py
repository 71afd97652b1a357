"""GAN loop + SPIN fine-tune integration tests (tiny everything)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from posegen_tpu.gen.generators import GenConfig
from posegen_tpu.gen.hmr import init_hmr
from posegen_tpu.gen.loop import (
    GanLoopConfig,
    GanTrainer,
    NeRFRenderer,
    fk_joints,
    prepare_spin_input,
)
from posegen_tpu.gen.spin_train import make_spin_finetune_step, spin_pose_loss
from posegen_tpu.render.raycast import RaycastConfig, init_raycaster

TINY_NERF = RaycastConfig(N_samples=8, N_importance=0, netdepth=2, netwidth=32)
TINY_GEN = GenConfig(width=32, num_stages=1)


def test_prepare_spin_input(rng):
    imgs = rng.uniform(0, 1, (2, 512, 512, 3)).astype(np.float32)
    x = prepare_spin_input(imgs)
    assert x.shape == (2, 224, 224, 3)
    # normalized stats near ImageNet transform of U[0,1]
    assert abs(float(jnp.mean(x))) < 1.0


def test_gan_trainer_steps_without_feedback(rng):
    cfg = GanLoopConfig(n_epochs=2, rpi=2, df=1)
    trainer = GanTrainer(cfg, renderer=None, gen_cfg=TINY_GEN, steps_per_epoch=4)
    poses = (rng.standard_normal((4, 8, 24, 3)) * 0.2).astype(np.float32)
    stats = trainer.train_epoch(poses)
    assert np.isfinite(stats["gen_loss"])
    assert "dis_loss" in stats
    assert trainer.epoch == 1


@pytest.mark.slow
def test_gan_trainer_with_spin_feedback(rng, tmp_path):
    """Full loop: G -> resident NeRF render -> SPIN -> reward, tiny shapes."""
    nerf_params = init_raycaster(jax.random.PRNGKey(0), TINY_NERF)
    renderer = NeRFRenderer(TINY_NERF, nerf_params, hw=96, focal=120.0, chunk=4096)
    spin_params, spin_state = init_hmr(jax.random.PRNGKey(1))

    cfg = GanLoopConfig(
        n_epochs=2, rpi=1, df=2, feedback_every=1, feedback_start_epoch=-1,
        crop=(16, 80), output_dir=str(tmp_path / "render_output"),
    )
    trainer = GanTrainer(
        cfg, renderer, spin_params, spin_state, gen_cfg=TINY_GEN, steps_per_epoch=2
    )
    poses = (rng.standard_normal((2, 24, 3)) * 0.2).astype(np.float32)
    # feedback engages immediately: the reward is computed on THIS
    # iteration's generated poses (pre-run with the update's PRNG key)
    s1 = trainer.train_step(poses)
    assert np.isfinite(s1["gen_loss"])
    assert s1["spin_loss"] != 0.0
    s2 = trainer.train_step(poses)
    assert np.isfinite(s2["gen_loss"])
    # dataset sink wrote renders + poses
    assert (tmp_path / "render_output" / "image" / "00000.png").exists()


def test_spin_pose_loss_hinge(rng):
    from posegen_tpu.skeleton.rotations import axisang_to_rot

    aa = (rng.standard_normal((4, 24, 3)) * 0.2).astype(np.float32)
    rotmat = axisang_to_rot(jnp.asarray(aa))
    gt = fk_joints(jnp.asarray(aa), 0.4)
    # perfect prediction -> ~zero loss, all samples kept
    loss, per_sample = spin_pose_loss(rotmat, gt)
    assert float(loss) < 1e-4
    # corrupt gt SHAPE (loss is translation- and scale-invariant) -> every
    # per-sample error exceeds the hinge -> filtered mean is zero
    noise = jnp.asarray(rng.standard_normal(gt.shape).astype(np.float32))
    loss_bad, ps = spin_pose_loss(rotmat, gt + noise)
    assert float(loss_bad) == 0.0 and np.all(np.asarray(ps) > 0.02)


@pytest.mark.slow
def test_spin_finetune_step_updates_weights(rng):
    params, state = init_hmr(jax.random.PRNGKey(0))
    opt, step = make_spin_finetune_step(lr=1e-4, hinge=None)
    opt_state = opt.init(params)
    imgs = jnp.asarray(rng.uniform(-1, 1, (2, 64, 64, 3)).astype(np.float32))
    gt = fk_joints(jnp.asarray((rng.standard_normal((2, 24, 3)) * 0.2).astype(np.float32)))
    w0 = np.asarray(params["fc1"]["w"])
    ip0 = np.asarray(params["init_pose"])
    params, opt_state, stats = step(
        params, state, opt_state, imgs, gt, jax.random.PRNGKey(1)
    )
    assert np.isfinite(float(stats["spin_loss"]))
    assert not np.allclose(np.asarray(params["fc1"]["w"]), w0)
    # mean-param buffers stay frozen
    np.testing.assert_array_equal(np.asarray(params["init_pose"]), ip0)


@pytest.mark.slow
def test_spin_finetune_driver(tmp_path, rng):
    """train_spin over a generated render dir: loss finite, ckpts written."""
    import imageio.v2 as imageio

    from posegen_tpu.gen.spin_driver import train_spin

    out = tmp_path / "render_output"
    (out / "image").mkdir(parents=True)
    n = 4
    bones = (rng.standard_normal((n, 24, 3)) * 0.2).astype(np.float32)
    np.save(out / "poses_axis_angles0.npy", bones)
    for i in range(n):
        imageio.imwrite(
            out / "image" / f"{i:05d}.png",
            rng.integers(0, 255, (96, 96, 3), dtype=np.uint8),
        )

    params, state = init_hmr(jax.random.PRNGKey(0))
    w0 = np.asarray(params["fc1"]["w"])
    params, history = train_spin(
        params, state, str(out), epochs=1, batch_size=2,
        crop=(16, 80), res=64, ckpt_dir=str(tmp_path / "ckpts"),
    )
    assert np.isfinite(history[0]["spin_loss"])
    assert (tmp_path / "ckpts" / "spin_000.npz").exists()
    # note: the hinge may filter every (random-image) sample to zero loss;
    # weights change only when some sample passes — accept either, but the
    # driver must run end-to-end without error
    assert w0.shape == np.asarray(params["fc1"]["w"]).shape


@pytest.mark.slow
def test_gan_train_epochs_feedback_then_spin_finetune(rng, tmp_path):
    """Epoch-level integration of the WHOLE PoseGen pipeline at tiny
    shapes: GanTrainer.train_epoch with the real render path and SPIN
    feedback across epochs, then one spin_driver.train_spin epoch on the
    generated (image, pose) sink (reference run_gan.py train() ->
    train_spin(), :2259-2297 + :1849-1952)."""
    from posegen_tpu.gen.spin_driver import train_spin

    nerf_params = init_raycaster(jax.random.PRNGKey(0), TINY_NERF)
    renderer = NeRFRenderer(TINY_NERF, nerf_params, hw=96, focal=120.0, chunk=4608)
    spin_params, spin_state = init_hmr(jax.random.PRNGKey(1))

    sink = str(tmp_path / "render_output")
    cfg = GanLoopConfig(
        n_epochs=3, rpi=1, df=2, feedback_every=2, feedback_start_epoch=0,
        crop=(16, 80), output_dir=sink,
    )
    trainer = GanTrainer(
        cfg, renderer, spin_params, spin_state, gen_cfg=TINY_GEN, steps_per_epoch=2
    )
    pool = (rng.standard_normal((4, 2, 24, 3)) * 0.2).astype(np.float32)
    curves = []
    for _ in range(3):
        stats = trainer.train_epoch(list(pool))
        curves.append(stats["gen_loss"])
    assert np.isfinite(curves).all(), curves
    assert trainer.iter_num == 12
    # the sink accumulated renders over the feedback calls
    import glob

    pngs = glob.glob(f"{sink}/image/*.png")
    assert len(pngs) >= 2, pngs

    # one SPIN fine-tune epoch on the generated dataset
    new_params, history = train_spin(
        spin_params, spin_state, render_dir=sink, epochs=1, batch_size=2,
        crop=(16, 80), hinge=None,  # random-init SPIN: every sample would
        # fall outside the 0.02 hinge band, zeroing the epoch
    )
    assert np.isfinite(history[-1]["spin_loss"])
    # weights moved somewhere in the tree (BN params stay frozen)
    moved = max(
        float(jnp.abs(a - b).max())
        for a, b in zip(
            jax.tree_util.tree_leaves(spin_params),
            jax.tree_util.tree_leaves(new_params),
        )
    )
    assert moved > 0.0, "no SPIN weight moved during fine-tuning"


def test_gan_checkpoint_resume_exact(rng, tmp_path):
    """save_checkpoint/load_checkpoint resume a GAN run bit-exactly: params,
    both optimizers, the PRNG key, the fake-replay pool (items + RNG bit
    state), and the iter/epoch counters all round-trip, so continuing from
    the checkpoint reproduces the uninterrupted run on the same batches.
    (The reference persists only SPIN state, run_gan.py:1947.)"""
    cfg = GanLoopConfig(n_epochs=4, rpi=2, df=2)
    poses = (rng.standard_normal((8, 4, 24, 3)) * 0.2).astype(np.float32)

    a = GanTrainer(cfg, renderer=None, gen_cfg=TINY_GEN, steps_per_epoch=4, seed=3)
    for b in poses[:4]:
        a.train_step(b)
    ckpt = a.save_checkpoint(str(tmp_path / "gan_ckpts" / "gan_000.npz"))
    for b in poses[4:]:
        a.train_step(b)

    b_tr = GanTrainer(cfg, renderer=None, gen_cfg=TINY_GEN, steps_per_epoch=4, seed=99)
    b_tr.load_checkpoint(ckpt)
    assert b_tr.iter_num == 4
    for b in poses[4:]:
        b_tr.train_step(b)

    for la, lb in zip(
        jax.tree_util.tree_leaves((a.g_params, a.d_params, a.g_state)),
        jax.tree_util.tree_leaves((b_tr.g_params, b_tr.d_params, b_tr.g_state)),
    ):
        np.testing.assert_array_equal(np.asarray(la), np.asarray(lb))
    assert len(a.fake_pool.items) == len(b_tr.fake_pool.items)


def test_spin_feedback_reward_direction(rng):
    """The feedback reward steers the generator AWAY from SPIN's predictions
    — the hard-pose-mining direction (VERDICT r3 item 1; reference
    run_gan.py:2041-2100: gen loss includes 1 - mpjpe(SPIN, gen_joints), so
    minimizing it GROWS the estimator error of generated poses)."""
    from posegen_tpu.gen.discriminators import init_pos3d_discriminator
    from posegen_tpu.gen.gan import SPIN_J14, make_generator_step
    from posegen_tpu.gen.generators import (
        init_pose_generator,
        pose_generator_apply,
    )

    cfg = TINY_GEN
    g_params, g_state = init_pose_generator(jax.random.PRNGKey(0), cfg)
    d_params = init_pos3d_discriminator(jax.random.PRNGKey(1))
    real = jnp.asarray(rng.standard_normal((16, 24, 3)) * 0.2, jnp.float32)
    key = jax.random.PRNGKey(2)  # FIXED noise: movement comes from params

    # spin_pred = the generator's CURRENT joints -> initial error ~ 0
    out0, _ = pose_generator_apply(g_params, g_state, key, real, cfg)
    joints0 = fk_joints(out0["pose_ba"])
    sel = jnp.arange(8, dtype=jnp.int32)
    spin_pred = joints0[sel][:, jnp.asarray(SPIN_J14)]

    # spin_coef heavy so the mining term dominates the adversarial one
    opt, step = make_generator_step(fk_joints, cfg, spin_coef=5.0)
    opt_state = opt.init(g_params)
    errs = []
    for _ in range(15):
        g_params, g_state, opt_state, out, stats = step(
            g_params, g_state, opt_state, d_params, key, real,
            spin_pred, sel, jnp.asarray(1.0),
        )
        # stats carry spin_loss = 1 - err
        errs.append(1.0 - float(stats["spin_loss"]))

    assert errs[0] < 0.05, f"initial error should be ~0, got {errs[0]}"
    assert errs[-1] > errs[0] + 0.05, (
        f"feedback failed to push poses away from SPIN: {errs[0]:.4f} -> "
        f"{errs[-1]:.4f}"
    )
    # monotone-ish growth: the last third is harder than the first third
    assert np.mean(errs[-5:]) > np.mean(errs[:5])


def test_latest_gan_checkpoint_numeric_order(tmp_path):
    """Resume must pick the numerically-latest epoch: lexical sort would
    rank gan_999.npz above gan_1000.npz."""
    from posegen_tpu.cli.run_gan import latest_gan_checkpoint

    assert latest_gan_checkpoint(str(tmp_path)) is None
    for name in ["gan_002.npz", "gan_999.npz", "gan_1000.npz", "gan_010.npz"]:
        (tmp_path / name).write_bytes(b"")
    assert latest_gan_checkpoint(str(tmp_path)).endswith("gan_1000.npz")

    # non-conforming names (hand-copied checkpoints) are skipped, not a crash
    (tmp_path / "gan_best.npz").write_bytes(b"")
    (tmp_path / "gan_12_old.npz").write_bytes(b"")
    assert latest_gan_checkpoint(str(tmp_path)).endswith("gan_1000.npz")
