"""Data-parallel GAN + SPIN steps match their single-device twins.

Runs on the conftest's virtual 8-device CPU mesh. The contract under test
(parallel/gan.py): with equal shards, each shard_map step reproduces the
single-device step on the concatenated batch — sync-BN (global moments),
globally-drawn noise slices, all_gathered joints for the SPIN-feedback
selection, global hinge denominators, psum'd gradients.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from posegen_tpu.gen.discriminators import init_pos3d_discriminator
from posegen_tpu.gen.gan import make_discriminator_step, make_generator_step
from posegen_tpu.gen.generators import GenConfig, init_pose_generator
from posegen_tpu.gen.loop import fk_joints
from posegen_tpu.parallel.gan import (
    make_parallel_discriminator_step,
    make_parallel_generator_step,
    make_parallel_spin_finetune_step,
)
from posegen_tpu.parallel.mesh import make_mesh

pytestmark = pytest.mark.skipif(
    jax.device_count() < 8, reason="needs the 8-device CPU mesh"
)


def assert_trees_close(a, b, rtol=5e-4, atol=5e-5):
    # atol floor: one Adam step turns reduction-order fp noise in near-zero
    # gradients into O(lr) parameter wiggles; 5e-5 = lr/2 covers it
    leaves_a, treedef_a = jax.tree_util.tree_flatten(a)
    leaves_b, treedef_b = jax.tree_util.tree_flatten(b)
    assert treedef_a == treedef_b
    for la, lb in zip(leaves_a, leaves_b):
        np.testing.assert_allclose(
            np.asarray(la), np.asarray(lb), rtol=rtol, atol=atol
        )


def test_parallel_discriminator_matches_single():
    mesh = make_mesh(8)
    d_params = init_pos3d_discriminator(jax.random.PRNGKey(0))
    rng = np.random.default_rng(1)
    real = jnp.asarray(rng.standard_normal((32, 24, 3)), jnp.float32)
    fake = jnp.asarray(rng.standard_normal((32, 24, 3)), jnp.float32)

    opt, step_s = make_discriminator_step()
    _, step_p = make_parallel_discriminator_step(mesh)

    ps, os_s, st_s = step_s(d_params, opt.init(d_params), real, fake)
    pp, os_p, st_p = step_p(d_params, opt.init(d_params), real, fake)

    assert_trees_close(ps, pp)
    assert_trees_close(st_s, st_p)


def test_parallel_discriminator_rejects_ragged_batch():
    mesh = make_mesh(8)
    d_params = init_pos3d_discriminator(jax.random.PRNGKey(0))
    _, step_p = make_parallel_discriminator_step(mesh)
    bad = jnp.zeros((30, 24, 3))
    with pytest.raises(ValueError, match="divide evenly"):
        step_p(d_params, None, bad, bad)


def test_parallel_generator_matches_single():
    """Sync-BN + global noise + gathered joints: the sharded generator step
    reproduces the single-device one, including the SPIN feedback term with
    spin_sel indexing the GLOBAL batch across shard boundaries."""
    mesh = make_mesh(8)
    cfg = GenConfig()
    g_params, g_state = init_pose_generator(jax.random.PRNGKey(2), cfg)
    d_params = init_pos3d_discriminator(jax.random.PRNGKey(3))
    rng = np.random.default_rng(4)
    real = jnp.asarray(rng.standard_normal((32, 24, 3)), jnp.float32)
    spin_pred = jnp.asarray(rng.standard_normal((4, 14, 3)), jnp.float32)
    # deliberately straddles shard boundaries (shards are 4 rows each)
    spin_sel = jnp.asarray([0, 5, 17, 31], jnp.int32)
    active = jnp.asarray(1.0)
    key = jax.random.PRNGKey(5)

    fk = fk_joints
    opt, step_s = make_generator_step(fk, cfg)
    _, step_p = make_parallel_generator_step(mesh, fk, cfg)

    ps, ns_s, os_s, out_s, st_s = step_s(
        g_params, g_state, opt.init(g_params), d_params, key, real,
        spin_pred, spin_sel, active,
    )
    pp, ns_p, os_p, out_p, st_p = step_p(
        g_params, g_state, opt.init(g_params), d_params, key, real,
        spin_pred, spin_sel, active,
    )

    assert_trees_close(out_s["pose_ba"], out_p["pose_ba"])
    assert_trees_close(st_s, st_p)
    assert_trees_close(ns_s, ns_p)  # sync-BN state is replicated-global
    assert_trees_close(ps, pp)
    assert float(st_p["spin_loss"]) != 0.0  # the feedback term was live


def test_parallel_spin_finetune_matches_single():
    """The sharded BN-frozen SPIN step (ResNet-50) matches single-device,
    including the hinge's divide-by-global-keep-count semantics with kept
    and rejected samples living on different shards."""
    from posegen_tpu.gen.hmr import hmr_apply, init_hmr
    from posegen_tpu.gen.spin_train import make_spin_finetune_step
    from posegen_tpu.skeleton.kinematics import smpl_l2ws_from_rots

    mesh = make_mesh(8)
    params, bn_state = init_hmr(jax.random.PRNGKey(6))
    rng = np.random.default_rng(7)
    images = jnp.asarray(rng.standard_normal((8, 224, 224, 3)) * 0.1, jnp.float32)

    # craft GT so even samples pass the hinge (~zero error) and odd ones
    # fail it — the keep-count then spans shards
    rotmat, _, _, _ = hmr_apply(params, bn_state, images, train=False)
    gt = np.array(smpl_l2ws_from_rots(rotmat, scale=0.4)[..., :3, 3])
    gt[1::2] += 1.0
    gt = jnp.asarray(gt)

    opt, step_s = make_spin_finetune_step(lr=1e-4)
    _, step_p = make_parallel_spin_finetune_step(mesh, lr=1e-4)

    ps, os_s, st_s = step_s(params, bn_state, opt.init(params), images, gt, None)
    pp, os_p, st_p = step_p(params, bn_state, opt.init(params), images, gt, None)

    np.testing.assert_allclose(
        float(st_s["spin_loss"]), float(st_p["spin_loss"]), rtol=1e-5
    )
    assert float(st_s["spin_loss"]) > 0.0  # some samples were kept
    assert_trees_close(st_s["per_sample"], st_p["per_sample"])
    # Params after ONE Adam step: update ≈ ±lr·sign(g), so fp reduction-order
    # noise in near-zero gradients flips signs and max|diff| can reach 2·lr
    # legitimately. An actually-unsynced gradient (missing psum) changes the
    # update DIRECTION of roughly half the elements, which the mean-|diff|
    # bound (≪ lr) catches even though the max bound alone would not.
    for leaf in ("fc1", "conv1"):
        diff = np.abs(
            np.asarray(ps[leaf]["w"]) - np.asarray(pp[leaf]["w"])
        )
        assert diff.max() <= 2.2e-4, f"{leaf}: max {diff.max():.2e}"
        assert diff.mean() <= 4e-5, f"{leaf}: mean {diff.mean():.2e}"


def test_gan_trainer_runs_on_mesh():
    """GanTrainer(mesh=...) plumbing: two iterations (G every step, D on the
    df cadence) on the 8-device mesh produce finite stats."""
    from posegen_tpu.gen.loop import GanLoopConfig, GanTrainer

    trainer = GanTrainer(
        GanLoopConfig(n_epochs=2, df=1), renderer=None,
        steps_per_epoch=2, seed=0, mesh=make_mesh(8),
    )
    rng = np.random.default_rng(8)
    for _ in range(2):
        stats = trainer.train_step(rng.standard_normal((16, 24, 3)).astype(np.float32))
        assert all(np.isfinite(v) for v in stats.values()), stats
    assert "dis_loss" in stats
