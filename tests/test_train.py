"""Trainer, pose-opt and multi-chip sharding tests."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from posegen_tpu.pose.opt import (
    PoseOptConfig,
    init_pose_params,
    kp_reg_loss,
    pose_apply,
)
from posegen_tpu.render.raycast import RaycastConfig, init_raycaster
from posegen_tpu.skeleton.skeleton import SMPL_REST_POSE
from posegen_tpu.train.trainer import TrainConfig, create_train_state, make_train_step
from posegen_tpu.utils.fixtures import make_train_batch

TINY = RaycastConfig(N_samples=8, N_importance=4, netdepth=2, netwidth=32)


def _make_state(tcfg, opt_pose=False, n_frames=4):
    variables = init_raycaster(jax.random.PRNGKey(0), TINY)
    pose_params = anchors = None
    if opt_pose:
        rng = np.random.default_rng(0)
        bones0 = (rng.standard_normal((n_frames, 24, 3)) * 0.1).astype(np.float32)
        kp0 = np.tile(SMPL_REST_POSE[None], (n_frames, 1, 1))
        pose_params, anchors = init_pose_params(PoseOptConfig(), bones0, kp0)
    return create_train_state(variables, tcfg, pose_params, anchors)


def test_train_step_decreases_loss():
    tcfg = TrainConfig(lrate=5e-3)
    state = _make_state(tcfg)
    step = jax.jit(make_train_step(TINY, tcfg))
    batch = make_train_batch(TINY, n_rays=128)
    key = jax.random.PRNGKey(0)
    losses = []
    for i in range(10):
        state, stats = step(state, batch, jax.random.fold_in(key, i))
        losses.append(float(stats["total_loss"]))
    assert np.isfinite(losses).all()
    assert losses[-1] < losses[0], f"loss did not decrease: {losses}"
    assert int(state.step) == 10


def test_train_step_pose_opt_updates_pose():
    n_frames = 4
    tcfg = TrainConfig(opt_pose=True, opt_pose_step=1, use_temp_loss=True)
    state = _make_state(tcfg, opt_pose=True, n_frames=n_frames)
    step = jax.jit(
        make_train_step(
            TINY,
            tcfg,
            PoseOptConfig(),
            rest_pose=jnp.asarray(SMPL_REST_POSE),
            n_frames=n_frames,
        )
    )
    batch = make_train_batch(TINY, n_rays=64, opt_pose=True, n_frames=n_frames)
    b0 = np.asarray(state.pose_params["bones"])
    state, stats = step(state, batch, jax.random.PRNGKey(0))
    assert np.isfinite(float(stats["total_loss"]))
    assert not np.allclose(np.asarray(state.pose_params["bones"]), b0), (
        "pose params did not receive gradients"
    )
    assert "kp_loss" in stats and "mpjpc" in stats and "temp_loss" in stats


def test_pose_apply_shapes_and_anchor_loss():
    rng = np.random.default_rng(1)
    n_frames = 3
    bones0 = (rng.standard_normal((n_frames, 24, 3)) * 0.1).astype(np.float32)
    kp0 = np.tile(SMPL_REST_POSE[None], (n_frames, 1, 1))
    pcfg = PoseOptConfig(use_rot6d=True, opt_pose_tol=0.01)
    params, anchors = init_pose_params(pcfg, bones0, kp0)
    assert params["bones"].shape == (n_frames, 24, 6)

    idx = jnp.asarray([0, 2, 1, 0])
    kps, bones, skts, l2ws = pose_apply(params, idx, jnp.asarray(SMPL_REST_POSE))
    assert kps.shape == (4, 24, 3)
    assert skts.shape == (4, 24, 4, 4)

    # at the anchor, the hinge loss is exactly zero
    assert float(kp_reg_loss(pcfg, params, anchors, idx)) < 1e-10
    # perturbations beyond tol give positive loss (pelvis alone does not:
    # the reference trainer's kp loss has no pelvis term, trainer.py:385-408)
    moved = {
        "pelvis": params["pelvis"] + 1.0,
        "bones": params["bones"] + 0.5,
    }
    assert float(kp_reg_loss(pcfg, moved, anchors, idx)) > 0.0
    pelvis_only = {"pelvis": params["pelvis"] + 1.0, "bones": params["bones"]}
    assert float(kp_reg_loss(pcfg, pelvis_only, anchors, idx)) < 1e-10


def test_embed_tau_annealed_in_step():
    tcfg = TrainConfig()
    state = _make_state(tcfg)
    step = jax.jit(make_train_step(TINY, tcfg))
    batch = make_train_batch(TINY, n_rays=64)
    tau0 = float(state.embeds["embed_kp"]["tau"])
    for i in range(3):
        state, _ = step(state, batch, jax.random.PRNGKey(i))
    tau1 = float(state.embeds["embed_kp"]["tau"])
    assert tau1 > tau0 * (10.0 ** (2 / 250000.0)) * 0.999


def test_graft_entry_single():
    import __graft_entry__ as ge

    fn, args = ge.entry()
    out = jax.jit(fn)(*args)
    assert out.shape == (1024, 3)
    assert bool(jnp.isfinite(out).all())


def test_graft_entry_multichip():
    import __graft_entry__ as ge

    assert jax.device_count() >= 8, "conftest should force 8 cpu devices"
    ge.dryrun_multichip(8)


@pytest.mark.slow
def test_shardmap_fused_render_multichip():
    """shard_map splits rays across 8 virtual devices; each runs the fused
    kernel (interpret on CPU); result matches the single-device render."""
    import posegen_tpu.kernels.field as field
    from posegen_tpu.parallel.mesh import make_mesh, make_shardmap_render, replicate
    from posegen_tpu.render.raycast import RaycastConfig, render_rays
    from posegen_tpu.utils.fixtures import make_problem

    orig = field.MM_DTYPE
    field.MM_DTYPE = jnp.float32  # CPU dot thunks reject bf16 x bf16 -> f32
    try:
        cfg, variables, ctx, ro, rd = make_problem(
            RaycastConfig(N_samples=8, N_importance=4), n_rays=64
        )
        mesh = make_mesh(8)
        params_r = replicate(variables, mesh)

        f = make_shardmap_render(cfg, mesh, use_fused=True)
        out = f(params_r, ro, rd, ctx)
        ref = render_rays(
            cfg, variables, ro, rd, ctx, perturb=0.0, raw_noise_std=0.0,
            eval_mean_code=True, use_fused=False,
        )
        err = float(jnp.abs(out["rgb_map"] - ref["rgb_map"]).max())
        assert err < 5e-3, f"sharded fused render diverges: {err}"
    finally:
        field.MM_DTYPE = orig


def test_shardmap_grouped_train_matches_single_device():
    """The CLI multi-device step (full train step per-device under shard_map,
    grouped batch: one image group per chip) matches the single-device step
    on the same batch. perturb=0 + fold_key_per_device=False makes both
    paths deterministic; the only numeric difference is grad-reduction order
    (pmean of per-shard means vs one global mean)."""
    from posegen_tpu.parallel.mesh import (
        make_mesh, make_shardmap_train_step, replicate, shard_batch,
    )
    from posegen_tpu.utils.fixtures import make_train_batch

    cfg = RaycastConfig(
        N_samples=8, N_importance=4, netdepth=2, netwidth=32, perturb=0.0
    )
    tcfg = TrainConfig()
    variables = init_raycaster(jax.random.PRNGKey(0), cfg)
    state0 = create_train_state(variables, tcfg)
    batch = make_train_batch(cfg, n_rays=64, n_groups=8)
    key = jax.random.PRNGKey(1)

    ref_step = jax.jit(make_train_step(cfg, tcfg))
    ref_state, ref_stats = ref_step(state0, batch, key)

    mesh = make_mesh(8)
    pstep = make_shardmap_train_step(
        cfg, tcfg, mesh=mesh, fold_key_per_device=False
    )
    sm_state, sm_stats = pstep(
        replicate(state0, mesh), shard_batch(batch, mesh), key
    )
    np.testing.assert_allclose(
        float(sm_stats["total_loss"]), float(ref_stats["total_loss"]), rtol=1e-5
    )
    for (path, a), (_, b) in zip(
        jax.tree_util.tree_flatten_with_path(sm_state.params)[0],
        jax.tree_util.tree_flatten_with_path(ref_state.params)[0],
    ):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), atol=2e-6, err_msg=str(path)
        )


@pytest.mark.slow
def test_shardmap_fused_train_multichip():
    """Fused-kernel data-parallel training on the 8-device CPU mesh: each
    chip runs the custom-VJP Pallas kernels (interpret on CPU) on its image
    group; update is deterministic and finite."""
    import posegen_tpu.kernels.field as field
    from posegen_tpu.parallel.mesh import (
        make_mesh, make_shardmap_train_step, replicate, shard_batch,
    )
    from posegen_tpu.utils.fixtures import make_train_batch

    orig = field.MM_DTYPE
    field.MM_DTYPE = jnp.float32  # CPU dot thunks reject bf16
    try:
        cfg = RaycastConfig()  # flagship config: required by the kernel
        tcfg = TrainConfig(fused_train=True)

        def fresh_state():
            # the step donates its input state; build a new (deterministic)
            # one per call rather than re-replicating freed buffers
            variables = init_raycaster(jax.random.PRNGKey(0), cfg)
            return replicate(create_train_state(variables, tcfg), mesh)

        # grouped batch: 8 image groups -> one per chip (per-device g == 1,
        # the fused kernel's padded single-group path)
        batch = make_train_batch(cfg, n_rays=32, n_groups=8)
        key = jax.random.PRNGKey(1)

        mesh = make_mesh(8)
        pstep = make_shardmap_train_step(cfg, tcfg, mesh=mesh)
        b_s = shard_batch(batch, mesh)
        new_state, stats = pstep(fresh_state(), b_s, key)
        assert np.isfinite(float(stats["total_loss"]))

        new_state2, stats2 = pstep(fresh_state(), b_s, key)
        np.testing.assert_allclose(
            float(stats["total_loss"]), float(stats2["total_loss"]), rtol=1e-6
        )
        for (_, a), (_, b) in zip(
            jax.tree_util.tree_flatten_with_path(new_state.params)[0],
            jax.tree_util.tree_flatten_with_path(new_state2.params)[0],
        ):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-6)
    finally:
        field.MM_DTYPE = orig


def test_shard_batch_rejects_nondivisible_groups():
    """1 < G not divisible by the mesh size must be a loud error (silent
    replication would hand chips the wrong pose rows)."""
    from posegen_tpu.parallel.mesh import make_mesh, shard_batch
    from posegen_tpu.utils.fixtures import make_train_batch

    cfg = RaycastConfig(N_samples=8, N_importance=4, netdepth=2, netwidth=32)
    batch = make_train_batch(cfg, n_rays=64, n_groups=4)
    mesh = make_mesh(8)
    with pytest.raises(ValueError, match="divides over"):
        shard_batch(batch, mesh)


def test_pose_opt_train_step_on_real_loader_batch(tmp_path):
    """Regression (round-2 review #1): --opt_pose training on an actual
    RayBatchLoader batch (grouped pose rows + per-GROUP kp_idx) must trace
    and run — previously cyls stayed per-group while pose rows were
    expanded per-ray and render_rays' broadcast failed."""
    from posegen_tpu.data.h5dataset import H5RayDataset, RayBatchLoader
    from posegen_tpu.data.synthetic import make_synthetic_h5

    path = str(tmp_path / "d.h5")
    make_synthetic_h5(path, n_images=4, H=32, W=32)
    ds = H5RayDataset(path, n_rays_per_image=8)
    loader = RayBatchLoader(ds, n_images_per_batch=4, seed=0)
    batch = loader.make_batch()
    assert batch["kp_idx"].shape == (4,), "kp_idx must be per image group"
    assert batch["skts"].shape[0] == 4 and batch["rays_o"].shape[0] == 32

    n_frames = ds.kp3d.shape[0]
    tcfg = TrainConfig(opt_pose=True, opt_pose_step=1)
    variables = init_raycaster(jax.random.PRNGKey(0), TINY)
    pcfg = PoseOptConfig()
    pose_params, anchors = init_pose_params(pcfg, ds.bones, ds.kp3d)
    state = create_train_state(variables, tcfg, pose_params, anchors)
    step = jax.jit(make_train_step(
        TINY, tcfg, pcfg, rest_pose=jnp.asarray(ds.rest_pose),
        n_frames=n_frames,
    ))
    batch = {k: jnp.asarray(v) for k, v in batch.items()}
    state, stats = step(state, batch, jax.random.PRNGKey(1))
    assert np.isfinite(float(stats["total_loss"]))
    loader.close()
    ds.close()


def test_pose_opt_warmup_freezes_optimizer_state():
    """Warmup must not advance the pose optimizer (reference does not step
    it before the window opens) — review finding #6."""
    tcfg = TrainConfig(opt_pose=True, opt_pose_step=1, opt_pose_warmup=100)
    state = _make_state(tcfg, opt_pose=True)
    step = jax.jit(make_train_step(
        TINY, tcfg, PoseOptConfig(), rest_pose=jnp.asarray(SMPL_REST_POSE),
        n_frames=4,
    ))
    batch = make_train_batch(TINY, n_rays=32, opt_pose=True, n_frames=4)
    b0 = np.asarray(state.pose_params["bones"])
    flat0 = jax.tree_util.tree_leaves(state.pose_opt_state)
    state, _ = step(state, batch, jax.random.PRNGKey(0))
    # params unchanged AND optimizer state untouched during warmup
    np.testing.assert_array_equal(np.asarray(state.pose_params["bones"]), b0)
    for a, b in zip(flat0, jax.tree_util.tree_leaves(state.pose_opt_state)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_use_background_composites_prediction():
    """--use_background: the loss compares rgb + (1-acc)*bg against the
    UNMASKED target (reference trainer.py:364-366), coarse pass included."""
    from posegen_tpu.train.trainer import compute_losses

    rng = np.random.default_rng(0)
    n = 16
    ret = {
        "rgb_map": jnp.asarray(rng.uniform(0, 0.3, (n, 3)).astype(np.float32)),
        "acc_map": jnp.asarray(rng.uniform(0, 1, (n,)).astype(np.float32)),
        "rgb0": jnp.asarray(rng.uniform(0, 0.3, (n, 3)).astype(np.float32)),
        "acc0": jnp.asarray(rng.uniform(0, 1, (n,)).astype(np.float32)),
    }
    bgs = jnp.asarray(rng.uniform(0, 1, (n, 3)).astype(np.float32))
    # target = EXACT composite of the prediction onto the background
    target = ret["rgb_map"] + (1 - ret["acc_map"])[..., None] * bgs
    batch = {"target_s": target, "bgs": bgs}

    tcfg_on = TrainConfig(use_background=True, use_coarse_loss=False)
    total_on, _ = compute_losses(tcfg_on, ret, batch)
    assert float(total_on) < 1e-10, "composited prediction should match exactly"

    tcfg_off = TrainConfig(use_background=False, use_coarse_loss=False)
    total_off, _ = compute_losses(tcfg_off, ret, batch)
    assert float(total_off) > 1e-4, "without compositing the loss must differ"

    # coarse pass composites too
    tcfg_c = TrainConfig(use_background=True, use_coarse_loss=True)
    total_c, stats = compute_losses(tcfg_c, ret, batch)
    expect0 = ret["rgb0"] + (1 - ret["acc0"])[..., None] * bgs
    np.testing.assert_allclose(
        float(stats["rgb0_loss"]),
        float(jnp.mean((expect0 - target) ** 2)), rtol=1e-5,
    )


def test_fix_layer_freezes_early_layers():
    """--finetune --fix_layer k: pts_linears below k receive zero gradients
    (reference freeze_weights, raycasters.py:215-217)."""
    tcfg = TrainConfig(fix_layer=1)
    state = _make_state(tcfg)
    step = jax.jit(make_train_step(TINY, tcfg))
    batch = make_train_batch(TINY, n_rays=64)
    # check on the FINE net: at this tiny random init the coarse net's relu
    # density is dead (all-negative raw), so its grads are zero regardless
    w0 = np.asarray(state.params["fine"]["pts_linears"][0]["w"])
    w1 = np.asarray(state.params["fine"]["pts_linears"][1]["w"])
    c0 = np.asarray(state.params["coarse"]["pts_linears"][0]["w"])
    state, _ = step(state, batch, jax.random.PRNGKey(0))
    np.testing.assert_array_equal(
        np.asarray(state.params["fine"]["pts_linears"][0]["w"]), w0
    )
    np.testing.assert_array_equal(
        np.asarray(state.params["coarse"]["pts_linears"][0]["w"]), c0
    )
    assert not np.allclose(
        np.asarray(state.params["fine"]["pts_linears"][1]["w"]), w1
    ), "unfrozen layer must still train"
