"""Trainer with the custom-VJP fused kernel == XLA-path training (f32 mode)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from posegen_tpu.render.raycast import RaycastConfig, init_raycaster
from posegen_tpu.train.trainer import TrainConfig, create_train_state, make_train_step
from posegen_tpu.utils.fixtures import make_pose_ctx, make_rays

CFG = RaycastConfig()  # flagship 64+16, 8x256


def _grouped_batch(rng, n_images=2, rpi=16):
    """Batch with per-image pose ROWS (the RayBatchLoader layout: pose
    arrays have one row per image; rays are contiguous per image)."""
    parts = []
    for i in range(n_images):
        ctx = make_pose_ctx(seed=i)
        ro, rd = make_rays(rpi, seed=10 + i)
        parts.append({
            "rays_o": np.asarray(ro),
            "rays_d": np.asarray(rd),
            "target_s": rng.uniform(0, 1, (rpi, 3)).astype(np.float32),
            "kp3d": np.asarray(ctx.kps),
            "skts": np.asarray(ctx.skts),
            "bones": np.asarray(ctx.bones),
            "cyls": np.asarray(ctx.cyls),
        })
    return {k: jnp.asarray(np.concatenate([p[k] for p in parts])) for k in parts[0]}


@pytest.mark.slow
def test_fused_train_step_matches_xla(rng):
    import posegen_tpu.kernels.field as field

    orig = field.MM_DTYPE
    field.MM_DTYPE = jnp.float32  # exactness mode (see test_fused_grad)
    try:
        batch = _grouped_batch(rng)
        variables = init_raycaster(jax.random.PRNGKey(0), CFG)
        key = jax.random.PRNGKey(5)

        tcfg_x = TrainConfig(fused_train=False, rays_per_image=16)
        tcfg_f = TrainConfig(fused_train=True, rays_per_image=16)

        s_x = create_train_state(variables, tcfg_x)
        s_f = create_train_state(variables, tcfg_f)
        step_x = make_train_step(CFG, tcfg_x)
        step_f = make_train_step(CFG, tcfg_f)

        s_x, stats_x = step_x(s_x, batch, key)
        s_f, stats_f = step_f(s_f, batch, key)

        assert np.isfinite(float(stats_f["total_loss"]))
        np.testing.assert_allclose(
            float(stats_f["total_loss"]), float(stats_x["total_loss"]),
            rtol=1e-4,
        )
        # updated parameters agree to numerical noise
        for (path, a), (_, b) in zip(
            jax.tree_util.tree_flatten_with_path(s_x.params)[0],
            jax.tree_util.tree_flatten_with_path(s_f.params)[0],
        ):
            a, b = np.asarray(a), np.asarray(b)
            err = np.abs(a - b).max()
            assert err < 5e-5, f"{jax.tree_util.keystr(path)}: {err}"
    finally:
        field.MM_DTYPE = orig


def test_fused_train_mode_gating(rng):
    """Fused-train auto-disables on bad grouping / pose-opt / framecodes."""
    batch = _grouped_batch(rng, n_images=2, rpi=16)
    variables = init_raycaster(jax.random.PRNGKey(0), CFG)

    # grouping that breaks tile divisibility (24 rays/group x 80 samples is
    # not a 256 multiple) -> falls back to the XLA path, still works
    bad = _grouped_batch(rng, n_images=2, rpi=24)
    tcfg = TrainConfig(fused_train=True)
    state = create_train_state(variables, tcfg)
    step = make_train_step(CFG, tcfg)
    state, stats = step(state, bad, jax.random.PRNGKey(0))
    assert np.isfinite(float(stats["total_loss"]))


@pytest.mark.slow
def test_fused_pose_opt_train_step_matches_xla(rng, monkeypatch):
    """Pose-opt training on the fused 'full' path: the kernel engages (no
    silent XLA fallback) and pose-parameter gradients match the XLA path."""
    import posegen_tpu.kernels.field as field
    from posegen_tpu.pose.opt import PoseOptConfig, init_pose_params
    from posegen_tpu.skeleton.skeleton import SMPL_REST_POSE

    orig = field.MM_DTYPE
    field.MM_DTYPE = jnp.float32  # exactness mode (see test_fused_grad)
    calls = {"n": 0}
    orig_fn = field.fused_run_net

    def spy(*a, **k):
        calls["n"] += 1
        return orig_fn(*a, **k)

    monkeypatch.setattr(field, "fused_run_net", spy)
    try:
        n_images, rpi = 2, 16
        batch = _grouped_batch(rng, n_images, rpi)
        for k in ("kp3d", "skts", "bones"):
            del batch[k]
        batch["kp_idx"] = jnp.asarray([0, 1], jnp.int32)

        n_frames = 2
        bones0 = np.stack(
            [np.asarray(make_pose_ctx(seed=i).bones[0]) for i in range(n_frames)]
        )
        kp0 = np.stack(
            [np.asarray(make_pose_ctx(seed=i).kps[0]) for i in range(n_frames)]
        )
        pcfg = PoseOptConfig(use_rot6d=True)
        pose_params, anchors = init_pose_params(pcfg, bones0, kp0)

        variables = init_raycaster(jax.random.PRNGKey(0), CFG)
        rest = jnp.asarray(SMPL_REST_POSE)
        key = jax.random.PRNGKey(5)

        outs = {}
        for name, fused_flag in (("xla", False), ("fused", True)):
            tcfg = TrainConfig(
                opt_pose=True, opt_pose_step=1, fused_train=fused_flag,
                use_temp_loss=True,
            )
            state = create_train_state(variables, tcfg, pose_params, anchors)
            step = make_train_step(
                CFG, tcfg, pcfg, rest_pose=rest, n_frames=n_frames
            )
            before = calls["n"]
            s2, stats = step(state, batch, key)
            outs[name] = (s2, stats, calls["n"] - before)

        assert outs["fused"][2] > 0, "fused kernel did not engage for pose-opt"
        sx, stats_x, _ = outs["xla"]
        sf, stats_f, _ = outs["fused"]
        np.testing.assert_allclose(
            float(stats_f["total_loss"]), float(stats_x["total_loss"]), rtol=1e-4
        )
        np.testing.assert_allclose(
            float(stats_f["pose_grad_norm"]), float(stats_x["pose_grad_norm"]),
            rtol=1e-4,
        )
        for k in sx.pose_params:
            a = np.asarray(sx.pose_params[k])
            b = np.asarray(sf.pose_params[k])
            assert np.abs(a - b).max() < 5e-5, f"pose_params[{k}]"
    finally:
        field.MM_DTYPE = orig


def test_pick_train_tile_invariants():
    """Tile choices are lane-aligned, group-divisible after padding, and
    zero-padding candidates win when the cost model says so (the measured
    on-chip optimum at the flagship shape — RESULTS.md tile sweep)."""
    from posegen_tpu.kernels.field_grad import (
        MAX_TRAIN_TILE, TRAIN_TILE, pick_train_tile,
    )

    # single group: flat padding, always the max tile
    assert pick_train_tile(2048, 80, 1) == (MAX_TRAIN_TILE, 2048)

    for rpi, s in [(48, 80), (12, 80), (32, 64), (48, 65), (7, 80)]:
        tile, rpi_p = pick_train_tile(rpi, s, 64)
        assert tile % 128 == 0 and TRAIN_TILE <= tile <= MAX_TRAIN_TILE
        assert rpi_p >= rpi
        assert (rpi_p * s) % tile == 0, (rpi, s, tile, rpi_p)

    # flagship 3072 rays / 64 groups / 80 samples: 768 = 48 rays x 16
    # divides exactly (zero ray padding) and measured fastest on-chip
    assert pick_train_tile(48, 80, 64) == (768, 48)
