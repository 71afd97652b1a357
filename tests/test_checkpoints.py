"""Checkpoint round-trip + PyTorch .tar import tests."""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from posegen_tpu.render.raycast import RaycastConfig, init_raycaster, render_rays
from posegen_tpu.train.checkpoints import (
    import_torch_checkpoint,
    latest_checkpoint,
    load_checkpoint,
    save_checkpoint,
)
from posegen_tpu.train.trainer import TrainConfig, create_train_state, make_train_step
from posegen_tpu.utils.fixtures import make_problem, make_train_batch

TINY = RaycastConfig(N_samples=8, N_importance=4, netdepth=2, netwidth=32)


def test_native_checkpoint_roundtrip(tmp_path):
    tcfg = TrainConfig()
    variables = init_raycaster(jax.random.PRNGKey(0), TINY)
    state = create_train_state(variables, tcfg)
    step = jax.jit(make_train_step(TINY, tcfg))
    batch = make_train_batch(TINY, n_rays=64)
    state, _ = step(state, batch, jax.random.PRNGKey(0))

    path = save_checkpoint(str(tmp_path), state)
    assert latest_checkpoint(str(tmp_path)) == path

    template = create_train_state(init_raycaster(jax.random.PRNGKey(7), TINY), tcfg)
    restored = load_checkpoint(path, template)
    assert int(restored.step) == 1
    a = jax.tree_util.tree_leaves(state.params)
    b = jax.tree_util.tree_leaves(restored.params)
    for x, y in zip(a, b):
        np.testing.assert_array_equal(np.asarray(x), np.asarray(y))
    # restored state is usable
    state2, stats = step(restored, batch, jax.random.PRNGKey(1))
    assert np.isfinite(float(stats["total_loss"]))


def test_torch_tar_import(tmp_path):
    torch = pytest.importorskip("torch")

    cfg = TINY
    # build a synthetic reference-style checkpoint with the reference's keys
    ncfg = cfg.nerf_cfg
    g = torch.Generator().manual_seed(0)

    def lin(n_in, n_out):
        return {
            "weight": torch.randn(n_out, n_in, generator=g),
            "bias": torch.randn(n_out, generator=g),
        }

    def net_sd():
        sd = {}
        for i in range(cfg.netdepth):
            fan_in = ncfg.dnet_input if i == 0 else ncfg.width
            if i > 0 and (i - 1) in ncfg.skips:
                fan_in = ncfg.width + ncfg.dnet_input
            for k, v in lin(fan_in, ncfg.width).items():
                sd[f"pts_linears.{i}.{k}"] = v
        for name, (ni, no) in {
            "alpha_linear": (ncfg.width, 1),
            "feature_linear": (ncfg.width, ncfg.width),
            "rgb_linear": (ncfg.width // 2, 3),
        }.items():
            for k, v in lin(ni, no).items():
                sd[f"{name}.{k}"] = v
        for k, v in lin(ncfg.vnet_input, ncfg.width // 2).items():
            sd[f"views_linears.0.{k}"] = v
        return sd

    embed_sd = {
        "tau": torch.tensor(100.0),
        "cutoff_dist": torch.ones(24) * 0.5,
    }
    ckpt = {
        "global_step": 1234,
        "network_fn_state_dict": net_sd(),
        "network_fine_state_dict": net_sd(),
        "embed_state_dict": dict(embed_sd),
        "embeddirs_state_dict": dict(embed_sd),
        "embedbones_state_dict": dict(embed_sd),
        "poseopt_layer_state_dict": {
            "pelvis": torch.zeros(5, 3),
            "bones": torch.zeros(5, 24, 3),
        },
    }
    path = os.path.join(str(tmp_path), "001234.tar")
    torch.save(ckpt, path)

    variables, extras = import_torch_checkpoint(path)
    assert extras["global_step"] == 1234
    assert extras["pose_params"]["bones"].shape == (5, 24, 3)
    assert float(variables["embed_kp"]["tau"]) == 100.0

    # weight orientation: torch (out,in) -> ours (in,out)
    w_t = np.asarray(ckpt["network_fn_state_dict"]["pts_linears.0.weight"])
    np.testing.assert_allclose(
        np.asarray(variables["coarse"]["pts_linears"][0]["w"]), w_t.T
    )

    # imported weights drive a real render without shape errors
    _, _, ctx, rays_o, rays_d = make_problem(cfg, n_rays=32)
    out = render_rays(cfg, variables, rays_o, rays_d, ctx, perturb=0.0)
    assert out["rgb_map"].shape == (32, 3)
    assert bool(jnp.isfinite(out["rgb_map"]).all())
