"""Pose GAN + HMR model tests, including numerical parity vs torch layers."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from posegen_tpu.gen.discriminators import (
    init_pos2d_discriminator,
    init_pos3d_discriminator,
    pos2d_discriminator_apply,
    pos3d_discriminator_apply,
)
from posegen_tpu.gen.gan import (
    FakePool,
    discriminator_accuracy,
    lsgan_loss,
    make_discriminator_step,
    make_generator_step,
    normalize_screen_coordinates,
    project_to_2d,
)
from posegen_tpu.gen.generators import GenConfig, init_pose_generator, pose_generator_apply
from posegen_tpu.gen.hmr import hmr_apply, import_torch_hmr, init_hmr

CFG = GenConfig(width=32, num_stages=1)


def _real_poses(rng, n=8):
    from posegen_tpu.skeleton.kinematics import smpl_l2ws

    bones = (rng.standard_normal((n, 24, 3)) * 0.2).astype(np.float32)
    return np.asarray(smpl_l2ws(jnp.asarray(bones)))[..., :3, 3]


def test_generator_forward_shapes(rng):
    params, state = init_pose_generator(jax.random.PRNGKey(0), CFG)
    kp3d = jnp.asarray(_real_poses(rng))
    out, new_state = pose_generator_apply(params, state, jax.random.PRNGKey(1), kp3d, CFG)
    assert out["pose_ba"].shape == (8, 24, 3)
    assert out["R"].shape == (8, 3, 3)
    assert out["T"].shape == (8, 3)
    assert out["pose_rt"].shape == (8, 24, 3)
    # R is a valid rotation
    RtR = np.asarray(out["R"] @ jnp.swapaxes(out["R"], -1, -2))
    np.testing.assert_allclose(RtR, np.broadcast_to(np.eye(3), RtR.shape), atol=1e-4)
    # T z-component is non-negative (squared)
    assert np.all(np.asarray(out["T"][:, 2]) >= 0)
    # BN state actually updated
    a = np.asarray(state["ba"]["bn_in"]["mean"])
    b = np.asarray(new_state["ba"]["bn_in"]["mean"])
    assert not np.allclose(a, b)


def test_discriminator_shapes(rng):
    kp3d = jnp.asarray(_real_poses(rng))
    d3 = init_pos3d_discriminator(jax.random.PRNGKey(0))
    logits = pos3d_discriminator_apply(d3, kp3d)
    assert logits.shape == (8, 7)
    d2 = init_pos2d_discriminator(jax.random.PRNGKey(1))
    logits2 = pos2d_discriminator_apply(d2, jnp.zeros((8, 24, 2)))
    assert logits2.shape == (8, 1)


def test_gan_losses_and_pool(rng):
    logits = jnp.asarray([[0.9], [0.1]])
    assert float(lsgan_loss(logits, 1.0)) == pytest.approx(0.5 * (0.01 + 0.81))
    assert float(discriminator_accuracy(logits, 1.0)) == 0.5

    pool = FakePool(max_elements=4)
    b1 = rng.standard_normal((4, 24, 3)).astype(np.float32)
    out1 = pool(b1)
    np.testing.assert_array_equal(out1, b1)  # fills up
    b2 = rng.standard_normal((4, 24, 3)).astype(np.float32)
    out2 = pool(b2)
    assert out2.shape == b2.shape  # mix of replayed and new


def test_projection_roundtrip(rng):
    kps = jnp.asarray(_real_poses(rng)) * 0.25 + jnp.asarray([0.0, 0.0, 3.0])
    ext = jnp.eye(4)
    kp2d, cam = project_to_2d(kps, ext, 512, 512, (1000.0, 1000.0))
    assert kp2d.shape == (8, 24, 2)
    # a ~0.5m-radius subject at z=3 with f=1000 projects inside the image
    assert np.all(np.abs(np.asarray(kp2d) - 256.0) < 256.0)
    # pinhole model: pixel offset equals f * x/z
    expect = np.asarray(kps[..., :2]) / np.asarray(kps[..., 2:3]) * 1000.0 + 256.0
    np.testing.assert_allclose(np.asarray(kp2d), expect, atol=1e-2)
    n = normalize_screen_coordinates(kp2d, 512, 512)
    assert np.all(np.abs(np.asarray(n)) <= 1.0)


def test_gan_steps_run_and_learn(rng):
    # real AMASS-style axis-angle poses
    real_pose = jnp.asarray((rng.standard_normal((8, 24, 3)) * 0.2).astype(np.float32))

    from posegen_tpu.skeleton.kinematics import smpl_l2ws

    def fk_fn(bones):
        return smpl_l2ws(bones, scale=0.4)[..., :3, 3]

    g_params, g_state = init_pose_generator(jax.random.PRNGKey(0), CFG)
    d_params = init_pos3d_discriminator(jax.random.PRNGKey(1))

    g_opt, g_step = make_generator_step(fk_fn, CFG, lr=1e-3)
    d_opt, d_step = make_discriminator_step(lr=1e-3)
    g_opt_state = g_opt.init(g_params)
    d_opt_state = d_opt.init(d_params)

    spin_pred = jnp.zeros((2, 14, 3))
    spin_sel = jnp.zeros((2,), jnp.int32)
    d_losses = []
    for i in range(5):
        g_params, g_state, g_opt_state, out, g_stats = g_step(
            g_params, g_state, g_opt_state, d_params,
            jax.random.PRNGKey(i), real_pose, spin_pred, spin_sel,
            jnp.asarray(0.0),
        )
        d_params, d_opt_state, d_stats = d_step(
            d_params, d_opt_state, real_pose, out["pose_ba"]
        )
        d_losses.append(float(d_stats["dis_loss"]))
        assert np.isfinite(float(g_stats["gen_loss"]))
    assert d_losses[-1] < d_losses[0]  # D learns to separate

    # with spin feedback active the reward term engages and stays finite
    g_params, g_state, g_opt_state, out, g_stats = g_step(
        g_params, g_state, g_opt_state, d_params,
        jax.random.PRNGKey(99), real_pose, spin_pred, spin_sel,
        jnp.asarray(1.0),
    )
    assert np.isfinite(float(g_stats["spin_loss"]))
    assert float(g_stats["spin_loss"]) != 0.0


def test_hmr_forward_tiny():
    params, state = init_hmr(jax.random.PRNGKey(0))
    imgs = jnp.zeros((2, 64, 64, 3))
    rotmat, betas, cam, ns = hmr_apply(params, state, imgs)
    assert rotmat.shape == (2, 24, 3, 3)
    assert betas.shape == (2, 10)
    assert cam.shape == (2, 3)
    # mean-param init pose gives near-identity rotations at zero features? not
    # necessarily — but all outputs finite and R orthonormal:
    RtR = np.asarray(rotmat @ jnp.swapaxes(rotmat, -1, -2))
    np.testing.assert_allclose(RtR, np.broadcast_to(np.eye(3), RtR.shape), atol=1e-4)


def test_conv_bn_parity_with_torch(rng):
    """Our NHWC conv + BN numerically match torch's NCHW versions."""
    torch = pytest.importorskip("torch")

    x = rng.standard_normal((2, 8, 8, 3)).astype(np.float32)
    w = rng.standard_normal((3, 3, 3, 4)).astype(np.float32)  # HWIO

    from posegen_tpu.nn.layers import batchnorm, conv2d

    y = conv2d({"w": jnp.asarray(w)}, jnp.asarray(x), stride=2, padding=((1, 1), (1, 1)))

    xt = torch.tensor(x.transpose(0, 3, 1, 2))
    wt = torch.tensor(w.transpose(3, 2, 0, 1))  # OIHW
    yt = torch.nn.functional.conv2d(xt, wt, stride=2, padding=1)
    np.testing.assert_allclose(
        np.asarray(y), yt.numpy().transpose(0, 2, 3, 1), atol=1e-4
    )

    # batchnorm train-mode parity
    p = {"scale": jnp.asarray(rng.uniform(0.5, 1.5, 4).astype(np.float32)),
         "bias": jnp.asarray(rng.standard_normal(4).astype(np.float32))}
    s = {"mean": jnp.zeros(4), "var": jnp.ones(4)}
    yb, ns = batchnorm(p, s, y, train=True)

    bn = torch.nn.BatchNorm2d(4)
    with torch.no_grad():
        bn.weight.copy_(torch.tensor(np.asarray(p["scale"])))
        bn.bias.copy_(torch.tensor(np.asarray(p["bias"])))
    bn.train()
    ybt = bn(yt)
    np.testing.assert_allclose(
        np.asarray(yb), ybt.detach().numpy().transpose(0, 2, 3, 1), atol=1e-3
    )
    np.testing.assert_allclose(
        np.asarray(ns["mean"]), bn.running_mean.numpy(), atol=1e-4
    )
    np.testing.assert_allclose(np.asarray(ns["var"]), bn.running_var.numpy(), atol=1e-3)


def test_import_torch_hmr_entries():
    torch = pytest.importorskip("torch")

    params, state = init_hmr(jax.random.PRNGKey(0))
    sd = {
        "conv1.weight": torch.randn(64, 3, 7, 7),
        "bn1.weight": torch.rand(64),
        "bn1.bias": torch.randn(64),
        "bn1.running_mean": torch.randn(64),
        "bn1.running_var": torch.rand(64),
        "fc1.weight": torch.randn(1024, 2048 + 24 * 6 + 13),
        "fc1.bias": torch.randn(1024),
    }
    p2, s2 = import_torch_hmr(sd, params, state)
    np.testing.assert_allclose(
        np.asarray(p2["conv1"]["w"]),
        sd["conv1.weight"].numpy().transpose(2, 3, 1, 0),
    )
    np.testing.assert_allclose(np.asarray(s2["bn1"]["mean"]), sd["bn1.running_mean"].numpy())
    np.testing.assert_allclose(np.asarray(p2["fc1"]["w"]), sd["fc1.weight"].numpy().T)
