"""GAN model forward parity vs the ACTUAL reference modules.

run_gan.py cannot be imported wholesale (module-level SMPL loads +
argparse), so the test executes just its model-class block (Linear,
PoseGenerator, BAGenerator, RTGenerator, Disc_Joint_Path,
Pos3dDiscriminator, Pos2dDiscriminator — run_gan.py:767-1046) in a
namespace, exports the torch state_dicts, imports them into our JAX
models, and compares forwards on identical noise.
"""

import re
import sys

import numpy as np
import pytest
import torch
import torch.nn as nn

import jax.numpy as jnp

sys.path.insert(0, "tests")
import reference_shims  # noqa: E402

reference_shims.install()

import pytorch3d.transforms as torch3d  # noqa: E402  (the shim)


def _load_reference_gan_classes():
    src = open("/root/reference/run_gan.py").read()
    start = src.index("class Linear(nn.Module):")
    end = src.index("def get_adv_loss")
    block = src[start:end]
    ns = {
        "nn": nn, "torch": torch, "np": np, "torch3d": torch3d,
        "dist": torch.distributions,
    }
    exec(compile(block, "reference_run_gan_models", "exec"), ns)
    return ns


@pytest.fixture(scope="module")
def ref_models():
    return _load_reference_gan_classes()


def test_pose_generator_forward_parity(ref_models):
    torch.manual_seed(0)
    ref = ref_models["PoseGenerator"](args=None)
    ref.eval()

    from posegen_tpu.gen.generators import (
        ba_generator_apply,
        import_torch_pose_generator,
        rt_generator_apply,
    )

    params, state = import_torch_pose_generator(
        {k: v.detach().numpy() for k, v in ref.state_dict().items()}
    )

    rng = np.random.default_rng(0)
    B = 6
    kp3d = rng.standard_normal((B, 24, 3)).astype(np.float32) * 0.3
    noise_ba = rng.standard_normal((B, 32)).astype(np.float32)
    noise_r = rng.standard_normal((B, 72)).astype(np.float32)
    noise_t = rng.standard_normal((B, 72)).astype(np.float32)
    eps_axis = rng.standard_normal((B, 3)).astype(np.float32)

    # reference: patch torch.randn / torch.normal to feed the same draws
    draws = [torch.from_numpy(noise_r), torch.from_numpy(noise_t)]
    with torch.no_grad():
        real_randn = torch.randn
        real_normal = torch.normal
        try:
            torch.randn = lambda *a, **k: torch.from_numpy(noise_ba)
            ba_ref = ref.BAprocess(torch.from_numpy(kp3d))
            torch.randn = lambda *a, **k: draws.pop(0)
            torch.normal = lambda mean, std: mean + std * torch.from_numpy(eps_axis)
            R_ref, T_ref, rt_ref = ref.RTprocess(torch.from_numpy(kp3d))
        finally:
            torch.randn = real_randn
            torch.normal = real_normal

    ba, _ = ba_generator_apply(
        params["ba"], state["ba"], None, B, train=False,
        noise=jnp.asarray(noise_ba),
    )
    np.testing.assert_allclose(np.asarray(ba), ba_ref.numpy(), atol=1e-5)

    R, T, rt, _, _ = rt_generator_apply(
        params["r"], params["t"], state["r"], state["t"], None,
        jnp.asarray(kp3d), train=False,
        noise_r=jnp.asarray(noise_r), noise_t=jnp.asarray(noise_t),
        eps_axis=jnp.asarray(eps_axis),
    )
    np.testing.assert_allclose(np.asarray(R), R_ref.numpy(), atol=1e-5)
    np.testing.assert_allclose(np.asarray(T), T_ref.numpy(), atol=1e-5)
    np.testing.assert_allclose(np.asarray(rt), rt_ref.numpy(), atol=1e-5)


def test_pos3d_discriminator_forward_parity(ref_models):
    torch.manual_seed(1)
    ref = ref_models["Pos3dDiscriminator"]()
    ref.eval()

    from posegen_tpu.gen.discriminators import (
        import_torch_pos3d_discriminator,
        pos3d_discriminator_apply,
    )

    params = import_torch_pos3d_discriminator(
        {k: v.detach().numpy() for k, v in ref.state_dict().items()}
    )
    rng = np.random.default_rng(1)
    kp3d = rng.standard_normal((5, 24, 3)).astype(np.float32) * 0.4
    with torch.no_grad():
        out_ref = ref(torch.from_numpy(kp3d))
    out = pos3d_discriminator_apply(params, jnp.asarray(kp3d))
    assert out.shape == out_ref.shape == (5, 7)
    np.testing.assert_allclose(np.asarray(out), out_ref.numpy(), atol=1e-5)


def test_pos2d_discriminator_forward_parity(ref_models):
    torch.manual_seed(2)
    ref = ref_models["Pos2dDiscriminator"]()
    ref.eval()

    from posegen_tpu.gen.discriminators import (
        import_torch_pos2d_discriminator,
        pos2d_discriminator_apply,
    )

    params = import_torch_pos2d_discriminator(
        {k: v.detach().numpy() for k, v in ref.state_dict().items()}
    )
    rng = np.random.default_rng(2)
    kp2d = rng.standard_normal((5, 24, 2)).astype(np.float32)
    with torch.no_grad():
        out_ref = ref(torch.from_numpy(kp2d))
    out = pos2d_discriminator_apply(params, jnp.asarray(kp2d))
    np.testing.assert_allclose(np.asarray(out), out_ref.numpy(), atol=1e-5)
