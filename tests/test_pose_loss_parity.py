"""Golden parity for the pose-regularization objectives.

Two reference implementations exist:
  * core/trainer.py:385-441 `Trainer._compute_kp_loss` — the one the train
    loop ACTUALLY runs (root-excluded squared bone diff, hinge at tol, no
    pelvis term; velocity temporal loss masked by temp_val). Our
    pose/opt.py:kp_reg_loss + temporal_loss + mpjpc_stat match it.
  * core/pose_opt.py:124-201 `get_kp_reg_loss` — the full opt_pose_type
    family (B/BE/RD/RDE with 'L1' substring). DEAD CODE in the reference
    (no caller), provided by us as pose/opt.py:get_kp_reg_loss.

Both are compared against the ACTUAL reference functions on shared inputs.
"""

import sys
from types import SimpleNamespace

import numpy as np
import pytest
import torch

sys.path.insert(0, "tests")
import reference_shims

reference_shims.install()

import jax.numpy as jnp

from posegen_tpu.pose.opt import (
    PoseOptConfig,
    get_kp_reg_loss,
    init_pose_params,
    kp_reg_loss,
    mpjpc_stat,
    pose_apply,
    temporal_loss,
)
from posegen_tpu.skeleton.rotations import axisang_to_rot, rot6d_to_rot
from posegen_tpu.skeleton.skeleton import SMPL_REST_POSE

J = 24


def _random_family_inputs(rng, B=5, opt_rot6d=False):
    D = 6 if opt_rot6d else 3
    def rots(n):
        aa = torch.tensor(rng.standard_normal((n * J, 3)) * 0.4, dtype=torch.float32)
        from reference_shims import axis_angle_to_matrix

        return axis_angle_to_matrix(aa).reshape(n, J, 3, 3)

    preds = {
        "kps": torch.tensor(rng.standard_normal((B, J, 3)), dtype=torch.float32),
        "bones": torch.tensor(rng.standard_normal((B, J, D)), dtype=torch.float32),
        "rots": rots(B),
    }
    regs = {
        "kps": torch.tensor(rng.standard_normal((B, J, 3)), dtype=torch.float32),
        "bones": torch.tensor(rng.standard_normal((B, J, D)), dtype=torch.float32),
        "rots": rots(B),
        "temp_kps": torch.tensor(rng.standard_normal((2 * B, J, 3)), dtype=torch.float32),
        "temp_bones": torch.tensor(rng.standard_normal((2 * B, J, D)), dtype=torch.float32),
        "temp_rots": rots(2 * B),
        "temp_valid": torch.tensor(rng.integers(0, 2, (B,)), dtype=torch.float32),
        "temp_valid_next": torch.tensor(rng.integers(0, 2, (B,)), dtype=torch.float32),
    }
    gts = {"kps": torch.tensor(rng.standard_normal((B, J, 3)), dtype=torch.float32)}
    return preds, regs, gts


@pytest.mark.parametrize("opt_type", ["B", "BE", "RD", "RDE", "BL1", "BEL1", "RDL1", "RDEL1"])
@pytest.mark.parametrize("opt_rot6d", [False, True])
def test_get_kp_reg_loss_family_parity(opt_type, opt_rot6d):
    """Every opt_pose_type variant matches reference get_kp_reg_loss."""
    from core.pose_opt import get_kp_reg_loss as ref_loss

    rng = np.random.default_rng(sum(map(ord, opt_type)) * 2 + int(opt_rot6d))
    preds, regs, gts = _random_family_inputs(rng, opt_rot6d=opt_rot6d)
    for use_temp, use_vel in [(False, False), (True, False), (True, True)]:
        args = SimpleNamespace(
            opt_pose_type=opt_type, opt_rot6d=opt_rot6d, opt_pose_tol=0.01,
            use_temp_loss=use_temp, use_temp_vel=use_vel, temp_coef=0.05,
            ext_scale=0.001,
        )
        ref_kp, ref_temp, ref_mpjpc, ref_gt = ref_loss(
            preds, regs, gts=gts, opt_pose_coefs=2.0, args=args
        )
        j = lambda d: {k: jnp.asarray(v.numpy()) for k, v in d.items()}
        our_kp, our_temp, our_mpjpc, our_gt = get_kp_reg_loss(
            j(preds), j(regs), gts=j(gts), opt_pose_coefs=2.0,
            opt_pose_type=opt_type, opt_rot6d=opt_rot6d, opt_pose_tol=0.01,
            use_temp_loss=use_temp, use_temp_vel=use_vel, temp_coef=0.05,
            ext_scale=0.001,
        )
        np.testing.assert_allclose(float(our_kp), float(ref_kp), rtol=2e-5, atol=1e-6)
        np.testing.assert_allclose(float(our_temp), float(ref_temp), rtol=2e-5, atol=1e-6)
        np.testing.assert_allclose(float(our_mpjpc), float(ref_mpjpc), rtol=2e-4)
        np.testing.assert_allclose(float(our_gt), float(ref_gt), rtol=2e-4)


class _FakePoptLayer:
    """Indexable stand-in for the reference PoseOptLayer: returns
    precomputed per-frame (kps, bones, skts, _, rots) torch tensors."""

    def __init__(self, kps, bones, rots):
        self.kps, self.bones_t, self.rots = kps, bones, rots
        self.bones = bones  # len() probed by the reference trainer

    def __call__(self, idx):
        idx = np.asarray(idx)
        return (
            self.kps[idx], self.bones_t[idx], None, None, self.rots[idx],
        )


@pytest.mark.parametrize("use_temp_loss", [False, True])
def test_trainer_compute_kp_loss_parity(use_temp_loss):
    """Our train-loop losses (kp_reg_loss/temporal_loss/mpjpc_stat) match
    the reference Trainer._compute_kp_loss on shared pose params."""
    from core.trainer import Trainer

    rng = np.random.default_rng(3)
    F, B = 6, 8
    bones_aa = (rng.standard_normal((F, J, 3)) * 0.3).astype(np.float32)
    kp3d = np.tile(SMPL_REST_POSE[None], (F, 1, 1)).astype(np.float32)
    kp3d += rng.standard_normal(kp3d.shape).astype(np.float32) * 0.05

    pcfg = PoseOptConfig(use_rot6d=True, opt_pose_tol=0.01, ext_scale=0.001)
    params, anchors = init_pose_params(pcfg, bones_aa, kp3d)
    # drift the params away from the anchors
    params = {
        "pelvis": params["pelvis"] + 0.02,
        "bones": params["bones"]
        + jnp.asarray(rng.standard_normal(params["bones"].shape) * 0.1, jnp.float32),
    }
    rest = jnp.asarray(SMPL_REST_POSE)

    # per-frame FK through OUR layer, shared with the reference fake layer
    all_idx = jnp.arange(F)
    kps_all, bones_all, _, _ = pose_apply(params, all_idx, rest)
    rots_all = rot6d_to_rot(params["bones"])
    anchor_rots = axisang_to_rot(jnp.asarray(bones_aa))

    kp_idx = rng.integers(0, F, (B,))
    temp_val = rng.integers(0, 2, (B,)).astype(np.float32)

    t = lambda a: torch.tensor(np.asarray(a), dtype=torch.float32)
    stub = SimpleNamespace(
        args=SimpleNamespace(
            opt_rot6d=True, opt_pose_tol=0.01, opt_pose_coef=2.0,
            use_temp_loss=use_temp_loss, temp_coef=0.05, ext_scale=0.001,
        ),
        popt_kwargs={
            "popt_anchors": {
                "rots": t(anchor_rots), "bones": t(bones_aa), "kps": t(kp3d),
            },
            "popt_layer": _FakePoptLayer(t(kps_all), t(params["bones"]), t(rots_all)),
        },
    )
    batch = {
        "kp_idx": torch.tensor(kp_idx, dtype=torch.long),
        "temp_val": t(temp_val),
    }
    kp_opts = {
        "rots": t(rots_all)[batch["kp_idx"]],
        "bones": t(params["bones"])[batch["kp_idx"]],
        "kp_batch": t(kps_all)[batch["kp_idx"]],
    }
    loss_dict, stat = Trainer._compute_kp_loss(stub, batch, kp_opts)

    idx = jnp.asarray(kp_idx)
    our_kp = 2.0 * kp_reg_loss(pcfg, params, anchors, idx)
    np.testing.assert_allclose(
        float(our_kp), float(loss_dict["kp_loss"]), rtol=2e-5, atol=1e-7
    )
    kps_b, bones_b, _, _ = pose_apply(params, idx, rest)
    from posegen_tpu.pose.opt import _canon_bones

    our_mpjpc = mpjpc_stat(pcfg, kps_b, jnp.asarray(kp3d)[idx])
    np.testing.assert_allclose(float(our_mpjpc), float(stat["MPJPC"]), rtol=2e-4)

    if use_temp_loss:
        our_temp = 0.05 * temporal_loss(
            params, idx, jnp.asarray(temp_val), rest, kps_b,
            _canon_bones(bones_b),
        )
        np.testing.assert_allclose(
            float(our_temp), float(loss_dict["temp_loss"]), rtol=2e-5, atol=1e-7
        )
