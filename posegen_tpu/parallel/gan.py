"""Data-parallel GAN + SPIN fine-tuning over the device mesh.

The reference's GAN loop (run_gan.py:1956-2135) and SPIN fine-tune
(:1849-1952) are single-GPU. The TPU rebuild scales both the same way the
NeRF trainer does (parallel/mesh.py): a 1-D mesh over all chips, parameters
and optimizer state replicated, batches sharded along dim 0, the whole step
inside shard_map with psum over ICI. The factories in gen/gan.py and
gen/spin_train.py carry the axis-aware math (sync-BN, global-denominator
losses, globally-drawn noise slices, joint all_gather for the SPIN-feedback
selection), so with equal shards every parallel step below reproduces its
single-device twin on the concatenated batch exactly — unlike torch
nn.DataParallel, whose per-replica BatchNorm diverges.
"""

from __future__ import annotations

from typing import Optional

import jax
from jax.sharding import Mesh, PartitionSpec as P

from posegen_tpu.gen.gan import make_discriminator_step, make_generator_step
from posegen_tpu.gen.spin_train import (
    make_ski_finetune_step,
    make_spin_finetune_step,
)


def _check_divisible(what: str, n: int, mesh: Mesh) -> None:
    if n % mesh.size != 0:
        raise ValueError(
            f"{what} ({n}) must divide evenly over the {mesh.size}-device "
            "mesh — pad or trim the batch"
        )


def make_parallel_generator_step(mesh: Mesh, fk_fn, cfg=None, *, axis: str = "data",
                                 **kwargs):
    """Sharded make_generator_step: real_pose splits along the mesh axis;
    params/optimizer/spin feedback stay replicated; the generated poses come
    back sharded (gathered to host lazily). Same signature as the
    single-device step."""
    from posegen_tpu.gen.generators import GenConfig

    cfg = cfg or GenConfig()
    opt, base = make_generator_step(fk_fn, cfg, axis_name=axis, **kwargs)

    sharded = jax.shard_map(
        base,
        mesh=mesh,
        # g_params, g_state, g_opt_state, d_params, key, real_pose,
        # spin_pred, spin_sel, spin_active
        in_specs=(P(), P(), P(), P(), P(), P(axis), P(), P(), P()),
        # g_params, new_state, g_opt_state, out, stats
        out_specs=(P(), P(), P(), P(axis), P()),
        check_vma=False,
    )

    def step(g_params, g_state, g_opt_state, d_params, key, real_pose,
             spin_pred, spin_sel, spin_active):
        _check_divisible("generator pose batch", real_pose.shape[0], mesh)
        return sharded(g_params, g_state, g_opt_state, d_params, key,
                       real_pose, spin_pred, spin_sel, spin_active)

    return opt, jax.jit(step)


def make_parallel_discriminator_step(mesh: Mesh, *, axis: str = "data", **kwargs):
    """Sharded make_discriminator_step: real/fake pose batches split along
    the mesh axis; params/optimizer replicated."""
    opt, base = make_discriminator_step(axis_name=axis, **kwargs)

    sharded = jax.shard_map(
        base,
        mesh=mesh,
        in_specs=(P(), P(), P(axis), P(axis)),
        out_specs=(P(), P(), P()),
        check_vma=False,
    )

    def step(d_params, d_opt_state, real_kp3d, fake_kp3d):
        _check_divisible("discriminator real batch", real_kp3d.shape[0], mesh)
        _check_divisible("discriminator fake batch", fake_kp3d.shape[0], mesh)
        return sharded(d_params, d_opt_state, real_kp3d, fake_kp3d)

    return opt, jax.jit(step)


def _parallel_finetune(mesh: Mesh, axis: str, opt, base):
    def per_device(params, bn_state, opt_state, images, gt, key):
        if key is not None:
            # independent dropout masks per device (a shared key would draw
            # the same per-row masks on every shard); None stays None so
            # dropout-free runs remain exactly single-device-comparable
            key = jax.random.fold_in(key, jax.lax.axis_index(axis))
        return base(params, bn_state, opt_state, images, gt, key)

    sharded = jax.shard_map(
        per_device,
        mesh=mesh,
        # params, bn_state, opt_state, images, gt, key
        in_specs=(P(), P(), P(), P(axis), P(axis), P()),
        # params, opt_state, {spin_loss scalar, per_sample sharded}
        out_specs=(P(), P(), {"spin_loss": P(), "per_sample": P(axis)}),
        check_vma=False,
    )

    def step(params, bn_state, opt_state, images, gt, key):
        _check_divisible("SPIN fine-tune batch", images.shape[0], mesh)
        return sharded(params, bn_state, opt_state, images, gt, key)

    return opt, jax.jit(step)


def make_parallel_spin_finetune_step(mesh: Mesh, *, axis: str = "data", **kwargs):
    """Sharded make_spin_finetune_step: the ResNet-50 SPIN forward/backward
    runs on each device's image shard; BN is frozen (reference set_bn_eval),
    so no stat sync is needed; psum(grads) is the exact single-device
    gradient (hinge keep-counts psum globally inside spin_pose_loss)."""
    opt, base = make_spin_finetune_step(axis_name=axis, **kwargs)
    return _parallel_finetune(mesh, axis, opt, base)


def make_parallel_ski_finetune_step(mesh: Mesh, smpl, J_regressor, *,
                                    axis: str = "data", **kwargs):
    """Sharded make_ski_finetune_step (same contract as the SPIN step)."""
    opt, base = make_ski_finetune_step(smpl, J_regressor, axis_name=axis, **kwargs)
    return _parallel_finetune(mesh, axis, opt, base)
