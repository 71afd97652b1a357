"""SPIN fine-tuning on generated (image, pose) data.

Capability parity with reference `train_spin` (run_gan.py:1849-1952):
BN-frozen training (running stats fixed, weights trainable), loss =
scale-normalized root-centred 14-joint position error x 0.1, with the
hinge filter comparing that 0.1-SCALED per-sample loss against 0.02
(i.e. keeping samples under 0.2 scene-scale units of raw joint error,
exactly the reference's `rows1 = spin_loss < 0.0200`,
run_gan.py:1906-1908 — trains on clean renders, skips failures).
Rebuilt as one jitted step; the MPII-mix pass is the same step on MPII
batches without the hinge.
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import optax

from posegen_tpu.gen.gan import SPIN_J14
from posegen_tpu.gen.hmr import hmr_apply
from posegen_tpu.skeleton.kinematics import smpl_l2ws_from_rots


def spin_pose_loss(
    pred_rotmat: jax.Array,
    gt_joints: jax.Array,
    pose_scale: float = 0.4,
    hinge: Optional[float] = 0.02,
) -> Tuple[jax.Array, jax.Array]:
    """(loss, per-sample errors). gt_joints: (B, 24, 3) world joints."""
    j14 = jnp.asarray(SPIN_J14)
    pose = smpl_l2ws_from_rots(pred_rotmat, scale=pose_scale)[..., :3, 3]
    pose = pose - pose[:, :1]
    gt = gt_joints - gt_joints[:, :1]
    pose, gt = pose[:, j14], gt[:, j14]
    # scale-normalize prediction to the GT's norm (reference :1903-1906)
    s_pred = jnp.linalg.norm(pose, axis=(-1, -2), keepdims=True)
    s_gt = jnp.linalg.norm(gt, axis=(-1, -2), keepdims=True)
    pose = pose / jnp.maximum(s_pred, 1e-8) * s_gt
    # eps-safe norm (NaN-free gradients when pred == gt exactly)
    per_sample = (
        jnp.mean(jnp.sqrt(jnp.sum((pose - gt) ** 2, axis=-1) + 1e-12), axis=-1) * 0.1
    )
    if hinge is not None:
        keep = (per_sample < hinge).astype(per_sample.dtype)
        loss = jnp.sum(per_sample * keep) / jnp.maximum(jnp.sum(keep), 1.0)
    else:
        loss = jnp.mean(per_sample)
    return loss, per_sample


def make_spin_finetune_step(
    lr: float = 1e-5,
    pose_scale: float = 0.4,
    hinge: Optional[float] = 0.02,
    freeze_init_buffers: bool = True,
):
    """-> (optimizer, step). step(params, bn_state, opt_state, images, gt_joints,
    key) with BN running stats FROZEN (reference set_bn_eval,
    run_gan.py:1860-1869); init_pose/shape/cam mean-param buffers excluded
    from updates (they are torch buffers, not parameters)."""

    def label_fn(params):
        return jax.tree_util.tree_map_with_path(
            lambda path, _: "freeze"
            if (
                freeze_init_buffers
                and any(
                    getattr(p, "key", None) in ("init_pose", "init_shape", "init_cam")
                    for p in path
                )
            )
            else "train",
            params,
        )

    opt = optax.multi_transform(
        {"train": optax.adam(lr), "freeze": optax.set_to_zero()}, label_fn
    )

    @jax.jit
    def step(params, bn_state, opt_state, images, gt_joints, key):
        def loss_fn(p):
            rotmat, betas, cam, _ = hmr_apply(
                p, bn_state, images, train=True, bn_train=False, dropout_key=key
            )
            loss, per_sample = spin_pose_loss(rotmat, gt_joints, pose_scale, hinge)
            return loss, per_sample

        (loss, per_sample), grads = jax.value_and_grad(loss_fn, has_aux=True)(params)
        updates, opt_state = opt.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return params, opt_state, {"spin_loss": loss, "per_sample": per_sample}

    return opt, step
