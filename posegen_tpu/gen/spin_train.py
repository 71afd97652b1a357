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
    axis_name: Optional[str] = None,
) -> Tuple[jax.Array, jax.Array]:
    """(loss, per-sample errors). gt_joints: (B, 24, 3) world joints.

    axis_name: data-parallel mode — the hinge keep-count (or batch size)
    psums over the mesh axis so the per-device loss is a local numerator
    over the GLOBAL denominator: psum of the per-device losses (and of
    their gradients) equals the single-device loss on the concatenated
    batch, including the reference's divide-by-kept-count semantics."""
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
        den = jnp.sum(keep)
        if axis_name is not None:
            den = jax.lax.psum(den, axis_name)
        loss = jnp.sum(per_sample * keep) / jnp.maximum(den, 1.0)
    else:
        n = per_sample.shape[0]
        if axis_name is not None:
            n = n * jax.lax.axis_size(axis_name)
        loss = jnp.sum(per_sample) / n
    return loss, per_sample


def bn_frozen_adam(lr: float, freeze_init_buffers: bool = True):
    """Adam over HMR weights with the init_pose/shape/cam mean-param buffers
    excluded (they are torch BUFFERS, not parameters); BN running stats are
    frozen separately by calling hmr_apply with bn_train=False (reference
    set_bn_eval, run_gan.py:1860-1869)."""

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

    return optax.multi_transform(
        {"train": optax.adam(lr), "freeze": optax.set_to_zero()}, label_fn
    )


def make_spin_finetune_step(
    lr: float = 5e-5,  # reference --lr_spin default (run_gan.py:79)
    pose_scale: float = 0.4,
    hinge: Optional[float] = 0.02,
    freeze_init_buffers: bool = True,
    axis_name: Optional[str] = None,
):
    """-> (optimizer, step). step(params, bn_state, opt_state, images, gt_joints,
    key) with BN running stats FROZEN (reference set_bn_eval,
    run_gan.py:1860-1869); init_pose/shape/cam mean-param buffers excluded
    from updates (they are torch buffers, not parameters).

    axis_name: data-parallel mode (images/gt_joints sharded along the mesh
    axis under shard_map; BN frozen, so no stat sync is needed). The loss
    uses global denominators (spin_pose_loss axis_name), psum(grads) is the
    exact single-device gradient, and the per-device loss psums back to the
    global value. Built by parallel.gan.make_parallel_spin_finetune_step."""
    opt = bn_frozen_adam(lr, freeze_init_buffers)

    @jax.jit
    def step(params, bn_state, opt_state, images, gt_joints, key):
        def loss_fn(p):
            rotmat, betas, cam, _ = hmr_apply(
                p, bn_state, images, train=True, bn_train=False, dropout_key=key
            )
            loss, per_sample = spin_pose_loss(
                rotmat, gt_joints, pose_scale, hinge, axis_name=axis_name
            )
            return loss, per_sample

        (loss, per_sample), grads = jax.value_and_grad(loss_fn, has_aux=True)(params)
        if axis_name is not None:
            grads = jax.lax.psum(grads, axis_name)
            loss = jax.lax.psum(loss, axis_name)
        updates, opt_state = opt.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return params, opt_state, {"spin_loss": loss, "per_sample": per_sample}

    return opt, step


def ski_pose_loss(
    pred_rotmat: jax.Array,
    pred_betas: jax.Array,
    gt_joints14: jax.Array,
    smpl,
    J_reg: jax.Array,
    axis_name: Optional[str] = None,
) -> Tuple[jax.Array, jax.Array]:
    """SKI fine-tune loss (reference train_ski,
    render_3dpw_testset.py:2690-2714): 14 joints regressed from the
    predicted MESH (H36M-17 rows SKI_PRED_J14), pelvis-centered by regressed
    joint 0 — the GT stays in its raw dataset frame exactly as the
    reference leaves it — scales matched via the [6]-[0] joint distance,
    then plain MPJPE. Returns (loss, per-sample errors)."""
    # the canonical H36M-17 -> SKI-14 row table lives with the eval harness
    # (reference EVAL_JOINTS, render_3dpw_testset.py:2700)
    from posegen_tpu.evals.harness import SKI_PRED_J14

    pred = smpl(
        betas=pred_betas, body_pose=pred_rotmat[:, 1:],
        global_orient=pred_rotmat[:, :1], pose2rot=False,
    )
    j17 = jnp.einsum("jv,bvc->bjc", J_reg, pred["vertices"])
    p14 = j17[:, jnp.asarray(SKI_PRED_J14)] - j17[:, :1]
    s_pred = jnp.linalg.norm(p14[:, 6:7] - p14[:, :1], axis=-1, keepdims=True)
    s_gt = jnp.linalg.norm(
        gt_joints14[:, 6:7] - gt_joints14[:, :1], axis=-1, keepdims=True
    )
    p14 = p14 * s_gt / jnp.maximum(s_pred, 1e-8)
    per_sample = jnp.mean(
        jnp.sqrt(jnp.sum((p14 - gt_joints14) ** 2, axis=-1) + 1e-12), axis=-1
    )
    n = per_sample.shape[0]
    if axis_name is not None:
        # local sum over the global count: psum = the global mean loss
        n = n * jax.lax.axis_size(axis_name)
    return jnp.sum(per_sample) / n, per_sample


def make_ski_finetune_step(
    smpl,
    J_regressor,
    lr: float = 5e-5,
    freeze_init_buffers: bool = True,
    axis_name: Optional[str] = None,
):
    """-> (optimizer, step) fine-tuning SPIN on SKI 3D-joint GT with the
    mesh-regressed loss above; BN stats frozen like make_spin_finetune_step
    (reference train_ski, render_3dpw_testset.py:2659-2775). axis_name:
    data-parallel mode, same contract as make_spin_finetune_step."""
    opt = bn_frozen_adam(lr, freeze_init_buffers)
    J_reg = jnp.asarray(J_regressor, jnp.float32)

    @jax.jit
    def step(params, bn_state, opt_state, images, gt_joints14, key):
        def loss_fn(p):
            rotmat, betas, _, _ = hmr_apply(
                p, bn_state, images, train=True, bn_train=False, dropout_key=key
            )
            return ski_pose_loss(
                rotmat, betas, gt_joints14, smpl, J_reg, axis_name=axis_name
            )

        (loss, per_sample), grads = jax.value_and_grad(loss_fn, has_aux=True)(params)
        if axis_name is not None:
            grads = jax.lax.psum(grads, axis_name)
            loss = jax.lax.psum(loss, axis_name)
        updates, opt_state = opt.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return params, opt_state, {"spin_loss": loss, "per_sample": per_sample}

    return opt, step
