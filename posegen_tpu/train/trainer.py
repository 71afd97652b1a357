"""Training loop core: train state + one pure, jittable train step.

Capability parity with reference core/trainer.py (Trainer.train_batch /
compute_loss / optimize / decay_optimizer_lrate) redesigned TPU-first:

  * The whole iteration — pose FK, rendering, losses, grads, both optimizer
    updates and the embedder tau/alpha schedules — is ONE jitted function of
    (state, batch, key). No host round-trips inside the step.
  * LR decay is an optax schedule (exact analog of the reference's
    lrate * 0.1**(step/decay) exponential, trainer.py:175-192).
  * Pose-opt gradient accumulation (`opt_pose_step`, trainer.py:478-484)
    is optax.MultiSteps on the pose optimizer.
  * tau/alpha annealing (raycasters.py:731-748) is computed in-graph from
    the step counter — schedules live in state, not python.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Dict, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import optax

from posegen_tpu.ops import embedding as emb_mod
from posegen_tpu.pose.opt import (
    PoseOptConfig,
    _canon_bones,
    kp_reg_loss,
    mpjpc_stat,
    pose_apply,
    temporal_loss,
)
from posegen_tpu.render.raycast import PoseCtx, RaycastConfig, render_rays
from posegen_tpu.skeleton.skeleton import SMPL_SKELETON, Skeleton
from posegen_tpu.train import losses as L


@dataclasses.dataclass(frozen=True)
class TrainConfig:
    """Static training hyper-parameters (reference run_nerf.py flags)."""

    lrate: float = 5e-4
    lrate_decay: int = 500  # in `decay_unit` steps (reference convention)
    lrate_decay_rate: float = 0.1
    decay_unit: int = 1000
    weight_decay: Optional[float] = None  # L2-to-grad, torch Adam semantics
    loss_fn: str = "MSE"
    loss_beta: float = 0.1  # huber delta (reference --loss_beta)
    use_coarse_loss: bool = True
    coarse_weight: float = 1.0
    use_acc_loss: bool = False
    acc_loss_weight: float = 0.01
    use_background: bool = False  # composite (1-acc)*bg into the prediction
    testopt: bool = False  # test-time pose opt: freeze the NeRF nets
    fix_layer: int = 0  # freeze pts_linears below this layer (finetune)
    # pose optimization
    opt_pose: bool = False
    opt_pose_lrate: float = 5e-4
    opt_pose_lrate_decay: int = 2
    opt_pose_decay_rate: float = 1.0
    opt_pose_decay_unit: int = 400
    opt_pose_step: int = 20
    opt_pose_coef: float = 2.0
    opt_pose_warmup: int = 0
    opt_pose_stop: Optional[int] = None
    use_temp_loss: bool = False
    temp_coef: float = 0.05
    opt_pose_cache: bool = False
    # embedder schedules
    cutoff_step: int = 250
    cutoff_rate: float = 10.0
    freq_schedule_step: int = 5
    # Pallas trainable field kernel (kernels/field_grad.py): None = auto
    # (on TPU, when the config qualifies and rays group evenly per pose)
    fused_train: Optional[bool] = None
    rays_per_image: int = 0  # rays per pose group in a batch (0 = one group)


class TrainState(NamedTuple):
    step: jax.Array  # scalar int32
    params: Dict[str, Any]  # trainable NeRF nets {'coarse', 'fine'}
    embeds: Dict[str, Any]  # embedder buffers {'embed_kp', ...}
    opt_state: optax.OptState
    pose_params: Optional[Dict[str, jax.Array]] = None
    pose_anchors: Optional[Dict[str, jax.Array]] = None
    pose_opt_state: Optional[optax.OptState] = None


def _split_variables(variables: Dict[str, Any]) -> Tuple[Dict, Dict]:
    params = {k: v for k, v in variables.items() if k in ("coarse", "fine")}
    embeds = {k: v for k, v in variables.items() if k.startswith("embed")}
    return params, embeds


def nerf_optimizer(tcfg: TrainConfig) -> optax.GradientTransformation:
    """Adam with the reference's exponential decay
    (new_lrate = lrate * rate**(step / (decay*decay_unit)),
    trainer.py:175-192). testopt freezes the NeRF entirely
    (reference --testopt: test-time pose optimization, no NeRF update)."""
    if tcfg.testopt:
        return optax.set_to_zero()
    sched = optax.exponential_decay(
        init_value=tcfg.lrate,
        transition_steps=tcfg.lrate_decay * tcfg.decay_unit,
        decay_rate=tcfg.lrate_decay_rate,
    )
    opt = optax.adam(learning_rate=sched, b1=0.9, b2=0.999)
    if tcfg.weight_decay:
        # torch Adam weight_decay semantics: L2 term added to the gradient
        # before the moment updates (reference raycasters.py:116)
        opt = optax.chain(optax.add_decayed_weights(tcfg.weight_decay), opt)
    return opt


def pose_optimizer(tcfg: TrainConfig) -> optax.GradientTransformation:
    sched = optax.exponential_decay(
        init_value=tcfg.opt_pose_lrate,
        transition_steps=max(tcfg.opt_pose_lrate_decay * tcfg.opt_pose_decay_unit, 1),
        decay_rate=tcfg.opt_pose_decay_rate,
    )
    opt = optax.adam(learning_rate=sched)
    if tcfg.opt_pose_step > 1:
        opt = optax.MultiSteps(opt, every_k_schedule=tcfg.opt_pose_step)
    return opt


def create_train_state(
    variables: Dict[str, Any],
    tcfg: TrainConfig,
    pose_params: Optional[Dict[str, jax.Array]] = None,
    pose_anchors: Optional[Dict[str, jax.Array]] = None,
) -> TrainState:
    params, embeds = _split_variables(variables)
    opt_state = nerf_optimizer(tcfg).init(params)
    pose_opt_state = None
    if tcfg.opt_pose and pose_params is not None:
        pose_opt_state = pose_optimizer(tcfg).init(pose_params)
    return TrainState(
        step=jnp.asarray(0, jnp.int32),
        params=params,
        embeds=embeds,
        opt_state=opt_state,
        pose_params=pose_params,
        pose_anchors=pose_anchors,
        pose_opt_state=pose_opt_state,
    )


def _updated_embeds(
    cfg: RaycastConfig, tcfg: TrainConfig, embeds: Dict[str, Any], step: jax.Array
) -> Dict[str, Any]:
    """Recompute tau/alpha buffers from the step counter, in-graph."""
    out = dict(embeds)
    for name, ecfg in (
        ("embed_kp", cfg.embed_kp_cfg),
        ("embed_bone", cfg.embed_bone_cfg),
        ("embed_view", cfg.embed_view_cfg),
    ):
        if ecfg is None or name not in embeds:
            continue
        st = dict(embeds[name])
        if ecfg.cutoff:
            st["tau"] = emb_mod.update_tau(ecfg, step, tcfg.cutoff_step, tcfg.cutoff_rate)
        if ecfg.freq_schedule:
            st["alpha"] = emb_mod.update_alpha(
                ecfg, step, tcfg.freq_schedule_step, float(cfg.multires - 1)
            )
        out[name] = st
    return out


def compute_losses(
    tcfg: TrainConfig,
    ret: Dict[str, jax.Array],
    batch: Dict[str, jax.Array],
) -> Tuple[jax.Array, Dict[str, jax.Array]]:
    """Photometric + coarse + acc losses (reference trainer.py:321-383).

    use_background composites the real background behind the prediction
    before the loss (reference _compute_nerf_loss, trainer.py:364-366:
    rgb_pred + (1-acc)*bgs against an UNMASKED target) — for both the fine
    and coarse passes."""
    target = batch["target_s"]
    rgb = ret["rgb_map"]
    if tcfg.use_background and "bgs" in batch:
        rgb = rgb + (1.0 - ret["acc_map"])[..., None] * batch["bgs"]
    loss = L.rgb_loss(tcfg.loss_fn, rgb, target, beta=tcfg.loss_beta)
    mse = L.img2mse(rgb, target)
    stats = {"rgb_loss": loss, "psnr": L.mse2psnr(mse)}
    total = loss
    if tcfg.use_coarse_loss and tcfg.coarse_weight > 0 and "rgb0" in ret:
        rgb0 = ret["rgb0"]
        if tcfg.use_background and "bgs" in batch:
            rgb0 = rgb0 + (1.0 - ret["acc0"])[..., None] * batch["bgs"]
        loss0 = L.rgb_loss(tcfg.loss_fn, rgb0, target, beta=tcfg.loss_beta)
        stats["rgb0_loss"] = loss0
        total = total + tcfg.coarse_weight * loss0
    if tcfg.use_acc_loss and "fgs" in batch:
        acc_l = L.acc2bce(ret["acc_map"], batch["fgs"][..., 0])
        if "acc0" in ret:
            acc_l = acc_l + L.acc2bce(ret["acc0"], batch["fgs"][..., 0])
        stats["acc_loss"] = acc_l
        total = total + tcfg.acc_loss_weight * acc_l
    return total, stats


def make_train_step(
    cfg: RaycastConfig,
    tcfg: TrainConfig,
    pcfg: Optional[PoseOptConfig] = None,
    skel: Skeleton = SMPL_SKELETON,
    rest_pose=None,
    kp_map=None,
    n_frames: int = 0,
    axis_name: Optional[str] = None,
):
    """Build the jittable train step.

    batch keys: rays_o, rays_d (N,3); target_s (N,3); cyls (N,5) or (1,5);
    kp3d/skts/bones when not pose-optimizing; kp_idx (N,) when pose-optimizing;
    cam_idxs (N,1) when framecodes are on; fgs (N,1) optional.

    axis_name: when the step runs per-device inside `shard_map` (see
    parallel/mesh.make_shardmap_train_step), the mesh axis to pmean grads and
    stats over. With replicated params/optimizer state, the post-pmean update
    is identical on every device, so the output state stays replicated —
    data parallelism without gathering rays (the TPU-native replacement for
    reference nn.DataParallel, core/raycasters.py:157).
    """
    opt = nerf_optimizer(tcfg)
    popt = pose_optimizer(tcfg) if tcfg.opt_pose else None

    def _fused_train_mode(params, batch) -> Any:
        """'train'/'full' when the custom-VJP Pallas kernel applies, else False.

        'train' propagates weight (+framecode) gradients only; 'full' (pose
        refinement on) additionally propagates input cotangents through the
        fused encoding into skts -> FK -> pose params. Requirements (all
        static at trace time): TPU backend, supported config, and rays
        grouping evenly into per-pose blocks whose sample counts are tile
        multiples.
        """
        from posegen_tpu.kernels.field import supports_fused_config

        enabled = tcfg.fused_train
        if enabled is None:
            # auto: single-chip jit, or per-device code under shard_map
            # (axis_name set). XLA does not partition pallas_call under plain
            # jit sharding, so plain multi-device jit keeps the XLA path
            # unless the user forces fused_train=True.
            enabled = jax.default_backend() == "tpu" and (
                jax.device_count() == 1 or axis_name is not None
            )
        if not enabled or not supports_fused_config(cfg):
            return False
        if len(params["coarse"].get("views_linears", [0])) != 1:
            return False
        mode = "full" if tcfg.opt_pose else "train"
        n = batch["rays_o"].shape[0]
        # pose groups carried by the batch (kp_idx rows when pose-optimizing)
        g = batch["kp_idx"].shape[0] if tcfg.opt_pose else batch["skts"].shape[0]
        if g == 1:
            return mode  # single group: fused_run_net pads to the tile
        if n % g != 0:
            return False
        # any group shape works: fused_run_net ray-pads each group to a
        # tile-divisible point count (kernels/field_grad.pick_train_tile)
        return mode

    def loss_fn(params, pose_params, embeds, anchors, batch, key):
        n = batch["rays_o"].shape[0]
        if tcfg.opt_pose and pose_params is not None:
            kps, bones, skts, _ = pose_apply(
                pose_params, batch["kp_idx"], rest_pose, skel, kp_map
            )
        else:
            kps, bones, skts = batch["kp3d"], batch["bones"], batch["skts"]
        kps_g, bones_g = kps, bones  # per-GROUP rows, before per-ray expansion

        # batches carry pose arrays per IMAGE group (G rows, rays contiguous
        # per group — the RayBatchLoader layout; kp_idx is per GROUP too),
        # not per ray: expanding on device saves ~rays_per_image x of
        # host->device transfer
        g = skts.shape[0]
        cyls = batch["cyls"]
        if cyls.shape[0] not in (1, n):
            # expand per-group cylinder rows to per-ray regardless of how
            # the pose rows are shaped (g may be n when kp_idx is per-ray)
            cyls = jnp.repeat(cyls, n // cyls.shape[0], axis=0)

        use_fused = _fused_train_mode(params, batch)
        if use_fused in ("train", "full") and g != n:
            ctx = PoseCtx(
                kps=kps, skts=skts, bones=bones, cyls=cyls,
                cam_idxs=batch.get("cam_idxs"),
            )
        else:
            if 1 < g < n:  # expand per-group rows to per-ray for the XLA path
                rep = n // g
                kps = jnp.repeat(kps, rep, axis=0)
                bones = jnp.repeat(bones, rep, axis=0)
                skts = jnp.repeat(skts, rep, axis=0)
            ctx = PoseCtx(
                kps=kps, skts=skts, bones=bones, cyls=cyls,
                cam_idxs=batch.get("cam_idxs"),
            )
        all_params = {**params, **embeds}
        ret = render_rays(
            cfg, all_params, batch["rays_o"], batch["rays_d"], ctx, key=key,
            use_fused=use_fused,
        )
        total, stats = compute_losses(tcfg, ret, batch)
        if tcfg.opt_pose and pose_params is not None:
            _pcfg = pcfg or PoseOptConfig()
            if anchors is not None:
                # the loss the reference train loop runs: root-excluded
                # squared bone diff, hinged at tol (trainer.py:385-408);
                # logged AFTER the coefficient, like the reference
                kp_l = tcfg.opt_pose_coef * kp_reg_loss(
                    _pcfg, pose_params, anchors, batch["kp_idx"], kp_map
                )
                stats["kp_loss"] = kp_l
                total = total + kp_l
                if "kp3d" in batch:
                    # anchors['kps'] in the reference are the dataset kp3d
                    stats["mpjpc"] = mpjpc_stat(_pcfg, kps_g, batch["kp3d"])
            if tcfg.use_temp_loss and n_frames > 1:
                temp_val = batch.get("temp_val")
                if temp_val is None:
                    temp_val = jnp.ones_like(batch["kp_idx"], dtype=jnp.float32)
                temp_l = tcfg.temp_coef * temporal_loss(
                    pose_params, batch["kp_idx"], temp_val, rest_pose,
                    kps_g, _canon_bones(bones_g), skel, kp_map,
                )
                stats["temp_loss"] = temp_l
                total = total + temp_l
        stats["total_loss"] = total
        return total, stats

    loss_with_anchor = loss_fn

    def _gradnorm(g) -> jax.Array:
        """Global gradient norm (reference get_gradnorm stats,
        trainer.py:194-205)."""
        return optax.global_norm(g)

    def _reduce(tree):
        return jax.lax.pmean(tree, axis_name) if axis_name else tree

    def _apply_fix_layer(g_nerf):
        """Zero gradients of pts_linears[:fix_layer] (reference
        freeze_weights for --finetune --fix_layer, raycasters.py:215-217)."""
        if tcfg.fix_layer <= 0:
            return g_nerf
        out = dict(g_nerf)
        for net in ("coarse", "fine"):
            if net not in out:
                continue
            sub = dict(out[net])
            sub["pts_linears"] = [
                jax.tree_util.tree_map(jnp.zeros_like, layer)
                if i < tcfg.fix_layer else layer
                for i, layer in enumerate(sub["pts_linears"])
            ]
            out[net] = sub
        return out

    def train_step(state: TrainState, batch: Dict[str, jax.Array], key: jax.Array):
        embeds = _updated_embeds(cfg, tcfg, state.embeds, state.step)
        if tcfg.opt_pose and state.pose_params is not None:
            (_, stats), (g_nerf, g_pose) = jax.value_and_grad(
                loss_with_anchor, argnums=(0, 1), has_aux=True
            )(state.params, state.pose_params, embeds, state.pose_anchors, batch, key)
            g_nerf, g_pose, stats = _reduce(g_nerf), _reduce(g_pose), _reduce(stats)
            g_nerf = _apply_fix_layer(g_nerf)
            stats["grad_norm"] = _gradnorm(g_nerf)
            stats["pose_grad_norm"] = _gradnorm(g_pose)
            updates, opt_state = opt.update(g_nerf, state.opt_state, state.params)
            params = optax.apply_updates(state.params, updates)
            # warmup / stop windows (reference --opt_pose_warmup /
            # --opt_pose_stop): skip the WHOLE optimizer transform in-graph
            # (lax.cond), so Adam moments / schedules / MultiSteps counters
            # do not advance while gated — matching the reference, which
            # simply does not step the pose optimizer outside the window
            if tcfg.opt_pose_warmup > 0 or tcfg.opt_pose_stop is not None:
                active = jnp.asarray(True)
                if tcfg.opt_pose_warmup > 0:
                    active = active & (state.step >= tcfg.opt_pose_warmup)
                if tcfg.opt_pose_stop is not None:
                    active = active & (state.step < tcfg.opt_pose_stop)
                p_updates, pose_opt_state = jax.lax.cond(
                    active,
                    lambda: popt.update(
                        g_pose, state.pose_opt_state, state.pose_params
                    ),
                    lambda: (
                        jax.tree_util.tree_map(jnp.zeros_like, state.pose_params),
                        state.pose_opt_state,
                    ),
                )
            else:
                p_updates, pose_opt_state = popt.update(
                    g_pose, state.pose_opt_state, state.pose_params
                )
            pose_params = optax.apply_updates(state.pose_params, p_updates)
            new_state = state._replace(
                step=state.step + 1,
                params=params,
                embeds=embeds,
                opt_state=opt_state,
                pose_params=pose_params,
                pose_opt_state=pose_opt_state,
            )
        else:
            (_, stats), g_nerf = jax.value_and_grad(
                lambda p: loss_with_anchor(p, None, embeds, None, batch, key),
                has_aux=True,
            )(state.params)
            g_nerf, stats = _reduce(g_nerf), _reduce(stats)
            g_nerf = _apply_fix_layer(g_nerf)
            stats["grad_norm"] = _gradnorm(g_nerf)
            updates, opt_state = opt.update(g_nerf, state.opt_state, state.params)
            params = optax.apply_updates(state.params, updates)
            new_state = state._replace(
                step=state.step + 1, params=params, embeds=embeds, opt_state=opt_state
            )
        return new_state, stats

    return train_step
