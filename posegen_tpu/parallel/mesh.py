"""Multi-chip scaling: ray/data sharding over a 1-D device mesh.

The reference's only parallelism is single-process nn.DataParallel
(reference core/raycasters.py:157) — ray batches scattered over GPUs and
gathered on GPU0, no distributed backend at all (SURVEY.md §2i). The
TPU-native replacement:

  * a 1-D `Mesh` over all chips with axis "data" (= the flattened ray axis;
    rays are this workload's sequence dimension),
  * parameters replicated (coarse+fine MLPs are ~7 MB — replication is free,
    every chip keeps its weights in VMEM),
  * ray batches sharded along axis 0; XLA turns the mean-loss reduction into
    a psum over ICI and the rendered-tile reassembly into an all_gather.

Everything rides `jax.jit` + `NamedSharding` constraints: we annotate, XLA
inserts the collectives (the scaling-book recipe), nothing is hand-scheduled.
"""

from __future__ import annotations

from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np
import optax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(n_devices: Optional[int] = None, axis: str = "data") -> Mesh:
    devs = jax.devices()
    if n_devices is not None:
        devs = devs[:n_devices]
    return Mesh(np.asarray(devs), (axis,))


def replicate(tree: Any, mesh: Mesh) -> Any:
    """Fully replicate a pytree across the mesh."""
    s = NamedSharding(mesh, P())
    return jax.device_put(tree, s)


def shard_batch(batch: Dict[str, jax.Array], mesh: Mesh, axis: str = "data") -> Dict:
    """Shard every batch leaf along dim 0 (replicating leaves with leading 1)."""
    def _put(x):
        x = jnp.asarray(x)
        if x.ndim >= 1 and x.shape[0] > 1 and x.shape[0] % mesh.size == 0:
            return jax.device_put(x, NamedSharding(mesh, P(axis)))
        return jax.device_put(x, NamedSharding(mesh, P()))
    return jax.tree_util.tree_map(_put, batch)


def make_parallel_train_step(train_step, mesh: Mesh, axis: str = "data"):
    """jit the train step with replicated state and dim-0-sharded batch.

    The per-ray loss mean over a sharded axis becomes an ICI psum; gradients
    (functions of replicated params) come out replicated — data-parallel
    training without any explicit collective in user code.
    """
    repl = NamedSharding(mesh, P())

    def spec_for_batch(x):
        if hasattr(x, "ndim") and x.ndim >= 1 and x.shape[0] > 1 and x.shape[0] % mesh.size == 0:
            return NamedSharding(mesh, P(axis))
        return repl

    def step(state, batch, key):
        batch = {
            k: jax.lax.with_sharding_constraint(v, spec_for_batch(v))
            for k, v in batch.items()
        }
        return train_step(state, batch, key)

    return jax.jit(step, donate_argnums=(0,))


def make_parallel_render(render_fn, mesh: Mesh, axis: str = "data"):
    """jit a `(params, rays_o, rays_d, ctx) -> maps` render with rays sharded
    across chips and outputs gathered (the all_gather replaces DataParallel's
    gather-on-GPU0)."""
    repl = NamedSharding(mesh, P())
    rays_s = NamedSharding(mesh, P(axis))

    def render(params, rays_o, rays_d, ctx):
        rays_o = jax.lax.with_sharding_constraint(rays_o, rays_s)
        rays_d = jax.lax.with_sharding_constraint(rays_d, rays_s)
        out = render_fn(params, rays_o, rays_d, ctx)
        # gather rendered tiles back to a replicated layout for host readback
        return jax.tree_util.tree_map(
            lambda x: jax.lax.with_sharding_constraint(x, repl), out
        )

    return jax.jit(render)


def make_shardmap_render(cfg, mesh: Mesh, axis: str = "data", use_fused=None):
    """Multi-chip renderer via shard_map: each chip runs the (Pallas-fused)
    render on its ray shard; outputs all_gather back to replicated.

    XLA's jit partitioner cannot split a pallas_call, so the sharded fused
    path must be expressed as per-device code — exactly what shard_map is.
    ctx must be single-pose (leading dim 1, replicated across chips).
    """
    from posegen_tpu.render.raycast import render_rays

    def per_device(params, rays_o, rays_d, ctx):
        out = render_rays(
            cfg, params, rays_o, rays_d, ctx,
            perturb=0.0, raw_noise_std=0.0, eval_mean_code=True,
            use_fused=use_fused,
        )
        return {k: out[k] for k in ("rgb_map", "acc_map", "disp_map")}

    sharded = jax.shard_map(
        per_device,
        mesh=mesh,
        in_specs=(P(), P(axis), P(axis), P()),
        out_specs=P(axis),
        check_vma=False,
    )
    return jax.jit(sharded)


def make_shardmap_train_step(cfg, tcfg, mesh: Mesh, axis: str = "data"):
    """Data-parallel training with the fused Pallas kernels on every chip.

    jit's partitioner cannot split pallas_call, so the loss/grad runs inside
    shard_map: each device evaluates its ray shard through the custom-VJP
    kernels and psums gradients + metrics over ICI; the (replicated) optax
    update then runs in the enclosing jit. Batches must shard evenly and the
    pose context must be replicated (single pose group per shard; the
    grouped layout generalizes by sharding whole image groups per chip).
    """
    from posegen_tpu.render.raycast import PoseCtx, render_rays
    from posegen_tpu.train import losses as L
    from posegen_tpu.train.trainer import nerf_optimizer

    shard_map = jax.shard_map
    opt = nerf_optimizer(tcfg)

    def loss_fn(params, embeds, batch, key):
        ctx = PoseCtx(
            kps=batch["kp3d"], skts=batch["skts"], bones=batch["bones"],
            cyls=batch["cyls"], cam_idxs=batch.get("cam_idxs"),
        )
        ret = render_rays(
            cfg, {**params, **embeds}, batch["rays_o"], batch["rays_d"], ctx,
            key=key, use_fused="train",
        )
        loss = L.rgb_loss(tcfg.loss_fn, ret["rgb_map"], batch["target_s"])
        if "rgb0" in ret:
            loss = loss + L.rgb_loss(tcfg.loss_fn, ret["rgb0"], batch["target_s"])
        return loss

    def per_device_grads(params, embeds, batch, key):
        loss, grads = jax.value_and_grad(loss_fn)(params, embeds, batch, key)
        grads = jax.lax.pmean(grads, axis)
        loss = jax.lax.pmean(loss, axis)
        return loss, grads

    def step(params, embeds, opt_state, batch, key):
        n = batch["rays_o"].shape[0]
        # shard per-ray leaves; replicate per-image pose rows / scalars
        batch_specs = {
            k: P(axis) if (hasattr(v, "shape") and v.ndim >= 1 and v.shape[0] == n)
            else P()
            for k, v in batch.items()
        }
        sharded_grads = shard_map(
            per_device_grads,
            mesh=mesh,
            in_specs=(P(), P(), batch_specs, P()),
            out_specs=(P(), P()),
            check_vma=False,
        )
        loss, grads = sharded_grads(params, embeds, batch, key)
        updates, opt_state = opt.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return params, opt_state, loss

    return opt, jax.jit(step)
