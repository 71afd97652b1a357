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

import functools

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


def batch_pspecs(
    batch: Dict[str, Any], n_devices: int, axis: str = "data", n_rays: Optional[int] = None
) -> Dict[str, P]:
    """PartitionSpec per batch leaf for data-parallel training.

    Layout contract (RayBatchLoader, data/h5dataset.py): per-ray leaves have
    leading dim N (rays contiguous per image group); per-image-group pose
    rows (skts/kp3d/bones/cyls/...) have leading dim G with N % G == 0;
    replicated leaves have leading dim 1 (or are scalars).

    Both N-leaves and G-leaves shard along dim 0 — each chip gets whole image
    groups together with exactly their rays (group-per-chip). Non-divisible
    G or N is a loud error, never a silent replicate: replicating a G-dim
    leaf while sharding the rays would hand each chip the wrong pose rows.
    """
    if n_rays is None:
        n_rays = int(batch["rays_o"].shape[0])
    if n_rays % n_devices != 0:
        raise ValueError(
            f"ray batch ({n_rays}) must divide evenly over {n_devices} devices"
        )
    specs: Dict[str, P] = {}
    for k, v in batch.items():
        dim0 = v.shape[0] if getattr(v, "ndim", 0) >= 1 else None
        if dim0 is None or dim0 == 1:
            specs[k] = P()
        elif dim0 == n_rays or dim0 % n_devices == 0:
            specs[k] = P(axis)
        else:
            raise ValueError(
                f"batch leaf {k!r} has leading dim {dim0}, which neither "
                f"matches the ray count ({n_rays}) nor divides over "
                f"{n_devices} devices — pad the image-group count to a "
                f"multiple of the mesh size"
            )
    return specs


def shard_batch(batch: Dict[str, jax.Array], mesh: Mesh, axis: str = "data") -> Dict:
    """device_put every batch leaf with its `batch_pspecs` layout."""
    specs = batch_pspecs(batch, mesh.size, axis)
    return {
        k: jax.device_put(jnp.asarray(v), NamedSharding(mesh, specs[k]))
        for k, v in batch.items()
    }


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


@functools.lru_cache(maxsize=8)
def make_shardmap_render(cfg, mesh: Mesh, axis: str = "data", use_fused=None):
    """Multi-chip renderer via shard_map: each chip runs the (Pallas-fused)
    render on its ray shard; outputs all_gather back to replicated.

    XLA's jit partitioner cannot split a pallas_call, so the sharded fused
    path must be expressed as per-device code — exactly what shard_map is.
    ctx must be single-pose (leading dim 1, replicated across chips).

    Memoized: jit's compile cache keys on function identity, so a fresh
    jit(shard_map(...)) per call would recompile the full render at every
    periodic eval (the bug render/image._default_render_fn fixed in r2).
    """
    from posegen_tpu.render.raycast import render_rays

    def per_device(params, rays_o, rays_d, ctx):
        # mean code iff the ctx carries no frame index (reference
        # render_testset passes cams=cam_idxs when opt_framecode)
        out = render_rays(
            cfg, params, rays_o, rays_d, ctx,
            perturb=0.0, raw_noise_std=0.0,
            eval_mean_code=ctx.cam_idxs is None,
            use_fused=use_fused, coarse_rgb=False,
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


@functools.lru_cache(maxsize=8)
def make_shardmap_render_cam(
    cfg, mesh: Mesh, chunk: int, axis: str = "data", use_fused=None,
    half_readback: bool = False,
):
    """Multi-chip renderer with on-device ray generation: the host uploads a
    ~60-byte cam pack + one i32 chunk offset; each chip generates its own
    `chunk / mesh.size` ray slice in-graph (`rays_from_box`) and renders it.
    Replaces both DataParallel's render scatter (core/raycasters.py:157) and
    the per-chunk ray upload. Tagged `takes_cam` for `render_image`."""
    from posegen_tpu.render.image import KEEP_MAPS, rays_from_box
    from posegen_tpu.render.raycast import render_rays

    local_n = chunk // mesh.size
    if local_n * mesh.size != chunk:
        raise ValueError(f"chunk {chunk} not divisible by mesh size {mesh.size}")

    def per_device(params, cam, start, ctx):
        lstart = start + jax.lax.axis_index(axis) * local_n
        rays_o, rays_d = rays_from_box(cam, lstart, local_n)
        out = render_rays(
            cfg, params, rays_o, rays_d, ctx,
            perturb=0.0, raw_noise_std=0.0,
            eval_mean_code=ctx.cam_idxs is None,
            use_fused=use_fused, coarse_rgb=False,
        )
        out = {k: out[k] for k in KEEP_MAPS}
        if half_readback:
            out = {k: v.astype(jnp.float16) for k, v in out.items()}
        return out

    sharded = jax.shard_map(
        per_device,
        mesh=mesh,
        in_specs=(P(), P(), P(), P()),
        out_specs=P(axis),
        check_vma=False,
    )
    jitted = jax.jit(sharded)
    jitted.takes_cam = True
    return jitted


def auto_render_fn(cfg, chunk: int, use_fused=None, half_readback: bool = False):
    """(render_fn, chunk) for the current topology: on a multi-chip host,
    a shard_map renderer (on-device raygen) over all devices + a
    mesh-divisible chunk; on one chip (None, chunk) so callers keep the
    memoized single-device jit (which also raygens in-graph).

    Covers every eval/render surface the reference ran under
    nn.DataParallel (core/raycasters.py:157): run_render, the GAN feedback
    renderer, i_video, evaluate_testset."""
    import jax as _jax

    from posegen_tpu.kernels.field import (
        fused_config_disqualification,
        warn_fused_fallback,
    )

    if use_fused is not False:
        reason = fused_config_disqualification(cfg)
        if reason is not None:
            # the XLA fallback pipeline materializes the per-point encodings
            # (~350 KB/ray at 64+16 samples): a 65536-ray eval chunk would
            # need >20 GB of HBM. Clamp to the reference's own eval tiling
            # (chunk // 8, run_nerf.py:157).
            if chunk > 8192:
                warn_fused_fallback(
                    "auto_render_fn", reason,
                    extra=f" Eval chunk clamped {chunk} -> 8192.",
                )
                chunk = 8192
            else:
                warn_fused_fallback("auto_render_fn", reason)

    if _jax.device_count() <= 1:
        return None, chunk
    mesh = make_mesh()
    chunk = chunk - (chunk % mesh.size) or mesh.size
    return (
        make_shardmap_render_cam(
            cfg, mesh, chunk, use_fused=use_fused, half_readback=half_readback
        ),
        chunk,
    )


def make_shardmap_train_step(
    cfg,
    tcfg,
    pcfg=None,
    *,
    mesh: Mesh,
    axis: str = "data",
    rest_pose=None,
    kp_map=None,
    n_frames: int = 0,
    fold_key_per_device: bool = True,
):
    """Data-parallel training over the mesh with the FULL train step —
    pose-opt, framecodes, embedder schedules, both optimizers — and the
    fused Pallas kernels on every chip (when the config qualifies).

    jit's partitioner cannot split pallas_call, so the whole step runs inside
    shard_map: each device renders its contiguous ray shard (with its image
    groups — see `batch_pspecs`) through the custom-VJP kernels, pmeans
    gradients + stats over ICI, and applies the optax update to its
    (replicated) copy of the state. Post-pmean inputs are identical on every
    device, so the updated state comes out replicated — no gather, no
    parameter traffic. This is the DataParallel replacement shipped by the
    run_nerf CLI's multi-device branch (reference core/raycasters.py:157).

    Returns a jitted `step(state, batch, key) -> (state, stats)` with the
    same signature as the single-device `make_train_step` product.

    fold_key_per_device: fold the device index into the PRNG key so each
    chip draws independent stratified-sampling/noise draws. Disable to make
    a perturb=0 run exactly reproducible against the single-device step.
    """
    from posegen_tpu.train.trainer import make_train_step

    base = make_train_step(
        cfg, tcfg, pcfg,
        rest_pose=rest_pose, kp_map=kp_map, n_frames=n_frames, axis_name=axis,
    )

    def per_device(state, batch, key):
        if fold_key_per_device:
            key = jax.random.fold_in(key, jax.lax.axis_index(axis))
        return base(state, batch, key)

    def step(state, batch, key):
        specs = batch_pspecs(batch, mesh.size, axis)
        f = jax.shard_map(
            per_device,
            mesh=mesh,
            in_specs=(P(), specs, P()),
            out_specs=(P(), P()),
            check_vma=False,
        )
        return f(state, batch, key)

    return jax.jit(step, donate_argnums=(0,))
