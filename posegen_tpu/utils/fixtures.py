"""Synthetic problem builders shared by tests, bench.py and __graft_entry__.

Produces a valid (params, pose context, ray batch) tuple for any config
without needing dataset files on disk.
"""

from __future__ import annotations

from typing import Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from posegen_tpu.render.raycast import PoseCtx, RaycastConfig, init_raycaster
from posegen_tpu.skeleton.geometry import get_kp_bounding_cylinder
from posegen_tpu.skeleton.kinematics import smpl_l2ws, invert_rigid


def make_pose_ctx(
    seed: int = 0,
    n_poses: int = 1,
    with_cam_idx: bool = False,
    pose_scale: float = 0.2,
) -> PoseCtx:
    """A plausible random SMPL pose context."""
    rng = np.random.default_rng(seed)
    bones = (rng.standard_normal((n_poses, 24, 3)) * pose_scale).astype(np.float32)
    l2ws = np.asarray(smpl_l2ws(jnp.asarray(bones)))
    kps = l2ws[..., :3, 3]
    skts = np.asarray(invert_rigid(jnp.asarray(l2ws)))
    cyls = np.asarray(get_kp_bounding_cylinder(kps, ext_scale=0.001))
    cam_idxs = np.zeros((n_poses, 1), dtype=np.int32) if with_cam_idx else None
    return PoseCtx(
        kps=jnp.asarray(kps),
        skts=jnp.asarray(skts),
        bones=jnp.asarray(bones),
        cyls=jnp.asarray(cyls.astype(np.float32)),
        cam_idxs=None if cam_idxs is None else jnp.asarray(cam_idxs),
    )


def make_rays(
    n_rays: int, seed: int = 1, target_center=(0.0, 0.0, 0.0), dist: float = 2.0
) -> Tuple[jax.Array, jax.Array]:
    """Rays from a ring of viewpoints aimed at the subject."""
    rng = np.random.default_rng(seed)
    theta = rng.uniform(0, 2 * np.pi, (n_rays,))
    origins = np.stack(
        [dist * np.cos(theta), rng.uniform(-0.5, 0.5, (n_rays,)), dist * np.sin(theta)],
        axis=-1,
    ).astype(np.float32)
    jitter = rng.uniform(-0.3, 0.3, (n_rays, 3)).astype(np.float32)
    dirs = np.asarray(target_center, dtype=np.float32) + jitter - origins
    dirs = dirs / np.linalg.norm(dirs, axis=-1, keepdims=True)
    return jnp.asarray(origins), jnp.asarray(dirs)


def make_problem(
    cfg: Optional[RaycastConfig] = None,
    n_rays: int = 1024,
    seed: int = 0,
) -> Tuple[RaycastConfig, Dict, PoseCtx, jax.Array, jax.Array]:
    """(cfg, params, ctx, rays_o, rays_d) ready for render_rays."""
    if cfg is None:
        cfg = RaycastConfig()
    params = init_raycaster(jax.random.PRNGKey(seed), cfg)
    ctx = make_pose_ctx(seed, with_cam_idx=cfg.opt_framecode)
    rays_o, rays_d = make_rays(n_rays, seed + 1)
    return cfg, params, ctx, rays_o, rays_d


def make_train_batch(
    cfg: RaycastConfig,
    n_rays: int = 1024,
    seed: int = 0,
    opt_pose: bool = False,
    n_frames: int = 4,
    n_groups: int = 1,
) -> Dict[str, jax.Array]:
    """A synthetic training batch matching make_train_step's expectations.

    n_groups > 1 produces the RayBatchLoader grouped layout: pose rows
    (kp3d/skts/bones/cyls) carried per image group (G rows), rays contiguous
    per group (n_rays % n_groups == 0).
    """
    assert n_rays % n_groups == 0
    rng = np.random.default_rng(seed + 7)
    ctx = make_pose_ctx(seed, n_poses=n_groups)
    rays_o, rays_d = make_rays(n_rays, seed + 1)
    batch = {
        "rays_o": rays_o,
        "rays_d": rays_d,
        "target_s": jnp.asarray(rng.uniform(0, 1, (n_rays, 3)).astype(np.float32)),
        "cyls": ctx.cyls,
        "fgs": jnp.asarray(rng.integers(0, 2, (n_rays, 1)).astype(np.float32)),
    }
    if opt_pose:
        # kp_idx is per image GROUP (the RayBatchLoader contract); kp3d is
        # the dataset's estimate rows (the loader always ships them — they
        # anchor the MPJPC stat)
        frames = rng.integers(0, n_frames, (n_groups,)).astype(np.int32)
        batch["kp_idx"] = jnp.asarray(frames)
        batch["kp3d"] = ctx.kps
    else:
        batch["kp3d"] = ctx.kps
        batch["skts"] = ctx.skts
        batch["bones"] = ctx.bones
    if cfg.opt_framecode:
        batch["cam_idxs"] = jnp.zeros((n_rays, 1), dtype=jnp.int32)
    return batch
