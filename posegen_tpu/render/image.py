"""Image-level rendering driver.

Capability parity with reference run_nerf.py:28-147 (`render_path`) and
core/utils/ray_utils.py:83-136 (`kp_to_valid_rays`): render only rays whose
pixels fall inside the pose's projected bounding-cylinder box, then composite
onto a background.

TPU-first mechanics: the valid-ray set (dynamic size per image) is padded on
the host to a multiple of `chunk`; the device sees only fixed-shape batches
of `chunk` rays, so one jit compilation serves every image. Padding lanes
render garbage that is discarded on scatter-back.
"""

from __future__ import annotations

import functools
import os
import time
from typing import Any, Dict, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from posegen_tpu.render.raycast import PoseCtx, RaycastConfig, render_rays
from posegen_tpu.skeleton.cameras import get_rays_np, nerf_c2w_to_extrinsic
from posegen_tpu.skeleton.geometry import cylinder_to_box_2d


def valid_rays_for_pose(
    H: int,
    W: int,
    focal,
    c2w: np.ndarray,
    cyl: np.ndarray,
    center=None,
) -> Tuple[np.ndarray, np.ndarray, np.ndarray, Tuple[np.ndarray, np.ndarray]]:
    """Rays restricted to the cylinder's 2D bbox.

    Returns (rays_o (V,3), rays_d (V,3), valid_idx (V,) flat pixel indices,
    (tl, br) box corners).
    """
    rays_o, rays_d = get_rays_np(H, W, focal, c2w, center=center)
    tl, br, valid_idx = valid_box_for_pose(H, W, focal, c2w, cyl, center)
    ro = rays_o.reshape(-1, 3)[valid_idx]
    rd = rays_d.reshape(-1, 3)[valid_idx]
    return ro.astype(np.float32), rd.astype(np.float32), valid_idx, (tl, br)


def valid_box_for_pose(
    H: int, W: int, focal, c2w: np.ndarray, cyl: np.ndarray, center=None,
    window=None,
) -> Tuple[np.ndarray, np.ndarray, np.ndarray]:
    """(tl, br, valid_idx): the pose cylinder's 2D bbox and the flat pixel
    indices inside it — the single source of the box convention for both
    the host-ray and device-raygen render paths.

    window: optional (lo, hi) pixel interval — the box is intersected with
    the square [lo, hi) x [lo, hi). Used by the GAN feedback renderer: SPIN
    consumes only the center crop (reference run_gan.py:2069 reads
    image[100:412, 100:412] and throws the margins away), so rays outside
    the crop are pure waste on that path."""
    w2c = nerf_c2w_to_extrinsic(np.asarray(c2w))
    tl, br, _ = cylinder_to_box_2d(np.asarray(cyl), [H, W, focal], w2c, center=center)
    if window is not None:
        lo, hi = int(window[0]), int(window[1])
        tl = np.maximum(tl, lo)
        br = np.minimum(br, hi)
        # degenerate intersection (pose fully outside the crop): keep one
        # pixel so downstream fixed-shape code stays alive
        br = np.maximum(br, tl + 1)
    yy, xx = np.meshgrid(
        np.arange(tl[1], br[1]), np.arange(tl[0], br[0]), indexing="ij"
    )
    valid_idx = (yy * W + xx).reshape(-1)
    return tl, br, valid_idx


KEEP_MAPS = ("rgb_map", "acc_map", "disp_map")


def make_cam(
    H: int,
    W: int,
    focal,
    c2w: np.ndarray,
    tl: np.ndarray,
    br: np.ndarray,
    center=None,
) -> Dict[str, np.ndarray]:
    """Pack the per-image camera + valid-ray box for on-device ray generation.

    ~60 bytes per frame replace the ~6 MB of f32 ray origins/directions the
    host path uploads for a 512^2 image — on tunneled/slow-PCIe hosts that
    upload, not compute, dominates frame latency. Layout:
      c2w  (3, 4) f32   camera-to-world
      foff (4,)   f32   [focal_x, focal_y, off_x, off_y]
      box  (4,)   i32   [tl_x, tl_y, box_width, n_valid]
    """
    f = np.reshape(np.asarray(focal, dtype=np.float32), (-1,))
    fx = float(f[0])
    fy = float(f[1]) if f.size > 1 else fx
    if center is None:
        off_x, off_y = W * 0.5, H * 0.5
    else:
        off_x, off_y = float(center[0]), float(center[1])
    bw = int(br[0] - tl[0])
    bh = int(br[1] - tl[1])
    return {
        "c2w": np.asarray(c2w, np.float32)[:3, :4],
        "foff": np.asarray([fx, fy, off_x, off_y], np.float32),
        "box": np.asarray([int(tl[0]), int(tl[1]), bw, bw * bh], np.int32),
    }


def rays_from_box(cam: Dict[str, jax.Array], start, n: int):
    """Rays for flat box offsets [start, start+n) — the in-graph twin of
    `get_rays_np` restricted to the valid-ray box (row-major, matching
    `valid_rays_for_pose`'s valid_idx order). Offsets past n_valid clamp to
    the last valid ray (same garbage-lane padding as the host path)."""
    box = cam["box"]
    foff = cam["foff"]
    j = jnp.asarray(start, jnp.int32) + jnp.arange(n, dtype=jnp.int32)
    j = jnp.minimum(j, box[3] - 1)
    y = (box[1] + j // box[2]).astype(jnp.float32)
    x = (box[0] + j % box[2]).astype(jnp.float32)
    dirs = jnp.stack(
        [(x - foff[2]) / foff[0], -(y - foff[3]) / foff[1], -jnp.ones_like(x)],
        axis=-1,
    )
    c2w = cam["c2w"]
    rays_d = jnp.sum(dirs[..., None, :] * c2w[:3, :3], axis=-1)
    rays_o = jnp.broadcast_to(c2w[:3, -1], rays_d.shape)
    return rays_o, rays_d


@functools.lru_cache(maxsize=8)
def _raygen_render_fn(cfg: RaycastConfig, chunk: int, half_readback: bool = False):
    """Memoized jitted raygen+render: rays are generated in-graph from the
    ~60-byte cam pack (XLA fuses the pinhole math into the render prologue),
    so per-chunk host->device upload is two scalars instead of 2 x (chunk, 3)
    f32 arrays."""

    def fn(p, cam, start, c):
        o, d = rays_from_box(cam, start, chunk)
        # a ctx WITHOUT cam_idxs evals with the mean code; one WITH them
        # uses the real per-frame codes (reference render_testset passes
        # cams=cam_idxs when opt_framecode, run_nerf.py:574 — mean code is
        # its idx = -1 convention, networks/embedding.py:17-33)
        out = render_rays(
            cfg, p, o, d, c, perturb=0.0, raw_noise_std=0.0,
            eval_mean_code=c.cam_idxs is None, coarse_rgb=False,
        )
        out = {k: v for k, v in out.items() if k in KEEP_MAPS}
        if half_readback:
            out = {k: v.astype(jnp.float16) for k, v in out.items()}
        return out

    jitted = jax.jit(fn)
    jitted.takes_cam = True
    return jitted


@functools.lru_cache(maxsize=8)
def _default_render_fn(cfg: RaycastConfig, half_readback: bool = False):
    """Memoized jitted eval render. A fresh `jax.jit(lambda ...)` per call
    would defeat jit's compilation cache (keyed on function identity) and
    silently recompile ~60 s per image.

    half_readback=True casts the per-ray output maps to f16 on-device
    before the host transfer: a 512x512 frame reads back ~5 MB of maps,
    which dominates frame latency on tunneled/slow-PCIe hosts; f16's 5e-4
    relative rounding is invisible in u8 PNGs and SPIN inputs (eval
    metrics keep the f32 path)."""

    def fn(p, o, d, c):
        # mean code iff the ctx carries no frame index (see _raygen_render_fn)
        out = render_rays(
            cfg, p, o, d, c, perturb=0.0, raw_noise_std=0.0,
            eval_mean_code=c.cam_idxs is None, coarse_rgb=False,
        )
        if half_readback:
            out = {
                k: (v.astype(jnp.float16) if k in KEEP_MAPS else v)
                for k, v in out.items()
            }
        return out

    return jax.jit(fn)


def _render_chunks(
    cfg: RaycastConfig,
    params: Dict[str, Any],
    rays_o: np.ndarray,
    rays_d: np.ndarray,
    ctx: PoseCtx,
    chunk: int,
    render_fn=None,
    keys: Tuple[str, ...] = KEEP_MAPS,
    half_readback: bool = False,
) -> Dict[str, np.ndarray]:
    """Pad the ray set to a chunk multiple and run fixed-shape device batches.

    Only `keys` are read back: the per-sample maps (alpha/weights, ~40 MB per
    32k-ray chunk) cost more in device->host transfer than the whole render
    compute on tunneled TPUs. Async dispatch: all chunks are enqueued before
    any readback, so transfers overlap compute.
    """
    n = rays_o.shape[0]
    n_pad = (-n) % chunk
    ro = np.concatenate([rays_o, np.broadcast_to(rays_o[-1:], (n_pad, 3))]) if n_pad else rays_o
    rd = np.concatenate([rays_d, np.broadcast_to(rays_d[-1:], (n_pad, 3))]) if n_pad else rays_d

    if render_fn is None:
        render_fn = _default_render_fn(cfg, half_readback)

    device_outs: List[Dict[str, jax.Array]] = []
    for i in range(0, ro.shape[0], chunk):
        ret = render_fn(
            params, jnp.asarray(ro[i : i + chunk]), jnp.asarray(rd[i : i + chunk]), ctx
        )
        device_outs.append({k: v for k, v in ret.items() if k in keys})
    outs: Dict[str, List[np.ndarray]] = {}
    for ret in device_outs:
        for k, v in ret.items():
            outs.setdefault(k, []).append(np.asarray(v, np.float32))
    return {k: np.concatenate(v)[:n] for k, v in outs.items()}


def _render_chunks_cam(
    cfg: RaycastConfig,
    params: Dict[str, Any],
    cam: Dict[str, np.ndarray],
    ctx: PoseCtx,
    chunk: int,
    render_fn=None,
    half_readback: bool = False,
) -> Dict[str, np.ndarray]:
    """Device-raygen twin of `_render_chunks`: per chunk the host uploads one
    i32 scalar (the chunk's flat box offset); rays never cross the link.
    render_fn, if given, must take (params, cam, start, ctx) — factories tag
    such functions with `takes_cam = True`."""
    n = int(cam["box"][3])
    if render_fn is None:
        render_fn = _raygen_render_fn(cfg, chunk, half_readback)
    cam_dev = {k: jnp.asarray(v) for k, v in cam.items()}

    device_outs: List[Dict[str, jax.Array]] = []
    for i in range(0, n + ((-n) % chunk), chunk):
        ret = render_fn(params, cam_dev, jnp.asarray(i, jnp.int32), ctx)
        device_outs.append({k: v for k, v in ret.items() if k in KEEP_MAPS})
    outs: Dict[str, List[np.ndarray]] = {}
    for ret in device_outs:
        for k, v in ret.items():
            outs.setdefault(k, []).append(np.asarray(v, np.float32))
    return {k: np.concatenate(v)[:n] for k, v in outs.items()}


def render_image(
    cfg: RaycastConfig,
    params: Dict[str, Any],
    H: int,
    W: int,
    focal,
    c2w: np.ndarray,
    ctx: PoseCtx,
    chunk: int = 4096,
    center=None,
    bg: Optional[np.ndarray] = None,
    white_bkgd: bool = False,
    render_fn=None,
    half_readback: bool = False,
) -> Dict[str, np.ndarray]:
    """Render one image (reference render_path inner loop, run_nerf.py:77-138).

    bg: optional (H, W, 3) background composited as rgb + (1-acc)*bg.
    Returns dict with 'rgb' (H, W, 3), 'acc' (H, W), 'disp' (H, W), 'bbox'.
    """
    cyl = np.asarray(ctx.cyls)[0]
    device_raygen = render_fn is None or getattr(render_fn, "takes_cam", False)
    if device_raygen:
        # box + flat indices only on the host; rays are generated in-graph
        tl, br, valid_idx = valid_box_for_pose(H, W, focal, c2w, cyl, center)
        cam = make_cam(H, W, focal, c2w, tl, br, center=center)
        ret = _render_chunks_cam(
            cfg, params, cam, ctx, chunk, render_fn, half_readback=half_readback
        )
    else:
        rays_o, rays_d, valid_idx, (tl, br) = valid_rays_for_pose(
            H, W, focal, c2w, cyl, center
        )
        ret = _render_chunks(
            cfg, params, rays_o, rays_d, ctx, chunk, render_fn,
            half_readback=half_readback,
        )

    if white_bkgd and bg is None:
        bg = np.ones((H, W, 3), dtype=np.float32)
    rgb_full = np.zeros((H * W, 3), dtype=np.float32) if bg is None else bg.reshape(-1, 3).astype(np.float32).copy()
    acc_full = np.zeros((H * W,), dtype=np.float32)
    disp_full = np.zeros((H * W,), dtype=np.float32)

    rgb = ret["rgb_map"]
    acc = ret["acc_map"]
    if bg is not None:
        rgb = rgb + (1.0 - acc[..., None]) * rgb_full[valid_idx]
    rgb_full[valid_idx] = rgb
    acc_full[valid_idx] = acc
    disp_full[valid_idx] = ret["disp_map"]

    return {
        "rgb": rgb_full.reshape(H, W, 3),
        "acc": acc_full.reshape(H, W),
        "disp": disp_full.reshape(H, W),
        "bbox": (tl, br),
        "valid_idx": valid_idx,
    }


def render_images_pipelined(
    cfg: RaycastConfig,
    params: Dict[str, Any],
    H: int,
    W: int,
    focal,
    c2ws: Sequence[np.ndarray],
    ctxs: Sequence[PoseCtx],
    cyls: np.ndarray,
    chunk: int = 4096,
    white_bkgd: bool = False,
    render_fn=None,
    half_readback: bool = False,
    window=None,
) -> np.ndarray:
    """Render K (camera, pose) pairs with the device pipeline kept full.

    `render_image` drains the device between images: it blocks on the
    np.asarray readback of image k before dispatching image k+1, so on a
    tunneled host the chip idles for the whole readback+host-composite
    latency every frame. Here ALL chunks of ALL images are enqueued first
    (jax dispatch is async; per-chunk uploads are a ~60-byte cam pack and
    one scalar), then read back and composited in order — transfers and
    host work overlap the remaining compute. This is the GAN feedback
    renderer's hot path (reference run_gan.py:2041-2091 renders rpi=20
    images per feedback event).

    cyls: (K, 5) HOST cylinder rows (the 2D box math is numpy); ctx pose
    fields may live on device. Only device-raygen render_fns are supported
    (the default single-chip jit and the shard_map cam renderer both are).
    Returns (K, H, W, 3) float32 composited frames.
    """
    if render_fn is None:
        render_fn = _raygen_render_fn(cfg, chunk, half_readback)
    if not getattr(render_fn, "takes_cam", False):
        raise ValueError("render_images_pipelined needs a device-raygen "
                         "(takes_cam) render_fn")

    debug = bool(os.environ.get("POSEGEN_RENDER_DEBUG"))
    t0 = time.time()
    pending = []
    n_total = 0
    for k in range(len(c2ws)):
        tl, br, valid_idx = valid_box_for_pose(
            H, W, focal, c2ws[k], cyls[k], window=window
        )
        cam = make_cam(H, W, focal, c2ws[k], tl, br)
        cam_dev = {kk: jnp.asarray(v) for kk, v in cam.items()}
        n = int(cam["box"][3])
        n_total += n
        outs = [
            render_fn(params, cam_dev, jnp.asarray(i, jnp.int32), ctxs[k])
            for i in range(0, n + ((-n) % chunk), chunk)
        ]
        pending.append((valid_idx, n, outs))
    t1 = time.time()

    frames = np.zeros((len(c2ws), H * W, 3), np.float32)
    if white_bkgd:
        frames += 1.0
    for k, (valid_idx, n, outs) in enumerate(pending):
        rgb = np.concatenate(
            [np.asarray(o["rgb_map"], np.float32) for o in outs]
        )[:n]
        if white_bkgd:
            acc = np.concatenate(
                [np.asarray(o["acc_map"], np.float32) for o in outs]
            )[:n]
            rgb = rgb + (1.0 - acc[..., None])
        frames[k, valid_idx] = rgb
    if debug:
        t2 = time.time()
        print(
            f"[render_images_pipelined] K={len(c2ws)} rays={n_total} "
            f"chunks={sum(len(o) for _, _, o in pending)} chunk={chunk} "
            f"enqueue {t1 - t0:.2f}s readback+composite {t2 - t1:.2f}s",
            flush=True,
        )
    return frames.reshape(len(c2ws), H, W, 3)


def render_path(
    cfg: RaycastConfig,
    params: Dict[str, Any],
    render_poses: Sequence[np.ndarray],
    hwf: Tuple[int, int, float],
    ctxs: Sequence[PoseCtx],
    chunk: int = 4096,
    centers=None,
    bgs=None,
    white_bkgd: bool = False,
    verbose: bool = False,
    render_fn=None,
    half_readback: bool = False,
) -> Dict[str, np.ndarray]:
    """Render a sequence of (camera, pose) pairs (reference run_nerf.py:28-147).

    When there are fewer pose contexts than cameras, pose i%len(ctxs) is used
    (matching kp_to_valid_rays' cyl_idx convention).

    render_fn: optional override — e.g. parallel.mesh.make_shardmap_render
    to spread each chunk's rays across a device mesh (the multi-chip role
    reference nn.DataParallel played on the render path,
    core/raycasters.py:157)."""
    H, W, focal = hwf
    rgbs, accs, disps, bboxes = [], [], [], []
    t0 = time.time()
    for i, c2w in enumerate(render_poses):
        ctx = ctxs[i % len(ctxs)]
        bg = None if bgs is None else bgs[i % len(bgs)]
        center = None if centers is None else centers[i]
        f = focal if np.ndim(focal) == 0 else focal[i]
        out = render_image(
            cfg, params, H, W, f, c2w, ctx, chunk=chunk, center=center,
            bg=bg, white_bkgd=white_bkgd, render_fn=render_fn,
            half_readback=half_readback,
        )
        rgbs.append(out["rgb"])
        accs.append(out["acc"])
        disps.append(out["disp"])
        bboxes.append(np.concatenate(out["bbox"]))
        if verbose:
            print(f"render {i}: {time.time() - t0:.3f}s")
            t0 = time.time()
    return {
        "rgbs": np.stack(rgbs),
        "accs": np.stack(accs),
        "disps": np.stack(disps),
        "bboxes": np.stack(bboxes),
    }
