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
    w2c = nerf_c2w_to_extrinsic(np.asarray(c2w))
    tl, br, _ = cylinder_to_box_2d(np.asarray(cyl), [H, W, focal], w2c, center=center)
    ys = np.arange(tl[1], br[1])
    xs = np.arange(tl[0], br[0])
    yy, xx = np.meshgrid(ys, xs, indexing="ij")
    valid_idx = (yy * W + xx).reshape(-1)
    ro = rays_o.reshape(-1, 3)[valid_idx]
    rd = rays_d.reshape(-1, 3)[valid_idx]
    return ro.astype(np.float32), rd.astype(np.float32), valid_idx, (tl, br)


KEEP_MAPS = ("rgb_map", "acc_map", "disp_map")


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
        out = render_rays(
            cfg, p, o, d, c, perturb=0.0, raw_noise_std=0.0,
            eval_mean_code=True, coarse_rgb=False,
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
    rays_o, rays_d, valid_idx, (tl, br) = valid_rays_for_pose(H, W, focal, c2w, cyl, center)

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
    if render_fn is None:
        render_fn = _default_render_fn(cfg, half_readback)
    t0 = time.time()
    for i, c2w in enumerate(render_poses):
        ctx = ctxs[i % len(ctxs)]
        bg = None if bgs is None else bgs[i % len(bgs)]
        center = None if centers is None else centers[i]
        f = focal if np.ndim(focal) == 0 else focal[i]
        out = render_image(
            cfg, params, H, W, f, c2w, ctx, chunk=chunk, center=center,
            bg=bg, white_bkgd=white_bkgd, render_fn=render_fn,
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
