"""Camera conventions and ray generation.

The world/camera conventions follow the reference exactly (NeRF-style c2w
with camera axes [right, up, backward]; extrinsics in OpenCV convention
[right, down, forward]): reference core/utils/skeleton_utils.py:529-537,
1401-1454 and core/utils/ray_utils.py:6-61.
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from posegen_tpu.skeleton.geometry import focal_to_intrinsic


def swap_mat(mat):
    """Flip the y/z camera axes: NeRF c2w <-> OpenCV-style pose.

    Equivalent to right-multiplying by diag(1, -1, -1, 1)
    (reference skeleton_utils.py:1401-1410).
    """
    xp = jnp if isinstance(mat, jax.Array) else np
    return xp.concatenate(
        [mat[..., 0:1], -mat[..., 1:2], -mat[..., 2:3], mat[..., 3:]], axis=-1
    )


def nerf_c2w_to_extrinsic(c2w):
    """NeRF camera-to-world -> OpenCV world-to-camera (reference :529)."""
    xp = jnp if isinstance(c2w, jax.Array) else np
    return xp.linalg.inv(swap_mat(c2w))


def nerf_extrinsic_to_c2w(ext):
    """OpenCV world-to-camera -> NeRF camera-to-world (reference :535)."""
    xp = jnp if isinstance(ext, jax.Array) else np
    return swap_mat(xp.linalg.inv(ext))


def world_to_cam(pts: np.ndarray, extrinsic: np.ndarray, H, W, focal,
                 center=None) -> np.ndarray:
    """Project world points to pixel coordinates
    (reference skeleton_utils.py:1435-1453). Host-side (numpy)."""
    if center is None:
        off_x, off_y = W * 0.5, H * 0.5
    else:
        off_x, off_y = center
    if pts.shape[-1] < 4:
        pts = np.concatenate([pts, np.ones((*pts.shape[:-1], 1), pts.dtype)], -1)
    intrinsic = focal_to_intrinsic(focal)
    cam = pts @ extrinsic.T @ intrinsic.T
    xy = cam[..., :2] / cam[..., 2:3]
    xy = np.where(np.isinf(xy), 0.0, xy)
    xy[..., 0] += off_x
    xy[..., 1] += off_y
    return xy


def get_rays(
    H: int,
    W: int,
    focal,
    c2w: jax.Array,
    center: Optional[Tuple[float, float]] = None,
) -> Tuple[jax.Array, jax.Array]:
    """Pinhole rays for a full image (reference ray_utils.py:6-28).

    Returns (rays_o, rays_d), each (H, W, 3). Directions are *not* normalised
    (lengths encode pixel footprint; the compositor multiplies by |d|).
    """
    focal = jnp.asarray(focal, dtype=jnp.float32).reshape(-1)
    focal_x = focal[0]
    focal_y = focal[1] if focal.shape[0] > 1 else focal[0]
    if center is None:
        off_x, off_y = W * 0.5, H * 0.5
    else:
        off_x, off_y = center
    j, i = jnp.meshgrid(
        jnp.arange(H, dtype=jnp.float32),
        jnp.arange(W, dtype=jnp.float32),
        indexing="ij",
    )
    # image y grows downward; the NeRF camera frame has +y up and -z forward
    dirs = jnp.stack(
        [(i - off_x) / focal_x, -(j - off_y) / focal_y, -jnp.ones_like(i)],
        axis=-1,
    )
    # broadcast-sum (VPU) instead of a 3x3 einsum: keeps f32 precision on TPU
    rays_d = jnp.sum(dirs[..., None, :] * c2w[:3, :3], axis=-1)
    rays_o = jnp.broadcast_to(c2w[:3, -1], rays_d.shape)
    return rays_o, rays_d


def get_rays_np(H, W, focal, c2w, center=None):
    """Host-side numpy version (reference ray_utils.py:31-61)."""
    i, j = np.meshgrid(
        np.arange(W, dtype=np.float32), np.arange(H, dtype=np.float32), indexing="xy"
    )
    f = np.reshape(np.asarray(focal, dtype=np.float32), (-1,))
    focal_x = f[0]
    focal_y = f[1] if f.size > 1 else f[0]
    if center is None:
        off_x, off_y = W * 0.5, H * 0.5
    else:
        off_x, off_y = center
    dirs = np.stack(
        [(i - off_x) / focal_x, -(j - off_y) / focal_y, -np.ones_like(i)], axis=-1
    )
    rays_d = np.sum(dirs[..., None, :] * c2w[:3, :3], axis=-1)
    rays_o = np.broadcast_to(c2w[:3, -1], rays_d.shape)
    return rays_o, rays_d


def rotate_x(phi: float) -> np.ndarray:
    c, s = np.cos(phi), np.sin(phi)
    return np.array(
        [[1, 0, 0, 0], [0, c, -s, 0], [0, s, c, 0], [0, 0, 0, 1]], dtype=np.float32
    )


def rotate_y(theta: float) -> np.ndarray:
    c, s = np.cos(theta), np.sin(theta)
    return np.array(
        [[c, 0, -s, 0], [0, 1, 0, 0], [s, 0, c, 0], [0, 0, 0, 1]], dtype=np.float32
    )


def rotate_z(psi: float) -> np.ndarray:
    c, s = np.cos(psi), np.sin(psi)
    return np.array(
        [[c, -s, 0, 0], [s, c, 0, 0], [0, 0, 1, 0], [0, 0, 0, 1]], dtype=np.float32
    )


def translate(tx: float, ty: float, tz: float) -> np.ndarray:
    m = np.eye(4, dtype=np.float32)
    m[:3, 3] = [tx, ty, tz]
    return m


def ndc_rays(H, W, focal, near, rays_o, rays_d):
    """Shift rays to normalized device coordinates
    (reference ray_utils.py:64-81; forward-facing scenes, unused by the
    human pipelines but part of the ray toolbox)."""
    xp = jnp if isinstance(rays_o, jax.Array) else np
    t = -(near + rays_o[..., 2]) / rays_d[..., 2]
    rays_o = rays_o + t[..., None] * rays_d

    o0 = -1.0 / (W / (2.0 * focal)) * rays_o[..., 0] / rays_o[..., 2]
    o1 = -1.0 / (H / (2.0 * focal)) * rays_o[..., 1] / rays_o[..., 2]
    o2 = 1.0 + 2.0 * near / rays_o[..., 2]
    d0 = (
        -1.0 / (W / (2.0 * focal))
        * (rays_d[..., 0] / rays_d[..., 2] - rays_o[..., 0] / rays_o[..., 2])
    )
    d1 = (
        -1.0 / (H / (2.0 * focal))
        * (rays_d[..., 1] / rays_d[..., 2] - rays_o[..., 1] / rays_o[..., 2])
    )
    d2 = -2.0 * near / rays_o[..., 2]
    return xp.stack([o0, o1, o2], -1), xp.stack([d0, d1, d2], -1)
