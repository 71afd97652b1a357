"""Software mesh rasterizer for turntable previews.

Capability parity with the reference's vendored EGL/OpenGL mesh renderer
(render/: GLSL color.vs/fs shaders, FBO pipeline render/render.py:32,
ColorRender color_render.py:31, camera math camera.py:30-240, driven by
render_mesh.py) rebuilt as a dependency-free vectorized numpy z-buffer
rasterizer — headless everywhere, no GL context needed. Lambertian vertex
shading matches the color shader's look; perspective camera uses the same
intrinsics convention as the rest of the framework.
"""

from __future__ import annotations

from typing import Optional

import numpy as np

from posegen_tpu.skeleton.cameras import nerf_c2w_to_extrinsic


def rasterize_mesh(
    verts: np.ndarray,
    faces: np.ndarray,
    c2w: np.ndarray,
    H: int,
    W: int,
    focal: float,
    colors: Optional[np.ndarray] = None,
    bg: float = 1.0,
    light_dir=(0.3, 0.8, 0.5),
) -> np.ndarray:
    """Render one view -> (H, W, 3) float [0, 1].

    verts (V, 3) world; faces (F, 3); colors optional (V, 3).
    """
    ext = nerf_c2w_to_extrinsic(np.asarray(c2w, np.float64))
    hom = np.concatenate([verts, np.ones((len(verts), 1))], -1)
    cam = hom @ ext.T  # (V, 4)
    z = cam[:, 2]
    x = cam[:, 0] / np.maximum(z, 1e-9) * focal + W / 2.0
    y = cam[:, 1] / np.maximum(z, 1e-9) * focal + H / 2.0

    if colors is None:
        colors = np.full((len(verts), 3), 0.75)

    # per-face lambertian shading from world normals
    v0, v1, v2 = (verts[faces[:, i]] for i in range(3))
    n = np.cross(v1 - v0, v2 - v0)
    n /= np.maximum(np.linalg.norm(n, axis=-1, keepdims=True), 1e-12)
    ld = np.asarray(light_dir, np.float64)
    ld /= np.linalg.norm(ld)
    shade = 0.35 + 0.65 * np.abs(n @ ld)  # (F,)

    img = np.full((H, W, 3), bg, np.float64)
    zbuf = np.full((H, W), np.inf)

    p0 = np.stack([x[faces[:, 0]], y[faces[:, 0]], z[faces[:, 0]]], -1)
    p1 = np.stack([x[faces[:, 1]], y[faces[:, 1]], z[faces[:, 1]]], -1)
    p2 = np.stack([x[faces[:, 2]], y[faces[:, 2]], z[faces[:, 2]]], -1)
    fcol = (colors[faces[:, 0]] + colors[faces[:, 1]] + colors[faces[:, 2]]) / 3.0
    fcol = fcol * shade[:, None]

    visible = (p0[:, 2] > 1e-6) & (p1[:, 2] > 1e-6) & (p2[:, 2] > 1e-6)
    order = np.argsort(-np.minimum(np.minimum(p0[:, 2], p1[:, 2]), p2[:, 2]))
    for fi in order:
        if not visible[fi]:
            continue
        a, b, c = p0[fi], p1[fi], p2[fi]
        x0 = max(int(np.floor(min(a[0], b[0], c[0]))), 0)
        x1 = min(int(np.ceil(max(a[0], b[0], c[0]))) + 1, W)
        y0 = max(int(np.floor(min(a[1], b[1], c[1]))), 0)
        y1 = min(int(np.ceil(max(a[1], b[1], c[1]))) + 1, H)
        if x0 >= x1 or y0 >= y1:
            continue
        xs, ys = np.meshgrid(np.arange(x0, x1) + 0.5, np.arange(y0, y1) + 0.5)
        d = (b[1] - c[1]) * (a[0] - c[0]) + (c[0] - b[0]) * (a[1] - c[1])
        if abs(d) < 1e-12:
            continue
        w0 = ((b[1] - c[1]) * (xs - c[0]) + (c[0] - b[0]) * (ys - c[1])) / d
        w1 = ((c[1] - a[1]) * (xs - c[0]) + (a[0] - c[0]) * (ys - c[1])) / d
        w2 = 1.0 - w0 - w1
        inside = (w0 >= 0) & (w1 >= 0) & (w2 >= 0)
        if not inside.any():
            continue
        zi = w0 * a[2] + w1 * b[2] + w2 * c[2]
        sub_z = zbuf[y0:y1, x0:x1]
        upd = inside & (zi < sub_z)
        sub_z[upd] = zi[upd]
        img[y0:y1, x0:x1][upd] = fcol[fi]
    return img.astype(np.float32)


def overlay_mesh(
    img: np.ndarray,
    verts: np.ndarray,
    faces: np.ndarray,
    c2w: np.ndarray,
    focal: float,
    alpha: float = 0.8,
    color=(0.65, 0.75, 0.9),
) -> np.ndarray:
    """Composite a mesh render over an image (the reference's pyrender SMPL
    debug overlay, core/misc/renderer.py:7-83). img: (H, W, 3) [0,1]."""
    H, W = img.shape[:2]
    colors = np.tile(np.asarray(color, np.float64), (len(verts), 1))
    ren = rasterize_mesh(verts, faces, c2w, H, W, focal, colors=colors, bg=-1.0)
    fg = ~np.all(ren == -1.0, axis=-1)  # bg sentinel marks untouched pixels
    out = img.astype(np.float32).copy()
    out[fg] = alpha * ren[fg] + (1 - alpha) * out[fg]
    return out


def turntable_render(
    verts: np.ndarray,
    faces: np.ndarray,
    n_views: int = 12,
    H: int = 256,
    W: int = 256,
    focal: float = 250.0,
    dist: Optional[float] = None,
) -> np.ndarray:
    """Orbit the mesh (reference render_mesh.py's turntable loop)
    -> (n_views, H, W, 3)."""
    from posegen_tpu.data.synthetic import _look_at_c2w

    center = verts.mean(0)
    if dist is None:
        dist = float(np.linalg.norm(verts - center, axis=-1).max() * 3.0 + 1e-6)
    frames = []
    for t in np.linspace(0, 2 * np.pi, n_views, endpoint=False):
        eye = center + np.array([dist * np.cos(t), 0.3 * dist, dist * np.sin(t)])
        c2w = _look_at_c2w(eye.astype(np.float32), center.astype(np.float32))
        frames.append(rasterize_mesh(verts, faces, c2w, H, W, focal))
    return np.stack(frames)
