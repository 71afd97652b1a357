"""Skeleton / camera visualization (host-side).

Capability parity with the reference's drawing utilities
(core/utils/skeleton_utils.py:842-1546: draw_skeletons_3d / draw_skeleton2d
cv2 overlays, kp-mask creation, plotly 3-D scene plots of skeletons,
cameras and cylinders). cv2 paths are always available; plotly paths are
gated on the import (the library is optional in this image).
"""

from __future__ import annotations

import numpy as np

from posegen_tpu.skeleton.cameras import nerf_c2w_to_extrinsic, world_to_cam
from posegen_tpu.skeleton.skeleton import SMPL_SKELETON, Skeleton


def draw_skeleton2d(
    img: np.ndarray,
    kp2d: np.ndarray,
    skel: Skeleton = SMPL_SKELETON,
    color=(0, 255, 0),
    radius: int = 2,
) -> np.ndarray:
    """Draw joints + bones on an image (reference skeleton_utils.py:1479)."""
    import cv2

    out = np.ascontiguousarray(img.copy())
    if out.dtype != np.uint8:
        out = (np.clip(out, 0, 1) * 255).astype(np.uint8)
    parents = skel.parents()
    for j in range(skel.n_joints):
        p = parents[j]
        x0, y0 = int(kp2d[j, 0]), int(kp2d[j, 1])
        cv2.circle(out, (x0, y0), radius, color, -1)
        if p != j:
            cv2.line(out, (x0, y0), (int(kp2d[p, 0]), int(kp2d[p, 1])), color, 1)
    return out


def draw_skeletons_3d(
    imgs: np.ndarray,
    kps: np.ndarray,
    c2ws: np.ndarray,
    H: int,
    W: int,
    focals,
    centers=None,
    skel: Skeleton = SMPL_SKELETON,
) -> np.ndarray:
    """Project 3-D keypoints into each camera and overlay
    (reference skeleton_utils.py:1467-1477)."""
    out = []
    for i in range(len(imgs)):
        f = focals if np.ndim(focals) == 0 else focals[i]
        ext = nerf_c2w_to_extrinsic(np.asarray(c2ws[i]))
        center = None if centers is None else centers[i]
        kp2d = world_to_cam(np.asarray(kps[i]), ext, H, W, f, center)
        out.append(draw_skeleton2d(imgs[i], kp2d, skel))
    return np.stack(out)


def create_kp_mask(
    H: int,
    W: int,
    kp2d: np.ndarray,
    skel: Skeleton = SMPL_SKELETON,
    thickness: int = 12,
) -> np.ndarray:
    """Binary mask around the projected skeleton (reference
    create_kp_masks, skeleton_utils.py:867-913)."""
    import cv2

    mask = np.zeros((H, W), np.uint8)
    parents = skel.parents()
    for j in range(skel.n_joints):
        p = parents[j]
        a = (int(kp2d[j, 0]), int(kp2d[j, 1]))
        b = (int(kp2d[p, 0]), int(kp2d[p, 1]))
        cv2.line(mask, a, b, 1, thickness)
        cv2.circle(mask, a, thickness, 1, -1)
    return mask[..., None]


def plot_skeleton3d(kp: np.ndarray, skel: Skeleton = SMPL_SKELETON, fig=None):
    """Interactive plotly 3-D skeleton (reference skeleton_utils.py:915-1028).
    Returns None when plotly isn't installed."""
    try:
        import plotly.graph_objects as go
    except ImportError:
        return None
    fig = fig or go.Figure()
    parents = skel.parents()
    for j in range(skel.n_joints):
        p = parents[j]
        fig.add_trace(
            go.Scatter3d(
                x=[kp[j, 0], kp[p, 0]],
                y=[kp[j, 1], kp[p, 1]],
                z=[kp[j, 2], kp[p, 2]],
                mode="lines+markers",
                marker=dict(size=3),
                showlegend=False,
            )
        )
    return fig


def plot_cameras(c2ws: np.ndarray, scale: float = 0.2, fig=None):
    """Camera frusta in 3-D (reference skeleton_utils.py:1030-1220)."""
    try:
        import plotly.graph_objects as go
    except ImportError:
        return None
    fig = fig or go.Figure()
    for c2w in np.asarray(c2ws):
        o = c2w[:3, 3]
        for axis, color in zip(range(3), ("red", "green", "blue")):
            d = c2w[:3, axis] * scale
            fig.add_trace(
                go.Scatter3d(
                    x=[o[0], o[0] + d[0]], y=[o[1], o[1] + d[1]],
                    z=[o[2], o[2] + d[2]],
                    mode="lines", line=dict(color=color), showlegend=False,
                )
            )
    return fig


def plot_cylinder(cyl: np.ndarray, n_seg: int = 32, fig=None):
    """Bounding cylinder wireframe (reference skeleton_utils.py:1222-1273)."""
    try:
        import plotly.graph_objects as go
    except ImportError:
        return None
    fig = fig or go.Figure()
    cx, cz, r, top, bot = [float(v) for v in cyl]
    theta = np.linspace(0, 2 * np.pi, n_seg)
    for h in (top, bot):
        fig.add_trace(
            go.Scatter3d(
                x=cx + r * np.cos(theta), y=np.full(n_seg, h),
                z=cz + r * np.sin(theta),
                mode="lines", showlegend=False,
            )
        )
    return fig
