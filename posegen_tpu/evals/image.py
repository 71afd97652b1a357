"""Image quality metrics in JAX: PSNR and gaussian-window (MS-)SSIM.

Capability parity with the reference's vendored pytorch-msssim
(pytorch_msssim/__init__.py:19-132: 11x11 gaussian window, per-channel
grouped conv, optional per-pixel map) and its PSNR/SSIM eval harness
(core/utils/evaluation_helpers.py:257-385: full-image, foreground-masked and
valid-bbox variants). Convolutions are `lax.conv_general_dilated` with
feature_group_count = channels — the depthwise form XLA maps onto the MXU.
"""

from __future__ import annotations

from typing import Dict, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np


def psnr(pred: jax.Array, target: jax.Array, mask: Optional[jax.Array] = None) -> jax.Array:
    """PSNR over the (optionally masked) pixels; inputs in [0, 1]."""
    se = (pred - target) ** 2
    if mask is not None:
        m = jnp.broadcast_to(mask[..., None] if mask.ndim == se.ndim - 1 else mask, se.shape)
        mse = jnp.sum(se * m) / jnp.maximum(jnp.sum(m), 1.0)
    else:
        mse = jnp.mean(se)
    return -10.0 * jnp.log10(jnp.maximum(mse, 1e-10))


def _gaussian_window(size: int, sigma: float) -> np.ndarray:
    x = np.arange(size, dtype=np.float64) - size // 2
    g = np.exp(-(x**2) / (2 * sigma**2))
    g = g / g.sum()
    return np.outer(g, g).astype(np.float32)


def _depthwise_conv(img: jax.Array, window: jax.Array) -> jax.Array:
    """(B, H, W, C) depthwise 2-D convolution, VALID padding."""
    C = img.shape[-1]
    k = jnp.broadcast_to(window[:, :, None, None], (*window.shape, 1, C))
    return jax.lax.conv_general_dilated(
        img, k,
        window_strides=(1, 1), padding="VALID",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        feature_group_count=C,
    )


def ssim(
    pred: jax.Array,
    target: jax.Array,
    window_size: int = 11,
    sigma: float = 1.5,
    val_range: float = 1.0,
    size_average: bool = True,
    full_map: bool = False,
):
    """Gaussian-window SSIM (reference pytorch_msssim/__init__.py:19-70).

    pred/target: (H, W, C) or (B, H, W, C) in [0, val_range].
    full_map=True returns the per-pixel SSIM map (size_average=False analog).
    """
    squeeze = pred.ndim == 3
    if squeeze:
        pred, target = pred[None], target[None]
    # clamp the window to the image (reference __init__.py:38: real_size =
    # min(window_size, height, width)) — small MS-SSIM scales would
    # otherwise produce an empty VALID conv (NaN mean)
    window_size = min(window_size, pred.shape[1], pred.shape[2])
    w = jnp.asarray(_gaussian_window(window_size, sigma))

    mu1 = _depthwise_conv(pred, w)
    mu2 = _depthwise_conv(target, w)
    mu1_sq, mu2_sq, mu12 = mu1 * mu1, mu2 * mu2, mu1 * mu2
    s1 = _depthwise_conv(pred * pred, w) - mu1_sq
    s2 = _depthwise_conv(target * target, w) - mu2_sq
    s12 = _depthwise_conv(pred * target, w) - mu12

    c1 = (0.01 * val_range) ** 2
    c2 = (0.03 * val_range) ** 2
    cs_map = (2 * s12 + c2) / (s1 + s2 + c2)
    ssim_map = ((2 * mu12 + c1) / (mu1_sq + mu2_sq + c1)) * cs_map

    if full_map:
        out = ssim_map[0] if squeeze else ssim_map
        return out
    if size_average:
        return jnp.mean(ssim_map), jnp.mean(cs_map)
    return (
        jnp.mean(ssim_map, axis=(1, 2, 3)),
        jnp.mean(cs_map, axis=(1, 2, 3)),
    )


def ms_ssim(
    pred: jax.Array,
    target: jax.Array,
    weights: Sequence[float] = (0.0448, 0.2856, 0.3001, 0.2363, 0.1333),
    window_size: int = 11,
    val_range: float = 1.0,
) -> jax.Array:
    """Multi-scale SSIM (reference pytorch_msssim/__init__.py:73-108):
    product of per-scale contrast terms with 2x average-pool downsampling."""
    if pred.ndim == 3:
        pred, target = pred[None], target[None]
    mssim, mcs = [], []
    for _ in weights:
        s, cs = ssim(pred, target, window_size=window_size, val_range=val_range)
        mssim.append(jnp.clip(s, 0.0, 1.0))
        mcs.append(jnp.clip(cs, 0.0, 1.0))
        pred = jax.lax.reduce_window(
            pred, 0.0, jax.lax.add, (1, 2, 2, 1), (1, 2, 2, 1), "VALID"
        ) / 4.0
        target = jax.lax.reduce_window(
            target, 0.0, jax.lax.add, (1, 2, 2, 1), (1, 2, 2, 1), "VALID"
        ) / 4.0
    w = jnp.asarray(weights)
    mcs_s = jnp.stack(mcs)
    return jnp.prod(mcs_s[:-1] ** w[:-1]) * mssim[-1] ** w[-1]


def evaluate_metric(
    rgbs: np.ndarray,
    gts: np.ndarray,
    fgs: Optional[np.ndarray] = None,
    bboxes: Optional[np.ndarray] = None,
) -> Dict[str, np.ndarray]:
    """Per-image PSNR/SSIM in the reference's three variants
    (evaluation_helpers.py:257-385): full image, valid-bbox crop, fg-masked.

    rgbs/gts: (N, H, W, 3) float in [0,1]; fgs: (N, H, W[,1]);
    bboxes: (N, 4) [x0, y0, x1, y1].
    """
    n = rgbs.shape[0]
    out: Dict[str, list] = {"psnr": [], "ssim": []}
    if bboxes is not None:
        out["psnr_box"], out["ssim_box"] = [], []
    if fgs is not None:
        out["psnr_fg"] = []
    ssim_j = jax.jit(lambda a, b: ssim(a, b)[0])
    psnr_j = jax.jit(psnr)
    for i in range(n):
        p, g = jnp.asarray(rgbs[i]), jnp.asarray(gts[i])
        out["psnr"].append(float(psnr_j(p, g)))
        out["ssim"].append(float(ssim_j(p, g)))
        if bboxes is not None:
            x0, y0, x1, y1 = [int(v) for v in bboxes[i]]
            pc, gc = p[y0:y1, x0:x1], g[y0:y1, x0:x1]
            if pc.shape[0] >= 11 and pc.shape[1] >= 11:
                out["psnr_box"].append(float(psnr(pc, gc)))
                out["ssim_box"].append(float(ssim(pc, gc)[0]))
        if fgs is not None:
            m = jnp.asarray(fgs[i]).reshape(p.shape[0], p.shape[1])
            out["psnr_fg"].append(float(psnr_j(p, g, m)))
    return {k: np.asarray(v) for k, v in out.items()}
