"""Offline person-mask extraction.

Capability parity with reference core/process_mask.py (TensorFlow DeepLab-v3
person segmentation for H36M/PerfCap preprocessing). TensorFlow isn't in
this image, so extraction runs in preference order:

  1. a user-supplied segmentation callable (e.g. a TF/torch model),
  2. background differencing against per-camera plates — H36M/surveillance
     -style footage has static backgrounds, which is exactly the reference's
     use case — with morphological cleanup,
  3. (no silent fallback: callers get a clear error if neither is possible).
"""

from __future__ import annotations

from typing import Callable, Optional

import numpy as np


def masks_from_background(
    imgs: np.ndarray,
    bkgd: np.ndarray,
    threshold: float = 25.0,
    open_kernel: int = 3,
    close_kernel: int = 7,
    min_area: int = 64,
) -> np.ndarray:
    """Foreground via |img - background| with morphological cleanup.

    imgs: (N, H, W, 3) uint8; bkgd: (H, W, 3) or (N, H, W, 3) uint8.
    Returns (N, H, W, 1) uint8.
    """
    import cv2

    imgs = np.asarray(imgs)
    bkgd = np.asarray(bkgd)
    if bkgd.ndim == 3:
        bkgd = bkgd[None]
    out = np.zeros((*imgs.shape[:3], 1), np.uint8)
    open_k = np.ones((open_kernel, open_kernel), np.uint8)
    close_k = np.ones((close_kernel, close_kernel), np.uint8)
    for i in range(imgs.shape[0]):
        diff = np.abs(
            imgs[i].astype(np.int16) - bkgd[min(i, len(bkgd) - 1)].astype(np.int16)
        ).max(-1)
        m = (diff > threshold).astype(np.uint8)
        m = cv2.morphologyEx(m, cv2.MORPH_OPEN, open_k)
        m = cv2.morphologyEx(m, cv2.MORPH_CLOSE, close_k)
        # keep only sizeable components
        n_lab, labels, stats, _ = cv2.connectedComponentsWithStats(m)
        keep = np.zeros_like(m)
        for lab in range(1, n_lab):
            if stats[lab, cv2.CC_STAT_AREA] >= min_area:
                keep[labels == lab] = 1
        out[i, ..., 0] = keep
    return out


def deeplab_segmenter(
    weights_path: Optional[str] = None,
    person_class: int = 15,
) -> Callable[[np.ndarray], np.ndarray]:
    """Bundled person segmenter: the JAX-native DeepLab-v3
    (data/segmenter.py — the analog of the reference's TF DeepLab,
    core/process_mask.py), loading torchvision deeplabv3_resnet50 weights
    from a local .pth."""
    from posegen_tpu.data.segmenter import deeplab_person_segmenter

    return deeplab_person_segmenter(weights_path, person_class=person_class)


def extract_person_masks(
    imgs: np.ndarray,
    bkgd: Optional[np.ndarray] = None,
    segmenter: Optional[Callable[[np.ndarray], np.ndarray]] = None,
    **kwargs,
) -> np.ndarray:
    """Dispatch: segmenter model > background differencing."""
    if segmenter is not None:
        masks = np.stack([np.asarray(segmenter(img)) for img in imgs])
        if masks.ndim == 3:
            masks = masks[..., None]
        return (masks > 0).astype(np.uint8)
    if bkgd is not None:
        return masks_from_background(imgs, bkgd, **kwargs)
    raise ValueError(
        "mask extraction needs either a `segmenter` callable (the reference "
        "uses TF DeepLab, core/process_mask.py) or background plates for "
        "differencing"
    )
