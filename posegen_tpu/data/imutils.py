"""Image crop / transform utilities (host-side numpy + cv2).

Capability parity with the reference's imutils (core/utils/imutils.py:12-168
and its near-duplicate core/imutils.py): scale/rotate crop transforms used
by the SPIN eval pipeline, plus left/right flips for images, keypoints and
SMPL pose vectors.
"""

from __future__ import annotations

from typing import Optional, Tuple

import numpy as np

# SMPL left/right joint swap (reference constants: SMPL_POSE_FLIP_PERM base)
SMPL_JOINT_FLIP_PERM = [
    0, 2, 1, 3, 5, 4, 6, 8, 7, 9, 11, 10, 12, 14, 13, 15, 17, 16, 19, 18,
    21, 20, 23, 22,
]

IMG_NORM_MEAN = np.array([0.485, 0.456, 0.406], np.float32)
IMG_NORM_STD = np.array([0.229, 0.224, 0.225], np.float32)


def get_transform(center, scale, res, rot: float = 0.0) -> np.ndarray:
    """Affine map from original-image coords to the (res x res) crop
    (reference imutils.py:12-36)."""
    h = 200.0 * scale
    t = np.zeros((3, 3))
    t[0, 0] = res[1] / h
    t[1, 1] = res[0] / h
    t[0, 2] = res[1] * (-center[0] / h + 0.5)
    t[1, 2] = res[0] * (-center[1] / h + 0.5)
    t[2, 2] = 1.0
    if rot != 0:
        rad = -rot * np.pi / 180.0
        sn, cs = np.sin(rad), np.cos(rad)
        rot_mat = np.eye(3)
        rot_mat[0, :2] = [cs, -sn]
        rot_mat[1, :2] = [sn, cs]
        t_mat = np.eye(3)
        t_mat[0, 2] = -res[1] / 2
        t_mat[1, 2] = -res[0] / 2
        t_inv = t_mat.copy()
        t_inv[:2, 2] *= -1
        t = t_inv @ rot_mat @ t_mat @ t
    return t


def transform(pt, center, scale, res, invert: bool = False, rot: float = 0.0):
    """Map a 2-D point through the crop transform (reference :38-45).

    Truncation (`astype(int)`, not round-half-up) is the reference's exact
    corner arithmetic; SPIN's crop boxes are defined by it, so the eval
    pipeline must truncate identically (pinned by
    tests/test_misc_parity.py::test_imutils_*_golden against the executed
    reference module)."""
    t = get_transform(center, scale, res, rot)
    if invert:
        t = np.linalg.inv(t)
    pt_h = np.array([pt[0] - 1.0, pt[1] - 1.0, 1.0])
    out = t @ pt_h
    return out[:2].astype(int) + 1


def crop(
    img: np.ndarray,
    center,
    scale,
    res: Tuple[int, int],
    rot: float = 0.0,
    resize_fn=None,
) -> np.ndarray:
    """Crop + resize around (center, scale) (reference :47-95).

    Corner / pad / canvas-placement arithmetic is kept verbatim-equivalent
    to the reference (golden-pinned against the executed module):
    - the bottom-right corner maps ``[res[0]+1, res[1]+1]`` in the
      reference's own (row, col) argument order — axes swap for non-square
      crops, but that IS the executed behavior;
    - the rotation pad uses the box HEIGHT (``br[1]-ul[1]``), reference :58;
    - the paste canvas is a float64 zeros array (reference :62), so the
      output is float in the input's value range.

    resize_fn(img, (rows, cols)) overrides the final resample. The default
    is cv2 INTER_LINEAR: the reference's `skimage.transform.resize`
    (bilinear + gaussian anti-alias prefilter) is not installed in this
    environment, so resampling is the one documented numeric deviation —
    the parity test injects a shared resize_fn on both sides to pin
    everything else exactly.
    """
    ul = np.array(transform([1, 1], center, scale, res, invert=True)) - 1
    br = np.array(
        transform([res[0] + 1, res[1] + 1], center, scale, res, invert=True)
    ) - 1
    # reference :58 computes the rotation pad from the box height
    pad = int(np.linalg.norm(br - ul) / 2 - float(br[1] - ul[1]) / 2)
    if rot != 0:
        ul -= pad
        br += pad

    new_shape = [br[1] - ul[1], br[0] - ul[0]]
    if img.ndim > 2:
        new_shape += [img.shape[2]]
    new_img = np.zeros(new_shape)  # float64 canvas, reference :62

    new_x = max(0, -ul[0]), min(br[0], img.shape[1]) - ul[0]
    new_y = max(0, -ul[1]), min(br[1], img.shape[0]) - ul[1]
    old_x = max(0, ul[0]), min(img.shape[1], br[0])
    old_y = max(0, ul[1]), min(img.shape[0], br[1])
    if new_x[1] <= new_x[0] or new_y[1] <= new_y[0]:
        # fully-outside box: the canvas stays zeros either way; returning
        # early protects the resize from a zero-area input (the reference
        # would crash in skimage here)
        return np.zeros((res[0], res[1], *new_shape[2:]))
    new_img[new_y[0] : new_y[1], new_x[0] : new_x[1]] = img[
        old_y[0] : old_y[1], old_x[0] : old_x[1]
    ]

    if rot != 0:
        # reference :88-90: scipy rotate with its default reshape=True,
        # then strip the pad
        import scipy.ndimage

        new_img = scipy.ndimage.rotate(new_img, rot)
        new_img = new_img[pad:-pad, pad:-pad]

    if resize_fn is not None:
        return resize_fn(new_img, (res[0], res[1]))
    import cv2

    return cv2.resize(new_img, (res[1], res[0]), interpolation=cv2.INTER_LINEAR)


def normalize_for_spin(img: np.ndarray) -> np.ndarray:
    """uint8/float [0,255] HWC -> ImageNet-normalized float32 HWC."""
    x = img.astype(np.float32)
    if x.max() > 1.5:
        x = x / 255.0
    return (x - IMG_NORM_MEAN) / IMG_NORM_STD


def flip_img(img: np.ndarray) -> np.ndarray:
    return img[:, ::-1].copy()


def flip_kp(kp: np.ndarray, perm=SMPL_JOINT_FLIP_PERM, width: Optional[float] = None):
    """Flip keypoints left/right (reference :144-152)."""
    kp = kp[..., perm, :].copy()
    if width is not None:
        kp[..., 0] = width - kp[..., 0]
    else:
        kp[..., 0] = -kp[..., 0]
    return kp


def flip_pose(pose: np.ndarray) -> np.ndarray:
    """Flip a (72,) SMPL axis-angle vector left/right (reference :154-168)."""
    flipped = pose.reshape(-1, 24, 3)[:, SMPL_JOINT_FLIP_PERM].reshape(pose.shape)
    out = flipped.copy()
    out[..., 1::3] = -out[..., 1::3]
    out[..., 2::3] = -out[..., 2::3]
    return out


def rot_aa(aa: np.ndarray, rot: float) -> np.ndarray:
    """In-plane rotate the global orientation axis-angle (reference :124-135)."""
    rad = np.deg2rad(-rot)
    R = np.array(
        [
            [np.cos(rad), -np.sin(rad), 0],
            [np.sin(rad), np.cos(rad), 0],
            [0, 0, 1],
        ]
    )
    import cv2

    mat, _ = cv2.Rodrigues(np.asarray(aa, np.float64))
    resrot, _ = cv2.Rodrigues(R @ mat)
    return resrot.squeeze().astype(aa.dtype)
