"""H5 dataset writer — the on-disk schema every loader produces.

Capability parity with the reference's `write_to_h5py`
(core/process_spin.py:234-296): images chunked per-image so a random-pixel
sampler touches exactly one chunk per image, pose/camera tables stored whole.

Schema (N images, J joints, C cameras):
  imgs            (N, H, W, 3) uint8        gzip-free, per-image chunks
  masks           (N, H, W, 1) uint8        foreground
  sampling_masks  (N, H, W, 1) uint8        dilated fg (pixel sampler domain)
  kp3d            (N_kp, J, 3) f32          posed joints (world)
  bones           (N_kp, J, 3) f32          axis-angle
  skts            (N_kp, J, 4, 4) f32       world-to-local
  cyls            (N_kp, 5) f32             bounding cylinders
  rest_pose       (J, 3) f32
  c2ws            (N, 4, 4) f32             NeRF-convention camera-to-world
  focals          (N,) or (N, 2) f32
  centers         (N, 2) f32 (optional)     principal points
  bkgds           (C, H, W, 3) uint8        per-camera background plates
  bkgd_idxs       (N,) i64                  image -> background
  kp_idxs         (N,) i64                  image -> pose row
  cam_idxs        (N,) i64                  image -> camera/framecode row
  img_shape       (3,) i64                  [H, W, 3]
  ext_scale       () f32
"""

from __future__ import annotations

from typing import Dict

import h5py
import numpy as np

_PER_IMAGE_KEYS = ("imgs", "masks", "sampling_masks", "bkgds")


def write_pose_h5(path: str, data: Dict[str, np.ndarray]) -> str:
    """Write the dataset dict to H5 with per-image chunking.

    Also precomputes per-image sampling-mask valid-pixel index lists
    (`sampling_idxs` int32 ragged concat + `sampling_idx_offsets`): they are
    static, and storing them lets the loader's native batch assembler skip
    the per-batch mask scans entirely (the cost the reference re-pays every
    epoch in sample_pixels, core/dataset.py:277-322)."""
    img_shape = np.asarray(data["imgs"].shape[1:], dtype=np.int64)
    with h5py.File(path, "w") as f:
        f.create_dataset("img_shape", data=img_shape)
        for k, v in data.items():
            if k == "img_shape":
                continue
            v = np.asarray(v)
            if k in _PER_IMAGE_KEYS and v.ndim >= 3:
                f.create_dataset(k, data=v, chunks=(1, *v.shape[1:]))
            else:
                f.create_dataset(k, data=v)
        if "sampling_masks" in data and "sampling_idxs" not in data:
            sm = np.asarray(data["sampling_masks"])
            flat = sm.reshape(sm.shape[0], -1)
            lists = [np.flatnonzero(r > 0).astype(np.int32) for r in flat]
            offsets = np.zeros(len(lists) + 1, np.int64)
            np.cumsum([len(l) for l in lists], out=offsets[1:])
            f.create_dataset(
                "sampling_idxs",
                data=np.concatenate(lists) if offsets[-1] else np.empty(0, np.int32),
            )
            f.create_dataset("sampling_idx_offsets", data=offsets)
    return path


def dilate_masks(masks: np.ndarray, kernel: int = 5, iters: int = 2) -> np.ndarray:
    """Grow fg masks so the sampler sees boundary pixels
    (reference process_spin.py uses cv2.dilate on sampling masks)."""
    import scipy.ndimage as ndi

    out = np.empty_like(masks)
    structure = np.ones((kernel, kernel), dtype=bool)
    for i in range(masks.shape[0]):
        m = masks[i, ..., 0] > 0
        out[i, ..., 0] = ndi.binary_dilation(m, structure, iterations=iters)
    return out.astype(masks.dtype)
