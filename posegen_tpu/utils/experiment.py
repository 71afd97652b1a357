"""Experiment readback + video tooling.

Capability parity with the reference's post-hoc analysis helpers
(core/utils/evaluation_helpers.py:28-219): read back TensorBoard event
files and psnr/ssim txt logs for run comparison, concatenate render videos
into grids, stamp text labels onto frames.
"""

from __future__ import annotations

import os
from glob import glob
from typing import Dict, Optional, Sequence

import numpy as np


def read_tfevent(log_dir: str, tags: Optional[Sequence[str]] = None) -> Dict[str, np.ndarray]:
    """Scalars from the newest tfevents file -> {tag: (N, 2) [step, value]}
    (reference evaluation_helpers.py:28-67)."""
    from tensorboard.backend.event_processing.event_accumulator import (
        EventAccumulator,
    )

    files = sorted(glob(os.path.join(log_dir, "events.out.tfevents.*")))
    if not files:
        return {}
    acc = EventAccumulator(files[-1])
    acc.Reload()
    out = {}
    for tag in tags or acc.Tags().get("scalars", []):
        try:
            events = acc.Scalars(tag)
        except KeyError:
            continue
        out[tag] = np.array([[e.step, e.value] for e in events], np.float64)
    return out


def read_eval_result(log_dir: str, metric: str = "psnr") -> np.ndarray:
    """Parse the tab-separated psnr/ssim txt appends -> (N, 2) [step, value]
    (reference evaluation_helpers.py:69-110; write side cli/run_nerf.py)."""
    path = os.path.join(log_dir, f"{metric}.txt")
    rows = []
    if not os.path.exists(path):
        return np.zeros((0, 2))
    with open(path) as f:
        for line in f:
            parts = line.split()
            if len(parts) == 1:
                rows.append([len(rows), float(parts[0])])
            elif len(parts) >= 2:
                rows.append([float(parts[0]), float(parts[1])])
    return np.asarray(rows, np.float64)


def best_value_and_step(
    scalars: np.ndarray, maximum: bool = True
) -> tuple:
    """(best value, its step) from an (N, 2) [step, value] scalar track —
    the per-run core of reference get_best_values_n_steps
    (evaluation_helpers.py:109-119); feed it read_tfevent/read_eval_result
    output per run to compare experiments."""
    if scalars.shape[0] == 0:
        return float("nan"), -1
    idx = int(np.argmax(scalars[:, 1]) if maximum else np.argmin(scalars[:, 1]))
    return float(scalars[idx, 1]), int(scalars[idx, 0])


def find_step_videos(
    log_dirs: Sequence[str], steps: Sequence[int],
    keyword: str = "_{:06d}", postfix: str = "rgb.gif",
) -> list:
    """Per run, the video artifact written at a given step (reference
    retrieve_best_vid_files, evaluation_helpers.py:121-138 — mp4 there,
    gif here; pass postfix='rgb.mp4' for ffmpeg-equipped hosts). Missing
    or ambiguous matches raise instead of dropping into a debugger."""
    names = []
    for log_dir, step in zip(log_dirs, steps):
        pattern = os.path.join(log_dir, f"*{keyword.format(step)}*{postfix}")
        matches = [f for f in glob(pattern) if "text_" not in f]
        if len(matches) != 1:
            raise FileNotFoundError(
                f"{pattern}: expected exactly one video, found {matches}"
            )
        names.append(matches[0])
    return names


def concat_video_grid(
    videos: Sequence[np.ndarray], n_cols: int = 2, pad: int = 2
) -> np.ndarray:
    """Stack (T, H, W, 3) videos into a grid video
    (reference concat_vid, evaluation_helpers.py:140-190)."""
    T = min(v.shape[0] for v in videos)
    H = max(v.shape[1] for v in videos)
    W = max(v.shape[2] for v in videos)
    n_rows = (len(videos) + n_cols - 1) // n_cols
    grid = np.zeros(
        (T, n_rows * (H + pad), n_cols * (W + pad), 3), videos[0].dtype
    )
    for i, v in enumerate(videos):
        r, c = divmod(i, n_cols)
        grid[
            :, r * (H + pad) : r * (H + pad) + v.shape[1],
            c * (W + pad) : c * (W + pad) + v.shape[2],
        ] = v[:T]
    return grid


def add_text_to_video(frames: np.ndarray, text: str) -> np.ndarray:
    """Stamp a label on every frame (reference add_text_to_vid,
    evaluation_helpers.py:192-219)."""
    import cv2

    out = []
    for f in frames:
        img = np.ascontiguousarray(
            (np.clip(f, 0, 1) * 255).astype(np.uint8) if f.dtype != np.uint8 else f
        )
        cv2.putText(
            img, text, (8, 24), cv2.FONT_HERSHEY_SIMPLEX, 0.7, (255, 255, 255), 2
        )
        out.append(img)
    return np.stack(out)


def save_video(path: str, frames: np.ndarray, fps: int = 14) -> Optional[str]:
    """mp4 via imageio-ffmpeg; returns None when ffmpeg is unavailable."""
    import imageio.v2 as imageio

    u8 = (
        frames
        if frames.dtype == np.uint8
        else (np.clip(frames, 0, 1) * 255).astype(np.uint8)
    )
    try:
        imageio.mimwrite(path, list(u8), fps=fps)
        return path
    except Exception:
        return None
