"""Mesh turntable CLI: `python -m posegen_tpu.cli.render_mesh --ply mesh.ply`.

Capability parity with reference render_mesh.py (:1-184): load a marched
mesh, orbit a camera around it, write numbered pngs (+ mp4 when imageio's
ffmpeg is available). Uses the software rasterizer instead of EGL/OpenGL.
"""

from __future__ import annotations

import argparse
import os
from typing import Optional, Sequence, Tuple

import numpy as np


def load_ply(path: str) -> Tuple[np.ndarray, np.ndarray]:
    """Read an ASCII .ply written by render/mesh.py:save_ply."""
    verts, faces = [], []
    with open(path) as f:
        n_v = n_f = 0
        for line in f:
            line = line.strip()
            if line.startswith("element vertex"):
                n_v = int(line.split()[-1])
            elif line.startswith("element face"):
                n_f = int(line.split()[-1])
            elif line == "end_header":
                break
        for _ in range(n_v):
            verts.append([float(v) for v in next(f).split()[:3]])
        for _ in range(n_f):
            parts = next(f).split()
            faces.append([int(v) for v in parts[1:4]])
    return np.asarray(verts, np.float32), np.asarray(faces, np.int64)


def main(argv: Optional[Sequence[str]] = None) -> str:
    p = argparse.ArgumentParser("posegen_tpu.render_mesh")
    p.add_argument("--ply", type=str, required=True)
    p.add_argument("--outputdir", type=str, default="mesh_render")
    p.add_argument("--n_views", type=int, default=12)
    p.add_argument("--res", type=int, default=256)
    p.add_argument("--fps", type=int, default=12)
    args = p.parse_args(argv)

    from posegen_tpu.render.rasterizer import turntable_render

    verts, faces = load_ply(args.ply)
    frames = turntable_render(
        verts, faces, n_views=args.n_views, H=args.res, W=args.res
    )

    import imageio.v2 as imageio

    os.makedirs(args.outputdir, exist_ok=True)
    for i, fr in enumerate(frames):
        imageio.imwrite(
            os.path.join(args.outputdir, f"{i:05d}.png"),
            (np.clip(fr, 0, 1) * 255).astype(np.uint8),
        )
    try:
        imageio.mimwrite(
            os.path.join(args.outputdir, "turntable.mp4"),
            [(np.clip(f, 0, 1) * 255).astype(np.uint8) for f in frames],
            fps=args.fps,
        )
    except Exception:
        pass  # ffmpeg not present: pngs only
    print(f"wrote {len(frames)} views to {args.outputdir}")
    return args.outputdir


if __name__ == "__main__":
    main()
