"""Visualization + software rasterizer + mesh CLI tests."""

import os

import numpy as np
import pytest

from posegen_tpu.render.mesh import marching_tetrahedra, save_ply
from posegen_tpu.render.rasterizer import rasterize_mesh, turntable_render
from posegen_tpu.utils.visualization import (
    create_kp_mask,
    draw_skeleton2d,
    draw_skeletons_3d,
)


def _sphere_mesh(r=0.5, n=20):
    t = np.linspace(-1, 1, n)
    x, y, z = np.meshgrid(t, t, t, indexing="ij")
    field = r**2 - (x**2 + y**2 + z**2)
    return marching_tetrahedra(field, origin=(-1, -1, -1), spacing=2 / (n - 1))


def test_rasterize_sphere_silhouette():
    verts, faces = _sphere_mesh()
    from posegen_tpu.data.synthetic import _look_at_c2w

    c2w = _look_at_c2w(np.array([0, 0, 2.0], np.float32), np.zeros(3, np.float32))
    img = rasterize_mesh(verts, faces, c2w, 64, 64, 60.0)
    assert img.shape == (64, 64, 3)
    fg = np.any(img != 1.0, axis=-1)
    # sphere of radius .5 at dist 2 with f=60: screen radius ~ 15px
    assert 400 < fg.sum() < 1200, fg.sum()
    # silhouette is centered
    ys, xs = np.nonzero(fg)
    assert abs(ys.mean() - 32) < 4 and abs(xs.mean() - 32) < 4


def test_turntable_render():
    verts, faces = _sphere_mesh(n=14)
    frames = turntable_render(verts, faces, n_views=4, H=48, W=48)
    assert frames.shape == (4, 48, 48, 3)
    for f in frames:
        assert np.any(f != 1.0)


def test_render_mesh_cli(tmp_path):
    verts, faces = _sphere_mesh(n=12)
    ply = str(tmp_path / "m.ply")
    save_ply(ply, verts, faces)
    from posegen_tpu.cli.render_mesh import load_ply, main

    v2, f2 = load_ply(ply)
    np.testing.assert_allclose(v2, verts, atol=1e-5)
    np.testing.assert_array_equal(f2, faces)
    out = main(["--ply", ply, "--outputdir", str(tmp_path / "out"),
                "--n_views", "3", "--res", "32"])
    assert os.path.exists(os.path.join(out, "00002.png"))


def test_skeleton_drawing(rng):
    img = np.zeros((64, 64, 3), np.uint8)
    kp2d = rng.uniform(5, 59, (24, 2)).astype(np.float32)
    out = draw_skeleton2d(img, kp2d)
    assert out.sum() > 0
    mask = create_kp_mask(64, 64, kp2d)
    assert mask.shape == (64, 64, 1) and mask.sum() > 50


def test_draw_skeletons_3d(rng):
    from posegen_tpu.utils.fixtures import make_pose_ctx
    from posegen_tpu.data.synthetic import _look_at_c2w

    ctx = make_pose_ctx()
    kps = np.asarray(ctx.kps)
    c2w = _look_at_c2w(np.array([0, 0.3, 2.5], np.float32), kps[0, 0])
    imgs = np.zeros((1, 64, 64, 3), np.uint8)
    out = draw_skeletons_3d(imgs, kps, c2w[None], 64, 64, 60.0)
    assert out.shape == (1, 64, 64, 3)
    assert out.sum() > 0


def test_overlay_mesh(rng):
    from posegen_tpu.render.rasterizer import overlay_mesh
    from posegen_tpu.data.synthetic import _look_at_c2w

    verts, faces = _sphere_mesh(n=14)
    img = rng.uniform(0, 0.3, (64, 64, 3)).astype(np.float32)
    c2w = _look_at_c2w(np.array([0, 0, 2.0], np.float32), np.zeros(3, np.float32))
    out = overlay_mesh(img, verts, faces, c2w, 60.0)
    assert out.shape == img.shape
    diff = np.abs(out - img).sum(-1)
    assert (diff > 0.1).sum() > 200  # mesh visibly composited
    assert (diff < 1e-6).sum() > 1000  # background untouched
