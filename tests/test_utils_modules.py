"""Profiling + experiment tooling tests."""

import os

import jax
import jax.numpy as jnp
import numpy as np

from posegen_tpu.utils.experiment import (
    add_text_to_video,
    concat_video_grid,
    read_eval_result,
    read_tfevent,
)
from posegen_tpu.utils.profiling import PhaseTimer, annotate, device_memory_stats


def test_phase_timer():
    t = PhaseTimer()
    x = jnp.ones((64, 64))
    with t.phase("matmul", block_on=None):
        y = x @ x
    jax.block_until_ready(y)
    assert "matmul" in t.ema and t.ema["matmul"] > 0
    assert "matmul" in t.summary()


def test_annotate_and_memstats():
    with annotate("region"):
        jax.block_until_ready(jnp.ones(8) * 2)
    stats = device_memory_stats()
    assert isinstance(stats, dict)  # may be empty on some backends


def test_read_eval_result(tmp_path):
    p = tmp_path / "psnr.txt"
    p.write_text("100\t21.5\n200\t23.0\n")
    arr = read_eval_result(str(tmp_path), "psnr")
    np.testing.assert_allclose(arr, [[100, 21.5], [200, 23.0]])
    assert read_eval_result(str(tmp_path), "ssim").shape == (0, 2)


def test_read_tfevent_roundtrip(tmp_path):
    try:
        from torch.utils.tensorboard import SummaryWriter
    except Exception:
        import pytest

        pytest.skip("tensorboard unavailable")
    w = SummaryWriter(str(tmp_path))
    for i in range(3):
        w.add_scalar("Val/PSNR", 20.0 + i, i * 100)
    w.close()
    out = read_tfevent(str(tmp_path), ["Val/PSNR"])
    assert "Val/PSNR" in out
    np.testing.assert_allclose(out["Val/PSNR"][:, 1], [20.0, 21.0, 22.0])


def test_video_grid_and_text(rng):
    vids = [rng.uniform(0, 1, (3, 16, 16, 3)).astype(np.float32) for _ in range(3)]
    grid = concat_video_grid(vids, n_cols=2)
    assert grid.shape[0] == 3 and grid.shape[1] >= 32 and grid.shape[2] >= 32
    stamped = add_text_to_video(vids[0], "hello")
    assert stamped.dtype == np.uint8 and stamped.shape == (3, 16, 16, 3)


def test_best_value_and_video_lookup(tmp_path, rng):
    """Best-run selection + per-step video retrieval (reference
    get_best_values_n_steps / retrieve_best_vid_files,
    evaluation_helpers.py:109-138)."""
    from posegen_tpu.utils.experiment import best_value_and_step, find_step_videos

    track = np.array([[1000, 20.0], [2000, 25.5], [3000, 24.0]])
    v, s = best_value_and_step(track)
    assert (v, s) == (25.5, 2000)
    v, s = best_value_and_step(track, maximum=False)
    assert (v, s) == (20.0, 1000)
    assert best_value_and_step(np.zeros((0, 2)))[1] == -1

    d = tmp_path / "run"
    d.mkdir()
    (d / "spiral_002000_rgb.gif").write_bytes(b"x")
    (d / "text_spiral_002000_rgb.gif").write_bytes(b"x")  # ignored
    names = find_step_videos([str(d)], [2000])
    assert names == [str(d / "spiral_002000_rgb.gif")]
    import pytest as _pytest

    with _pytest.raises(FileNotFoundError):
        find_step_videos([str(d)], [9000])
