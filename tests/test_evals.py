"""Metric tests: PSNR/SSIM/MS-SSIM and pose errors."""

import jax.numpy as jnp
import numpy as np
import pytest

from posegen_tpu.evals.image import evaluate_metric, ms_ssim, psnr, ssim
from posegen_tpu.evals.pose import (
    auc,
    mpjpe,
    pa_mpjpe,
    pck,
    per_joint_error,
    similarity_transform,
)


def test_psnr_basics(rng):
    img = rng.uniform(0, 1, (32, 32, 3)).astype(np.float32)
    assert float(psnr(jnp.asarray(img), jnp.asarray(img))) >= 100.0 - 1e-3
    noisy = np.clip(img + 0.1, 0, 1).astype(np.float32)
    p = float(psnr(jnp.asarray(noisy), jnp.asarray(img)))
    assert 15.0 < p < 25.0  # 0.1 offset -> ~20dB


def test_psnr_masked(rng):
    img = rng.uniform(0, 1, (16, 16, 3)).astype(np.float32)
    bad = img.copy()
    bad[:8] = 0.0  # corrupt the top half
    mask = np.zeros((16, 16), np.float32)
    mask[8:] = 1.0  # evaluate only the clean half
    p = float(psnr(jnp.asarray(bad), jnp.asarray(img), jnp.asarray(mask)))
    assert p >= 100.0 - 1e-3


def test_ssim_identity_and_noise(rng):
    img = rng.uniform(0, 1, (48, 48, 3)).astype(np.float32)
    s_same, _ = ssim(jnp.asarray(img), jnp.asarray(img))
    assert float(s_same) > 0.999
    noisy = np.clip(img + rng.normal(0, 0.2, img.shape), 0, 1).astype(np.float32)
    s_noisy, _ = ssim(jnp.asarray(noisy), jnp.asarray(img))
    assert float(s_noisy) < 0.9


def test_ssim_map_shape(rng):
    img = rng.uniform(0, 1, (32, 32, 3)).astype(np.float32)
    m = ssim(jnp.asarray(img), jnp.asarray(img), full_map=True)
    assert m.shape == (22, 22, 3)  # valid conv: 32 - 11 + 1


def test_ms_ssim(rng):
    img = rng.uniform(0, 1, (192, 192, 3)).astype(np.float32)
    v = float(ms_ssim(jnp.asarray(img), jnp.asarray(img)))
    assert v > 0.99


def test_evaluate_metric_variants(rng):
    gts = rng.uniform(0, 1, (2, 64, 64, 3)).astype(np.float32)
    preds = np.clip(gts + rng.normal(0, 0.05, gts.shape), 0, 1).astype(np.float32)
    fgs = (rng.uniform(size=(2, 64, 64)) > 0.5).astype(np.float32)
    bboxes = np.array([[8, 8, 56, 56], [4, 4, 40, 60]])
    out = evaluate_metric(preds, gts, fgs=fgs, bboxes=bboxes)
    for k in ("psnr", "ssim", "psnr_box", "ssim_box", "psnr_fg"):
        assert k in out and np.isfinite(out[k]).all(), k


def test_similarity_transform_recovers_pose(rng):
    gt = rng.standard_normal((24, 3)).astype(np.float32)
    # random rigid + scale corruption
    theta = 0.7
    R = np.array(
        [
            [np.cos(theta), -np.sin(theta), 0],
            [np.sin(theta), np.cos(theta), 0],
            [0, 0, 1],
        ],
        np.float32,
    )
    pred = 2.5 * gt @ R.T + np.array([1.0, -2.0, 0.5], np.float32)
    aligned, scale, _, _ = similarity_transform(jnp.asarray(pred), jnp.asarray(gt))
    assert np.allclose(np.asarray(aligned), gt, atol=1e-4)
    # mpjpe is large before alignment, ~0 after
    assert float(mpjpe(jnp.asarray(pred), jnp.asarray(gt))) > 0.5
    assert float(pa_mpjpe(jnp.asarray(pred)[None], jnp.asarray(gt)[None])) < 1e-4


def test_pck_auc(rng):
    # reference convention: strict '<', raw fraction
    # (evaluation_helpers.py:592-603)
    errs = jnp.asarray([0.0, 0.1, 0.2, 0.3])  # meters
    assert float(pck(errs, 0.15)) == 0.5
    assert float(pck(jnp.asarray([0.15]), 0.15)) == 0.0  # boundary excluded
    a = float(auc(errs, 0.15))
    assert 0.0 < a < 1.0


def test_per_joint_error_root_align(rng):
    gt = rng.standard_normal((2, 24, 3)).astype(np.float32)
    pred = gt + 0.05
    errs = per_joint_error(jnp.asarray(pred), jnp.asarray(gt))
    assert np.allclose(np.asarray(errs), 0.05 * np.sqrt(3), atol=1e-5)


def test_ssim_matches_vendored_pytorch_msssim():
    """Golden parity vs the reference's ACTUAL vendored pytorch-msssim
    (pytorch_msssim/__init__.py:19-108), not just formula agreement."""
    import sys

    sys.path.insert(0, "tests")
    import reference_shims

    reference_shims.install()
    import torch
    from pytorch_msssim import msssim as ref_msssim
    from pytorch_msssim import ssim as ref_ssim

    from posegen_tpu.evals.image import ms_ssim, ssim

    rng = np.random.default_rng(0)
    a = rng.uniform(0, 1, (64, 64, 3)).astype(np.float32)
    b = np.clip(a + rng.normal(0, 0.08, a.shape).astype(np.float32), 0, 1)

    ta = torch.from_numpy(a.transpose(2, 0, 1))[None]
    tb = torch.from_numpy(b.transpose(2, 0, 1))[None]

    ours, _ = ssim(jnp.asarray(a), jnp.asarray(b))
    theirs = float(ref_ssim(ta, tb, val_range=1.0))
    np.testing.assert_allclose(float(ours), theirs, atol=2e-4)

    # identical images -> 1 on both sides
    ours1, _ = ssim(jnp.asarray(a), jnp.asarray(a))
    np.testing.assert_allclose(float(ours1), float(ref_ssim(ta, ta, val_range=1.0)), atol=1e-5)

    ours_ms = ms_ssim(jnp.asarray(a), jnp.asarray(b))
    theirs_ms = float(ref_msssim(ta, tb, val_range=1.0, normalize="relu"))
    np.testing.assert_allclose(float(ours_ms), theirs_ms, atol=5e-3)


def test_procrustes_matches_reference():
    """Golden parity of procrustes_align vs the reference's MATLAB-port
    procrustes (evaluation_helpers.py:387-467): identical aligned points."""
    import sys

    sys.path.insert(0, "tests")
    import reference_shims

    reference_shims.install()
    from core.utils.evaluation_helpers import procrustes as ref_procrustes

    from posegen_tpu.evals.pose import procrustes_align

    rng = np.random.default_rng(1)
    for trial in range(3):
        gt = rng.standard_normal((14, 3)).astype(np.float64)
        # pred = rotated+scaled+shifted gt + noise
        theta = rng.uniform(0, np.pi)
        R = np.array([[np.cos(theta), -np.sin(theta), 0],
                      [np.sin(theta), np.cos(theta), 0], [0, 0, 1.0]])
        pred = 0.7 * gt @ R.T + rng.standard_normal(3) * 0.5
        pred += rng.normal(0, 0.02, pred.shape)

        _, z_ref, _ = ref_procrustes(gt, pred)
        z_ours = np.asarray(
            procrustes_align(jnp.asarray(pred[None]), jnp.asarray(gt[None]))
        )[0]
        np.testing.assert_allclose(z_ours, z_ref, atol=1e-4, err_msg=f"trial {trial}")
