"""Small parity items: progress bar, NDC rays, framecode idx_map, masks."""

import io

import jax.numpy as jnp
import numpy as np

from posegen_tpu.data.masks import extract_person_masks, masks_from_background
from posegen_tpu.models.nerf import framecode_lookup
from posegen_tpu.skeleton.cameras import get_rays_np, ndc_rays
from posegen_tpu.utils.progress import AverageMeter, Bar


def test_bar_and_meter():
    buf = io.StringIO()
    bar = Bar("Train", max=10, stream=buf)
    for _ in range(10):
        bar.suffix = f"ETA: {bar.eta_td}"
        bar.next()
    bar.finish()
    out = buf.getvalue()
    assert "10/10" in out and "Train" in out

    m = AverageMeter()
    m.update(2.0)
    m.update(4.0)
    assert m.avg == 3.0 and m.val == 4.0


def test_ndc_rays():
    H = W = 64
    c2w = np.eye(4, dtype=np.float32)
    ro, rd = get_rays_np(H, W, 50.0, c2w)
    o_ndc, d_ndc = ndc_rays(H, W, 50.0, 1.0, ro.reshape(-1, 3), rd.reshape(-1, 3))
    assert o_ndc.shape == (H * W, 3)
    # after shifting to the near plane, o2 = 1 + 2*near/oz with oz = -near -> -1
    np.testing.assert_allclose(o_ndc[:, 2], -1.0, atol=1e-5)


def test_framecode_idx_map():
    codes = jnp.asarray(np.arange(12, dtype=np.float32).reshape(4, 3))
    idx = jnp.asarray([[0], [1], [2]])
    idx_map = jnp.asarray([3, 3, 0, 0])  # views 0,1 share code 3; 2,3 share 0
    out = framecode_lookup(codes, idx, idx_map=idx_map)
    np.testing.assert_allclose(np.asarray(out[0]), np.asarray(codes[3]))
    np.testing.assert_allclose(np.asarray(out[1]), np.asarray(codes[3]))
    np.testing.assert_allclose(np.asarray(out[2]), np.asarray(codes[0]))
    # interpolated form with idx_map
    idx3 = jnp.asarray([[0, 2, 0.5]])
    out3 = framecode_lookup(codes, idx3, idx_map=idx_map)
    np.testing.assert_allclose(
        np.asarray(out3[0]), 0.5 * np.asarray(codes[3] + codes[0])
    )


def test_masks_from_background(rng):
    H = W = 48
    bkgd = rng.integers(0, 80, (H, W, 3), dtype=np.uint8)
    img = bkgd.copy()
    img[10:30, 15:35] = 255  # bright subject
    masks = masks_from_background(img[None], bkgd, threshold=40)
    assert masks.shape == (1, H, W, 1)
    assert masks[0, 20, 25, 0] == 1
    assert masks[0, 5, 5, 0] == 0
    # dispatch via extract_person_masks with a segmenter callable
    seg = lambda im: (im.sum(-1) > 600).astype(np.uint8)
    m2 = extract_person_masks(img[None], segmenter=seg)
    assert m2[0, 20, 25, 0] == 1
