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


def test_deeplab_segmenter_shape():
    """The bundled JAX DeepLab-v3 person segmenter (weightless test build)
    produces a binary (H, W) mask and wires into extract_person_masks."""
    import numpy as np

    from posegen_tpu.data.masks import deeplab_segmenter, extract_person_masks

    seg = deeplab_segmenter(weights_path=None)
    img = np.random.default_rng(0).integers(0, 255, (33, 41, 3), dtype=np.uint8)
    m = seg(img)
    assert m.shape == (33, 41) and m.dtype == np.uint8
    masks = extract_person_masks(img[None], segmenter=seg)
    assert masks.shape == (1, 33, 41, 1)
    assert set(np.unique(masks)).issubset({0, 1})


def test_deeplab_torch_import_roundtrip():
    """A synthesized torchvision-layout deeplabv3_resnet50 state_dict imports
    into our pytree with matching shapes and runs forward."""
    import jax
    import numpy as np

    from posegen_tpu.data.segmenter import (
        deeplab_logits, import_torch_deeplab, init_deeplab,
    )

    ref_p, ref_s = init_deeplab(jax.random.PRNGKey(0))
    rng = np.random.default_rng(1)

    sd = {}
    def put_conv(name, p, bias=False):
        k, _, ci, co = np.shape(p["w"])
        sd[f"{name}.weight"] = rng.standard_normal((co, ci, k, k)).astype(np.float32) * 0.05
        if bias:
            sd[f"{name}.bias"] = np.zeros(co, np.float32)
    def put_bn(name, dim):
        sd[f"{name}.weight"] = np.ones(dim, np.float32)
        sd[f"{name}.bias"] = np.zeros(dim, np.float32)
        sd[f"{name}.running_mean"] = np.zeros(dim, np.float32)
        sd[f"{name}.running_var"] = np.ones(dim, np.float32)

    put_conv("backbone.conv1", ref_p["conv1"]); put_bn("backbone.bn1", 64)
    from posegen_tpu.data.segmenter import RESNET50_LAYERS
    for li, blocks in enumerate(RESNET50_LAYERS):
        for b in range(blocks):
            base = f"backbone.layer{li + 1}.{b}"
            blk = ref_p[f"layer{li + 1}"][b]
            for ci in (1, 2, 3):
                put_conv(f"{base}.conv{ci}", blk[f"conv{ci}"])
                put_bn(f"{base}.bn{ci}", blk[f"bn{ci}"]["scale"].shape[0])
            if "downsample" in blk:
                put_conv(f"{base}.downsample.0", blk["downsample"])
                put_bn(f"{base}.downsample.1", blk["down_bn"]["scale"].shape[0])
    for i in range(4):
        put_conv(f"classifier.0.convs.{i}.0", ref_p["aspp"][f"conv{i}"])
        put_bn(f"classifier.0.convs.{i}.1", 256)
    put_conv("classifier.0.convs.4.1", ref_p["aspp"]["pool_conv"])
    put_bn("classifier.0.convs.4.2", 256)
    put_conv("classifier.0.project.0", ref_p["aspp"]["project"])
    put_bn("classifier.0.project.1", 256)
    put_conv("classifier.1", ref_p["head_conv"])
    put_bn("classifier.2", 256)
    put_conv("classifier.4", ref_p["classifier"], bias=True)

    params, state = import_torch_deeplab(sd)
    for (pa, a), (_, b) in zip(
        jax.tree_util.tree_flatten_with_path(params)[0],
        jax.tree_util.tree_flatten_with_path(ref_p)[0],
    ):
        assert np.shape(a) == np.shape(b), pa
    x = rng.standard_normal((1, 32, 32, 3)).astype(np.float32)
    out = deeplab_logits(params, state, x)
    assert out.shape == (1, 32, 32, 21)
    assert bool(np.isfinite(np.asarray(out)).all())


def test_acc2bce_matches_reference_off_reduction():
    """Our acc2bce must match the reference's LIVE reg path: core/trainer.py:378
    calls acc2bce(..., reduction='off'), which is a mean over BACKGROUND pixels
    only (trainer.py:44-52: bce_loss[y < 1.0].mean())."""
    import sys

    sys.path.insert(0, "tests")
    import reference_shims

    reference_shims.install()
    import torch
    from core.trainer import acc2bce as ref_acc2bce

    from posegen_tpu.train import losses as L

    rng = np.random.default_rng(3)
    acc = rng.uniform(0.0, 1.0, size=(257,)).astype(np.float32)
    fg = (rng.uniform(size=(257,)) < 0.4).astype(np.float32)
    # include saturated acc values the eps must handle
    acc[:4] = [0.0, 1.0, 1e-9, 1.0 - 1e-9]
    ref = ref_acc2bce(torch.tensor(acc), torch.tensor(fg), reduction="off")
    ours = L.acc2bce(jnp.asarray(acc), jnp.asarray(fg))
    np.testing.assert_allclose(float(ours), float(ref), rtol=1e-5)


def _ref_imutils():
    import sys

    sys.path.insert(0, "tests")
    import reference_shims

    reference_shims.install()
    import core.utils.imutils as ref_imutils

    return ref_imutils


def test_imutils_transform_golden():
    """Corner arithmetic vs the EXECUTED reference transform
    (core/utils/imutils.py:38-45): truncation, not round-half-up — points
    landing on x.5+ grid offsets are where the two differ by a pixel."""
    ref = _ref_imutils()
    from posegen_tpu.data.imutils import transform

    rng = np.random.default_rng(0)
    for _ in range(64):
        pt = rng.uniform(-30, 600, size=2)
        center = rng.uniform(50, 500, size=2)
        scale = float(rng.uniform(0.4, 3.0))
        res = (224, 224)
        rot = float(rng.choice([0.0, 0.0, 15.0, -30.0]))
        invert = bool(rng.choice([False, True]))
        ours = transform(pt, center, scale, res, invert=invert, rot=rot)
        theirs = ref.transform(pt, center, scale, res, invert=int(invert), rot=rot)
        np.testing.assert_array_equal(np.asarray(ours), np.asarray(theirs))


def test_imutils_crop_golden_square():
    """Full-pixel crop parity vs the executed reference (square res, rot=0),
    partial out-of-bounds boxes included. The shim routes the reference's
    skimage resize through the same cv2 bilinear our crop uses, so this
    pins every other piece: corners, pad, canvas dtype, placement."""
    ref = _ref_imutils()
    from posegen_tpu.data.imutils import crop

    rng = np.random.default_rng(1)
    img = (rng.uniform(0, 255, size=(480, 640, 3))).astype(np.uint8)
    for center, scale in [
        ((320.0, 240.0), 1.2),
        ((50.0, 60.0), 0.9),      # box spills past the top-left edge
        ((620.0, 470.0), 1.5),    # spills bottom-right
        ((320.5, 239.25), 0.77),  # fractional centers hit the truncation
    ]:
        ours = crop(img, center, scale, (224, 224))
        theirs = ref.crop(img, center, scale, [224, 224])
        assert ours.dtype == theirs.dtype == np.float64
        np.testing.assert_allclose(ours, theirs, atol=1e-9)


def test_imutils_crop_golden_nonsquare_and_rotated():
    """Non-square res exercises the reference's own (row, col) corner-order
    and height-based pad quirks verbatim; rot!=0 exercises the scipy
    reshape+strip path (reference :88-90). The reference calls the removed
    scipy.ndimage.interpolation alias, so the rotated comparison patches it
    to the live scipy.ndimage on the reference side only."""
    ref = _ref_imutils()
    import scipy.ndimage

    from posegen_tpu.data.imutils import crop

    rng = np.random.default_rng(2)
    img = (rng.uniform(0, 255, size=(480, 640, 3))).astype(np.uint8)

    ours = crop(img, (300.0, 250.0), 1.1, (256, 192))
    theirs = ref.crop(img, (300.0, 250.0), 1.1, [256, 192])
    np.testing.assert_allclose(ours, theirs, atol=1e-9)

    if not hasattr(scipy.ndimage, "interpolation"):
        scipy.ndimage.interpolation = scipy.ndimage  # reference :88 alias
    try:
        ours_r = crop(img, (320.0, 240.0), 1.3, (224, 224), rot=20.0)
        theirs_r = ref.crop(img, (320.0, 240.0), 1.3, [224, 224], rot=20.0)
    finally:
        if scipy.ndimage.interpolation is scipy.ndimage:
            del scipy.ndimage.interpolation
    np.testing.assert_allclose(ours_r, theirs_r, atol=1e-9)
