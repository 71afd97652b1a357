"""JAX-native DeepLab-v3 person segmenter.

Capability parity with reference core/process_mask.py (TF DeepLab-v3 person
segmentation used to build H36M/PerfCap masks), rebuilt as a pure-JAX
ResNet-50 + ASPP model (the torchvision `deeplabv3_resnet50` architecture)
with a torch-checkpoint importer: the image has no network egress, so
weights come from a locally downloaded torchvision .pth.

Atrous backbone: layer3 stride->dilation 2, layer4 stride->dilation 4
(output stride 8); ASPP rates (12, 24, 36); logits bilinearly upsampled to
the input. Class 15 is 'person' in the VOC/COCO-21 label map.
"""

from __future__ import annotations

from typing import Any, Callable, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from posegen_tpu.nn.layers import (
    batchnorm,
    conv2d,
    init_batchnorm,
    init_conv,
    max_pool,
)

RESNET50_LAYERS = (3, 4, 6, 3)
ASPP_RATES = (12, 24, 36)
N_CLASSES = 21
PERSON_CLASS = 15

_IMAGENET_MEAN = np.array([0.485, 0.456, 0.406], np.float32)
_IMAGENET_STD = np.array([0.229, 0.224, 0.225], np.float32)


def _init_block(key, c_in: int, planes: int) -> Tuple[Dict, Dict]:
    ks = jax.random.split(key, 4)
    c_out = planes * 4
    p: Dict[str, Any] = {
        "conv1": init_conv(ks[0], 1, c_in, planes),
        "conv2": init_conv(ks[1], 3, planes, planes),
        "conv3": init_conv(ks[2], 1, planes, c_out),
    }
    s: Dict[str, Any] = {}
    for i, dim in (("1", planes), ("2", planes), ("3", c_out)):
        p[f"bn{i}"], s[f"bn{i}"] = init_batchnorm(dim)
    if c_in != c_out:
        p["downsample"] = init_conv(ks[3], 1, c_in, c_out)
        p["down_bn"], s["down_bn"] = init_batchnorm(c_out)
    return p, s


def _block_apply(p, s, x, stride: int, dilation: int):
    y = conv2d(p["conv1"], x)
    y, _ = batchnorm(p["bn1"], s["bn1"], y, train=False)
    y = jax.nn.relu(y)
    y = conv2d(p["conv2"], y, stride=stride, dilation=dilation)
    y, _ = batchnorm(p["bn2"], s["bn2"], y, train=False)
    y = jax.nn.relu(y)
    y = conv2d(p["conv3"], y)
    y, _ = batchnorm(p["bn3"], s["bn3"], y, train=False)
    if "downsample" in p:
        sc = conv2d(p["downsample"], x, stride=stride)
        sc, _ = batchnorm(p["down_bn"], s["down_bn"], sc, train=False)
    else:
        sc = x
    return jax.nn.relu(y + sc)


def init_deeplab(key: jax.Array, n_classes: int = N_CLASSES) -> Tuple[Dict, Dict]:
    """-> (params, bn_state) for deeplabv3_resnet50."""
    keys = jax.random.split(key, 16)
    params: Dict[str, Any] = {"conv1": init_conv(keys[0], 7, 3, 64)}
    state: Dict[str, Any] = {}
    params["bn1"], state["bn1"] = init_batchnorm(64)

    c_in, ki = 64, 1
    for li, (planes, blocks) in enumerate(zip((64, 128, 256, 512), RESNET50_LAYERS)):
        ps, ss = [], []
        for b in range(blocks):
            p, s = _init_block(
                jax.random.fold_in(keys[ki], b),
                c_in if b == 0 else planes * 4,
                planes,
            )
            ps.append(p)
            ss.append(s)
        params[f"layer{li + 1}"] = ps
        state[f"layer{li + 1}"] = ss
        c_in = planes * 4
        ki += 1

    # ASPP: 1x1 + three atrous 3x3 + image pooling, project, classify
    aspp_p, aspp_s = {}, {}
    aspp_p["conv0"] = init_conv(keys[6], 1, 2048, 256)
    aspp_p["bn0"], aspp_s["bn0"] = init_batchnorm(256)
    for i, _r in enumerate(ASPP_RATES):
        aspp_p[f"conv{i + 1}"] = init_conv(keys[7 + i], 3, 2048, 256)
        aspp_p[f"bn{i + 1}"], aspp_s[f"bn{i + 1}"] = init_batchnorm(256)
    aspp_p["pool_conv"] = init_conv(keys[10], 1, 2048, 256)
    aspp_p["pool_bn"], aspp_s["pool_bn"] = init_batchnorm(256)
    aspp_p["project"] = init_conv(keys[11], 1, 256 * 5, 256)
    aspp_p["project_bn"], aspp_s["project_bn"] = init_batchnorm(256)
    params["aspp"], state["aspp"] = aspp_p, aspp_s

    params["head_conv"] = init_conv(keys[12], 3, 256, 256)
    params["head_bn"], state["head_bn"] = init_batchnorm(256)
    params["classifier"] = init_conv(keys[13], 1, 256, n_classes, use_bias=True)
    return params, state


def deeplab_logits(params: Dict, state: Dict, x: jax.Array) -> jax.Array:
    """(B, H, W, 3) normalized -> (B, H, W, n_classes) logits."""
    B, H, W, _ = x.shape
    y = conv2d(params["conv1"], x, stride=2)
    y, _ = batchnorm(params["bn1"], state["bn1"], y, train=False)
    y = jax.nn.relu(y)
    y = max_pool(y, 3, 2)
    # strides/dilations for output stride 8 (torchvision
    # replace_stride_with_dilation=[False, True, True]). torchvision's
    # _make_layer gives BLOCK 0 the PREVIOUS dilation (captured before
    # `self.dilation *= stride`); later blocks use the doubled one.
    layer_cfg = ((1, 1, 1), (2, 1, 1), (1, 1, 2), (1, 2, 4))
    for li, (stride0, dil0, dil) in enumerate(layer_cfg):
        for b, (p, s) in enumerate(
            zip(params[f"layer{li + 1}"], state[f"layer{li + 1}"])
        ):
            y = _block_apply(
                p, s, y, stride0 if b == 0 else 1, dil0 if b == 0 else dil
            )

    ap, as_ = params["aspp"], state["aspp"]

    def bn_relu(name, z):
        z, _ = batchnorm(ap[f"bn{name}"], as_[f"bn{name}"], z, train=False)
        return jax.nn.relu(z)

    feats = [bn_relu("0", conv2d(ap["conv0"], y))]
    for i, r in enumerate(ASPP_RATES):
        feats.append(bn_relu(str(i + 1), conv2d(ap[f"conv{i + 1}"], y, dilation=r)))
    pooled = jnp.mean(y, axis=(1, 2), keepdims=True)
    pooled = conv2d(ap["pool_conv"], pooled)
    pooled, _ = batchnorm(ap["pool_bn"], as_["pool_bn"], pooled, train=False)
    pooled = jax.nn.relu(pooled)
    pooled = jnp.broadcast_to(pooled, feats[0].shape[:3] + (pooled.shape[-1],))
    z = jnp.concatenate(feats + [pooled], axis=-1)
    z = conv2d(ap["project"], z)
    z, _ = batchnorm(ap["project_bn"], as_["project_bn"], z, train=False)
    z = jax.nn.relu(z)

    z = conv2d(params["head_conv"], z)
    z, _ = batchnorm(params["head_bn"], state["head_bn"], z, train=False)
    z = jax.nn.relu(z)
    logits = conv2d(params["classifier"], z)
    return jax.image.resize(logits, (B, H, W, logits.shape[-1]), "bilinear")


# ---------------------------------------------------------------------------
# torchvision weight import
# ---------------------------------------------------------------------------


from posegen_tpu.utils.torch_import import t_batchnorm as _t_bn  # noqa: E402
from posegen_tpu.utils.torch_import import t_conv as _t_conv  # noqa: E402


def _t_conv_b(sd, name):
    return _t_conv(sd, name, bias=True)


def import_torch_deeplab(state_dict: Dict[str, Any]) -> Tuple[Dict, Dict]:
    """torchvision deeplabv3_resnet50 state_dict -> (params, bn_state)."""
    sd = {k: np.asarray(v) for k, v in state_dict.items()}
    params: Dict[str, Any] = {"conv1": _t_conv(sd, "backbone.conv1")}
    state: Dict[str, Any] = {}
    params["bn1"], state["bn1"] = _t_bn(sd, "backbone.bn1")
    for li, blocks in enumerate(RESNET50_LAYERS):
        ps, ss = [], []
        for b in range(blocks):
            base = f"backbone.layer{li + 1}.{b}"
            p: Dict[str, Any] = {}
            s: Dict[str, Any] = {}
            for ci in (1, 2, 3):
                p[f"conv{ci}"] = _t_conv(sd, f"{base}.conv{ci}")
                p[f"bn{ci}"], s[f"bn{ci}"] = _t_bn(sd, f"{base}.bn{ci}")
            if f"{base}.downsample.0.weight" in sd:
                p["downsample"] = _t_conv(sd, f"{base}.downsample.0")
                p["down_bn"], s["down_bn"] = _t_bn(sd, f"{base}.downsample.1")
            ps.append(p)
            ss.append(s)
        params[f"layer{li + 1}"] = ps
        state[f"layer{li + 1}"] = ss

    # classifier.0 = ASPP (convs 0-3, pooling 4), .1-.3 = head, .4 = logits
    ap: Dict[str, Any] = {}
    as_: Dict[str, Any] = {}
    for i in range(4):
        ap[f"conv{i}"] = _t_conv(sd, f"classifier.0.convs.{i}.0")
        ap[f"bn{i}"], as_[f"bn{i}"] = _t_bn(sd, f"classifier.0.convs.{i}.1")
    ap["pool_conv"] = _t_conv(sd, "classifier.0.convs.4.1")
    ap["pool_bn"], as_["pool_bn"] = _t_bn(sd, "classifier.0.convs.4.2")
    ap["project"] = _t_conv(sd, "classifier.0.project.0")
    ap["project_bn"], as_["project_bn"] = _t_bn(sd, "classifier.0.project.1")
    params["aspp"], state["aspp"] = ap, as_

    params["head_conv"] = _t_conv(sd, "classifier.1")
    params["head_bn"], state["head_bn"] = _t_bn(sd, "classifier.2")
    params["classifier"] = _t_conv_b(sd, "classifier.4")
    return params, state


def deeplab_person_segmenter(
    weights_path: Optional[str] = None,
    person_class: int = PERSON_CLASS,
) -> Callable[[np.ndarray], np.ndarray]:
    """img (H, W, 3) uint8 -> person mask (H, W) uint8.

    weights_path: a locally downloaded torchvision deeplabv3_resnet50 .pth
    (loaded with torch for deserialization only). Without weights the model
    is randomly initialized — useful only for tests.
    """
    if weights_path:
        import torch

        sd = torch.load(weights_path, map_location="cpu")
        if isinstance(sd, dict) and "state_dict" in sd:
            sd = sd["state_dict"]
        sd = {k: v.numpy() if hasattr(v, "numpy") else v for k, v in sd.items()}
        params, state = import_torch_deeplab(sd)
    else:
        print(
            "[segmenter] WARNING: no weights_path — random DeepLab weights "
            "(tests only); download torchvision's deeplabv3_resnet50 .pth "
            "offline for real segmentation"
        )
        params, state = init_deeplab(jax.random.PRNGKey(0))

    fwd = jax.jit(lambda p, s, x: deeplab_logits(p, s, x))

    def run(img: np.ndarray) -> np.ndarray:
        x = (img.astype(np.float32) / 255.0 - _IMAGENET_MEAN) / _IMAGENET_STD
        logits = fwd(params, state, jnp.asarray(x[None]))
        return np.asarray(jnp.argmax(logits[0], -1) == person_class).astype(np.uint8)

    return run
