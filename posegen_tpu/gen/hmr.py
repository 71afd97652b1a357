"""HMR / SPIN: ResNet-50 backbone + iterative SMPL regressor in JAX.

Capability parity with the reference's HMR (run_gan.py:1188-1377: ResNet-50
trunk, 3-iteration regressor emitting rot6d pose (24x6), betas (10) and weak
-perspective cam (3), initialised from SMPL mean params). NHWC convs, BN
running stats in an explicit state pytree; `import_torch_hmr` maps a
torchvision-resnet50 or SPIN checkpoint state dict onto the pytree (NCHW
OIHW -> HWIO transposes) so reference-pretrained SPIN weights drop in.
"""

from __future__ import annotations

from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from posegen_tpu.nn.layers import (
    batchnorm,
    conv2d,
    init_batchnorm,
    init_conv,
    init_linear,
    linear,
    max_pool,
)
from posegen_tpu.skeleton.rotations import rot6d_to_rot

RESNET50_LAYERS = (3, 4, 6, 3)
NPOSE = 24 * 6


# ---------------------------------------------------------------------------
# bottleneck blocks
# ---------------------------------------------------------------------------

def _init_bottleneck(key, c_in: int, planes: int, stride: int) -> Dict:
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
    if stride != 1 or c_in != c_out:
        p["downsample"] = init_conv(ks[3], 1, c_in, c_out)
        p["down_bn"], s["down_bn"] = init_batchnorm(c_out)
    return {"params": p, "state": s, "stride": stride}


def _bottleneck_apply(p: Dict, s: Dict, x: jax.Array, stride: int, train: bool):
    ns = {}
    y = conv2d(p["conv1"], x)
    y, ns["bn1"] = batchnorm(p["bn1"], s["bn1"], y, train)
    y = jax.nn.relu(y)
    y = conv2d(p["conv2"], y, stride=stride)
    y, ns["bn2"] = batchnorm(p["bn2"], s["bn2"], y, train)
    y = jax.nn.relu(y)
    y = conv2d(p["conv3"], y)
    y, ns["bn3"] = batchnorm(p["bn3"], s["bn3"], y, train)
    if "downsample" in p:
        sc = conv2d(p["downsample"], x, stride=stride)
        sc, ns["down_bn"] = batchnorm(p["down_bn"], s["down_bn"], sc, train)
    else:
        sc = x
    return jax.nn.relu(y + sc), ns


# ---------------------------------------------------------------------------
# full model
# ---------------------------------------------------------------------------

def init_hmr(
    key: jax.Array,
    mean_params: Optional[Dict[str, np.ndarray]] = None,
) -> Tuple[Dict, Dict]:
    """-> (params, bn_state). mean_params: {'pose' (144,), 'shape' (10,),
    'cam' (3,)} from SPIN's smpl_mean_params.npz; zeros/identity-ish defaults
    otherwise."""
    keys = jax.random.split(key, 24)
    params: Dict[str, Any] = {"conv1": init_conv(keys[0], 7, 3, 64)}
    state: Dict[str, Any] = {}
    params["bn1"], state["bn1"] = init_batchnorm(64)

    c_in, ki = 64, 1
    for li, (planes, blocks) in enumerate(zip((64, 128, 256, 512), RESNET50_LAYERS)):
        layer_p, layer_s = [], []
        for b in range(blocks):
            stride = (2 if li > 0 else 1) if b == 0 else 1
            blk = _init_bottleneck(jax.random.fold_in(keys[ki], b), c_in, planes, stride)
            layer_p.append(blk["params"])
            layer_s.append(blk["state"])
            c_in = planes * 4
        params[f"layer{li + 1}"] = layer_p
        state[f"layer{li + 1}"] = layer_s
        ki += 1

    feat = 512 * 4
    params["fc1"] = init_linear(keys[20], feat + NPOSE + 13, 1024)
    params["fc2"] = init_linear(keys[21], 1024, 1024)
    # 0.01-gain xavier heads (reference run_gan.py:1281-1283)
    for name, n_out, k in (("decpose", NPOSE, keys[22]), ("decshape", 10, keys[23]),
                           ("deccam", 3, jax.random.fold_in(keys[23], 1))):
        w = jax.random.normal(k, (1024, n_out)) * 0.01 * np.sqrt(2.0 / (1024 + n_out))
        params[name] = {"w": w, "b": jnp.zeros((n_out,))}

    if mean_params is None:
        pose0 = np.tile(np.array([1, 0, 0, 1, 0, 0], np.float32), 24)
        mean_params = {"pose": pose0, "shape": np.zeros(10, np.float32),
                       "cam": np.array([0.9, 0.0, 0.0], np.float32)}
    params["init_pose"] = jnp.asarray(mean_params["pose"], jnp.float32).reshape(1, -1)
    params["init_shape"] = jnp.asarray(mean_params["shape"], jnp.float32).reshape(1, -1)
    params["init_cam"] = jnp.asarray(mean_params["cam"], jnp.float32).reshape(1, -1)
    return params, state


def resnet_features(params: Dict, state: Dict, x: jax.Array, train: bool):
    """(B, 224, 224, 3) -> (B, 2048) pooled features + new BN state."""
    ns: Dict[str, Any] = {}
    y = conv2d(params["conv1"], x, stride=2)
    y, ns["bn1"] = batchnorm(params["bn1"], state["bn1"], y, train)
    y = jax.nn.relu(y)
    y = max_pool(y, 3, 2)
    for li in range(1, 5):
        layer_ns = []
        for b, blk in enumerate(params[f"layer{li}"]):
            stride = 2 if (li > 1 and b == 0) else 1
            y, bns = _bottleneck_apply(
                blk, state[f"layer{li}"][b], y, stride, train
            )
            layer_ns.append(bns)
        ns[f"layer{li}"] = layer_ns
    feat = jnp.mean(y, axis=(1, 2))  # global average pool (7x7 avgpool analog)
    return feat, ns


def hmr_apply(
    params: Dict,
    state: Dict,
    images: jax.Array,
    n_iter: int = 3,
    train: bool = False,
    bn_train: Optional[bool] = None,
    dropout_key: Optional[jax.Array] = None,
    dropout_rate: float = 0.5,
) -> Tuple[jax.Array, jax.Array, jax.Array, Dict]:
    """images (B, H, W, 3) normalized -> (pred_rotmat (B, 24, 3, 3),
    pred_betas (B, 10), pred_cam (B, 3), new_bn_state).

    bn_train=False with train=True reproduces the reference's BN-frozen SPIN
    fine-tuning mode (run_gan.py:1860-1869). Dropout (reference drop1/drop2)
    engages only when train and a dropout_key is given."""
    B = images.shape[0]
    bn_train = train if bn_train is None else bn_train
    feat, ns = resnet_features(params, state, images, bn_train)

    def drop(x, k):
        if not train or dropout_key is None:
            return x
        keep = jax.random.bernoulli(k, 1.0 - dropout_rate, x.shape)
        return jnp.where(keep, x / (1.0 - dropout_rate), 0.0)

    pose = jnp.broadcast_to(params["init_pose"], (B, NPOSE))
    shape = jnp.broadcast_to(params["init_shape"], (B, 10))
    cam = jnp.broadcast_to(params["init_cam"], (B, 3))
    for i in range(n_iter):
        kd = (
            jax.random.fold_in(dropout_key, i) if dropout_key is not None else None
        )
        xc = jnp.concatenate([feat, pose, shape, cam], axis=-1)
        xc = drop(linear(params["fc1"], xc), kd)
        xc = drop(
            linear(params["fc2"], xc),
            jax.random.fold_in(kd, 1) if kd is not None else None,
        )
        pose = linear(params["decpose"], xc) + pose
        shape = linear(params["decshape"], xc) + shape
        cam = linear(params["deccam"], xc) + cam

    rotmat = rot6d_to_rot(pose.reshape(B, 24, 6))
    return rotmat, shape, cam, ns


# ---------------------------------------------------------------------------
# torch import
# ---------------------------------------------------------------------------

def _t_conv(sd, name):
    return {"w": jnp.asarray(np.asarray(sd[f"{name}.weight"]).transpose(2, 3, 1, 0))}


def _t_bn(sd, name):
    p = {"scale": jnp.asarray(np.asarray(sd[f"{name}.weight"])),
         "bias": jnp.asarray(np.asarray(sd[f"{name}.bias"]))}
    s = {"mean": jnp.asarray(np.asarray(sd[f"{name}.running_mean"])),
         "var": jnp.asarray(np.asarray(sd[f"{name}.running_var"]))}
    return p, s


def _t_lin(sd, name):
    return {"w": jnp.asarray(np.asarray(sd[f"{name}.weight"]).T),
            "b": jnp.asarray(np.asarray(sd[f"{name}.bias"]))}


def import_torch_hmr(state_dict: Dict[str, Any], params: Dict, state: Dict):
    """Overlay a torch HMR/resnet50 state dict onto (params, state).

    Accepts either a full SPIN HMR checkpoint (has fc1/decpose heads) or a
    plain torchvision resnet50 (backbone only, reference hmr() pretrained
    path, run_gan.py:1360-1369). Returns new (params, state)."""
    sd = {k: (v.numpy() if hasattr(v, "numpy") else v) for k, v in state_dict.items()}
    params = jax.tree_util.tree_map(lambda x: x, params)  # shallow copy
    state = jax.tree_util.tree_map(lambda x: x, state)

    if "conv1.weight" in sd:
        params["conv1"] = _t_conv(sd, "conv1")
    if "bn1.weight" in sd:
        params["bn1"], state["bn1"] = _t_bn(sd, "bn1")
    for li in range(1, 5):
        for b in range(RESNET50_LAYERS[li - 1]):
            pre = f"layer{li}.{b}"
            if f"{pre}.conv1.weight" not in sd:
                continue  # strict=False analog: keep existing init
            blk = dict(params[f"layer{li}"][b])
            bst = dict(state[f"layer{li}"][b])
            for ci in ("1", "2", "3"):
                blk[f"conv{ci}"] = _t_conv(sd, f"{pre}.conv{ci}")
                blk[f"bn{ci}"], bst[f"bn{ci}"] = _t_bn(sd, f"{pre}.bn{ci}")
            if f"{pre}.downsample.0.weight" in sd:
                blk["downsample"] = _t_conv(sd, f"{pre}.downsample.0")
                blk["down_bn"], bst["down_bn"] = _t_bn(sd, f"{pre}.downsample.1")
            params[f"layer{li}"][b] = blk
            state[f"layer{li}"][b] = bst
    for head in ("fc1", "fc2", "decpose", "decshape", "deccam"):
        if f"{head}.weight" in sd:
            params[head] = _t_lin(sd, head)
    for buf in ("init_pose", "init_shape", "init_cam"):
        if buf in sd:
            params[buf] = jnp.asarray(np.asarray(sd[buf])).reshape(1, -1)
    return params, state
