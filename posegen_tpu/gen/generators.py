"""Pose GAN generators.

Capability parity with the reference's PoseGenerator / BAGenerator /
RTGenerator (run_gan.py:767-980) rebuilt functionally: params + BN state are
pytrees, randomness is explicit PRNG keys, and the whole generator forward
jits into one program (the reference's per-layer BatchNorm1d MLP becomes a
chain of fused matmuls).

Architecture (mirroring the reference):
  BAGenerator: noise(32) -> Linear(256) + BN + LeakyReLU
               -> 2 x [Linear+BN+LReLU, Linear+BN+LReLU] residual-style stages
               -> Linear(24*4) -> per-joint (axis, theta); axis normalized,
               pose = axis * theta, root theta scaled by 2*pi.
  RTGenerator: two such trunks; R head emits (mean, std, scale) -> sampled
               axis-angle -> rotmat; T head emits xyz with z squared
               (keeps the subject in front of the camera). Applies (R, T) to
               the root-centred input pose.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp

from posegen_tpu.nn.layers import batchnorm, init_batchnorm, init_linear, leaky_relu, linear
from posegen_tpu.skeleton.rotations import axisang_to_rot


@dataclasses.dataclass(frozen=True)
class GenConfig:
    n_joints: int = 24
    noise_ch: int = 32
    rt_noise_ch: int = 72
    width: int = 256
    num_stages: int = 2


def _init_block(key, width) -> Dict:
    """One residual-style stage: two Linear+BN pairs (reference Linear
    module, run_gan.py:767-789)."""
    k1, k2 = jax.random.split(key)
    p1, s1 = init_batchnorm(width)
    p2, s2 = init_batchnorm(width)
    return {
        "w1": init_linear(k1, width, width), "bn1": p1,
        "w2": init_linear(k2, width, width), "bn2": p2,
        "_state": {"bn1": s1, "bn2": s2},
    }


def _block_apply(
    p: Dict, s: Dict, x: jax.Array, train: bool, axis_name: Optional[str] = None
) -> Tuple[jax.Array, Dict]:
    y = linear(p["w1"], x)
    y, s1 = batchnorm(p["bn1"], s["bn1"], y, train, axis_name=axis_name)
    y = leaky_relu(y)
    y = linear(p["w2"], y)
    y, s2 = batchnorm(p["bn2"], s["bn2"], y, train, axis_name=axis_name)
    y = leaky_relu(y)
    return y, {"bn1": s1, "bn2": s2}


def _init_trunk(key, cfg: GenConfig, noise_ch: int, out_dim: Optional[int]) -> Dict:
    """out_dim None = headless trunk: the reference RTGenerator's R branch
    slices raw trunk features (run_gan.py:952-957, w2_R is dead code)."""
    keys = jax.random.split(key, cfg.num_stages + 2)
    bn_p, bn_s = init_batchnorm(cfg.width)
    tree = {
        "w_in": init_linear(keys[0], noise_ch, cfg.width),
        "bn_in": bn_p,
        "stages": [_init_block(keys[i + 1], cfg.width) for i in range(cfg.num_stages)],
        "_state": {"bn_in": bn_s},
    }
    if out_dim is not None:
        tree["w_out"] = init_linear(keys[-1], cfg.width, out_dim)
    return tree


def _trunk_apply(
    tree: Dict, state: Dict, noise: jax.Array, train: bool,
    axis_name: Optional[str] = None,
) -> Tuple[jax.Array, Dict]:
    y = linear(tree["w_in"], noise)
    y, s_in = batchnorm(tree["bn_in"], state["bn_in"], y, train, axis_name=axis_name)
    y = leaky_relu(y)
    new_state = {"bn_in": s_in, "stages": []}
    for i, stage in enumerate(tree["stages"]):
        y, s = _block_apply(stage, state["stages"][i], y, train, axis_name)
        new_state["stages"].append(s)
    if "w_out" in tree:
        y = linear(tree["w_out"], y)
    return y, new_state


def init_pose_generator(key: jax.Array, cfg: GenConfig = GenConfig()) -> Tuple[Dict, Dict]:
    """-> (params, bn_state) for the combined BA+RT generator."""
    k_ba, k_r, k_t = jax.random.split(key, 3)
    ba = _init_trunk(k_ba, cfg, cfg.noise_ch, cfg.n_joints * 4)
    r = _init_trunk(k_r, cfg, cfg.rt_noise_ch, None)  # headless (see _init_trunk)
    t = _init_trunk(k_t, cfg, cfg.rt_noise_ch, 3)

    def strip(tree):
        params, state = {}, {}
        for k, v in tree.items():
            if k == "_state":
                state.update(v)
            elif k == "stages":
                params[k] = [strip(b)[0] for b in v]
                state[k] = [strip(b)[1] for b in v]
            else:
                params[k] = v
        return params, state

    pa, sa = strip(ba)
    pr, sr = strip(r)
    pt, st = strip(t)
    return {"ba": pa, "r": pr, "t": pt}, {"ba": sa, "r": sr, "t": st}


def ba_generator_apply(
    params: Dict, state: Dict, key: jax.Array, batch: int,
    cfg: GenConfig = GenConfig(), train: bool = True,
    noise: Optional[jax.Array] = None,
    axis_name: Optional[str] = None,
) -> Tuple[jax.Array, Dict]:
    """noise -> axis-angle bones (B, J, 3) (reference BAGenerator.forward)."""
    if noise is None:
        noise = jax.random.normal(key, (batch, cfg.noise_ch))
    y, new_state = _trunk_apply(params, state, noise, train, axis_name)
    y = y.reshape(batch, cfg.n_joints, 4)
    axis = y[..., :3]
    axis = axis / jnp.maximum(jnp.linalg.norm(axis, axis=-1, keepdims=True), 1e-8)
    theta = y[..., 3:4]
    out = axis * theta
    # the reference scales the root theta by literally 3.14*2, not 2*pi
    # (run_gan.py:887) — matched for checkpoint-level parity
    out = out.at[:, 0].multiply(3.14 * 2.0)
    return out, new_state


def rt_generator_apply(
    params_r: Dict, params_t: Dict, state_r: Dict, state_t: Dict,
    key: jax.Array, kp3d: jax.Array,
    cfg: GenConfig = GenConfig(), train: bool = True,
    noise_r: Optional[jax.Array] = None,
    noise_t: Optional[jax.Array] = None,
    eps_axis: Optional[jax.Array] = None,
    axis_name: Optional[str] = None,
):
    """noise -> (R (B,3,3), T (B,3), transformed pose (B,J,3)), new states
    (reference RTGenerator.forward, run_gan.py:944-980)."""
    B = kp3d.shape[0]
    if noise_r is None or eps_axis is None or noise_t is None:
        k1, k2, k3 = jax.random.split(key, 3)
        if noise_r is None:
            noise_r = jax.random.normal(k1, (B, cfg.rt_noise_ch))
        if eps_axis is None:
            eps_axis = jax.random.normal(k2, (B, 3))
        if noise_t is None:
            noise_t = jax.random.normal(k3, (B, cfg.rt_noise_ch))

    r_feat, ns_r = _trunk_apply(params_r, state_r, noise_r, train, axis_name)
    r_mean, r_std, r_scale = r_feat[:, :3], r_feat[:, 3:6] ** 2, r_feat[:, 6:7]
    r_axis = r_mean + r_std * eps_axis
    r_axis = r_axis / jnp.maximum(jnp.linalg.norm(r_axis, axis=-1, keepdims=True), 1e-8)
    R = axisang_to_rot(r_axis * r_scale)

    t_feat, ns_t = _trunk_apply(params_t, state_t, noise_t, train, axis_name)
    T = t_feat.at[:, 2].set(t_feat[:, 2] ** 2)

    centered = kp3d - kp3d[:, :1]
    out = jnp.einsum("nxy,njy->njx", R, centered) + T[:, None]
    return R, T, out, ns_r, ns_t


def pose_generator_apply(
    params: Dict, state: Dict, key: jax.Array, kp3d: jax.Array,
    cfg: GenConfig = GenConfig(), train: bool = True,
    noises: Optional[Dict[str, jax.Array]] = None,
    axis_name: Optional[str] = None,
) -> Tuple[Dict, Dict]:
    """Full generator (reference PoseGenerator.forward, run_gan.py:799-816).

    kp3d: (B, J, 3) real poses (used for batch size + RT application).
    Returns ({'pose_ba', 'R', 'T', 'pose_rt'}, new_state).

    noises: optional explicit noise dict {'ba', 'r', 'eps', 't'} overriding
    the key-derived draws — the data-parallel generator step passes each
    device's slice of globally-drawn noise so a sharded forward reproduces
    the single-device one exactly. axis_name: sync-BN mesh axis (see
    nn.layers.batchnorm).
    """
    noises = noises or {}
    k_ba, k_rt = jax.random.split(key)
    pose_ba, ns_ba = ba_generator_apply(
        params["ba"], state["ba"], k_ba, kp3d.shape[0], cfg, train,
        noise=noises.get("ba"), axis_name=axis_name,
    )
    R, T, pose_rt, ns_r, ns_t = rt_generator_apply(
        params["r"], params["t"], state["r"], state["t"], k_rt, kp3d, cfg, train,
        noise_r=noises.get("r"), noise_t=noises.get("t"),
        eps_axis=noises.get("eps"), axis_name=axis_name,
    )
    return (
        {"pose_ba": pose_ba, "R": R, "T": T, "pose_rt": pose_rt},
        {"ba": ns_ba, "r": ns_r, "t": ns_t},
    )


# ---------------------------------------------------------------------------
# torch checkpoint import (reference run_gan.py GAN checkpoints)
# ---------------------------------------------------------------------------


from posegen_tpu.utils.torch_import import t_batchnorm as _t_bn  # noqa: E402
from posegen_tpu.utils.torch_import import t_linear as _t_lin  # noqa: E402


def _t_trunk(sd, prefix_in, prefix_bn, prefix_stages, prefix_out, n_stages=2):
    params = {"w_in": _t_lin(sd, prefix_in)}
    state: Dict[str, Any] = {}
    params["bn_in"], state["bn_in"] = _t_bn(sd, prefix_bn)
    ps, ss = [], []
    for i in range(n_stages):
        base = f"{prefix_stages}.{i}"
        p: Dict[str, Any] = {
            "w1": _t_lin(sd, f"{base}.w1"), "w2": _t_lin(sd, f"{base}.w2"),
        }
        s: Dict[str, Any] = {}
        p["bn1"], s["bn1"] = _t_bn(sd, f"{base}.batch_norm1")
        p["bn2"], s["bn2"] = _t_bn(sd, f"{base}.batch_norm2")
        ps.append(p)
        ss.append(s)
    params["stages"], state["stages"] = ps, ss
    if prefix_out is not None:
        params["w_out"] = _t_lin(sd, prefix_out)
    return params, state


def import_torch_pose_generator(state_dict: Dict[str, Any]):
    """Reference PoseGenerator state_dict -> (params, bn_state)
    (module names from run_gan.py:793-980: BAprocess.w1/batch_norm1/
    linear_stages/w2, RTprocess.w1_R/.../w2_T; w2_R is dead code)."""
    sd = dict(state_dict)
    pa, sa = _t_trunk(sd, "BAprocess.w1", "BAprocess.batch_norm1",
                      "BAprocess.linear_stages", "BAprocess.w2")
    pr, sr = _t_trunk(sd, "RTprocess.w1_R", "RTprocess.batch_norm_R",
                      "RTprocess.linear_stages_R", None)
    pt, st = _t_trunk(sd, "RTprocess.w1_T", "RTprocess.batch_norm_T",
                      "RTprocess.linear_stages_T", "RTprocess.w2_T")
    return {"ba": pa, "r": pr, "t": pt}, {"ba": sa, "r": sr, "t": st}
