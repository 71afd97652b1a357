"""Pose discriminators.

Capability parity with the reference's Pos3dDiscriminator (7 part-wise
KCS-style MLP paths over joint groups -> 7 logits, run_gan.py:982-1026) and
Pos2dDiscriminator (24x2 -> 1 logit, run_gan.py:1028-1046). The 7 part paths
are evaluated as one batched computation by padding each group's input to the
widest and stacking — XLA sees a handful of large matmuls, not 7 small ones.
"""

from __future__ import annotations

from typing import Dict, List, Tuple

import jax
import jax.numpy as jnp

from posegen_tpu.nn.layers import init_linear, leaky_relu, linear

# joint groups (SMPL indexing, reference run_gan.py:1013-1020)
PART_GROUPS: Tuple[Tuple[int, ...], ...] = (
    (4, 7, 10),                         # left leg
    (5, 8, 11),                         # right leg
    (9, 13, 16, 18, 20, 22),            # left arm
    (9, 14, 17, 19, 21, 23),            # right arm
    (0, 1, 2, 3, 6, 9, 13, 14, 16, 17), # torso
    (9, 12, 15),                        # head
    tuple(range(24)),                   # full body
)


def _init_path(key, n_in: int, channel: int = 500, channel_mid: int = 1000) -> Dict:
    ks = jax.random.split(key, 5)
    return {
        "l1": init_linear(ks[0], n_in, channel),
        "l2": init_linear(ks[1], channel, channel),
        "l3": init_linear(ks[2], channel, channel),
        "l4": init_linear(ks[3], channel, channel_mid),
        "pred": init_linear(ks[4], channel_mid, 1),
    }


def _path_apply(p: Dict, x: jax.Array) -> jax.Array:
    y = leaky_relu(linear(p["l1"], x))
    y = leaky_relu(linear(p["l2"], y))
    y = leaky_relu(linear(p["l3"], y))
    y = leaky_relu(linear(p["l4"], y))
    return linear(p["pred"], y)


def init_pos3d_discriminator(key: jax.Array) -> Dict:
    keys = jax.random.split(key, len(PART_GROUPS))
    return {
        f"path{i}": _init_path(k, len(g) * 3)
        for i, (k, g) in enumerate(zip(keys, PART_GROUPS))
    }


def pos3d_discriminator_apply(params: Dict, kp3d: jax.Array) -> jax.Array:
    """kp3d (B, 24, 3) -> logits (B, 7)."""
    outs: List[jax.Array] = []
    for i, g in enumerate(PART_GROUPS):
        x = kp3d[:, jnp.asarray(g)].reshape(kp3d.shape[0], -1)
        outs.append(_path_apply(params[f"path{i}"], x))
    return jnp.concatenate(outs, axis=-1)


def init_pos2d_discriminator(key: jax.Array, n_joints: int = 24) -> Dict:
    return _init_path(key, n_joints * 2, channel=1000, channel_mid=100)


def pos2d_discriminator_apply(params: Dict, kp2d: jax.Array) -> jax.Array:
    """kp2d (B, 24, 2) -> logits (B, 1)."""
    return _path_apply(params, kp2d.reshape(kp2d.shape[0], -1))


# torch checkpoint import (reference run_gan.py:982-1046)
_REF_PATH_NAMES = (
    "layer_left_leg", "layer_right_leg", "layer_left_arm", "layer_right_arm",
    "layer_torso", "layer_head", "layer_full_body",
)


from posegen_tpu.utils.torch_import import t_linear as _t_lin  # noqa: E402


def _t_path(sd, prefix):
    return {
        "l1": _t_lin(sd, f"{prefix}.layer_1"),
        "l2": _t_lin(sd, f"{prefix}.layer_2"),
        "l3": _t_lin(sd, f"{prefix}.layer_3"),
        "l4": _t_lin(sd, f"{prefix}.layer_last"),
        "pred": _t_lin(sd, f"{prefix}.layer_pred"),
    }


def import_torch_pos3d_discriminator(state_dict) -> Dict:
    """Reference Pos3dDiscriminator state_dict -> our params (paths ordered
    like PART_GROUPS / the reference forward's concat)."""
    return {
        f"path{i}": _t_path(state_dict, name)
        for i, name in enumerate(_REF_PATH_NAMES)
    }


def import_torch_pos2d_discriminator(state_dict) -> Dict:
    return {
        "l1": _t_lin(state_dict, "layer_1"),
        "l2": _t_lin(state_dict, "layer_2"),
        "l3": _t_lin(state_dict, "layer_3"),
        "l4": _t_lin(state_dict, "layer_last"),
        "pred": _t_lin(state_dict, "layer_pred"),
    }
