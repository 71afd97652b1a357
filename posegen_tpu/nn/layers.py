"""Minimal functional NN layers: params/state as dicts, pure applies.

Shared by the pose GAN and the HMR/SPIN backbone. Initialisation follows
PyTorch defaults so imported torchvision/SPIN weights drop in unchanged
(linear/conv: kaiming-uniform fan_in; BN: ones/zeros, eps 1e-5, momentum 0.1).
Convs are NHWC — the TPU-native layout.
"""

from __future__ import annotations

from typing import Dict, Tuple

import jax
import jax.numpy as jnp
import numpy as np


def init_linear(key: jax.Array, n_in: int, n_out: int) -> Dict[str, jax.Array]:
    kw, kb = jax.random.split(key)
    bound = 1.0 / np.sqrt(n_in)
    return {
        "w": jax.random.uniform(kw, (n_in, n_out), jnp.float32, -bound, bound),
        "b": jax.random.uniform(kb, (n_out,), jnp.float32, -bound, bound),
    }


def linear(p: Dict[str, jax.Array], x: jax.Array) -> jax.Array:
    return x @ p["w"] + p["b"]


def leaky_relu(x: jax.Array, slope: float = 0.01) -> jax.Array:
    return jax.nn.leaky_relu(x, slope)


# ---------------------------------------------------------------------------
# batch norm with explicit running-stat state
# ---------------------------------------------------------------------------

def init_batchnorm(dim: int) -> Tuple[Dict, Dict]:
    """-> (params {scale, bias}, state {mean, var})."""
    params = {"scale": jnp.ones((dim,)), "bias": jnp.zeros((dim,))}
    state = {"mean": jnp.zeros((dim,)), "var": jnp.ones((dim,))}
    return params, state


def batchnorm(
    params: Dict,
    state: Dict,
    x: jax.Array,
    train: bool,
    momentum: float = 0.1,
    eps: float = 1e-5,
    axis_name: str = None,
) -> Tuple[jax.Array, Dict]:
    """Normalize over all axes but the last. Returns (y, new_state).

    train=True uses batch statistics and updates the running stats (the
    PyTorch convention: new = (1-m)*old + m*batch). train=False (and the
    SPIN fine-tuning 'BN frozen' mode, reference run_gan.py:1860-1869) uses
    the stored running stats and leaves state unchanged.

    axis_name: sync-BN for data-parallel training under shard_map — batch
    statistics are pmean'd over the mesh axis so every device normalizes
    with GLOBAL-batch moments; with equal shards the result matches the
    single-device step exactly (unlike torch nn.DataParallel's per-replica
    stats), and the returned state is replicated.
    """
    axes = tuple(range(x.ndim - 1))
    if train:
        mean = jnp.mean(x, axis=axes)
        n = x.size // x.shape[-1]
        if axis_name is None:
            var = jnp.var(x, axis=axes)
        else:
            mean = jax.lax.pmean(mean, axis_name)
            msq = jax.lax.pmean(jnp.mean(x * x, axis=axes), axis_name)
            var = msq - mean * mean
            n = n * jax.lax.axis_size(axis_name)
        unbiased = var * n / max(n - 1, 1)
        new_state = {
            "mean": (1 - momentum) * state["mean"] + momentum * mean,
            "var": (1 - momentum) * state["var"] + momentum * unbiased,
        }
    else:
        mean, var = state["mean"], state["var"]
        new_state = state
    y = (x - mean) * jax.lax.rsqrt(var + eps) * params["scale"] + params["bias"]
    return y, new_state


# ---------------------------------------------------------------------------
# conv / pooling (NHWC)
# ---------------------------------------------------------------------------

def init_conv(
    key: jax.Array,
    k: int,
    c_in: int,
    c_out: int,
    use_bias: bool = False,
) -> Dict[str, jax.Array]:
    fan_in = k * k * c_in
    bound = np.sqrt(1.0 / fan_in)
    # kaiming-uniform with a=sqrt(5) (torch Conv2d default) ~ U(-b, b), b = sqrt(6/((1+5)*fan_in)) = sqrt(1/fan_in)
    p = {"w": jax.random.uniform(key, (k, k, c_in, c_out), jnp.float32, -bound, bound)}
    if use_bias:
        p["b"] = jnp.zeros((c_out,))
    return p


def conv2d(
    p: Dict[str, jax.Array],
    x: jax.Array,
    stride: int = 1,
    padding="SAME",
    dilation: int = 1,
) -> jax.Array:
    y = jax.lax.conv_general_dilated(
        x, p["w"],
        window_strides=(stride, stride),
        padding=padding,
        rhs_dilation=(dilation, dilation),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )
    if "b" in p:
        y = y + p["b"]
    return y


def max_pool(x: jax.Array, k: int = 3, stride: int = 2, padding="SAME") -> jax.Array:
    return jax.lax.reduce_window(
        x, -jnp.inf, jax.lax.max, (1, k, k, 1), (1, stride, stride, 1), padding
    )
