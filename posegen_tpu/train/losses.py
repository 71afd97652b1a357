"""Photometric + regularization losses (reference core/trainer.py:8-61).

Pure functions over arrays; every loss returns a scalar f32.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def img2mse(pred: jax.Array, target: jax.Array) -> jax.Array:
    return jnp.mean((pred - target) ** 2)


def img2l1(pred: jax.Array, target: jax.Array) -> jax.Array:
    return jnp.mean(jnp.abs(pred - target))


def img2huber(pred: jax.Array, target: jax.Array, delta: float = 0.1) -> jax.Array:
    err = pred - target
    abs_err = jnp.abs(err)
    quad = jnp.minimum(abs_err, delta)
    return jnp.mean(0.5 * quad**2 + delta * (abs_err - quad))


def mse2psnr(mse: jax.Array) -> jax.Array:
    return -10.0 * jnp.log10(jnp.maximum(mse, 1e-10))


def acc2bce(acc: jax.Array, fg: jax.Array, eps: float = 1e-8) -> jax.Array:
    """Binary cross-entropy pushing accumulated alpha toward the fg mask.

    Matches the reference's LIVE reg path exactly: _compute_nerf_loss calls
    acc2bce with reduction='off' (core/trainer.py:378, :44-52), which averages
    the per-pixel BCE over BACKGROUND pixels only (fg < 1.0) — foreground
    pixels contribute nothing. The data-dependent boolean index becomes a
    jittable masked mean here."""
    bce = -(fg * jnp.log(acc + eps) + (1.0 - fg) * jnp.log(1.0 - acc + eps))
    bg = (fg < 1.0).astype(bce.dtype)
    return jnp.sum(bce * bg) / jnp.maximum(jnp.sum(bg), 1.0)


def rgb_loss(
    loss_fn: str, pred: jax.Array, target: jax.Array, beta: float = 0.1
) -> jax.Array:
    if loss_fn == "MSE":
        return img2mse(pred, target)
    if loss_fn == "L1":
        return img2l1(pred, target)
    if loss_fn == "Huber":
        return img2huber(pred, target, delta=beta)
    raise NotImplementedError(f"loss_fn {loss_fn!r}")
