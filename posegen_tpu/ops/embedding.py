"""Positional encoding with per-joint soft cutoff — pure functions.

Capability parity with the reference's `Embedder`/`CutoffEmbedder`
(reference: core/cutoff_embedder.py:9-197). Stateless: the annealed
temperature `tau`, the BARF-style schedule `alpha` and the per-joint
`cutoff_dist` are explicit inputs carried in the train state, not buffers.

Semantics (cutoff path):
  w_j   = 1 - sigmoid(tau * (dist_j - cutoff_j))          per-joint gate
  PE    = [input?, sin(f_0 x), cos(f_0 x), ..., sin(f_{NF-1} x), cos(...)]
  out   = flatten(PE * w) with optional BARF frequency window.
"""

from __future__ import annotations

import dataclasses
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np


@dataclasses.dataclass(frozen=True)
class EmbedConfig:
    """Static embedder configuration (hashable -> jit static arg).

    num_freqs: number of octaves (reference `multires`); frequencies are
      2**linspace(0, num_freqs-1, num_freqs).
    input_dims: trailing dim of the embedded signal.
    cutoff_dim: number of joints driving the cutoff gates.
    dist_inputs: True when input_dims != cutoff_dim — each joint's distance
      gates `input_dims // cutoff_dim` consecutive input channels
      (reference cutoff_embedder.py:116-124).
    cutoff_inputs: also gate the raw (identity) part of the encoding.
    cut_to_dist / shift_inputs: input reparameterisations
      (reference :127-134).
    """

    num_freqs: int
    input_dims: int
    include_input: bool = True
    cutoff: bool = False
    cutoff_dim: int = 24
    dist_inputs: bool = False
    cutoff_inputs: bool = False
    cut_to_dist: bool = False
    shift_inputs: bool = False
    normalize: bool = False
    freq_schedule: bool = False
    init_alpha: float = 0.0
    init_tau: float = 20.0
    log_sampling: bool = True

    @property
    def out_dim(self) -> int:
        d = self.input_dims if self.include_input else 0
        return d + 2 * self.num_freqs * self.input_dims

    @property
    def expand(self) -> int:
        if not self.dist_inputs:
            return 1
        assert self.input_dims % self.cutoff_dim == 0, (
            f"input_dims {self.input_dims} not a multiple of cutoff_dim {self.cutoff_dim}"
        )
        return self.input_dims // self.cutoff_dim

    def freq_bands(self) -> np.ndarray:
        if self.num_freqs == 0:
            return np.zeros((0,), dtype=np.float32)
        if self.log_sampling:
            return (2.0 ** np.linspace(0.0, self.num_freqs - 1, self.num_freqs)).astype(np.float32)
        return np.linspace(1.0, 2.0 ** (self.num_freqs - 1), self.num_freqs).astype(np.float32)


def identity_config(input_dims: int) -> EmbedConfig:
    """No-op embedding (reference i_embed == -1)."""
    return EmbedConfig(num_freqs=0, input_dims=input_dims, include_input=True)


def init_embed_state(cfg: EmbedConfig, cutoff_dist: Optional[jax.Array] = None) -> dict:
    """Mutable-through-train-state quantities of the embedder."""
    if cutoff_dist is None:
        cutoff_dist = jnp.ones((cfg.cutoff_dim,), dtype=jnp.float32) * 0.175
    return {
        "tau": jnp.asarray(cfg.init_tau, dtype=jnp.float32),
        "alpha": jnp.asarray(cfg.init_alpha, dtype=jnp.float32),
        # copy: several embed states share one cutoff table at init, and
        # aliased buffers break argument donation in jitted train steps
        "cutoff_dist": jnp.array(cutoff_dist, dtype=jnp.float32, copy=True),
    }


def update_tau(cfg: EmbedConfig, global_step, step: int, rate: float) -> jax.Array:
    """Exponential temperature anneal (reference cutoff_embedder.py:181-183):
    tau = init_tau * rate**(global_step / (step * 1000)), clamped at 2000."""
    gs = jnp.asarray(global_step, dtype=jnp.float32)
    return jnp.minimum(cfg.init_tau * rate ** (gs / float(step * 1000)), 2000.0)


def update_alpha(cfg: EmbedConfig, global_step, step: int, target: Optional[float] = None) -> jax.Array:
    """Linear BARF alpha schedule (reference :185-190)."""
    if not cfg.freq_schedule:
        return jnp.asarray(cfg.init_alpha, dtype=jnp.float32)
    if target is None:
        target = float(cfg.num_freqs - 1)
    gs = jnp.asarray(global_step, dtype=jnp.float32)
    return jnp.asarray(cfg.init_alpha + (target - cfg.init_alpha) * gs / float(step * 1000))


def _schedule_w(cfg: EmbedConfig, alpha: jax.Array) -> jax.Array | float:
    """BARF frequency window, shape (2*NF, 1) over the stacked sin/cos axis
    (reference :192-197)."""
    if not cfg.freq_schedule or cfg.num_freqs == 0:
        return 1.0
    freq_k = jnp.log2(jnp.asarray(cfg.freq_bands()))  # (NF,)
    diff = jnp.clip(alpha - freq_k, 0.0, 1.0)
    w = 0.5 * (1.0 - jnp.cos(jnp.pi * diff))  # (NF,)
    return jnp.repeat(w, 2)[:, None]  # (2*NF, 1): sin & cos per octave


def embed(
    cfg: EmbedConfig,
    inputs: jax.Array,
    dists: Optional[jax.Array] = None,
    state: Optional[dict] = None,
) -> Tuple[jax.Array, Optional[jax.Array]]:
    """Apply the (cutoff) positional encoding.

    inputs: (..., input_dims) signal to encode.
    dists:  (..., cutoff_dim) per-joint distances driving the gates
            (ignored when cfg.cutoff is False; defaults to `inputs` when
            dist_inputs is False, as in the reference).
    state:  {'tau', 'alpha', 'cutoff_dist'} — required when cfg.cutoff.

    Returns (embedded (..., out_dim), cutoff_weights or None).
    The channel layout matches the reference exactly:
    [input, sin(f0 x), cos(f0 x), sin(f1 x), ...] each of width input_dims.
    """
    freq_bands = cfg.freq_bands()
    NF = cfg.num_freqs

    if not cfg.cutoff:
        parts = [inputs] if cfg.include_input else []
        for f in freq_bands:
            parts.append(jnp.sin(inputs * f))
            parts.append(jnp.cos(inputs * f))
        if not parts:
            return inputs, None
        return jnp.concatenate(parts, axis=-1), None

    assert state is not None, "cutoff embedder needs {'tau','alpha','cutoff_dist'} state"
    tau = state["tau"]
    cutoff_dist = state["cutoff_dist"]  # (cutoff_dim,)

    if cfg.dist_inputs:
        # each joint's distance/cutoff gates `expand` consecutive channels
        e = cfg.expand
        assert dists is not None
        dists_e = jnp.repeat(dists, e, axis=-1)  # (..., NJ*e)
        cutoff_e = jnp.repeat(cutoff_dist, e, axis=-1)
        x = inputs
        gate_arg = tau * (dists_e - cutoff_e)
    else:
        dists = inputs if dists is None else dists
        x = inputs
        if cfg.cut_to_dist:
            x = cutoff_dist - x
        if cfg.shift_inputs:
            x = x * (2.0 / cutoff_dist) - 1.0
        gate_arg = tau * (dists - cutoff_dist)

    w = 1.0 - jax.nn.sigmoid(gate_arg)[..., None, :]  # (..., 1, D)

    if NF > 0:
        # [sin(f0 x), cos(f0 x), sin(f1 x), ...] emitted directly in final
        # layout via cos(x) = sin(x + pi/2): one broadcasted multiply-add-sin
        # instead of separate sin/cos tensors + an interleaving stack (a
        # relayout copy of the largest tensor in the renderer). TPU: the VPU
        # computes the fused chain; no intermediate hits HBM.
        fb2 = jnp.repeat(jnp.asarray(freq_bands), 2)[:, None]  # (2NF, 1)
        phase = jnp.tile(jnp.asarray([0.0, np.pi / 2.0], x.dtype), NF)[:, None]
        pe = jnp.sin(x[..., None, :] * fb2 + phase)  # (..., 2NF, D)
        pe = pe * _schedule_w(cfg, state["alpha"])
    else:
        pe = jnp.zeros((*x.shape[:-1], 0, x.shape[-1]), dtype=x.dtype)

    if cfg.include_input and cfg.cutoff_inputs:
        emb = jnp.concatenate([inputs[..., None, :], pe], axis=-2) * w
    elif cfg.include_input:
        emb = jnp.concatenate([inputs[..., None, :], pe * w], axis=-2)
    else:
        emb = pe * w

    if cfg.normalize:
        # L2-normalise each 3-vector group, zeroing gated-out joints
        # (reference :161-170; assumes trailing groups of 3)
        sh = emb.shape
        grouped = emb.reshape(-1, 3)
        is_zero = jnp.isclose(w.reshape(-1, w.shape[-1])[:, :1], 0.0, atol=1e-6)
        norm = jnp.linalg.norm(grouped, axis=-1, keepdims=True)
        grouped = grouped / jnp.maximum(norm, 1e-12)
        emb = jnp.where(is_zero.reshape(-1, 1), 0.0, grouped).reshape(sh)

    return emb.reshape(*emb.shape[:-2], -1), w
