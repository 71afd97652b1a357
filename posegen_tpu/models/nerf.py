"""The skeleton-conditioned NeRF field — params pytree + pure apply fns.

Capability parity with reference core/networks/nerf.py (8x256 density MLP
with skip, view branch producing RGB, optional per-frame codes) and its
`raw2outputs` alpha compositor, rebuilt functionally:

  params = init_nerf(key, cfg)                     # pytree of f32 arrays
  raw    = nerf_apply(cfg, params, x_pts, x_views, frame_idx)
  maps   = raw2outputs(raw, z_vals, rays_d, ...)

The MLP evaluates (N_rays*N_samples, C) batches as single large matmuls —
XLA tiles them onto the MXU; there is no netchunk loop.
"""

from __future__ import annotations

import dataclasses
from typing import Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np


@dataclasses.dataclass(frozen=True)
class NeRFConfig:
    """Static architecture config (reference nerf.py:12-44).

    input_ch: width of the keypoint (kp) embedding.
    input_ch_bones: width of the bone embedding (appended to kp for density).
    input_ch_views: width of the view embedding.
    """

    input_ch: int
    input_ch_bones: int = 0
    input_ch_views: int = 0
    depth: int = 8
    width: int = 256
    skips: Tuple[int, ...] = (4,)
    use_viewdirs: bool = True
    use_framecode: bool = False
    framecode_ch: int = 16
    n_framecodes: int = 0
    density_scale: float = 1.0
    density_type: str = "relu"  # or 'softplus'
    softplus_shift: float = 1.0

    @property
    def dnet_input(self) -> int:
        return self.input_ch + self.input_ch_bones

    @property
    def vnet_input(self) -> int:
        off = self.framecode_ch if self.use_framecode else 0
        return self.input_ch_views + off + self.width


def _init_linear(key, n_in: int, n_out: int) -> Dict[str, jax.Array]:
    """PyTorch-Linear-style init: U(-1/sqrt(fan_in), 1/sqrt(fan_in)).

    Weights are stored (in, out) so application is x @ W + b.
    """
    kw, kb = jax.random.split(key)
    bound = 1.0 / np.sqrt(n_in)
    return {
        "w": jax.random.uniform(kw, (n_in, n_out), jnp.float32, -bound, bound),
        "b": jax.random.uniform(kb, (n_out,), jnp.float32, -bound, bound),
    }


def linear(p: Dict[str, jax.Array], x: jax.Array) -> jax.Array:
    return x @ p["w"] + p["b"]


def init_nerf(key: jax.Array, cfg: NeRFConfig) -> Dict:
    """Initialise all parameters of one NeRF net (coarse or fine)."""
    keys = jax.random.split(key, cfg.depth + 5)
    pts_layers = []
    n_in = cfg.dnet_input
    for i in range(cfg.depth):
        # layer i takes width (+ skip concat) input for i-1 in skips
        if i == 0:
            fan_in = cfg.dnet_input
        elif (i - 1) in cfg.skips:
            fan_in = cfg.width + cfg.dnet_input
        else:
            fan_in = cfg.width
        pts_layers.append(_init_linear(keys[i], fan_in, cfg.width))

    params: Dict = {"pts_linears": pts_layers}
    k = cfg.depth
    if cfg.use_viewdirs:
        params["alpha_linear"] = _init_linear(keys[k], cfg.width, 1)
        params["feature_linear"] = _init_linear(keys[k + 1], cfg.width, cfg.width)
        params["views_linears"] = [_init_linear(keys[k + 2], cfg.vnet_input, cfg.width // 2)]
        params["rgb_linear"] = _init_linear(keys[k + 3], cfg.width // 2, 3)
    else:
        params["output_linear"] = _init_linear(keys[k], cfg.width, 4)
    if cfg.use_framecode:
        # xavier-normal init like the reference Optcodes (embedding.py:36-38)
        std = np.sqrt(2.0 / (cfg.n_framecodes + cfg.framecode_ch))
        params["framecodes"] = (
            jax.random.normal(keys[k + 4], (cfg.n_framecodes, cfg.framecode_ch)) * std
        )
    return params


def forward_density(cfg: NeRFConfig, params: Dict, x_pts: jax.Array) -> jax.Array:
    """Density trunk: (..., dnet_input) -> (..., width) feature
    (reference nerf.py:94-102)."""
    h = x_pts
    for i, layer in enumerate(params["pts_linears"]):
        h = jax.nn.relu(linear(layer, h))
        if i in cfg.skips:
            h = jnp.concatenate([x_pts, h], axis=-1)
    return h


def framecode_lookup(
    codes: jax.Array,
    idx: jax.Array,
    eval_mean: bool = False,
    idx_map: Optional[jax.Array] = None,
) -> jax.Array:
    """Per-frame code retrieval (reference networks/embedding.py:17-33).

    idx: (..., 1) integer frame index, or (..., 3) [idx0, idx1, w] for
    two-code interpolation. eval_mean: use the mean code (test-time idx<0).
    idx_map: optional remap table applied before lookup (the reference
    Optcodes' idx_map, embedding.py:12-20 — e.g. many views sharing codes).
    """
    if eval_mean:
        mean = jnp.mean(codes, axis=0, keepdims=True)
        return jnp.broadcast_to(mean, (*idx.shape[:-1], codes.shape[-1]))
    if idx.shape[-1] == 3:
        i0, i1 = idx[..., 0].astype(jnp.int32), idx[..., 1].astype(jnp.int32)
        if idx_map is not None:
            i0, i1 = jnp.take(idx_map, i0), jnp.take(idx_map, i1)
        w = idx[..., 2:3]
        return codes[i0] * (1.0 - w) + codes[i1] * w
    i = idx[..., 0].astype(jnp.int32)
    if idx_map is not None:
        i = jnp.take(idx_map, i)
    return codes[i]


def nerf_apply(
    cfg: NeRFConfig,
    params: Dict,
    x_pts: jax.Array,
    x_views: Optional[jax.Array] = None,
    frame_idx: Optional[jax.Array] = None,
    eval_mean_code: bool = False,
) -> jax.Array:
    """Full forward: embeddings -> raw (..., 4) [r, g, b, sigma]
    (reference nerf.py:104-148)."""
    h = forward_density(cfg, params, x_pts)
    if not cfg.use_viewdirs:
        return linear(params["output_linear"], h)

    alpha = linear(params["alpha_linear"], h)
    feat = linear(params["feature_linear"], h)
    if cfg.use_framecode:
        assert frame_idx is not None
        fc = framecode_lookup(params["framecodes"], frame_idx, eval_mean_code)
        x_views = jnp.concatenate([x_views, fc], axis=-1)
    hv = jnp.concatenate([feat, x_views], axis=-1)
    for layer in params["views_linears"]:
        hv = jax.nn.relu(linear(layer, hv))
    rgb = linear(params["rgb_linear"], hv)
    return jnp.concatenate([rgb, alpha], axis=-1)


def density_activation(cfg: NeRFConfig):
    if cfg.density_type == "relu":
        return jax.nn.relu
    if cfg.density_type == "softplus":
        return lambda x: jax.nn.softplus(x - cfg.softplus_shift)
    raise NotImplementedError(f"density activation {cfg.density_type!r}")


def raw2outputs(
    raw: jax.Array,
    z_vals: jax.Array,
    rays_d: jax.Array,
    raw_noise_std: float = 0.0,
    noise: Optional[jax.Array] = None,
    B: float = 1.0,
    act_fn=jax.nn.relu,
    rgb_eps: float = 0.001,
) -> Dict[str, jax.Array]:
    """Alpha-composite raw network outputs along each ray
    (reference nerf.py:150-205).

    raw: (N, S, 4); z_vals: (N, S); rays_d: (N, 3).
    noise: optional pre-drawn density noise (N, S) — pass
      `jax.random.normal(key, shape) * raw_noise_std * B` for the stochastic
      path or seeded values for golden parity; None means no noise.
    Returns rgb_map (N,3), disp_map, acc_map, weights, alpha.
    """
    dists = z_vals[..., 1:] - z_vals[..., :-1]
    dists = jnp.concatenate(
        [dists, jnp.full_like(dists[..., :1], 1e10)], axis=-1
    )
    dists = dists * jnp.linalg.norm(rays_d[..., None, :], axis=-1)

    rgb = jax.nn.sigmoid(raw[..., :3]) * (1.0 + 2.0 * rgb_eps) - rgb_eps

    sigma = raw[..., 3] / B
    if noise is not None:
        sigma = sigma + noise
    alpha = 1.0 - jnp.exp(-act_fn(sigma) * dists)

    # T_i = prod_{j<i} (1 - alpha_j + eps)
    trans = jnp.cumprod(1.0 - alpha + 1e-10, axis=-1)
    trans = jnp.concatenate([jnp.ones_like(trans[..., :1]), trans[..., :-1]], axis=-1)
    weights = alpha * trans

    rgb_map = jnp.sum(weights[..., None] * rgb, axis=-2)
    depth_map = jnp.sum(weights * z_vals, axis=-1)
    acc = jnp.sum(weights, axis=-1)
    disp_map = 1.0 / jnp.maximum(1e-10, depth_map / (acc + 1e-10))
    disp_map = jnp.where(jnp.isclose(acc, 0.0), 0.0, disp_map)
    acc_map = jnp.minimum(acc, 1.0)

    return {
        "rgb_map": rgb_map,
        "disp_map": disp_map,
        "acc_map": acc_map,
        "weights": weights,
        "alpha": alpha,
    }
