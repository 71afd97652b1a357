"""The ray engine: cylinder clip -> stratified -> encode -> MLP -> composite
-> importance -> fine pass, as one pure jittable function.

Capability parity with reference core/raycasters.py:326-822 (`RayCaster`)
and core/trainer.py:64-147 (`render`/`batchify_rays`), redesigned TPU-first:

  * No chunk/netchunk python loops — a whole ray batch is one traced
    computation; XLA fuses the encoders into the MLP matmuls.
  * Static shapes: callers pad ray batches; masked lanes are free.
  * The fine pass re-encodes the merged sample set directly (equivalent to
    the reference's gather-merge of encodings, but one straight-line
    computation instead of scatter/gather bookkeeping).
  * Randomness is explicit: a single PRNG key is split per consumer;
    deterministic golden-parity paths take pre-drawn noise.
"""

from __future__ import annotations

import dataclasses
import os
from typing import Any, Dict, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp

from posegen_tpu.models import nerf as nerf_mod
from posegen_tpu.models.nerf import NeRFConfig, density_activation, init_nerf, nerf_apply
from posegen_tpu.ops import embedding as emb_mod
from posegen_tpu.ops import encoders as enc
from posegen_tpu.ops.embedding import identity_config as emb_identity
from posegen_tpu.ops import sampling as samp
from posegen_tpu.ops.embedding import EmbedConfig
from posegen_tpu.skeleton.skeleton import SMPL_SKELETON, Skeleton


class PoseCtx(NamedTuple):
    """Per-ray pose conditioning (broadcastable leading dim 1 or N_rays)."""

    kps: jax.Array  # (B, J, 3)
    skts: jax.Array  # (B, J, 4, 4)
    bones: jax.Array  # (B, J, 3)
    cyls: jax.Array  # (B, 5)
    cam_idxs: Optional[jax.Array] = None  # (B, 1|3) framecode index


@dataclasses.dataclass(frozen=True)
class RaycastConfig:
    """Everything static about the renderer (hashable -> jit static arg).

    Mirrors the knobs assembled by reference create_raycaster
    (core/raycasters.py:17-184).
    """

    n_joints: int = 24
    i_embed: int = 0  # -1 = identity (no PE, no cutoff; reference get_embedder i==-1)
    kp_dist_type: str = "reldist"
    view_type: str = "relray"
    bone_type: str = "reldir"
    multires: int = 7
    multires_views: int = 4
    multires_bones: int = 0
    use_viewdirs: bool = True
    use_cutoff: bool = True
    cutoff_viewdir: bool = True
    cutoff_bones: bool = False
    cutoff_inputs: bool = True
    cut_to_dist: bool = False
    cutoff_shift: bool = False
    normalize_cutoff: bool = False
    freq_schedule: bool = False
    init_freq: float = 0.0
    opt_framecode: bool = False
    framecode_ch: int = 16
    n_framecodes: int = 0
    netdepth: int = 8
    netwidth: int = 256
    netdepth_fine: Optional[int] = None  # None = match netdepth
    netwidth_fine: Optional[int] = None  # None = match netwidth
    N_samples: int = 64
    N_importance: int = 16
    single_net: bool = False
    perturb: float = 1.0
    raw_noise_std: float = 0.0
    ray_noise_std: float = 0.0
    lindisp: bool = False
    density_scale: float = 1.0
    density_type: str = "relu"
    softplus_shift: float = 1.0
    rgb_eps: float = 0.001
    near: float = 0.35
    far: float = 2.75

    # ----- derived static dims -----
    @property
    def kp_dims(self) -> Tuple[int, int]:
        return enc.kp_encoder_dims(self.kp_dist_type, self.n_joints)

    @property
    def embed_kp_cfg(self) -> EmbedConfig:
        input_dims, cutoff_dims = self.kp_dims
        if self.i_embed == -1:
            return emb_identity(input_dims)
        return EmbedConfig(
            num_freqs=self.multires,
            input_dims=input_dims,
            cutoff=self.use_cutoff,
            cutoff_dim=cutoff_dims,
            dist_inputs=input_dims != cutoff_dims,
            cutoff_inputs=self.cutoff_inputs,
            cut_to_dist=self.cut_to_dist,
            shift_inputs=self.cutoff_shift,
            normalize=self.normalize_cutoff,
            freq_schedule=self.freq_schedule,
            init_alpha=self.init_freq,
        )

    @property
    def embed_bone_cfg(self) -> Optional[EmbedConfig]:
        dims = enc.bone_encoder_dims(self.bone_type, self.n_joints)
        if dims == 0:
            return None
        if self.i_embed == -1:
            return emb_identity(dims)
        return EmbedConfig(
            num_freqs=self.multires_bones,
            input_dims=dims,
            cutoff=self.use_cutoff and self.cutoff_bones,
            cutoff_dim=self.n_joints,
            dist_inputs=True,
            cutoff_inputs=self.cutoff_inputs,
            freq_schedule=self.freq_schedule,
            init_alpha=self.init_freq,
        )

    @property
    def embed_view_cfg(self) -> Optional[EmbedConfig]:
        if not self.use_viewdirs:
            return None
        dims = enc.view_encoder_dims(self.view_type, self.n_joints)
        if self.i_embed == -1:
            return emb_identity(dims)
        return EmbedConfig(
            num_freqs=self.multires_views,
            input_dims=dims,
            cutoff=self.use_cutoff and self.cutoff_viewdir,
            cutoff_dim=self.n_joints,
            dist_inputs=True,
            cutoff_inputs=self.cutoff_inputs,
            freq_schedule=self.freq_schedule,
            init_alpha=self.init_freq,
        )

    @property
    def nerf_cfg(self) -> NeRFConfig:
        bone_cfg = self.embed_bone_cfg
        view_cfg = self.embed_view_cfg
        return NeRFConfig(
            input_ch=self.embed_kp_cfg.out_dim,
            input_ch_bones=bone_cfg.out_dim if bone_cfg is not None else 0,
            input_ch_views=view_cfg.out_dim if view_cfg is not None else 0,
            depth=self.netdepth,
            width=self.netwidth,
            use_viewdirs=self.use_viewdirs,
            use_framecode=self.opt_framecode,
            framecode_ch=self.framecode_ch,
            n_framecodes=self.n_framecodes,
            density_scale=self.density_scale,
            density_type=self.density_type,
            softplus_shift=self.softplus_shift,
        )


def init_raycaster(
    key: jax.Array,
    cfg: RaycastConfig,
    skel: Skeleton = SMPL_SKELETON,
    ext_scale: float = 0.001,
    cutoff_mm: float = 500.0,
) -> Dict[str, Any]:
    """Initialise the full parameter/state pytree of the renderer."""
    k_coarse, k_fine = jax.random.split(key)
    nerf_cfg = cfg.nerf_cfg
    params: Dict[str, Any] = {"coarse": init_nerf(k_coarse, nerf_cfg)}
    if cfg.N_importance > 0 and not cfg.single_net:
        fine_cfg = dataclasses.replace(
            nerf_cfg,
            depth=cfg.netdepth_fine or cfg.netdepth,
            width=cfg.netwidth_fine or cfg.netwidth,
        )
        params["fine"] = init_nerf(k_fine, fine_cfg)

    cutoff_dist = jnp.full((skel.n_joints,), cutoff_mm * ext_scale, dtype=jnp.float32)
    # default uses a uniform cutoff_mm like reference create_raycaster
    # (cutoff_kwargs['cutoff_dist'] = args.cutoff_mm * args.ext_scale)
    params["embed_kp"] = emb_mod.init_embed_state(cfg.embed_kp_cfg, cutoff_dist)
    if cfg.embed_bone_cfg is not None:
        params["embed_bone"] = emb_mod.init_embed_state(cfg.embed_bone_cfg, cutoff_dist)
    if cfg.embed_view_cfg is not None:
        params["embed_view"] = emb_mod.init_embed_state(cfg.embed_view_cfg, cutoff_dist)
    return params


def update_embed_states(
    params: Dict[str, Any],
    cfg: RaycastConfig,
    global_step,
    cutoff_step: int = 250,
    cutoff_rate: float = 10.0,
    freq_schedule_step: int = 5,
) -> Dict[str, Any]:
    """Anneal tau / BARF alpha in the embed states
    (reference raycasters.py:731-748)."""
    out = dict(params)
    for name, ecfg in (
        ("embed_kp", cfg.embed_kp_cfg),
        ("embed_bone", cfg.embed_bone_cfg),
        ("embed_view", cfg.embed_view_cfg),
    ):
        if ecfg is None or name not in params:
            continue
        st = dict(params[name])
        if ecfg.cutoff:
            st["tau"] = emb_mod.update_tau(ecfg, global_step, cutoff_step, cutoff_rate)
        if ecfg.freq_schedule:
            st["alpha"] = emb_mod.update_alpha(
                ecfg, global_step, freq_schedule_step, float(cfg.multires - 1)
            )
        out[name] = st
    return out


def encode_inputs(
    cfg: RaycastConfig,
    params: Dict[str, Any],
    pts: jax.Array,
    rays_d: jax.Array,
    ctx: PoseCtx,
) -> Tuple[jax.Array, Optional[jax.Array], Optional[jax.Array]]:
    """Points + pose -> (x_pts (N,S,Ckp+Cbone), x_views, cutoff_w)
    (reference raycasters.py:476-555)."""
    N = pts.shape[0]
    kps = jnp.broadcast_to(ctx.kps, (N, *ctx.kps.shape[1:]))
    skts = jnp.broadcast_to(ctx.skts, (N, *ctx.skts.shape[1:]))
    bones = jnp.broadcast_to(ctx.bones, (N, *ctx.bones.shape[1:]))

    pts_t = enc.transform_batch_pts(pts, skts)
    rays_t = enc.transform_batch_rays(rays_d, skts)

    v = enc.encode_kp(cfg.kp_dist_type, pts, pts_t, kps)
    r = enc.encode_bone(cfg.bone_type, pts_t, bones)
    d = enc.encode_view(cfg.view_type, rays_t, pts_t, rays_d) if cfg.use_viewdirs else None

    if "Dist" in cfg.kp_dist_type or cfg.kp_dist_type == "reldist":
        j_dists = v
    else:
        j_dists = jnp.linalg.norm(pts[:, :, None] - kps[:, None], axis=-1)

    v_e, cw = emb_mod.embed(cfg.embed_kp_cfg, v, dists=j_dists, state=params["embed_kp"])
    parts = [v_e]
    if cfg.embed_bone_cfg is not None and r is not None:
        r_e, _ = emb_mod.embed(cfg.embed_bone_cfg, r, dists=j_dists, state=params["embed_bone"])
        parts.append(r_e)
    x_pts = jnp.concatenate(parts, axis=-1)

    x_views = None
    if d is not None:
        x_views, _ = emb_mod.embed(
            cfg.embed_view_cfg, d, dists=j_dists, state=params["embed_view"]
        )
    return x_pts, x_views, cw


def _run_net(
    cfg: RaycastConfig,
    net_params: Dict,
    params: Dict[str, Any],
    pts: jax.Array,
    rays_d: jax.Array,
    ctx: PoseCtx,
    eval_mean_code: bool,
    use_fused: bool = False,
    density_only: bool = False,
) -> jax.Array:
    """Encode and evaluate one NeRF net over (N, S) samples -> raw (N, S, 4).

    density_only (fused eval path only): skip the view branch — the rgb rows
    come back zero; sigma is exact."""
    if use_fused:
        from posegen_tpu.kernels import field as fused

        return fused.fused_run_net(
            cfg, net_params, params["embed_kp"], pts, rays_d, ctx,
            interpret=jax.default_backend() == "cpu",
            trainable=use_fused in ("train", "full"),
            eval_mean_code=eval_mean_code,
            input_grads=use_fused == "full",
            density_only=density_only and use_fused is True,
            view_embed_state=params.get("embed_view"),
        )
    x_pts, x_views, _ = encode_inputs(cfg, params, pts, rays_d, ctx)
    frame_idx = None
    if cfg.opt_framecode:
        S = pts.shape[1]
        idxs = ctx.cam_idxs
        if idxs is None:
            # mean code (reference idx < 0 eval path, embedding.py:17-33);
            # the zeros only shape the lookup
            idxs = jnp.zeros((pts.shape[0], 1), jnp.int32)
            eval_mean_code = True
        frame_idx = jnp.broadcast_to(
            idxs[:, None, :], (pts.shape[0], S, idxs.shape[-1])
        )
    if x_views is not None:
        return nerf_apply(
            cfg.nerf_cfg, net_params, x_pts, x_views, frame_idx, eval_mean_code
        )
    return nerf_apply(cfg.nerf_cfg, net_params, x_pts, None, frame_idx, eval_mean_code)


def render_rays(
    cfg: RaycastConfig,
    params: Dict[str, Any],
    rays_o: jax.Array,
    rays_d: jax.Array,
    ctx: PoseCtx,
    key: Optional[jax.Array] = None,
    perturb: Optional[float] = None,
    raw_noise_std: Optional[float] = None,
    eval_mean_code: bool = False,
    det_noise: Optional[Dict[str, jax.Array]] = None,
    use_fused: Optional[bool] = None,
    coarse_rgb: bool = True,
) -> Dict[str, jax.Array]:
    """Volume-render a batch of rays (reference raycasters.py:361-474).

    coarse_rgb=False (eval-only fast path): the coarse pass skips its view
    branch on the fused kernel — rgb0 comes back zero while weights / acc0 /
    disp0 stay exact (they depend on sigma only). Callers that read rgb0
    (training, golden tests) must keep the default.

    rays_o/rays_d: (N, 3). ctx fields broadcast (leading 1 or N).
    perturb/raw_noise_std default to the config (pass 0.0 for eval).
    det_noise: {'coarse': (N,S), 'importance': (N,I), 'sigma': (N,S+I), ...}
      optional deterministic noise for golden-parity tests.
    use_fused: run the Pallas fused field kernel (kernels/field.py); None =
      auto (on whenever the config/pose shape qualifies — the inference path;
      training differentiates through the XLA path instead).
    Returns rgb_map/disp_map/acc_map/alpha (+ *0 coarse copies).
    """
    perturb = cfg.perturb if perturb is None else perturb
    raw_noise_std = cfg.raw_noise_std if raw_noise_std is None else raw_noise_std
    if use_fused is None:
        from posegen_tpu.kernels.field import (
            fused_disqualification,
            warn_fused_fallback,
        )

        # auto-dispatch only on real TPUs: the CPU fallback would run the
        # kernel in the (slow) interpreter; tests opt in explicitly
        use_fused = False
        if jax.default_backend() == "tpu":
            reason = fused_disqualification(cfg, ctx, params["coarse"])
            use_fused = reason is None
            if reason is not None:
                warn_fused_fallback("render_rays", reason)
    act = density_activation(cfg.nerf_cfg)
    dn = det_noise or {}

    keys = list(jax.random.split(key, 4)) if key is not None else [None] * 4

    near, far = samp.get_near_far_in_cylinder(
        rays_o, rays_d, jnp.broadcast_to(ctx.cyls, (rays_o.shape[0], 5)),
        near=cfg.near, far=cfg.far,
    )
    z_vals = samp.sample_from_lineseg(
        near, far, cfg.N_samples, perturb=perturb, lindisp=cfg.lindisp,
        key=keys[0], det_noise=dn.get("coarse"),
    )
    pts = rays_o[:, None] + rays_d[:, None] * z_vals[..., None]

    coarse_density_only = (
        not coarse_rgb
        and cfg.N_importance > 0
        and not cfg.single_net  # single-net merges the coarse raw into fine
    )
    raw_fc = None  # fine-net raw on the coarse samples (dual-net kernel)
    if (
        use_fused is True
        and coarse_density_only
        and not os.environ.get("POSEGEN_NO_DUAL_EVAL")
    ):
        from posegen_tpu.kernels import field as fused

        if fused.supports_dual_eval(cfg, ctx, params["coarse"]):
            # dual-net coarse pass: encode each sample once, run the coarse
            # trunk (density for importance sampling) AND the fine net (its
            # raw for the final composite) in the same kernel — the fine
            # pass below then only evaluates the fresh samples, killing the
            # duplicate encode of the shared N_samples (the dominant fine-
            # kernel cost, RESULTS.md roofline)
            raw_c, raw_fc = fused.fused_run_net(
                cfg, params["coarse"], params["embed_kp"], pts, rays_d, ctx,
                interpret=jax.default_backend() == "cpu",
                eval_mean_code=eval_mean_code, density_only=True,
                view_embed_state=params.get("embed_view"),
                dual_params=params.get("fine", params["coarse"]),
            )
    if raw_fc is None:
        raw_c = _run_net(
            cfg, params["coarse"], params, pts, rays_d, ctx, eval_mean_code,
            use_fused, density_only=coarse_density_only,
        )
    noise_c = None
    if raw_noise_std > 0.0:
        if "sigma0" in dn:
            noise_c = dn["sigma0"]
        elif keys[1] is not None:
            noise_c = (
                jax.random.normal(keys[1], raw_c.shape[:-1]) * raw_noise_std * cfg.density_scale
            )
    out_c = nerf_mod.raw2outputs(
        raw_c, z_vals, rays_d, noise=noise_c, B=cfg.density_scale,
        act_fn=act, rgb_eps=cfg.rgb_eps,
    )

    if cfg.N_importance <= 0:
        return _collect(out_c, None)

    z_all, z_samples, sorted_idxs = samp.isample_from_lineseg(
        z_vals, out_c["weights"], cfg.N_importance, det=(perturb == 0.0),
        is_only=cfg.single_net, key=keys[2], det_noise=dn.get("importance"),
        need_idxs=cfg.single_net,  # only the single-net merge needs indices
    )

    fine_params = params.get("fine", params["coarse"])
    if raw_fc is not None:
        # the dual kernel already evaluated the fine net on the coarse
        # samples; only the fresh samples need a pass. Raws merge by z
        # through a multi-operand co-sort — an argsort + take_along_axis
        # pair here measured +13 ms of glue at the bench shape (same
        # reason the z-merge is value-only, ops/sampling.py need_idxs)
        pts_is = rays_o[:, None] + rays_d[:, None] * z_samples[..., None]
        raw_is = _run_net(cfg, fine_params, params, pts_is, rays_d, ctx,
                          eval_mean_code, use_fused)
        z_cat = jnp.concatenate([z_vals, z_samples], axis=-1)
        raw_cat = jnp.concatenate([raw_fc, raw_is], axis=1)
        srt = jax.lax.sort(
            (z_cat,) + tuple(raw_cat[..., i] for i in range(4)),
            dimension=-1, num_keys=1,
        )
        z_all = srt[0]
        raw_f = jnp.stack(srt[1:], axis=-1)
    elif not cfg.single_net:
        # re-encode the merged, sorted sample set in one pass (equivalent to
        # the reference's encoding gather-merge, raycasters.py:446-469)
        pts_all = rays_o[:, None] + rays_d[:, None] * z_all[..., None]
        raw_f = _run_net(cfg, fine_params, params, pts_all, rays_d, ctx, eval_mean_code, use_fused)
    else:
        # single-net: evaluate only the new samples, merge raws by sort order
        pts_is = rays_o[:, None] + rays_d[:, None] * z_samples[..., None]
        raw_is = _run_net(cfg, fine_params, params, pts_is, rays_d, ctx, eval_mean_code, use_fused)
        raw_cat = jnp.concatenate([raw_c, raw_is], axis=1)
        raw_f = jnp.take_along_axis(raw_cat, sorted_idxs[..., None], axis=1)

    noise_f = None
    if raw_noise_std > 0.0:
        if "sigma" in dn:
            noise_f = dn["sigma"]
        elif keys[3] is not None:
            noise_f = (
                jax.random.normal(keys[3], raw_f.shape[:-1]) * raw_noise_std * cfg.density_scale
            )
    out_f = nerf_mod.raw2outputs(
        raw_f, z_all, rays_d, noise=noise_f, B=cfg.density_scale,
        act_fn=act, rgb_eps=cfg.rgb_eps,
    )
    return _collect(out_f, out_c)


def _collect(ret: Dict[str, jax.Array], ret0: Optional[Dict[str, jax.Array]]) -> Dict[str, jax.Array]:
    """Output dict layout (reference raycasters.py:711-724)."""
    out = {
        "rgb_map": ret["rgb_map"],
        "disp_map": ret["disp_map"],
        "acc_map": ret["acc_map"],
        "alpha": ret["alpha"],
    }
    if ret0 is not None:
        out.update(
            rgb0=ret0["rgb_map"], disp0=ret0["disp_map"],
            acc0=ret0["acc_map"], alpha0=ret0["alpha"],
        )
    return out


def render_pts_density(
    cfg: RaycastConfig,
    params: Dict[str, Any],
    pts: jax.Array,
    ctx: PoseCtx,
    use_fine: bool = True,
) -> jax.Array:
    """Raw density at arbitrary points (mesh extraction / density probes,
    reference raycasters.py:580-648). pts: (N, S, 3) -> (N, S, 1)."""
    x_pts, _, _ = encode_inputs(cfg, params, pts, jnp.zeros((pts.shape[0], 3)), ctx)
    net = params.get("fine", params["coarse"]) if use_fine else params["coarse"]
    h = nerf_mod.forward_density(cfg.nerf_cfg, net, x_pts)
    if cfg.use_viewdirs:
        return nerf_mod.linear(net["alpha_linear"], h)
    return nerf_mod.linear(net["output_linear"], h)[..., 3:4]


def render_mesh_density(
    cfg: RaycastConfig,
    params: Dict[str, Any],
    ctx: PoseCtx,
    radius: float = 1.0,
    res: int = 64,
) -> jax.Array:
    """Density on a (res+1)^3 grid centred at the root joint
    (reference raycasters.py:579-595). Returns (res+1, res+1, res+1)."""
    t = jnp.linspace(-radius, radius, res + 1)
    grid = jnp.stack(jnp.meshgrid(t, t, t, indexing="xy"), axis=-1).reshape(-1, 1, 3)
    grid = grid + ctx.kps[0, 0]
    sigma = render_pts_density(cfg, params, grid, ctx)
    side = res + 1
    return sigma.reshape(side, side, side).transpose(1, 0, 2)
