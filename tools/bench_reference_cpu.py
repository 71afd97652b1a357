"""Anchor the bench.py baseline: measure the ACTUAL reference renderer.

bench.py assumes REFERENCE_RAYS_PER_SEC = 25_000 on an A100 (the reference
publishes no numbers). This script produces the one honest data point we
can measure in this image: the reference RayCaster.render_rays (torch CPU,
via tests/reference_shims) vs our render_rays (jax CPU) on the SAME host,
same flagship architecture (8x256 coarse+fine, 64+16 samples, reldist/
relray/reldir + cutoff), same ray count.

Run:  python tools/bench_reference_cpu.py
Prints one JSON line {"ref_cpu_rays_per_sec", "ours_cpu_rays_per_sec",
"cpu_speedup"} and is quoted in RESULTS.md next to the A100 assumption.
"""

from __future__ import annotations

import json
import os
import sys
import time

os.environ.setdefault("JAX_PLATFORM_NAME", "cpu")
sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "tests"))

import jax

jax.config.update("jax_platforms", "cpu")

import numpy as np
import torch

import reference_shims

reference_shims.install()


def build_reference_caster(cfg, variables):
    """The reference RayCaster at our flagship config with our weights
    (mirrors tests/test_reference_parity.py::test_full_render_rays_parity)."""
    from core.cutoff_embedder import get_embedder as ref_get_embedder
    from core.networks.nerf import NeRF as RefNeRF
    from core.raycasters import RayCaster as RefRayCaster

    def build_ref_net(ours):
        net = RefNeRF(
            D=cfg.netdepth, W=cfg.netwidth,
            input_ch=cfg.embed_kp_cfg.out_dim,
            input_ch_bones=cfg.embed_bone_cfg.out_dim,
            input_ch_views=cfg.embed_view_cfg.out_dim,
            skips=[4],
            use_viewdirs=True,
        )
        sd = net.state_dict()
        with torch.no_grad():
            for i, lay in enumerate(ours["pts_linears"]):
                sd[f"pts_linears.{i}.weight"].copy_(torch.tensor(np.asarray(lay["w"]).T))
                sd[f"pts_linears.{i}.bias"].copy_(torch.tensor(np.asarray(lay["b"])))
            for name in ("alpha_linear", "feature_linear", "rgb_linear"):
                sd[f"{name}.weight"].copy_(torch.tensor(np.asarray(ours[name]["w"]).T))
                sd[f"{name}.bias"].copy_(torch.tensor(np.asarray(ours[name]["b"])))
            sd["views_linears.0.weight"].copy_(
                torch.tensor(np.asarray(ours["views_linears"][0]["w"]).T))
            sd["views_linears.0.bias"].copy_(
                torch.tensor(np.asarray(ours["views_linears"][0]["b"])))
        net.load_state_dict(sd)
        return net

    cut = torch.tensor(np.asarray(variables["embed_kp"]["cutoff_dist"]))
    mk_cut_kwargs = lambda dist_inputs: {
        "cutoff": True, "cutoff_dim": 24, "cutoff_dist": cut.clone(),
        "cutoff_inputs": True, "opt_cutoff": False, "cut_to_dist": False,
        "dist_inputs": dist_inputs, "shift_inputs": False,
        "freq_schedule": False, "init_alpha": 0.0, "normalize": False,
    }
    embed_fn, _ = ref_get_embedder(
        cfg.multires, input_dims=24, cutoff_kwargs=mk_cut_kwargs(False)
    )
    embeddirs_fn, _ = ref_get_embedder(
        cfg.multires_views, input_dims=72, cutoff_kwargs=mk_cut_kwargs(True)
    )
    embedbones_fn, _ = ref_get_embedder(0, input_dims=72, cutoff_kwargs={"cutoff": False})
    with torch.no_grad():
        embed_fn.tau.fill_(float(variables["embed_kp"]["tau"]))
        embeddirs_fn.tau.fill_(float(variables["embed_view"]["tau"]))

    joint_coords = torch.eye(3).view(1, 1, 3, 3).expand(1, 24, 3, 3).contiguous()
    caster = RefRayCaster(
        build_ref_net(variables["coarse"]),
        embed_fn, embedbones_fn, embeddirs_fn,
        network_fine=build_ref_net(variables["fine"]),
        joint_coords=joint_coords,
    )
    caster.eval()
    return caster


def main(n_rays: int = 1024, iters_ref: int = 4, iters_ours: int = 8) -> None:
    import torch.nn.functional as TF

    from core.encoders import RelDistEncoder, VecNormEncoder, WorldToLocalEncoder

    from posegen_tpu.render.raycast import RaycastConfig, render_rays
    from posegen_tpu.utils.fixtures import make_pose_ctx, make_rays

    cfg = RaycastConfig()  # flagship: 8x256, 64 + 16 samples, multires 7/4
    from posegen_tpu.render.raycast import init_raycaster

    variables = init_raycaster(jax.random.PRNGKey(0), cfg)
    ctx = make_pose_ctx(seed=0)
    ro, rd = make_rays(n_rays, seed=1)

    caster = build_reference_caster(cfg, variables)
    preproc = {
        "density_scale": 1.0,
        "density_fn": TF.relu,
        "pts_tr_fn": WorldToLocalEncoder(),
        "kp_input_fn": RelDistEncoder(24),
        "view_input_fn": VecNormEncoder(24),
        "bone_input_fn": VecNormEncoder(24),
    }
    n = n_rays
    ray_batch = torch.tensor(np.concatenate(
        [np.asarray(ro), np.asarray(rd),
         np.full((n, 1), cfg.near, np.float32),
         np.full((n, 1), cfg.far, np.float32),
         np.asarray(rd)], axis=-1,
    ))
    tile = lambda a: torch.tensor(
        np.tile(np.asarray(a), (n,) + (1,) * (np.asarray(a).ndim - 1))
    )
    kwargs = dict(
        skts=tile(ctx.skts), bones=tile(ctx.bones),
        cyls=tile(ctx.cyls),
        N_importance=cfg.N_importance, perturb=0.0, raw_noise_std=0.0,
        preproc_kwargs=preproc,
    )
    kp = tile(ctx.kps)
    with torch.no_grad():
        caster.render_rays(ray_batch, cfg.N_samples, kp, **kwargs)  # warmup
        t0 = time.perf_counter()
        for _ in range(iters_ref):
            caster.render_rays(ray_batch, cfg.N_samples, kp, **kwargs)
        ref_dt = (time.perf_counter() - t0) / iters_ref
    ref_rps = n_rays / ref_dt

    fn = jax.jit(
        lambda p, o, d, c: render_rays(
            cfg, p, o, d, c, perturb=0.0, raw_noise_std=0.0, coarse_rgb=False
        )["rgb_map"]
    )
    jax.block_until_ready(fn(variables, ro, rd, ctx))
    t0 = time.perf_counter()
    for _ in range(iters_ours):
        out = fn(variables, ro, rd, ctx)
    jax.block_until_ready(out)
    ours_dt = (time.perf_counter() - t0) / iters_ours
    ours_rps = n_rays / ours_dt

    print(json.dumps({
        "ref_cpu_rays_per_sec": round(ref_rps, 1),
        "ours_cpu_rays_per_sec": round(ours_rps, 1),
        "cpu_speedup": round(ours_rps / ref_rps, 2),
        "n_rays": n_rays,
    }))


if __name__ == "__main__":
    main()
