"""Golden parity vs the ACTUAL reference implementation (torch CPU).

Runs the reference's sampling / embedding / encoding / compositing / FK code
(from /root/reference, via tests/reference_shims) on the same inputs as our
JAX rebuild and asserts numerical agreement. This is the reference's own
`pytest=True` deterministic-noise strategy (SURVEY.md §4) made real.
"""

import sys

import numpy as np
import pytest

sys.path.insert(0, "tests")
import reference_shims

reference_shims.install()

import torch  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from posegen_tpu.models.nerf import raw2outputs  # noqa: E402
from posegen_tpu.ops import embedding as emb  # noqa: E402
from posegen_tpu.ops import encoders as enc  # noqa: E402
from posegen_tpu.ops import sampling as samp  # noqa: E402
from posegen_tpu.skeleton.kinematics import smpl_l2ws  # noqa: E402
from posegen_tpu.skeleton.geometry import get_kp_bounding_cylinder  # noqa: E402

TOL = dict(rtol=2e-4, atol=2e-5)


def test_sample_from_lineseg_parity(rng):
    from core.utils import ray_utils as ref

    near = rng.uniform(0.3, 0.6, (16, 1)).astype(np.float32)
    far = rng.uniform(2.0, 3.0, (16, 1)).astype(np.float32)
    ref_z = ref.sample_from_lineseg(
        torch.tensor(near), torch.tensor(far), 16, 32, perturb=1.0, pytest=True
    ).numpy()
    np.random.seed(0)
    det_noise = np.random.rand(16, 32).astype(np.float64)
    ours = np.asarray(
        samp.sample_from_lineseg(
            jnp.asarray(near), jnp.asarray(far), 32, perturb=1.0,
            det_noise=jnp.asarray(det_noise.astype(np.float32)),
        )
    )
    np.testing.assert_allclose(ours, ref_z, **TOL)


def test_isample_parity(rng):
    from core.utils import ray_utils as ref

    z = np.sort(rng.uniform(0.5, 2.5, (8, 32)), -1).astype(np.float32)
    w = rng.uniform(0, 1, (8, 32)).astype(np.float32)
    ref_all, ref_s, ref_idx = ref.isample_from_lineseg(
        torch.tensor(z), torch.tensor(w), 16, det=True, pytest=True
    )
    np.random.seed(0)
    u = np.broadcast_to(np.linspace(0, 1, 16), (8, 16)).astype(np.float32)
    ours_all, ours_s, ours_idx = samp.isample_from_lineseg(
        jnp.asarray(z), jnp.asarray(w), 16, det=True, det_noise=jnp.asarray(u)
    )
    np.testing.assert_allclose(np.asarray(ours_s), ref_s.numpy(), **TOL)
    np.testing.assert_allclose(np.asarray(ours_all), ref_all.numpy(), **TOL)

    # single-net max-filtered weights variant
    ref_all2, ref_s2, _ = ref.isample_from_lineseg(
        torch.tensor(z), torch.tensor(w), 16, det=True, pytest=True, is_only=True
    )
    ours_all2, ours_s2, _ = samp.isample_from_lineseg(
        jnp.asarray(z), jnp.asarray(w), 16, det=True, is_only=True,
        det_noise=jnp.asarray(u),
    )
    np.testing.assert_allclose(np.asarray(ours_s2), ref_s2.numpy(), **TOL)


def test_near_far_cylinder_parity(rng):
    from core.utils import ray_utils as ref

    n = 64
    rays_o = (rng.standard_normal((n, 3)) * 0.1 + np.array([0, 0.2, 2.5])).astype(
        np.float32
    )
    dirs = np.array([0, 0, -1.0]) + rng.uniform(-0.4, 0.4, (n, 3))
    rays_d = (dirs / np.linalg.norm(dirs, axis=-1, keepdims=True)).astype(np.float32)
    cyl = np.tile(
        np.array([[0.05, -0.1, 0.8, 0.9, -1.0]], np.float32), (n, 1)
    )
    ref_near, ref_far = ref.get_near_far_in_cylinder(
        torch.tensor(rays_o), torch.tensor(rays_d), torch.tensor(cyl)
    )
    ours_near, ours_far = samp.get_near_far_in_cylinder(
        jnp.asarray(rays_o), jnp.asarray(rays_d), jnp.asarray(cyl)
    )
    np.testing.assert_allclose(np.asarray(ours_near), ref_near.numpy(), rtol=1e-3, atol=1e-4)
    np.testing.assert_allclose(np.asarray(ours_far), ref_far.numpy(), rtol=1e-3, atol=1e-4)


def test_raw2outputs_parity(rng):
    from core.networks.nerf import NeRF

    n, s = 12, 24
    raw = rng.standard_normal((n, s, 4)).astype(np.float32)
    z = np.sort(rng.uniform(0.5, 2.5, (n, s)), -1).astype(np.float32)
    rd = rng.standard_normal((n, 3)).astype(np.float32)

    # raw2outputs reads no instance state; B=1.0 matches our density_scale
    ref_out = NeRF.raw2outputs(
        None, torch.tensor(raw), torch.tensor(z), torch.tensor(rd),
        raw_noise_std=0.0, B=1.0,
    )
    ours = raw2outputs(jnp.asarray(raw), jnp.asarray(z), jnp.asarray(rd))
    for key, tol in (
        ("rgb_map", TOL), ("weights", TOL), ("alpha", TOL), ("acc_map", TOL),
        ("disp_map", dict(rtol=1e-3, atol=1e-4)),
    ):
        np.testing.assert_allclose(
            np.asarray(ours[key]), ref_out[key].numpy(), err_msg=key, **tol
        )


def test_encoder_parity(rng):
    from core import encoders as ref_enc

    n, s, j = 6, 10, 24
    pts = rng.standard_normal((n, s, 3)).astype(np.float32)
    rays_d = rng.standard_normal((n, 3)).astype(np.float32)
    # valid rigid skts from a real pose
    bones = (rng.standard_normal((1, 24, 3)) * 0.3).astype(np.float32)
    l2ws = np.asarray(smpl_l2ws(jnp.asarray(bones)))[0]
    skts = np.linalg.inv(l2ws).astype(np.float32)
    skts_b = np.tile(skts[None], (n, 1, 1, 1))

    ref_pts_t = ref_enc.transform_batch_pts(
        torch.tensor(pts), torch.tensor(skts_b)
    ).numpy()
    ours_pts_t = np.asarray(enc.transform_batch_pts(jnp.asarray(pts), jnp.asarray(skts_b)))
    np.testing.assert_allclose(ours_pts_t, ref_pts_t, rtol=1e-4, atol=1e-5)

    ref_rays_t = ref_enc.transform_batch_rays(
        torch.tensor(rays_d), torch.tensor(rays_d[:, None]), torch.tensor(skts_b)
    ).numpy()
    ours_rays_t = np.asarray(
        enc.transform_batch_rays(jnp.asarray(rays_d), jnp.asarray(skts_b))
    )
    np.testing.assert_allclose(ours_rays_t, ref_rays_t, rtol=1e-4, atol=1e-5)


def test_cutoff_embedder_parity(rng):
    from core.cutoff_embedder import get_embedder

    n, s, j = 4, 8, 24
    v = rng.uniform(0.0, 1.5, (n, s, j)).astype(np.float32)

    cutoff_kwargs = {
        "cutoff": True,
        "cutoff_dim": j,
        "cutoff_dist": torch.ones(j) * 0.5,
        "cutoff_inputs": True,
        "opt_cutoff": False,
        "cut_to_dist": False,
        "dist_inputs": False,
        "shift_inputs": False,
        "freq_schedule": False,
        "init_alpha": 0.0,
        "normalize": False,
    }
    ref_embed, ref_dims = get_embedder(
        7, input_dims=j, skel_type=None, cutoff_kwargs=cutoff_kwargs
    )
    ref_out, _ = ref_embed(torch.tensor(v), dists=torch.tensor(v))

    cfg = emb.EmbedConfig(
        num_freqs=7, input_dims=j, cutoff=True, cutoff_dim=j,
        cutoff_inputs=True, dist_inputs=False,
    )
    state = {
        "tau": jnp.asarray(float(ref_embed.tau)),
        "alpha": jnp.asarray(0.0),
        "cutoff_dist": jnp.ones((j,)) * 0.5,
    }
    ours, _ = emb.embed(cfg, jnp.asarray(v), dists=jnp.asarray(v), state=state)
    assert ours.shape[-1] == ref_dims
    np.testing.assert_allclose(
        np.asarray(ours), ref_out.detach().numpy(), rtol=1e-3, atol=2e-4
    )


def test_fk_parity(rng):
    from core.utils.skeleton_utils import get_smpl_l2ws

    bones = (rng.standard_normal((24, 3)) * 0.4).astype(np.float32)
    ref_l2ws = get_smpl_l2ws(bones, scale=0.5).astype(np.float32)
    ours = np.asarray(smpl_l2ws(jnp.asarray(bones), scale=0.5))
    np.testing.assert_allclose(ours, ref_l2ws, rtol=1e-4, atol=1e-5)


def test_cylinder_parity(rng):
    from core.utils.skeleton_utils import get_kp_bounding_cylinder as ref_cyl

    bones = (rng.standard_normal((3, 24, 3)) * 0.3).astype(np.float32)
    kps = np.asarray(smpl_l2ws(jnp.asarray(bones)))[..., :3, 3]
    ref_out = ref_cyl(kps, ext_scale=0.001, extend_mm=250, head="-y")
    ours = np.asarray(get_kp_bounding_cylinder(kps, ext_scale=0.001, extend_mm=250, head="-y"))
    np.testing.assert_allclose(ours, np.asarray(ref_out), rtol=1e-4, atol=1e-5)


def test_nerf_mlp_forward_parity(rng):
    """Reference NeRF module loaded with OUR weights == our nerf_apply."""
    from core.networks.nerf import NeRF as RefNeRF

    import jax
    from posegen_tpu.models.nerf import NeRFConfig, init_nerf, nerf_apply

    cfg = NeRFConfig(input_ch=48, input_ch_bones=24, input_ch_views=36,
                     depth=4, width=32, skips=(2,), use_viewdirs=True)
    params = init_nerf(jax.random.PRNGKey(0), cfg)

    ref = RefNeRF(D=4, W=32, input_ch=48, input_ch_bones=24, input_ch_views=36,
                  skips=[2], use_viewdirs=True)
    sd = ref.state_dict()
    with torch.no_grad():
        for i, lay in enumerate(params["pts_linears"]):
            sd[f"pts_linears.{i}.weight"].copy_(torch.tensor(np.asarray(lay["w"]).T))
            sd[f"pts_linears.{i}.bias"].copy_(torch.tensor(np.asarray(lay["b"])))
        for name in ("alpha_linear", "feature_linear", "rgb_linear"):
            sd[f"{name}.weight"].copy_(torch.tensor(np.asarray(params[name]["w"]).T))
            sd[f"{name}.bias"].copy_(torch.tensor(np.asarray(params[name]["b"])))
        sd["views_linears.0.weight"].copy_(
            torch.tensor(np.asarray(params["views_linears"][0]["w"]).T))
        sd["views_linears.0.bias"].copy_(
            torch.tensor(np.asarray(params["views_linears"][0]["b"])))
    ref.load_state_dict(sd)

    n, s = 5, 7
    x_pts = rng.standard_normal((n, s, 48 + 24)).astype(np.float32)
    x_views = rng.standard_normal((n, s, 36)).astype(np.float32)

    # reference forward takes flattened concat [pts | views]
    ref_in = torch.tensor(
        np.concatenate([x_pts, x_views], -1).reshape(n * s, -1)
    )
    with torch.no_grad():
        ref_raw = ref(ref_in).numpy().reshape(n, s, 4)

    ours = np.asarray(nerf_apply(cfg, params, jnp.asarray(x_pts), jnp.asarray(x_views)))
    np.testing.assert_allclose(ours, ref_raw, rtol=2e-4, atol=2e-5)


def test_full_render_rays_parity(rng):
    """END-TO-END: our render_rays == the reference RayCaster.render_rays
    (same weights, deterministic sampling) at the pixel level."""
    import torch.nn.functional as TF

    from core.encoders import RelDistEncoder, VecNormEncoder, WorldToLocalEncoder
    from core.cutoff_embedder import get_embedder as ref_get_embedder
    from core.networks.nerf import NeRF as RefNeRF
    from core.raycasters import RayCaster as RefRayCaster

    import jax
    from posegen_tpu.render.raycast import PoseCtx, RaycastConfig, init_raycaster, render_rays
    from posegen_tpu.utils.fixtures import make_pose_ctx, make_rays

    cfg = RaycastConfig(
        netdepth=4, netwidth=64, N_samples=16, N_importance=8,
        multires=7, multires_views=4,
    )
    variables = init_raycaster(jax.random.PRNGKey(0), cfg)
    ctx = make_pose_ctx(seed=0)
    ro, rd = make_rays(24, seed=1)

    # ---- assemble the reference RayCaster with OUR weights ----------------
    def build_ref_net(ours):
        net = RefNeRF(
            D=4, W=64,
            input_ch=cfg.embed_kp_cfg.out_dim,
            input_ch_bones=cfg.embed_bone_cfg.out_dim,
            input_ch_views=cfg.embed_view_cfg.out_dim,
            skips=[2] if 2 in cfg.nerf_cfg.skips else [4],
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
    embed_fn, _ = ref_get_embedder(7, input_dims=24, cutoff_kwargs=mk_cut_kwargs(False))
    embeddirs_fn, _ = ref_get_embedder(4, input_dims=72, cutoff_kwargs=mk_cut_kwargs(True))
    embedbones_fn, _ = ref_get_embedder(0, input_dims=72, cutoff_kwargs={"cutoff": False})
    # match our tau (reference init_tau differs from ours)
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

    preproc = {
        "density_scale": 1.0,
        "density_fn": TF.relu,
        "pts_tr_fn": WorldToLocalEncoder(),
        "kp_input_fn": RelDistEncoder(24),
        "view_input_fn": VecNormEncoder(24),
        "bone_input_fn": VecNormEncoder(24),
    }
    n = ro.shape[0]
    ray_batch = torch.tensor(np.concatenate(
        [np.asarray(ro), np.asarray(rd),
         np.full((n, 1), cfg.near, np.float32),
         np.full((n, 1), cfg.far, np.float32),
         np.asarray(rd)], axis=-1,
    ))
    # the reference expects kp arrays pre-expanded per ray (its internal
    # broadcast branch has a latent NameError, raycasters.py:506)
    tile = lambda a: torch.tensor(np.tile(np.asarray(a), (n,) + (1,) * (np.asarray(a).ndim - 1)))
    with torch.no_grad():
        ref_out = caster.render_rays(
            ray_batch, cfg.N_samples,
            tile(ctx.kps),
            skts=tile(ctx.skts),
            cyls=tile(ctx.cyls),
            bones=tile(ctx.bones),
            perturb=0.0, N_importance=cfg.N_importance, raw_noise_std=0.0,
            preproc_kwargs=preproc,
        )

    ours = render_rays(cfg, variables, ro, rd, ctx, perturb=0.0,
                       raw_noise_std=0.0, use_fused=False)

    for key, ref_key in (("rgb_map", "rgb_map"), ("acc_map", "acc_map"),
                         ("rgb0", "rgb0"), ("disp_map", "disp_map")):
        a = np.asarray(ours[key])
        b = ref_out[ref_key].numpy()
        np.testing.assert_allclose(a, b, rtol=5e-4, atol=5e-5, err_msg=key)


def test_barf_schedule_parity_under_training(rng):
    """BARF freq_schedule golden: alpha annealing (reference update_alpha,
    cutoff_embedder.py:185-190) + the octave window (get_schedule_w, :192-198)
    + the full scheduled embedding output, at several training steps."""
    from core.cutoff_embedder import get_embedder

    n, s, j = 4, 8, 24
    v = rng.uniform(0.0, 1.5, (n, s, j)).astype(np.float32)

    cutoff_kwargs = {
        "cutoff": True, "cutoff_dim": j, "cutoff_dist": torch.ones(j) * 0.5,
        "cutoff_inputs": True, "opt_cutoff": False, "cut_to_dist": False,
        "dist_inputs": False, "shift_inputs": False,
        "freq_schedule": True, "init_alpha": 0.0, "normalize": False,
    }
    ref_embed, _ = get_embedder(
        7, input_dims=j, skel_type=None, cutoff_kwargs=cutoff_kwargs
    )
    cfg = emb.EmbedConfig(
        num_freqs=7, input_dims=j, cutoff=True, cutoff_dim=j,
        cutoff_inputs=True, dist_inputs=False, freq_schedule=True,
        init_alpha=0.0,
    )
    # anneal to target = multires - 1 over freq_schedule_step kilo-steps
    # (reference raycasters.py passes alpha_target; trainer uses
    # freq_schedule_step) — compare at several global steps incl. mid-window
    for gstep in (0, 900, 2500, 5000, 12000):
        ref_embed.update_alpha(gstep, step=5, target=torch.tensor(6.0))
        alpha = emb.update_alpha(cfg, gstep, step=5, target=6.0)
        np.testing.assert_allclose(
            float(alpha), float(ref_embed.sched_alpha), rtol=1e-6
        )
        ref_w = ref_embed.get_schedule_w().flatten().numpy()
        our_w = np.asarray(emb._schedule_w(cfg, alpha)).flatten()
        np.testing.assert_allclose(our_w, ref_w, rtol=1e-6)

        ref_out, _ = ref_embed(torch.tensor(v), dists=torch.tensor(v))
        state = {
            "tau": jnp.asarray(float(ref_embed.tau)),
            "alpha": alpha,
            "cutoff_dist": jnp.ones((j,)) * 0.5,
        }
        ours, _ = emb.embed(cfg, jnp.asarray(v), dists=jnp.asarray(v), state=state)
        np.testing.assert_allclose(
            np.asarray(ours), ref_out.detach().numpy(), rtol=1e-3, atol=2e-4,
            err_msg=f"step {gstep}",
        )
