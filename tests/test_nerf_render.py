import numpy as np
import jax
import jax.numpy as jnp
import pytest

from posegen_tpu.models import nerf as N
from posegen_tpu.render import raycast as RC
from posegen_tpu.skeleton import kinematics as K
from posegen_tpu.skeleton.geometry import get_kp_bounding_cylinder
from posegen_tpu.skeleton.skeleton import SMPL_REST_POSE, SMPL_SKELETON


def make_ctx(rng, n_framecodes=0):
    bones = jnp.asarray(rng.normal(size=(1, 24, 3)).astype(np.float32) * 0.3)
    pelvis = jnp.zeros((1, 3))
    kps, skts, _, _ = K.pose_to_kinematic(bones, pelvis, jnp.asarray(SMPL_REST_POSE * 0.4))
    cyl = get_kp_bounding_cylinder(np.asarray(kps), skel=SMPL_SKELETON, ext_scale=0.001, head="-y")
    cam = jnp.zeros((1, 1), dtype=jnp.int32) if n_framecodes else None
    return RC.PoseCtx(kps=kps, skts=skts, bones=bones, cyls=jnp.asarray(cyl), cam_idxs=cam)


def make_rays(n=32):
    rays_o = jnp.broadcast_to(jnp.asarray([0.0, 0.0, 3.0]), (n, 3))
    x = np.linspace(-0.2, 0.2, n)
    rays_d = jnp.asarray(np.stack([x, np.zeros(n), -np.ones(n)], -1).astype(np.float32))
    return rays_o, rays_d


def test_nerf_config_dims_match_reference_surreal():
    cfg = RC.RaycastConfig()  # surreal defaults
    ncfg = cfg.nerf_cfg
    # kp: reldist 24 dims, NF=7, include_input -> 24 + 24*14 = 360
    assert ncfg.input_ch == 360
    # bones: reldir 72 dims, NF=0 plain -> 72
    assert ncfg.input_ch_bones == 72
    # views: vecnorm 72 dims, NF=4 -> 72 + 72*8 = 648
    assert ncfg.input_ch_views == 648
    assert ncfg.dnet_input == 432
    assert ncfg.vnet_input == 648 + 256


def test_init_and_apply_shapes(rng):
    cfg = RC.RaycastConfig()
    ncfg = cfg.nerf_cfg
    params = N.init_nerf(jax.random.PRNGKey(0), ncfg)
    assert len(params["pts_linears"]) == 8
    assert params["pts_linears"][0]["w"].shape == (432, 256)
    assert params["pts_linears"][5]["w"].shape == (256 + 432, 256)
    x_pts = jnp.asarray(rng.normal(size=(7, 432)).astype(np.float32))
    x_views = jnp.asarray(rng.normal(size=(7, 648)).astype(np.float32))
    raw = N.nerf_apply(ncfg, params, x_pts, x_views)
    assert raw.shape == (7, 4)


def test_raw2outputs_opaque_and_empty(rng):
    Nr, S = 4, 16
    z = jnp.broadcast_to(jnp.linspace(1.0, 2.0, S), (Nr, S))
    d = jnp.broadcast_to(jnp.asarray([0.0, 0.0, -1.0]), (Nr, 3))
    # empty: large negative sigma
    raw = jnp.concatenate(
        [jnp.zeros((Nr, S, 3)), jnp.full((Nr, S, 1), -100.0)], axis=-1
    )
    out = N.raw2outputs(raw, z, d)
    np.testing.assert_allclose(np.asarray(out["acc_map"]), 0.0, atol=1e-6)
    np.testing.assert_allclose(np.asarray(out["rgb_map"]), 0.0, atol=1e-6)
    np.testing.assert_allclose(np.asarray(out["disp_map"]), 0.0, atol=1e-6)
    # opaque from the first sample: weights concentrate there
    raw2 = raw.at[..., 3].set(1e4)
    out2 = N.raw2outputs(raw2, z, d)
    np.testing.assert_allclose(np.asarray(out2["acc_map"]), 1.0, atol=1e-5)
    np.testing.assert_allclose(np.asarray(out2["weights"][:, 0]), 1.0, atol=1e-5)
    # rgb = sigmoid(0) stretched = 0.5
    np.testing.assert_allclose(np.asarray(out2["rgb_map"]), 0.5, atol=1e-5)


def test_render_rays_shapes_coarse_only(rng):
    cfg = RC.RaycastConfig(N_samples=16, N_importance=0, perturb=0.0, raw_noise_std=0.0)
    params = RC.init_raycaster(jax.random.PRNGKey(0), cfg)
    ctx = make_ctx(rng)
    rays_o, rays_d = make_rays(8)
    out = RC.render_rays(cfg, params, rays_o, rays_d, ctx)
    assert out["rgb_map"].shape == (8, 3)
    assert out["acc_map"].shape == (8,)
    assert out["alpha"].shape == (8, 16)
    assert "rgb0" not in out
    assert np.isfinite(np.asarray(out["rgb_map"])).all()


@pytest.mark.parametrize("single_net", [False, True])
def test_render_rays_hierarchical(rng, single_net):
    cfg = RC.RaycastConfig(
        N_samples=16, N_importance=8, perturb=0.0, raw_noise_std=0.0,
        single_net=single_net,
    )
    params = RC.init_raycaster(jax.random.PRNGKey(0), cfg)
    ctx = make_ctx(rng)
    rays_o, rays_d = make_rays(8)
    out = RC.render_rays(cfg, params, rays_o, rays_d, ctx)
    assert out["rgb_map"].shape == (8, 3)
    assert out["alpha"].shape == (8, 24)
    assert out["rgb0"].shape == (8, 3)
    assert np.isfinite(np.asarray(out["rgb_map"])).all()


def test_render_rays_jit_and_stochastic(rng):
    cfg = RC.RaycastConfig(N_samples=16, N_importance=8, perturb=1.0, raw_noise_std=1.0)
    params = RC.init_raycaster(jax.random.PRNGKey(0), cfg)
    ctx = make_ctx(rng)
    rays_o, rays_d = make_rays(8)
    f = jax.jit(RC.render_rays, static_argnames=("cfg",))
    out1 = f(cfg, params, rays_o, rays_d, ctx, key=jax.random.PRNGKey(1))
    out2 = f(cfg, params, rays_o, rays_d, ctx, key=jax.random.PRNGKey(2))
    assert np.isfinite(np.asarray(out1["rgb_map"])).all()
    # different keys -> different stochastic renders
    assert np.abs(np.asarray(out1["rgb_map"]) - np.asarray(out2["rgb_map"])).max() > 0


def test_render_rays_framecodes(rng):
    cfg = RC.RaycastConfig(
        N_samples=8, N_importance=0, perturb=0.0, raw_noise_std=0.0,
        opt_framecode=True, n_framecodes=5,
    )
    params = RC.init_raycaster(jax.random.PRNGKey(0), cfg)
    # lift density out of the ReLU dead zone so rays actually accumulate color
    params["coarse"]["alpha_linear"]["b"] = params["coarse"]["alpha_linear"]["b"] + 2.0
    assert params["coarse"]["framecodes"].shape == (5, 16)
    ctx = make_ctx(rng, n_framecodes=5)
    rays_o, rays_d = make_rays(4)
    out = RC.render_rays(cfg, params, rays_o, rays_d, ctx)
    # different cam idx changes the render
    ctx2 = ctx._replace(cam_idxs=jnp.full((1, 1), 3, dtype=jnp.int32))
    out2 = RC.render_rays(cfg, params, rays_o, rays_d, ctx2)
    assert np.abs(np.asarray(out["rgb_map"]) - np.asarray(out2["rgb_map"])).max() > 0
    # eval_mean_code path runs
    out3 = RC.render_rays(cfg, params, rays_o, rays_d, ctx, eval_mean_code=True)
    assert np.isfinite(np.asarray(out3["rgb_map"])).all()


def test_gradients_flow_through_render(rng):
    cfg = RC.RaycastConfig(N_samples=8, N_importance=4, perturb=0.0, raw_noise_std=0.0)
    params = RC.init_raycaster(jax.random.PRNGKey(0), cfg)
    for net in ("coarse", "fine"):
        params[net]["alpha_linear"]["b"] = params[net]["alpha_linear"]["b"] + 2.0
    ctx = make_ctx(rng)
    rays_o, rays_d = make_rays(4)

    def loss_fn(p):
        out = RC.render_rays(cfg, p, rays_o, rays_d, ctx)
        return jnp.mean(out["rgb_map"] ** 2) + jnp.mean(out["rgb0"] ** 2)

    grads = jax.grad(loss_fn)(params)
    leaves = jax.tree_util.tree_leaves(grads)
    assert all(np.isfinite(np.asarray(g)).all() for g in leaves)
    # both nets receive gradient
    assert np.abs(np.asarray(grads["coarse"]["pts_linears"][0]["w"])).max() > 0
    assert np.abs(np.asarray(grads["fine"]["pts_linears"][0]["w"])).max() > 0


def test_gradients_flow_to_pose(rng):
    """Pose-optimization prerequisite: d(render)/d(bones) exists and is finite
    (the reference backprops through sampler+compositor, SURVEY config 4)."""
    cfg = RC.RaycastConfig(N_samples=8, N_importance=4, perturb=0.0, raw_noise_std=0.0)
    params = RC.init_raycaster(jax.random.PRNGKey(0), cfg)
    for net in ("coarse", "fine"):
        params[net]["alpha_linear"]["b"] = params[net]["alpha_linear"]["b"] + 2.0
    rays_o, rays_d = make_rays(4)
    bones0 = jnp.asarray(rng.normal(size=(1, 24, 3)).astype(np.float32) * 0.3)

    def loss_fn(bones):
        pelvis = jnp.zeros((1, 3))
        kps, skts, _, _ = K.pose_to_kinematic(bones, pelvis, jnp.asarray(SMPL_REST_POSE * 0.4))
        cyl = jnp.asarray(
            get_kp_bounding_cylinder(np.zeros((1, 24, 3)) + np.asarray(SMPL_REST_POSE * 0.4),
                                     skel=SMPL_SKELETON, ext_scale=0.001, head="-y")
        )
        ctx = RC.PoseCtx(kps=kps, skts=skts, bones=bones, cyls=cyl, cam_idxs=None)
        out = RC.render_rays(cfg, params, rays_o, rays_d, ctx)
        return jnp.mean(out["rgb_map"] ** 2)

    g = jax.grad(loss_fn)(bones0)
    assert np.isfinite(np.asarray(g)).all()
    assert np.abs(np.asarray(g)).max() > 0


def test_render_mesh_density(rng):
    cfg = RC.RaycastConfig(N_samples=8, N_importance=0)
    params = RC.init_raycaster(jax.random.PRNGKey(0), cfg)
    ctx = make_ctx(rng)
    grid = RC.render_mesh_density(cfg, params, ctx, radius=0.5, res=8)
    assert grid.shape == (9, 9, 9)
    assert np.isfinite(np.asarray(grid)).all()


def test_render_image_full(rng):
    from posegen_tpu.render import image as IMG

    cfg = RC.RaycastConfig(N_samples=8, N_importance=4, perturb=0.0, raw_noise_std=0.0)
    params = RC.init_raycaster(jax.random.PRNGKey(0), cfg)
    for net in ("coarse", "fine"):
        params[net]["alpha_linear"]["b"] = params[net]["alpha_linear"]["b"] + 2.0
    ctx = make_ctx(rng)
    H = W = 32
    c2w = np.eye(4, dtype=np.float32)
    c2w[2, 3] = 3.0
    out = IMG.render_image(cfg, params, H, W, 40.0, c2w, ctx, chunk=256, white_bkgd=True)
    assert out["rgb"].shape == (H, W, 3)
    assert np.isfinite(out["rgb"]).all()
    tl, br = out["bbox"]
    # pixels outside the bbox remain background white
    mask = np.ones((H, W), dtype=bool)
    mask[tl[1]:br[1], tl[0]:br[0]] = False
    assert np.allclose(out["rgb"][mask], 1.0)
    # the person occupies some pixels inside the box
    assert out["acc"].max() > 0.5


def test_render_image_multichip_matches_single(rng):
    """auto_render_fn routes full-image rendering over the 8-device CPU mesh
    (run_render / i_video / NeRFRenderer path) and matches the single-device
    render bit-for-bit up to f32 reduction order (VERDICT r2 #6)."""
    from posegen_tpu.parallel.mesh import auto_render_fn
    from posegen_tpu.render import image as IMG

    assert jax.device_count() == 8
    cfg = RC.RaycastConfig(N_samples=8, N_importance=4, perturb=0.0, raw_noise_std=0.0)
    params = RC.init_raycaster(jax.random.PRNGKey(0), cfg)
    for net in ("coarse", "fine"):
        params[net]["alpha_linear"]["b"] = params[net]["alpha_linear"]["b"] + 2.0
    ctx = make_ctx(rng)
    H = W = 32
    c2w = np.eye(4, dtype=np.float32)
    c2w[2, 3] = 3.0

    single = IMG.render_image(cfg, params, H, W, 40.0, c2w, ctx, chunk=256)
    render_fn, chunk = auto_render_fn(cfg, 250)
    assert render_fn is not None and chunk % 8 == 0
    multi = IMG.render_image(
        cfg, params, H, W, 40.0, c2w, ctx, chunk=chunk, render_fn=render_fn
    )
    np.testing.assert_allclose(multi["rgb"], single["rgb"], rtol=1e-3, atol=1e-4)
    np.testing.assert_allclose(multi["acc"], single["acc"], rtol=1e-3, atol=1e-4)


def test_gan_feedback_renderer_multichip(rng):
    """The resident GAN feedback renderer (gen/loop.NeRFRenderer) shards its
    rays over the mesh automatically and matches a single-device render."""
    import jax.numpy as jnp

    from posegen_tpu.gen.loop import NeRFRenderer
    from posegen_tpu.render.raycast import render_rays

    cfg = RC.RaycastConfig(N_samples=6, N_importance=0, perturb=0.0, raw_noise_std=0.0)
    params = RC.init_raycaster(jax.random.PRNGKey(1), cfg)
    params["coarse"]["alpha_linear"]["b"] = params["coarse"]["alpha_linear"]["b"] + 2.0

    r = NeRFRenderer(cfg, params, hw=24, focal=30.0, chunk=250)
    assert r.chunk % jax.device_count() == 0
    bones = rng.standard_normal((1, 24, 3)).astype(np.float32) * 0.2
    c2w = np.eye(4, dtype=np.float32)
    c2w[2, 3] = 3.0
    imgs = r.render_poses(bones, c2w[None])
    assert imgs.shape == (1, 24, 24, 3)
    assert np.isfinite(imgs).all()

    # same render forced single-device: _render_fn=None routes render_poses
    # through the memoized single-chip device-raygen jit (the single-chip
    # NeRFRenderer default)
    single = NeRFRenderer.__new__(NeRFRenderer)
    single.cfg, single.params = cfg, params
    single.hw, single.focal, single.pose_scale, single.chunk = 24, 30.0, r.pose_scale, 256
    single.white_bkgd = False
    single._render_fn = None
    imgs1 = single.render_poses(bones, c2w[None])
    np.testing.assert_allclose(imgs, imgs1, rtol=1e-3, atol=5e-4)


def test_device_raygen_matches_host_rays(rng):
    """`rays_from_box` (in-graph pinhole raygen from the ~60-byte cam pack)
    reproduces the host `valid_rays_for_pose` rays, including the clamp-to-
    last-valid padding convention."""
    from posegen_tpu.render import image as IMG

    H, W, focal = 24, 36, (30.0, 28.0)
    c2w = np.eye(4, dtype=np.float32)
    c2w[:3, :3] = np.linalg.qr(rng.standard_normal((3, 3)))[0].astype(np.float32)
    c2w[2, 3] = 3.0
    kp = SMPL_REST_POSE[None] + rng.standard_normal((1, 24, 3)).astype(np.float32) * 0.05
    cyl = np.asarray(get_kp_bounding_cylinder(jnp.asarray(kp)))[0]
    center = (W * 0.5 - 1.0, H * 0.5 + 2.0)

    ro, rd, valid_idx, (tl, br) = IMG.valid_rays_for_pose(H, W, focal, c2w, cyl, center)
    cam = IMG.make_cam(H, W, focal, c2w, tl, br, center=center)
    n = int(cam["box"][3])
    assert n == ro.shape[0]

    n_pad = 7
    o2, d2 = jax.jit(lambda c: IMG.rays_from_box(c, 0, n + n_pad))(
        {k: jnp.asarray(v) for k, v in cam.items()}
    )
    np.testing.assert_allclose(np.asarray(o2)[:n], ro, rtol=1e-6, atol=1e-6)
    np.testing.assert_allclose(np.asarray(d2)[:n], rd, rtol=1e-6, atol=1e-6)
    # padding lanes clamp to the last valid ray
    np.testing.assert_allclose(
        np.asarray(d2)[n:], np.broadcast_to(rd[-1], (n_pad, 3)),
        rtol=1e-6, atol=1e-6,
    )


def test_render_image_device_raygen_matches_legacy(rng):
    """The default render path (device raygen) matches the legacy host-ray
    upload path on a full image."""
    from posegen_tpu.render import image as IMG

    cfg = RC.RaycastConfig(N_samples=8, N_importance=4, perturb=0.0, raw_noise_std=0.0)
    params = RC.init_raycaster(jax.random.PRNGKey(0), cfg)
    for net in ("coarse", "fine"):
        params[net]["alpha_linear"]["b"] = params[net]["alpha_linear"]["b"] + 2.0
    ctx = make_ctx(rng)
    H = W = 32
    c2w = np.eye(4, dtype=np.float32)
    c2w[2, 3] = 3.0

    new = IMG.render_image(cfg, params, H, W, 40.0, c2w, ctx, chunk=256)
    legacy_fn = IMG._default_render_fn(cfg)  # no takes_cam -> host rays
    legacy = IMG.render_image(
        cfg, params, H, W, 40.0, c2w, ctx, chunk=256, render_fn=legacy_fn
    )
    np.testing.assert_allclose(new["rgb"], legacy["rgb"], rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(new["acc"], legacy["acc"], rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(new["disp"], legacy["disp"], rtol=1e-4, atol=1e-5)


def test_feedback_crop_window_matches_full_inside(rng):
    """window=(lo,hi) renders exactly the full render's pixels inside the
    crop and leaves background outside — the GAN feedback path's 2.5x ray
    saving must be invisible to every consumer (all of them crop first)."""
    from posegen_tpu.gen.loop import NeRFRenderer

    cfg = RC.RaycastConfig(
        N_samples=6, N_importance=0, perturb=0.0, raw_noise_std=0.0
    )
    params = RC.init_raycaster(jax.random.PRNGKey(1), cfg)
    params["coarse"]["alpha_linear"]["b"] = (
        params["coarse"]["alpha_linear"]["b"] + 2.0
    )
    r = NeRFRenderer(cfg, params, hw=32, focal=40.0, chunk=256)
    bones = rng.standard_normal((2, 24, 3)).astype(np.float32) * 0.2
    c2w = np.eye(4, dtype=np.float32)
    c2w[2, 3] = 3.0
    c2ws = np.broadcast_to(c2w, (2, 4, 4))

    full = r.render_poses(bones, c2ws)
    lo, hi = 8, 26
    cropped = r.render_poses(bones, c2ws, window=(lo, hi))
    np.testing.assert_allclose(
        cropped[:, lo:hi, lo:hi], full[:, lo:hi, lo:hi], atol=2e-3
    )
    # outside the window: untouched background (zeros here)
    outside = cropped.copy()
    outside[:, lo:hi, lo:hi] = 0.0
    assert float(np.abs(outside).max()) == 0.0
