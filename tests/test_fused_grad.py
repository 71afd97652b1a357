"""Custom-VJP fused field: weight gradients match the XLA autodiff path."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from posegen_tpu.kernels.field import fused_run_net
from posegen_tpu.models import nerf as nerf_mod
from posegen_tpu.render.raycast import RaycastConfig, encode_inputs
from posegen_tpu.utils.fixtures import make_problem

CFG = RaycastConfig()


@pytest.fixture
def f32_matmuls():
    """Exactness mode: CPU XLA computes f32 matmuls exactly, so comparing
    against the kernel's bf16 MXU casts only measures rounding noise.
    Temporarily run the kernels in f32 to verify the backward MATH."""
    import posegen_tpu.kernels.field as field

    orig = field.MM_DTYPE
    field.MM_DTYPE = jnp.float32
    yield
    field.MM_DTYPE = orig


@pytest.mark.slow
def test_trainable_fused_grads_match_xla(f32_matmuls):
    cfg, params, ctx, ro, rd = make_problem(CFG, n_rays=8)
    n, s = 8, 6
    key = jax.random.PRNGKey(3)
    z = jnp.sort(jax.random.uniform(key, (n, s), minval=0.5, maxval=2.0), axis=-1)
    pts = ro[:, None] + rd[:, None] * z[..., None]
    # a fixed random cotangent-inducing loss
    wgt = jax.random.normal(jax.random.PRNGKey(7), (n, s, 4))

    def loss_xla(net):
        x_pts, x_views, _ = encode_inputs(cfg, params, pts, rd, ctx)
        raw = nerf_mod.nerf_apply(cfg.nerf_cfg, net, x_pts, x_views)
        return jnp.sum(raw * wgt)

    def loss_fused(net):
        raw = fused_run_net(
            cfg, net, params["embed_kp"], pts, rd, ctx,
            interpret=True, trainable=True,
        )
        return jnp.sum(raw * wgt)

    g_xla = jax.grad(loss_xla)(params["coarse"])
    g_fus = jax.grad(loss_fused)(params["coarse"])

    flat_x, _ = jax.tree_util.tree_flatten_with_path(g_xla)
    flat_f = dict(jax.tree_util.tree_flatten_with_path(g_fus)[0])
    checked = 0
    all_x, all_f = [], []
    for path, gx in flat_x:
        gf = flat_f[path]
        gx, gf = np.asarray(gx), np.asarray(gf)
        all_x.append(gx.ravel())
        all_f.append(gf.ravel())
        scale = max(np.abs(gx).max(), 1e-3)
        err = np.abs(gf - gx).max() / scale
        assert err < 1e-4, f"{jax.tree_util.keystr(path)}: rel err {err}"
        checked += 1
    assert checked >= 20  # all layers covered
    vx, vf = np.concatenate(all_x), np.concatenate(all_f)
    rel_l2 = float(np.linalg.norm(vf - vx) / (np.linalg.norm(vx) + 1e-12))
    assert rel_l2 < 1e-5, f"gradient rel L2 {rel_l2}"


@pytest.mark.slow
def test_trainable_fused_value_matches_inference_kernel():
    cfg, params, ctx, ro, rd = make_problem(CFG, n_rays=8)
    z = jnp.sort(
        jax.random.uniform(jax.random.PRNGKey(0), (8, 6), minval=0.5, maxval=2.0), -1
    )
    pts = ro[:, None] + rd[:, None] * z[..., None]
    raw_inf = fused_run_net(
        cfg, params["coarse"], params["embed_kp"], pts, rd, ctx, interpret=True
    )
    raw_tr = fused_run_net(
        cfg, params["coarse"], params["embed_kp"], pts, rd, ctx,
        interpret=True, trainable=True,
    )
    np.testing.assert_allclose(
        np.asarray(raw_tr), np.asarray(raw_inf), rtol=2e-2, atol=2e-3
    )


@pytest.mark.slow
def test_fused_input_grads_match_xla(f32_matmuls):
    """d(loss)/d(pts, rays_d, skts) from the input_grads backward kernel ==
    XLA autodiff (the pose-opt chain, reference core/pose_opt.py:372-445)."""
    from posegen_tpu.render.raycast import PoseCtx

    cfg, params, ctx, ro, rd = make_problem(CFG, n_rays=8)
    n, s = 8, 6
    z = jnp.sort(
        jax.random.uniform(jax.random.PRNGKey(3), (n, s), minval=0.5, maxval=2.0), -1
    )
    pts = ro[:, None] + rd[:, None] * z[..., None]
    wgt = jax.random.normal(jax.random.PRNGKey(7), (n, s, 4))

    def mk_ctx(skts):
        return PoseCtx(kps=ctx.kps, skts=skts, bones=ctx.bones, cyls=ctx.cyls)

    def loss_xla(pts, rd, skts):
        x_pts, x_views, _ = encode_inputs(cfg, params, pts, rd, mk_ctx(skts))
        raw = nerf_mod.nerf_apply(cfg.nerf_cfg, params["coarse"], x_pts, x_views)
        return jnp.sum(raw * wgt)

    def loss_fused(pts, rd, skts):
        raw = fused_run_net(
            cfg, params["coarse"], params["embed_kp"], pts, rd, mk_ctx(skts),
            interpret=True, trainable=True, input_grads=True,
        )
        return jnp.sum(raw * wgt)

    gx = jax.grad(loss_xla, argnums=(0, 1, 2))(pts, rd, ctx.skts)
    gf = jax.grad(loss_fused, argnums=(0, 1, 2))(pts, rd, ctx.skts)

    for name, a, b in zip(("pts", "rays_d", "skts"), gx, gf):
        a, b = np.asarray(a), np.asarray(b)
        scale = max(np.abs(a).max(), 1e-3)
        err = np.abs(b - a).max() / scale
        assert err < 1e-4, f"{name}: rel err {err}"
        rel_l2 = float(np.linalg.norm(b - a) / (np.linalg.norm(a) + 1e-12))
        assert rel_l2 < 1e-5, f"{name}: rel L2 {rel_l2}"


@pytest.mark.slow
def test_fused_input_grads_grouped(f32_matmuls):
    """Per-group d_rot/d_trn accumulators: 2 pose groups, 64 samples/ray so
    each group is exactly one TRAIN_TILE; d_skts matches XLA per group."""
    from posegen_tpu.render.raycast import PoseCtx
    from posegen_tpu.utils.fixtures import make_pose_ctx, make_rays

    cfg = CFG
    params = __import__("posegen_tpu.render.raycast", fromlist=["init_raycaster"]).init_raycaster(
        jax.random.PRNGKey(0), cfg
    )
    ctx2 = make_pose_ctx(seed=0, n_poses=2)
    ro, rd = make_rays(8, seed=1)
    n, s = 8, 64  # 4 rays/group * 64 samples = 256 = TRAIN_TILE
    z = jnp.sort(
        jax.random.uniform(jax.random.PRNGKey(5), (n, s), minval=0.5, maxval=2.0), -1
    )
    pts = ro[:, None] + rd[:, None] * z[..., None]
    wgt = jax.random.normal(jax.random.PRNGKey(11), (n, s, 4))

    def mk_ctx(skts):
        return PoseCtx(kps=ctx2.kps, skts=skts, bones=ctx2.bones, cyls=ctx2.cyls)

    def loss_xla(skts):
        # XLA path needs per-ray pose rows
        rep = n // 2
        skts_r = jnp.repeat(skts, rep, axis=0)
        ctx_r = PoseCtx(
            kps=jnp.repeat(ctx2.kps, rep, axis=0),
            skts=skts_r,
            bones=jnp.repeat(ctx2.bones, rep, axis=0),
            cyls=ctx2.cyls,
        )
        x_pts, x_views, _ = encode_inputs(cfg, params, pts, rd, ctx_r)
        raw = nerf_mod.nerf_apply(cfg.nerf_cfg, params["coarse"], x_pts, x_views)
        return jnp.sum(raw * wgt)

    def loss_fused(skts):
        raw = fused_run_net(
            cfg, params["coarse"], params["embed_kp"], pts, rd, mk_ctx(skts),
            interpret=True, trainable=True, input_grads=True,
        )
        return jnp.sum(raw * wgt)

    gx = np.asarray(jax.grad(loss_xla)(ctx2.skts))
    gf = np.asarray(jax.grad(loss_fused)(ctx2.skts))
    scale = max(np.abs(gx).max(), 1e-3)
    assert np.abs(gf - gx).max() / scale < 1e-4


@pytest.mark.slow
def test_fused_framecode_grads_with_input_grads(f32_matmuls):
    """Regression: with input_grads=True AND framecodes on (pose-opt +
    opt_framecode training), d_codes must come from its own output ref.
    It used to be read from outs[-1], which is d_trn in that combination —
    corrupting BOTH the framecode-table and the skts gradients."""
    from posegen_tpu.models import nerf as nerf_mod
    from posegen_tpu.render.raycast import PoseCtx, encode_inputs
    from posegen_tpu.utils.fixtures import make_pose_ctx, make_rays

    cfg = RaycastConfig(opt_framecode=True, n_framecodes=4)
    params = __import__(
        "posegen_tpu.render.raycast", fromlist=["init_raycaster"]
    ).init_raycaster(jax.random.PRNGKey(0), cfg)
    base = make_pose_ctx(seed=0, n_poses=2)
    cam_idxs = jnp.asarray([[0], [2]], dtype=jnp.int32)  # distinct rows
    ro, rd = make_rays(8, seed=1)
    n, s, G = 8, 64, 2
    z = jnp.sort(
        jax.random.uniform(jax.random.PRNGKey(5), (n, s), minval=0.5, maxval=2.0), -1
    )
    pts = ro[:, None] + rd[:, None] * z[..., None]
    wgt = jax.random.normal(jax.random.PRNGKey(11), (n, s, 4))

    def loss_xla(net, skts):
        rep = n // G
        ctx_r = PoseCtx(
            kps=jnp.repeat(base.kps, rep, axis=0),
            skts=jnp.repeat(skts, rep, axis=0),
            bones=jnp.repeat(base.bones, rep, axis=0),
            cyls=base.cyls,
        )
        x_pts, x_views, _ = encode_inputs(cfg, params, pts, rd, ctx_r)
        frame_idx = jnp.broadcast_to(
            jnp.repeat(cam_idxs, rep, axis=0)[:, None, :], (n, s, 1)
        )
        raw = nerf_mod.nerf_apply(cfg.nerf_cfg, net, x_pts, x_views, frame_idx)
        return jnp.sum(raw * wgt)

    def loss_fused(net, skts):
        ctx_g = PoseCtx(
            kps=base.kps, skts=skts, bones=base.bones, cyls=base.cyls,
            cam_idxs=cam_idxs,
        )
        raw = fused_run_net(
            cfg, net, params["embed_kp"], pts, rd, ctx_g,
            interpret=True, trainable=True, input_grads=True,
        )
        return jnp.sum(raw * wgt)

    gx_net, gx_skts = jax.grad(loss_xla, argnums=(0, 1))(params["coarse"], base.skts)
    gf_net, gf_skts = jax.grad(loss_fused, argnums=(0, 1))(params["coarse"], base.skts)

    gx_c, gf_c = np.asarray(gx_net["framecodes"]), np.asarray(gf_net["framecodes"])
    assert np.abs(gx_c).max() > 0
    np.testing.assert_allclose(gf_c, gx_c, rtol=1e-4, atol=1e-6)
    gx_s, gf_s = np.asarray(gx_skts), np.asarray(gf_skts)
    scale = max(np.abs(gx_s).max(), 1e-3)
    assert np.abs(gf_s - gx_s).max() / scale < 1e-4


@pytest.mark.slow
def test_stash_backward_matches_recompute():
    """The stashed-encode backward (STASH_BWD: forward writes bf16
    encodings, backward streams them instead of recomputing the VPU
    encode) returns the same gradients as the recompute backward — every
    consumer of e_pts/e_view is a matmul that casts to the stash dtype
    anyway. Covers the flagship single-group shape and a grouped +
    framecode batch."""
    import posegen_tpu.kernels.field_grad as fg
    from posegen_tpu.render.raycast import PoseCtx, init_raycaster
    from posegen_tpu.utils.fixtures import make_pose_ctx, make_rays

    def grads(cfg, params, ctx, pts, rd, wgt, stash):
        old = fg.STASH_BWD
        fg.STASH_BWD = stash
        try:
            def loss(net):
                raw = fused_run_net(
                    cfg, net, params["embed_kp"], pts, rd, ctx,
                    interpret=True, trainable=True,
                )
                return jnp.sum(raw * wgt)

            return jax.grad(loss)(params["coarse"])
        finally:
            fg.STASH_BWD = old

    def check(cfg, params, ctx, pts, rd, wgt):
        g_re = grads(cfg, params, ctx, pts, rd, wgt, stash=False)
        g_st = grads(cfg, params, ctx, pts, rd, wgt, stash=True)
        flat_re = jax.tree_util.tree_flatten_with_path(g_re)[0]
        flat_st = dict(jax.tree_util.tree_flatten_with_path(g_st)[0])
        for path, gr in flat_re:
            gs = np.asarray(flat_st[path])
            gr = np.asarray(gr)
            scale = max(np.abs(gr).max(), 1e-3)
            err = np.abs(gs - gr).max() / scale
            assert err < 1e-6, f"{jax.tree_util.keystr(path)}: rel err {err}"

    # flagship single-group
    cfg, params, ctx, ro, rd = make_problem(CFG, n_rays=8)
    z = jnp.sort(
        jax.random.uniform(jax.random.PRNGKey(0), (8, 6), minval=0.5, maxval=2.0), -1
    )
    pts = ro[:, None] + rd[:, None] * z[..., None]
    wgt = jax.random.normal(jax.random.PRNGKey(7), (8, 6, 4))
    check(cfg, params, ctx, pts, rd, wgt)

    # grouped batch + framecodes (weights-only: input_grads stays False)
    cfg2 = RaycastConfig(opt_framecode=True, n_framecodes=4)
    params2 = init_raycaster(jax.random.PRNGKey(0), cfg2)
    base = make_pose_ctx(seed=0, n_poses=2)
    ctx2 = PoseCtx(
        kps=base.kps, skts=base.skts, bones=base.bones, cyls=base.cyls,
        cam_idxs=jnp.asarray([[0], [2]], dtype=jnp.int32),
    )
    ro2, rd2 = make_rays(8, seed=1)
    z2 = jnp.sort(
        jax.random.uniform(jax.random.PRNGKey(5), (8, 64), minval=0.5, maxval=2.0), -1
    )
    pts2 = ro2[:, None] + rd2[:, None] * z2[..., None]
    wgt2 = jax.random.normal(jax.random.PRNGKey(11), (8, 64, 4))
    check(cfg2, params2, ctx2, pts2, rd2, wgt2)
