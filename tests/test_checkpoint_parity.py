"""PSNR parity against a reference-TRAINED checkpoint (.tar path end-to-end).

The round-1 golden tests proved pixel parity of the math with shared random
weights. This test closes the remaining gap (BASELINE.md quality target): it
runs the ACTUAL reference Trainer (core/trainer.py, torch CPU via
tests/reference_shims) for a couple hundred iterations, saves its .tar with
Trainer.save_nerf (core/trainer.py:487-508 — the reference's real key
scheme, custom RayCaster.state_dict key mangling raycasters.py:752-766 and
all), imports it with train/checkpoints.import_torch_checkpoint, renders the
same held-out rays through BOTH stacks, and asserts the two renders agree at
pixel level and in PSNR-vs-GT to < 0.05 dB.
"""

import os
import sys

import numpy as np
import pytest

sys.path.insert(0, "tests")
import reference_shims

reference_shims.install()

import torch  # noqa: E402
import torch.nn as nn  # noqa: E402
import torch.nn.functional as TF  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from posegen_tpu.evals.image import psnr as jax_psnr  # noqa: E402
from posegen_tpu.render.raycast import RaycastConfig, render_rays  # noqa: E402
from posegen_tpu.train.checkpoints import import_torch_checkpoint  # noqa: E402
from posegen_tpu.utils.fixtures import make_pose_ctx, make_rays  # noqa: E402

CFG = RaycastConfig(
    netdepth=4, netwidth=64, N_samples=16, N_importance=8,
    multires=7, multires_views=4,
)


def _build_reference_raycaster(
    cfg: RaycastConfig, seed: int = 3, cutoff_dist: float = 0.175
):
    """A reference RayCaster with the reference's OWN torch init (no weight
    copying from our side) plus the preproc kwargs of the flagship config
    (reldist kp / vecnorm view+bone encoders, relu density).

    cutoff_dist: constructor value of the per-joint gate radii (overridden
    by the checkpoint on load in the import tests; the training A/B passes
    0.5 = the reference default cutoff_mm 500 x ext_scale 0.001 so both
    stacks see the same scene volume)."""
    from core.cutoff_embedder import get_embedder as ref_get_embedder
    from core.encoders import RelDistEncoder, VecNormEncoder, WorldToLocalEncoder
    from core.networks.nerf import NeRF as RefNeRF
    from core.raycasters import RayCaster as RefRayCaster

    torch.manual_seed(seed)

    def build_net():
        return RefNeRF(
            D=cfg.netdepth, W=cfg.netwidth,
            input_ch=cfg.embed_kp_cfg.out_dim,
            input_ch_bones=cfg.embed_bone_cfg.out_dim,
            input_ch_views=cfg.embed_view_cfg.out_dim,
            skips=[2] if 2 in cfg.nerf_cfg.skips else [4],
            use_viewdirs=True,
            use_framecode=cfg.opt_framecode,
            framecode_ch=cfg.framecode_ch,
            n_framecodes=cfg.n_framecodes,
        )

    mk_cut_kwargs = lambda dist_inputs: {
        "cutoff": True, "cutoff_dim": 24,
        "cutoff_dist": torch.ones(24) * cutoff_dist,
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
    embedbones_fn, _ = ref_get_embedder(
        cfg.multires_bones, input_dims=72, cutoff_kwargs={"cutoff": False}
    )

    joint_coords = torch.eye(3).view(1, 1, 3, 3).expand(1, 24, 3, 3).contiguous()
    caster = RefRayCaster(
        build_net(), embed_fn, embedbones_fn, embeddirs_fn,
        network_fine=build_net(), joint_coords=joint_coords,
    )
    preproc = {
        "density_scale": 1.0,
        "density_fn": TF.relu,
        "pts_tr_fn": WorldToLocalEncoder(),
        "kp_input_fn": RelDistEncoder(24),
        "view_input_fn": VecNormEncoder(24),
        "bone_input_fn": VecNormEncoder(24),
    }
    return caster, preproc


def _gt_rgb(rays_o: np.ndarray, rays_d: np.ndarray) -> np.ndarray:
    """Smooth synthetic target colors (any consistent function works: the
    parity claim is about the two stacks agreeing on the SAME checkpoint)."""
    x = np.concatenate([rays_o, rays_d], -1)
    r = 0.5 + 0.4 * np.sin(3.0 * x[:, 3])
    g = 0.5 + 0.4 * np.cos(2.0 * x[:, 4] + x[:, 0])
    b = 0.5 + 0.4 * np.sin(x[:, 5] + 2.0 * x[:, 1])
    return np.stack([r, g, b], -1).astype(np.float32)


@pytest.mark.slow
def test_reference_trained_tar_psnr_parity(tmp_path):
    from types import SimpleNamespace

    from core.trainer import Trainer, render

    cfg = CFG
    caster, preproc = _build_reference_raycaster(cfg)
    dp_caster = nn.DataParallel(caster)

    n_iters = 200
    args = SimpleNamespace(
        # loss / trainer knobs actually read on the popt-less path
        opt_pose_stop=None, opt_pose=False, opt_pose_cache=False,
        opt_pose_step=1, chunk=4096, loss_fn="MSE", loss_beta=0.1,
        reg_fn=None, use_background=False, coarse_weight=0.1,
        lrate=5e-4, lrate_decay=250, lrate_decay_rate=0.1, decay_unit=1000,
        finetune=False, opt_framecode=False,
        # embedder schedule knobs (update_embed_fns, raycasters.py:731)
        cutoff_step=1, cutoff_rate=10.0, freq_schedule_step=1, multires=cfg.multires,
    )
    optimizer = torch.optim.Adam(caster.parameters(), lr=args.lrate)
    render_kwargs_train = {
        "ray_caster": dp_caster,
        "use_viewdirs": True,
        "near": cfg.near, "far": cfg.far,
        "N_samples": cfg.N_samples, "N_importance": cfg.N_importance,
        "perturb": 1.0, "raw_noise_std": 0.0,
        "preproc_kwargs": preproc,
    }
    trainer = Trainer(
        args, {"hwf": (8, 8, 10.0)}, optimizer, None,
        render_kwargs_train, None, popt_kwargs=None, device="cpu",
    )

    # ---- train on the reference stack --------------------------------------
    ctx = make_pose_ctx(seed=0)
    pool_o, pool_d = make_rays(512, seed=1)
    pool_o, pool_d = np.asarray(pool_o), np.asarray(pool_d)
    pool_rgb = _gt_rgb(pool_o, pool_d)

    def tile(a, n):
        a = np.asarray(a)
        return torch.tensor(np.tile(a, (n,) + (1,) * (a.ndim - 1)))

    rng = np.random.default_rng(0)
    torch.manual_seed(0)
    n_rand = 128
    losses = []
    for i in range(1, n_iters + 1):
        sel = rng.integers(0, pool_o.shape[0], (n_rand,))
        batch = {
            "rays": torch.tensor(np.stack([pool_o[sel], pool_d[sel]], 0)),
            "target_s": torch.tensor(pool_rgb[sel]),
            "kp3d": tile(ctx.kps, n_rand),
            "skts": tile(ctx.skts, n_rand),
            "bones": tile(ctx.bones, n_rand),
            "cyls": tile(ctx.cyls, n_rand),
        }
        loss_dict, stats = trainer.train_batch(batch, i=i, global_step=i)
        losses.append(loss_dict["total_loss"].item())
        assert np.isfinite(losses[-1])
    # the reference trainer actually learned (weights are trained, not init)
    assert np.mean(losses[-20:]) < np.mean(losses[:20])

    # tau must have annealed away from its init (proves the saved embed state
    # is genuinely trained, not the constructor default)
    assert caster.embed_fn.get_tau() != pytest.approx(
        float(caster.embed_fn.init_tau)
    )

    # ---- save the .tar exactly as the reference does -----------------------
    tar_path = str(tmp_path / "000200.tar")
    trainer.save_nerf(tar_path, global_step=n_iters)

    # ---- render held-out rays through the reference stack ------------------
    val_o, val_d = make_rays(96, seed=7)
    val_gt = _gt_rgb(np.asarray(val_o), np.asarray(val_d))
    caster.eval()
    with torch.no_grad():
        ref_out = render(
            8, 8, 10.0, chunk=4096,
            rays=(torch.tensor(np.asarray(val_o)), torch.tensor(np.asarray(val_d))),
            kp_batch=tile(ctx.kps, 96), skts=tile(ctx.skts, 96),
            bones=tile(ctx.bones, 96), cyls=tile(ctx.cyls, 96),
            **{**render_kwargs_train, "perturb": 0.0},
        )
    ref_rgb = ref_out["rgb_map"].numpy()

    # ---- import the .tar and render through OUR stack ----------------------
    variables, extras = import_torch_checkpoint(tar_path)
    assert extras["global_step"] == n_iters
    for k in ("coarse", "fine", "embed_kp", "embed_view", "embed_bone"):
        assert k in variables, f"importer dropped {k}"
    # the annealed tau came through
    np.testing.assert_allclose(
        float(variables["embed_kp"]["tau"]), caster.embed_fn.get_tau(), rtol=1e-6
    )

    ours = render_rays(
        cfg, variables, val_o, val_d, ctx, perturb=0.0, raw_noise_std=0.0,
        use_fused=False,
    )
    our_rgb = np.asarray(ours["rgb_map"])

    # pixel-level agreement of the two stacks on the SAME trained checkpoint
    np.testing.assert_allclose(our_rgb, ref_rgb, rtol=5e-4, atol=5e-4)

    # and the headline number: PSNR-vs-GT delta < 0.05 dB
    def np_psnr(a, b):
        return float(-10.0 * np.log10(np.mean((a - b) ** 2)))

    psnr_ref = np_psnr(ref_rgb, val_gt)
    psnr_ours = np_psnr(our_rgb, val_gt)
    assert abs(psnr_ref - psnr_ours) < 0.05, (
        f"PSNR mismatch: ref {psnr_ref:.4f} vs ours {psnr_ours:.4f}"
    )


def test_exported_tar_loads_in_reference_and_matches(tmp_path):
    """The inverse migration: OUR checkpoint exported to .tar, loaded by the
    reference's OWN load_ckpt_from_path (core/utils/run_nerf_helpers.py:6-17,
    strict per-module load_state_dict), rendered through the reference stack
    — pixels must match our render of the same weights."""
    import jax

    from core.trainer import render
    from core.utils.run_nerf_helpers import load_ckpt_from_path
    from posegen_tpu.render.raycast import init_raycaster
    from posegen_tpu.train.checkpoints import export_torch_checkpoint
    from posegen_tpu.utils.fixtures import make_pose_ctx, make_rays

    cfg = CFG
    variables = init_raycaster(jax.random.PRNGKey(5), cfg)
    # non-default embed buffers so their transit is proven (an annealed tau
    # and a scaled cutoff table change every gate in the encoding)
    variables["embed_kp"] = {
        **variables["embed_kp"],
        "tau": jnp.asarray(137.5),
        "cutoff_dist": variables["embed_kp"]["cutoff_dist"] * 1.25,
    }
    variables["embed_view"] = {
        **variables["embed_view"],
        "tau": jnp.asarray(64.0),
    }

    tar = str(tmp_path / "000042.tar")
    export_torch_checkpoint(tar, variables, cfg, global_step=42)

    # a reference raycaster with its OWN (different-seed) init: everything it
    # renders with below must come from the loaded .tar, not construction
    caster, preproc = _build_reference_raycaster(cfg, seed=11)
    optimizer = torch.optim.Adam(caster.parameters(), lr=5e-4)
    gs, caster, optimizer, _ = load_ckpt_from_path(caster, optimizer, tar)
    assert gs == 42
    np.testing.assert_allclose(float(caster.embed_fn.get_tau()), 137.5)
    np.testing.assert_allclose(
        caster.embed_fn.cutoff_dist.detach().numpy(),
        np.asarray(variables["embed_kp"]["cutoff_dist"]),
        rtol=1e-6,
    )

    ctx = make_pose_ctx(seed=0)
    val_o, val_d = make_rays(96, seed=7)

    def tile(a, n):
        a = np.asarray(a)
        return torch.tensor(np.tile(a, (n,) + (1,) * (a.ndim - 1)))

    caster.eval()
    with torch.no_grad():
        ref_out = render(
            8, 8, 10.0, chunk=4096,
            rays=(torch.tensor(np.asarray(val_o)), torch.tensor(np.asarray(val_d))),
            kp_batch=tile(ctx.kps, 96), skts=tile(ctx.skts, 96),
            bones=tile(ctx.bones, 96), cyls=tile(ctx.cyls, 96),
            ray_caster=nn.DataParallel(caster), use_viewdirs=True,
            near=cfg.near, far=cfg.far,
            N_samples=cfg.N_samples, N_importance=cfg.N_importance,
            perturb=0.0, raw_noise_std=0.0, preproc_kwargs=preproc,
        )
    ref_rgb = ref_out["rgb_map"].numpy()

    ours = render_rays(
        cfg, variables, val_o, val_d, ctx, perturb=0.0, raw_noise_std=0.0,
        use_fused=False,
    )
    np.testing.assert_allclose(
        np.asarray(ours["rgb_map"]), ref_rgb, rtol=5e-4, atol=5e-4
    )


def run_training_ab(
    work_dir,
    n_iters: int = 400,
    ref_seed: int = 3,
    our_seed: int = 21,
    stream_seed: int = 11,
    torch_seed: int = 0,
    step_key_seed: int = 0,
):
    """Train the ACTUAL reference Trainer (core/trainer.py:232-519) and OUR
    trainer on the SAME scene with matched hyperparameters and iteration
    budget — identical batch-index stream, matched LR schedule / tau anneal
    / loss weights — and return both held-out PSNRs.

    Shared by the parity test below (one seed, assertion-gated) and
    tools/exp_ab.py (the multi-seed x multi-budget sweep, VERDICT r4 item 3).
    Seeds: ref_seed/our_seed vary the two stacks' weight inits (the
    realization difference under test), stream_seed the image/pixel stream
    (always the SAME for both stacks within a run), torch_seed/step_key_seed
    the in-training noise draws.

    Returns dict(psnr_ref, psnr_ours, ref_losses, our_losses)."""
    import h5py
    from types import SimpleNamespace

    import jax
    from core.trainer import Trainer, render

    from posegen_tpu.data.synthetic import make_synthetic_h5
    from posegen_tpu.render.raycast import PoseCtx, init_raycaster
    from posegen_tpu.skeleton.cameras import get_rays_np
    from posegen_tpu.train.trainer import (
        TrainConfig,
        create_train_state,
        make_train_step,
    )

    # the demo-config architecture: small enough to converge in a few
    # hundred CPU iterations (the CFG export arch stalls at this budget —
    # the A/B needs a scene BOTH stacks visibly learn). raw_noise_std=1.0
    # as in every shipped reference config: with relu density and no noise,
    # an unlucky init leaves a net's sigma negative everywhere and
    # permanently dead (exactly what happened to the reference fine net at
    # seed 3 before this was matched).
    cfg = RaycastConfig(
        netdepth=2, netwidth=48, multires=4, multires_views=2,
        N_samples=12, N_importance=4, raw_noise_std=1.0,
    )
    n_rand = 128
    lrate = 5e-3  # the demo config's fast-convergence LR, same for both

    h5 = make_synthetic_h5(
        os.path.join(str(work_dir), "demo.h5"), n_images=8, H=64, W=64
    )
    with h5py.File(h5, "r") as f:
        imgs = np.asarray(f["imgs"], np.float32) / 255.0
        smask = np.asarray(f["sampling_masks"])[..., 0] > 0
        kp3d = np.asarray(f["kp3d"])
        skts = np.asarray(f["skts"])
        bones = np.asarray(f["bones"])
        cyls = np.asarray(f["cyls"])
        c2ws = np.asarray(f["c2ws"])
        focals = np.asarray(f["focals"])
        kp_idxs = np.asarray(f["kp_idxs"])

    # precompute per-image rays + masked pixel pools; image 7 held out
    rays, pix_pools = [], []
    for i in range(8):
        ro, rd = get_rays_np(64, 64, float(focals[i]), c2ws[i])
        rays.append((np.asarray(ro).reshape(-1, 3).astype(np.float32),
                     np.asarray(rd).reshape(-1, 3).astype(np.float32)))
        pix_pools.append(np.where(smask[i].reshape(-1))[0])
    targets = imgs.reshape(8, -1, 3)
    val_i = 7
    val_pix = pix_pools[val_i][:512]
    val_o = rays[val_i][0][val_pix]
    val_d = rays[val_i][1][val_pix]
    val_gt = targets[val_i][val_pix]

    def np_psnr(a, b):
        return float(-10.0 * np.log10(np.mean((a - b) ** 2)))

    def tile(a, n):
        a = np.asarray(a)
        return torch.tensor(np.tile(a, (n,) + (1,) * (a.ndim - 1)))

    def batch_stream(seed):
        """(image_idx, pixel_sel) stream — identical for both stacks."""
        rng = np.random.default_rng(seed)
        while True:
            i = int(rng.integers(0, 7))  # train images only
            sel = rng.choice(pix_pools[i], size=n_rand, replace=True)
            yield i, sel

    def pose_rows(i):
        k = kp_idxs[i]
        return kp3d[k : k + 1], skts[k : k + 1], bones[k : k + 1], cyls[k : k + 1]

    # ---- reference stack, its own init + RNG ------------------------------
    # cutoff_dist 0.5 = cutoff_mm 500 x ext_scale 0.001, matching OUR
    # init_raycaster default — with the import-test value (0.175) the gate
    # blinds the reference to most of the scene and it cannot learn
    caster, preproc = _build_reference_raycaster(cfg, seed=ref_seed, cutoff_dist=0.5)
    args = SimpleNamespace(
        opt_pose_stop=None, opt_pose=False, opt_pose_cache=False,
        opt_pose_step=1, chunk=4096, loss_fn="MSE", loss_beta=0.1,
        reg_fn=None, use_background=False, coarse_weight=0.1,
        lrate=lrate, lrate_decay=250, lrate_decay_rate=0.1, decay_unit=1000,
        finetune=False, opt_framecode=False,
        cutoff_step=1, cutoff_rate=10.0, freq_schedule_step=1,
        multires=cfg.multires,
    )
    optimizer = torch.optim.Adam(caster.parameters(), lr=args.lrate)
    render_kwargs_train = {
        "ray_caster": nn.DataParallel(caster),
        "use_viewdirs": True,
        "near": cfg.near, "far": cfg.far,
        "N_samples": cfg.N_samples, "N_importance": cfg.N_importance,
        "perturb": 1.0, "raw_noise_std": 1.0,
        "preproc_kwargs": preproc,
    }
    trainer = Trainer(
        args, {"hwf": (64, 64, float(focals[0]))}, optimizer, None,
        render_kwargs_train, None, popt_kwargs=None, device="cpu",
    )

    stream = batch_stream(stream_seed)
    torch.manual_seed(torch_seed)
    ref_losses = []
    for it in range(1, n_iters + 1):
        i, sel = next(stream)
        kp, sk, bo, cy = pose_rows(i)
        batch = {
            "rays": torch.tensor(
                np.stack([rays[i][0][sel], rays[i][1][sel]], 0)
            ),
            "target_s": torch.tensor(targets[i][sel]),
            "kp3d": tile(kp, n_rand), "skts": tile(sk, n_rand),
            "bones": tile(bo, n_rand), "cyls": tile(cy, n_rand),
        }
        loss_dict, _ = trainer.train_batch(batch, i=it, global_step=it)
        ref_losses.append(loss_dict["total_loss"].item())
        assert np.isfinite(ref_losses[-1])

    kp, sk, bo, cy = pose_rows(val_i)
    caster.eval()
    with torch.no_grad():
        ref_out = render(
            64, 64, float(focals[0]), chunk=4096,
            rays=(torch.tensor(val_o), torch.tensor(val_d)),
            kp_batch=tile(kp, len(val_o)), skts=tile(sk, len(val_o)),
            bones=tile(bo, len(val_o)), cyls=tile(cy, len(val_o)),
            **{**render_kwargs_train, "perturb": 0.0, "raw_noise_std": 0.0},
        )
    psnr_ref = np_psnr(ref_out["rgb_map"].numpy(), val_gt)

    # ---- our stack, same hyperparameters + batch stream -------------------
    tcfg = TrainConfig(
        lrate=lrate, lrate_decay=250, lrate_decay_rate=0.1, decay_unit=1000,
        loss_fn="MSE", coarse_weight=0.1,
        cutoff_step=1, cutoff_rate=10.0,
    )
    variables = init_raycaster(jax.random.PRNGKey(our_seed), cfg)
    state = create_train_state(variables, tcfg)
    step = jax.jit(make_train_step(cfg, tcfg), donate_argnums=(0,))

    stream = batch_stream(stream_seed)  # the SAME image/pixel stream
    key = jax.random.PRNGKey(step_key_seed)
    our_losses = []
    for it in range(1, n_iters + 1):
        i, sel = next(stream)
        kp, sk, bo, cy = pose_rows(i)
        batch = {
            "rays_o": jnp.asarray(rays[i][0][sel]),
            "rays_d": jnp.asarray(rays[i][1][sel]),
            "target_s": jnp.asarray(targets[i][sel]),
            "kp3d": jnp.asarray(kp), "skts": jnp.asarray(sk),
            "bones": jnp.asarray(bo), "cyls": jnp.asarray(cy),
        }
        state, stats = step(state, batch, jax.random.fold_in(key, it))
        our_losses.append(float(stats["total_loss"]))
        assert np.isfinite(our_losses[-1])

    kp, sk, bo, cy = pose_rows(val_i)
    ctx = PoseCtx(
        kps=jnp.asarray(kp), skts=jnp.asarray(sk),
        bones=jnp.asarray(bo), cyls=jnp.asarray(cy),
    )
    ours = render_rays(
        cfg, {**state.params, **state.embeds}, jnp.asarray(val_o),
        jnp.asarray(val_d), ctx, perturb=0.0, raw_noise_std=0.0,
        use_fused=False,
    )
    psnr_ours = np_psnr(np.asarray(ours["rgb_map"]), val_gt)

    print(f"A/B val PSNR: reference {psnr_ref:.2f} dB, ours {psnr_ours:.2f} dB")
    return {
        "psnr_ref": psnr_ref, "psnr_ours": psnr_ours,
        "ref_losses": ref_losses, "our_losses": our_losses,
    }


def run_training_ab_h36m(
    work_dir,
    n_iters: int = 300,
    ref_seed: int = 3,
    our_seed: int = 21,
    stream_seed: int = 11,
    torch_seed: int = 0,
    step_key_seed: int = 0,
):
    """The h36m-config-family training A/B (VERDICT r4 item 3, second half):
    L1 loss + background compositing + per-frame codes + pose optimization —
    the loss path `run_training_ab` (MSE, no bg, no popt) does not touch.
    The reference side runs the ACTUAL Trainer with create_popt's
    PoseOptLayer (core/pose_opt.py:14-83,240-330) and a pose Adam stepped
    every opt_pose_step iters; ours runs the same knobs through
    TrainConfig/PoseOptConfig. Matched stream, matched h36m hyperparameters
    (L1, coarse_weight 1, opt_pose_step 50, pose lr 5e-4, rot6d, tol 0.01,
    coef 2.0, framecode_ch 16). Returns dict(psnr_ref, psnr_ours, ...)."""
    import h5py
    from types import SimpleNamespace

    import jax
    from core.trainer import Trainer, render
    from core.pose_opt import create_popt
    from core.utils.skeleton_utils import SMPLSkeleton

    from posegen_tpu.data.synthetic import make_synthetic_h5
    from posegen_tpu.pose.opt import PoseOptConfig, init_pose_params
    from posegen_tpu.render.raycast import PoseCtx, init_raycaster
    from posegen_tpu.skeleton.cameras import get_rays_np
    from posegen_tpu.skeleton.skeleton import SMPL_REST_POSE
    from posegen_tpu.train.trainer import (
        TrainConfig,
        create_train_state,
        make_train_step,
    )

    cfg = RaycastConfig(
        netdepth=2, netwidth=48, multires=4, multires_views=2,
        N_samples=12, N_importance=4, raw_noise_std=1.0,
        opt_framecode=True, n_framecodes=8, framecode_ch=16,
    )
    n_rand = 128
    lrate = 5e-3
    OPT_POSE_STEP = 50   # verbatim h36m cadence
    POSE_LR = 5e-4

    h5 = make_synthetic_h5(
        os.path.join(str(work_dir), "demo_h36m.h5"), n_images=8, H=64, W=64
    )
    with h5py.File(h5, "r") as f:
        imgs = np.asarray(f["imgs"], np.float32) / 255.0
        smask = np.asarray(f["sampling_masks"])[..., 0] > 0
        masks = np.asarray(f["masks"], np.float32)
        kp3d = np.asarray(f["kp3d"])
        skts = np.asarray(f["skts"])
        bones = np.asarray(f["bones"])
        cyls = np.asarray(f["cyls"])
        c2ws = np.asarray(f["c2ws"])
        focals = np.asarray(f["focals"])
        kp_idxs = np.asarray(f["kp_idxs"])

    # non-trivial background (the synthetic scene's own bkgd is black, which
    # would make the use_background composite a numeric no-op): a smooth
    # deterministic gradient, composited into the targets for BOTH stacks
    yy, xx = np.mgrid[0:64, 0:64].astype(np.float32) / 64.0
    bg_img = np.stack([0.2 + 0.5 * yy, 0.3 + 0.4 * xx,
                       0.5 - 0.3 * yy * xx], -1).astype(np.float32)
    imgs = imgs * masks + (1.0 - masks) * bg_img

    rays, fg_pools, ring_pools = [], [], []
    for i in range(8):
        ro, rd = get_rays_np(64, 64, float(focals[i]), c2ws[i])
        rays.append((np.asarray(ro).reshape(-1, 3).astype(np.float32),
                     np.asarray(rd).reshape(-1, 3).astype(np.float32)))
        tight = masks[i, ..., 0].reshape(-1) > 0
        dil = smask[i].reshape(-1)
        fg_pools.append(np.where(tight)[0])
        ring_pools.append(np.where(dil & ~tight)[0])
    targets = imgs.reshape(8, -1, 3)
    bg_flat = bg_img.reshape(-1, 3)
    val_i = 7
    val_pix = np.concatenate([fg_pools[val_i][:384], ring_pools[val_i][:128]])
    val_o = rays[val_i][0][val_pix]
    val_d = rays[val_i][1][val_pix]
    val_gt = targets[val_i][val_pix]
    val_bg = bg_flat[val_pix]

    def np_psnr(a, b):
        return float(-10.0 * np.log10(np.mean((a - b) ** 2)))

    def tile(a, n):
        a = np.asarray(a)
        return torch.tensor(np.tile(a, (n,) + (1,) * (a.ndim - 1)))

    def batch_stream(seed):
        # fg-biased sampling (the reference's own fg_ratio device,
        # run_nerf.py --fg_ratio / h36m fg_ratio=1.0): with bg compositing,
        # uniformly-sampled dilated-mask pixels are mostly background and
        # BOTH stacks find the acc=0 "render nothing" minimum — the person
        # must dominate the loss for the scene to be learnable at this
        # budget. 3:1 person:ring, identical stream for both stacks.
        rng = np.random.default_rng(seed)
        while True:
            i = int(rng.integers(0, 7))
            sel = np.concatenate([
                rng.choice(fg_pools[i], size=(3 * n_rand) // 4, replace=True),
                rng.choice(ring_pools[i], size=n_rand - (3 * n_rand) // 4,
                           replace=True),
            ])
            yield i, sel

    # ---- reference stack: Trainer + create_popt ---------------------------
    caster, preproc = _build_reference_raycaster(cfg, seed=ref_seed, cutoff_dist=0.5)
    args = SimpleNamespace(
        opt_pose_stop=None, opt_pose=True, opt_pose_cache=False,
        opt_pose_step=OPT_POSE_STEP, chunk=4096, loss_fn="L1", loss_beta=0.1,
        reg_fn=None, use_background=True, coarse_weight=1.0,
        lrate=lrate, lrate_decay=250, lrate_decay_rate=0.1, decay_unit=1000,
        finetune=False, opt_framecode=True,
        cutoff_step=250, cutoff_rate=10.0, freq_schedule_step=1,
        multires=cfg.multires,
        opt_rot6d=True, opt_pose_tol=0.01, opt_pose_coef=2.0,
        opt_pose_lrate=POSE_LR, use_temp_loss=False, ext_scale=0.001,
        init_poseopt=None, no_poseopt_reload=False, use_ckpt_anchor=False,
    )
    data_attrs = {
        "skel_type": SMPLSkeleton,
        "rest_pose": np.asarray(SMPL_REST_POSE, np.float32) * 0.4,
        "betas": np.zeros((1, 10), np.float32),
        "kp3d": kp3d.astype(np.float32),
        "bones": bones.astype(np.float32),
    }
    torch.manual_seed(torch_seed)
    pose_optimizer, popt_kwargs = create_popt(args, data_attrs, device="cpu")
    optimizer = torch.optim.Adam(caster.parameters(), lr=args.lrate)
    render_kwargs_train = {
        "ray_caster": nn.DataParallel(caster),
        "use_viewdirs": True,
        "near": cfg.near, "far": cfg.far,
        "N_samples": cfg.N_samples, "N_importance": cfg.N_importance,
        "perturb": 1.0, "raw_noise_std": 1.0,
        "preproc_kwargs": preproc,
    }
    trainer = Trainer(
        args, {"hwf": (64, 64, float(focals[0]))}, optimizer, pose_optimizer,
        render_kwargs_train, None, popt_kwargs=popt_kwargs, device="cpu",
    )

    # the reference's popt path reads grad norms AFTER zero_grad
    # (trainer.py:470-475); its torch era kept zeroed tensors there, modern
    # torch sets None and get_gradnorm divides by zero — restore the old
    # zero_grad semantics for the executed code
    def _optim_step_legacy():
        trainer.optimizer.step()
        trainer.optimizer.zero_grad(set_to_none=False)

    trainer._optim_step = _optim_step_legacy

    stream = batch_stream(stream_seed)
    torch.manual_seed(torch_seed)
    ref_losses = []
    for it in range(1, n_iters + 1):
        i, sel = next(stream)
        batch = {
            "rays": torch.tensor(
                np.stack([rays[i][0][sel], rays[i][1][sel]], 0)
            ),
            "target_s": torch.tensor(targets[i][sel]),
            "bgs": torch.tensor(bg_flat[sel]),
            "cam_idxs": torch.tensor(np.full(n_rand, i, np.int64)),
            "kp_idx": torch.tensor(np.full(n_rand, int(kp_idxs[i]))),
            "cyls": tile(cyls[kp_idxs[i] : kp_idxs[i] + 1], n_rand),
        }
        loss_dict, _ = trainer.train_batch(batch, i=it, global_step=it)
        ref_losses.append(loss_dict["total_loss"].item())
        assert np.isfinite(ref_losses[-1])

    # val render with the OPTIMIZED reference poses + real framecodes
    popt_layer = popt_kwargs["popt_layer"]
    with torch.no_grad():
        kps_r, bones_r, skts_r, _, _ = popt_layer(np.asarray([int(kp_idxs[val_i])]))
    caster.eval()
    with torch.no_grad():
        ref_out = render(
            64, 64, float(focals[0]), chunk=4096,
            rays=(torch.tensor(val_o), torch.tensor(val_d)),
            kp_batch=kps_r.expand(len(val_o), -1, -1),
            skts=skts_r.expand(len(val_o), -1, -1, -1),
            bones=bones_r.expand(len(val_o), -1, -1),
            cyls=tile(cyls[kp_idxs[val_i] : kp_idxs[val_i] + 1], len(val_o)),
            cams=torch.tensor(np.full(len(val_o), val_i, np.int64)),
            **{**render_kwargs_train, "perturb": 0.0, "raw_noise_std": 0.0},
        )
    ref_rgb = ref_out["rgb_map"].numpy()
    ref_rgb = ref_rgb + (1.0 - ref_out["acc_map"].numpy())[..., None] * val_bg
    psnr_ref = np_psnr(ref_rgb, val_gt)

    # ---- our stack --------------------------------------------------------
    tcfg = TrainConfig(
        lrate=lrate, lrate_decay=250, lrate_decay_rate=0.1, decay_unit=1000,
        loss_fn="L1", coarse_weight=1.0, use_background=True,
        cutoff_step=250, cutoff_rate=10.0,
        opt_pose=True, opt_pose_step=OPT_POSE_STEP, opt_pose_coef=2.0,
        opt_pose_lrate=POSE_LR, opt_pose_decay_rate=1.0,
    )
    pcfg = PoseOptConfig(use_rot6d=True, opt_pose_tol=0.01)
    pose_params, anchors = init_pose_params(pcfg, bones, kp3d)
    variables = init_raycaster(jax.random.PRNGKey(our_seed), cfg)
    state = create_train_state(variables, tcfg, pose_params, anchors)
    rest_pose = jnp.asarray(np.asarray(SMPL_REST_POSE, np.float32) * 0.4)
    step = jax.jit(
        make_train_step(cfg, tcfg, pcfg, rest_pose=rest_pose,
                        n_frames=len(bones)),
        donate_argnums=(0,),
    )

    stream = batch_stream(stream_seed)
    key = jax.random.PRNGKey(step_key_seed)
    our_losses = []
    for it in range(1, n_iters + 1):
        i, sel = next(stream)
        batch = {
            "rays_o": jnp.asarray(rays[i][0][sel]),
            "rays_d": jnp.asarray(rays[i][1][sel]),
            "target_s": jnp.asarray(targets[i][sel]),
            "bgs": jnp.asarray(bg_flat[sel]),
            "cam_idxs": jnp.asarray(np.full((n_rand, 1), i, np.int32)),
            "kp_idx": jnp.asarray([int(kp_idxs[i])], jnp.int32),
            "kp3d": jnp.asarray(kp3d[kp_idxs[i] : kp_idxs[i] + 1]),
            "cyls": jnp.asarray(cyls[kp_idxs[i] : kp_idxs[i] + 1]),
        }
        state, stats = step(state, batch, jax.random.fold_in(key, it))
        our_losses.append(float(stats["total_loss"]))
        assert np.isfinite(our_losses[-1])

    from posegen_tpu.pose.opt import pose_apply

    kps_o, bones_o, skts_o, _ = pose_apply(
        state.pose_params, jnp.asarray([int(kp_idxs[val_i])]), rest_pose
    )
    from posegen_tpu.skeleton.geometry import get_kp_bounding_cylinder

    cyl_o = get_kp_bounding_cylinder(kps_o, ext_scale=0.001).astype(jnp.float32)
    ctx = PoseCtx(
        kps=kps_o, skts=skts_o, bones=bones_o, cyls=cyl_o,
        cam_idxs=jnp.full((1, 1), val_i, jnp.int32),
    )
    ours = render_rays(
        cfg, {**state.params, **state.embeds}, jnp.asarray(val_o),
        jnp.asarray(val_d), ctx, perturb=0.0, raw_noise_std=0.0,
        use_fused=False,
    )
    our_rgb = np.asarray(ours["rgb_map"]) + (
        1.0 - np.asarray(ours["acc_map"])
    )[..., None] * val_bg
    psnr_ours = np_psnr(our_rgb, val_gt)

    print(f"h36m A/B val PSNR: reference {psnr_ref:.2f} dB, ours {psnr_ours:.2f} dB")
    return {
        "psnr_ref": psnr_ref, "psnr_ours": psnr_ours,
        "ref_losses": ref_losses, "our_losses": our_losses,
    }


@pytest.mark.slow
def test_native_training_quality_parity_ab_h36m(tmp_path):
    """h36m-family loss-path parity gate (L1 + background + framecodes +
    pose-opt). This combination is SLOW to learn on the blob scene — with
    bg compositing both stacks start at the acc=0 "render nothing" minimum
    (~8.9 dB on the fg-biased val pixels) and climb out over ~1k iters
    (measured: ref/ours 8.94/11.65 at 300 iters, 11.86/11.75 at 1200) — so
    the learnability floor is "visibly above the collapse floor", not the
    MSE A/B's 14 dB."""
    r = run_training_ab_h36m(
        tmp_path, n_iters=int(os.environ.get("POSEGEN_AB_ITERS", "1200"))
    )
    psnr_ref, psnr_ours = r["psnr_ref"], r["psnr_ours"]
    ref_losses = r["ref_losses"]
    assert psnr_ref > 10.5 and np.mean(ref_losses[-20:]) < 0.8 * np.mean(
        ref_losses[:20]
    ), f"reference stack failed to learn ({psnr_ref:.2f} dB)"
    assert psnr_ours > psnr_ref - 0.75, (
        f"our trainer underperforms on the h36m path: "
        f"{psnr_ours:.2f} vs ref {psnr_ref:.2f}"
    )


@pytest.mark.slow
def test_native_training_quality_parity_ab(tmp_path):
    """Native-training quality parity, single-seed gate (the multi-seed x
    multi-budget sweep lives in tools/exp_ab.py; its measured seed spread is
    recorded in RESULTS.md and logs/ab/). Asserts our trainer reaches the
    reference's held-out PSNR within the measured cross-seed spread."""
    r = run_training_ab(
        tmp_path, n_iters=int(os.environ.get("POSEGEN_AB_ITERS", "400"))
    )
    psnr_ref, psnr_ours = r["psnr_ref"], r["psnr_ours"]
    ref_losses = r["ref_losses"]
    # both stacks actually learned the scene (guards against a vacuous pass)
    assert psnr_ref > 14.0 and np.mean(ref_losses[-20:]) < 0.3 * np.mean(
        ref_losses[:20]
    ), f"reference stack failed to learn ({psnr_ref:.2f} dB)"
    # matched-budget parity: our trainer must reach the reference's quality.
    # Tolerance sits just beyond the MEASURED cross-seed spread (tools/
    # exp_ab.py, 3 seeds x {400, 2000} iters, logs/ab/summary.json): at 400
    # iters the gap is -0.15+/-0.17 dB (worst seed -0.32), at 2000 it is
    # -0.01+/-0.84 with our stack winning seeds outright — i.e. no
    # systematic deficit, so anything past ~2 sigma is a real regression.
    assert psnr_ours > psnr_ref - 0.6, (
        f"our trainer underperforms: {psnr_ours:.2f} vs ref {psnr_ref:.2f}"
    )


def test_exported_framecode_tar_loads_in_reference_and_matches(tmp_path):
    """Export-path completeness (VERDICT r3 item 8), framecode variant: an
    opt_framecode model exported to .tar strict-loads in the reference
    (per-frame Optcodes table included, nerf.py:87-88 `framecodes.codes`)
    and renders identically through both stacks with PER-RAY camera
    indices selecting different learned codes."""
    import jax

    from core.trainer import render
    from core.utils.run_nerf_helpers import load_ckpt_from_path
    from posegen_tpu.render.raycast import PoseCtx, init_raycaster
    from posegen_tpu.train.checkpoints import export_torch_checkpoint
    from posegen_tpu.utils.fixtures import make_pose_ctx, make_rays

    cfg = RaycastConfig(
        netdepth=4, netwidth=64, N_samples=16, N_importance=8,
        multires=7, multires_views=4,
        opt_framecode=True, n_framecodes=5, framecode_ch=16,
    )
    variables = init_raycaster(jax.random.PRNGKey(9), cfg)
    # spread the codes out so a wrong/missing row is visible in pixels
    rng = np.random.default_rng(3)
    for net in ("coarse", "fine"):
        variables[net]["framecodes"] = jnp.asarray(
            rng.standard_normal(variables[net]["framecodes"].shape) * 3.0,
            jnp.float32,
        )

    tar = str(tmp_path / "000011.tar")
    export_torch_checkpoint(tar, variables, cfg, global_step=11)

    caster, preproc = _build_reference_raycaster(cfg, seed=13)
    gs, caster, _, _ = load_ckpt_from_path(caster, None, tar)
    assert gs == 11
    np.testing.assert_allclose(
        caster.network.framecodes.codes.weight.detach().numpy(),
        np.asarray(variables["coarse"]["framecodes"]), rtol=1e-6,
    )

    base = make_pose_ctx(seed=0)
    val_o, val_d = make_rays(96, seed=7)
    cam_idxs = (np.arange(96) % cfg.n_framecodes).astype(np.int64)

    def tile(a, n):
        a = np.asarray(a)
        return torch.tensor(np.tile(a, (n,) + (1,) * (a.ndim - 1)))

    caster.eval()
    with torch.no_grad():
        ref_out = render(
            8, 8, 10.0, chunk=4096,
            rays=(torch.tensor(np.asarray(val_o)), torch.tensor(np.asarray(val_d))),
            kp_batch=tile(base.kps, 96), skts=tile(base.skts, 96),
            bones=tile(base.bones, 96), cyls=tile(base.cyls, 96),
            cams=torch.tensor(cam_idxs),
            ray_caster=nn.DataParallel(caster), use_viewdirs=True,
            near=cfg.near, far=cfg.far,
            N_samples=cfg.N_samples, N_importance=cfg.N_importance,
            perturb=0.0, raw_noise_std=0.0, preproc_kwargs=preproc,
        )
    ref_rgb = ref_out["rgb_map"].numpy()

    ctx = PoseCtx(
        kps=base.kps, skts=base.skts, bones=base.bones, cyls=base.cyls,
        cam_idxs=jnp.asarray(cam_idxs[:, None].astype(np.int32)),
    )
    ours = render_rays(
        cfg, variables, val_o, val_d, ctx, perturb=0.0, raw_noise_std=0.0,
        use_fused=False,
    )
    np.testing.assert_allclose(
        np.asarray(ours["rgb_map"]), ref_rgb, rtol=5e-4, atol=5e-4
    )

    # the per-ray codes genuinely differ (a mean-code bug would equalize)
    ctx0 = PoseCtx(
        kps=base.kps, skts=base.skts, bones=base.bones, cyls=base.cyls,
        cam_idxs=jnp.zeros((96, 1), jnp.int32),
    )
    flat = render_rays(
        cfg, variables, val_o, val_d, ctx0, perturb=0.0, raw_noise_std=0.0,
        use_fused=False,
    )
    assert float(np.abs(np.asarray(flat["rgb_map"]) - ref_rgb).max()) > 1e-3


def test_exported_multiview_pose_tar_loads_in_reference(tmp_path):
    """Export-path completeness (VERDICT r3 item 8), multiview pose-opt
    variant: a multiview checkpoint (per-view pelvis/root bone + shared
    non-root table + kp_map/kp_uidxs buffers) strict-loads through the
    reference's own load_poseopt_from_state_dict (pose_opt.py:212-238) and
    the restored layer's FK matches ours frame-for-frame."""
    import jax

    from core.pose_opt import load_poseopt_from_state_dict
    from posegen_tpu.pose.opt import (
        PoseOptConfig,
        init_pose_params,
        pose_apply,
    )
    from posegen_tpu.render.raycast import init_raycaster
    from posegen_tpu.skeleton.skeleton import SMPL_REST_POSE
    from posegen_tpu.train.checkpoints import export_torch_checkpoint

    rng = np.random.default_rng(5)
    n, _u = 8, 2
    kp_map = np.asarray([0, 1, 0, 1, 0, 1, 0, 1])
    kp_uidxs = np.asarray([0, 1])
    bones = (rng.standard_normal((n, 24, 3)) * 0.2).astype(np.float32)
    for i in range(n):
        bones[i, 1:] = bones[kp_uidxs[kp_map[i]], 1:]
    kp3d = np.tile(np.asarray(SMPL_REST_POSE)[None], (n, 1, 1)).astype(np.float32)
    kp3d += rng.standard_normal(kp3d.shape).astype(np.float32) * 0.05

    pcfg = PoseOptConfig(use_rot6d=True)
    mv_params, _ = init_pose_params(
        pcfg, bones, kp3d, kp_map=kp_map, kp_uidxs=kp_uidxs
    )

    cfg = CFG
    variables = init_raycaster(jax.random.PRNGKey(4), cfg)
    tar = str(tmp_path / "000013.tar")

    # refusing to emit an unloadable checkpoint: multiview without the maps
    with pytest.raises(ValueError, match="kp_map"):
        export_torch_checkpoint(
            tar, variables, cfg, global_step=13,
            pose_params=mv_params, rest_pose=np.asarray(SMPL_REST_POSE),
        )

    export_torch_checkpoint(
        tar, variables, cfg, global_step=13,
        pose_params=mv_params, rest_pose=np.asarray(SMPL_REST_POSE),
        kp_map=kp_map, kp_uidxs=kp_uidxs,
    )

    popt = load_poseopt_from_state_dict(torch.load(tar))  # strict load inside
    np.testing.assert_array_equal(popt.kp_map.numpy(), kp_map)
    np.testing.assert_array_equal(popt.kp_uidxs.numpy(), kp_uidxs)
    assert popt.use_rot6d
    np.testing.assert_allclose(
        popt.bones.detach().numpy(), np.asarray(mv_params["bones"]), rtol=1e-6
    )

    idx = np.asarray([3, 0, 7, 2])
    with torch.no_grad():
        kps_ref, bones_ref, skts_ref, _, _ = popt(idx)
    kps_j, bones_j, skts_j, _ = pose_apply(
        mv_params, jnp.asarray(idx), jnp.asarray(SMPL_REST_POSE),
        kp_map=jnp.asarray(kp_map),
    )
    np.testing.assert_allclose(
        np.asarray(kps_j), kps_ref.numpy(), atol=2e-5
    )
    np.testing.assert_allclose(
        np.asarray(bones_j), bones_ref.numpy(), atol=1e-6
    )
    np.testing.assert_allclose(
        np.asarray(skts_j), skts_ref.numpy(), atol=2e-5
    )

    # and the reverse migration: our importer surfaces the multiview layout
    from posegen_tpu.train.checkpoints import import_torch_checkpoint

    _, extras = import_torch_checkpoint(tar)
    np.testing.assert_allclose(
        np.asarray(extras["pose_params"]["root_bones"]),
        np.asarray(mv_params["root_bones"]), rtol=1e-6,
    )
    np.testing.assert_array_equal(np.asarray(extras["kp_map"]), kp_map)
    np.testing.assert_array_equal(np.asarray(extras["kp_uidxs"]), kp_uidxs)


def test_export_import_roundtrip_with_pose(tmp_path):
    """export -> import round-trip preserves every tensor, including
    pose-opt state (pelvis/bones ride as poseopt_layer_state_dict with the
    rest_pose buffer and a fresh pose_optimizer_state_dict, matching
    create_popt's unconditional optimizer load, pose_opt.py:54-55)."""
    import jax

    from posegen_tpu.render.raycast import init_raycaster
    from posegen_tpu.skeleton.skeleton import SMPL_REST_POSE
    from posegen_tpu.train.checkpoints import (
        export_torch_checkpoint,
        import_torch_checkpoint,
        load_pose_params,
    )

    cfg = CFG
    variables = init_raycaster(jax.random.PRNGKey(2), cfg)
    rng = np.random.default_rng(0)
    pose_params = {
        "pelvis": rng.standard_normal((3, 3)).astype(np.float32),
        "bones": rng.standard_normal((3, 24, 6)).astype(np.float32),
    }
    tar = str(tmp_path / "000007.tar")
    export_torch_checkpoint(
        tar, variables, cfg, global_step=7,
        pose_params=pose_params, rest_pose=np.asarray(SMPL_REST_POSE),
    )

    back, extras = import_torch_checkpoint(tar)
    assert extras["global_step"] == 7
    for net in ("coarse", "fine"):
        for i, lay in enumerate(variables[net]["pts_linears"]):
            np.testing.assert_allclose(
                np.asarray(back[net]["pts_linears"][i]["w"]),
                np.asarray(lay["w"]), rtol=1e-6,
            )
    np.testing.assert_allclose(
        np.asarray(extras["pose_params"]["bones"]), pose_params["bones"]
    )
    pp = load_pose_params(tar)
    np.testing.assert_allclose(np.asarray(pp["pelvis"]), pose_params["pelvis"])
