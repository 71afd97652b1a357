"""End-to-end slice: data -> train -> render -> eval on synthetic data.

The TPU analog of the reference's visual/metric validation loop
(run_nerf.py:540-604): a tiny NeRF overfits a few synthetic views; held-out
render PSNR must improve over the untrained model.
"""

import jax
import numpy as np
import pytest

from posegen_tpu.data.catalog import DataConfig, load_data
from posegen_tpu.evals.image import psnr
from posegen_tpu.render.image import render_image
from posegen_tpu.render.raycast import PoseCtx, RaycastConfig, init_raycaster
from posegen_tpu.train.trainer import TrainConfig, create_train_state, make_train_step

TINY = RaycastConfig(
    N_samples=12, N_importance=4, netdepth=2, netwidth=48, multires=4, multires_views=2
)


@pytest.mark.slow
def test_train_then_render_improves_psnr(tmp_path):
    cfg = TINY
    dcfg = DataConfig(
        dataset="synthetic", data_root=str(tmp_path), n_rand=256,
        n_sample_images=4, num_val_images=1, mask_image=True,
    )
    loader, render_data, attrs = load_data(dcfg)

    tcfg = TrainConfig(lrate=5e-3)
    variables = init_raycaster(jax.random.PRNGKey(0), cfg)
    state = create_train_state(variables, tcfg)
    step = jax.jit(make_train_step(cfg, tcfg))

    def render_val():
        params = {**state.params, **state.embeds}
        ctx = PoseCtx(
            kps=render_data["kp3d"][:1],
            skts=render_data["skts"][:1],
            bones=render_data["bones"][:1],
            cyls=render_data["cyls"][:1],
        )
        H, W, focal = render_data["hwf"]
        out = render_image(
            cfg, params, H, W, float(np.ravel(render_data["focals"])[0]),
            render_data["c2ws"][0], ctx, chunk=2048,
        )
        gt = render_data["imgs"][0] * render_data["masks"][0]
        return float(psnr(out["rgb"], gt))

    psnr_before = render_val()

    key = jax.random.PRNGKey(0)
    it = iter(loader)
    losses = []
    for i in range(60):
        batch = next(it)
        state, stats = step(state, batch, jax.random.fold_in(key, i))
        losses.append(float(stats["total_loss"]))
    loader.close()

    assert np.isfinite(losses).all()
    assert np.mean(losses[-10:]) < np.mean(losses[:10])

    psnr_after = render_val()
    assert psnr_after > psnr_before + 1.0, (
        f"render PSNR did not improve: {psnr_before:.2f} -> {psnr_after:.2f}"
    )
