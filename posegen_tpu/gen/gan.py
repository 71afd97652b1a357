"""GAN machinery: LSGAN losses, fake-replay pool, projection, train steps.

Capability parity with the reference's GAN loop plumbing
(run_gan.py:578-600 `Sample_from_Pool`, 732-759 `project_to_2d`,
1117-1141 `get_adv_loss`, 1143-1178 `train_dis`, 1956-2135 `train_gan`)
rebuilt as pure jitted steps + a host-side replay buffer. The LSGAN
criterion is MSE on logits, matching the reference's nn.MSELoss.
"""

from __future__ import annotations

from typing import Callable, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
import optax

from posegen_tpu.gen.discriminators import pos3d_discriminator_apply
from posegen_tpu.gen.generators import GenConfig, pose_generator_apply


def lsgan_loss(logits: jax.Array, target: float) -> jax.Array:
    return jnp.mean((logits - target) ** 2)


def discriminator_accuracy(logits: jax.Array, target: float) -> jax.Array:
    """Fraction of logits within 0.5 of the target label
    (reference get_discriminator_accuracy, run_gan.py:584-598)."""
    return jnp.mean((jnp.abs(logits - target) <= 0.5).astype(jnp.float32))


def project_to_2d(
    kps: jax.Array,
    exts: jax.Array,
    H: float,
    W: float,
    focals: Tuple[float, float],
) -> Tuple[jax.Array, jax.Array]:
    """Perspective projection (reference run_gan.py:732-759).

    kps (B, J, 3) world; exts (B, 4, 4) or (4, 4) extrinsics.
    Returns (kp2d (B, J, 2) pixels, kp3d_cam (B, J, 3))."""
    if exts.ndim == 2:
        exts = jnp.broadcast_to(exts, (kps.shape[0], 4, 4))
    hom = jnp.concatenate([kps, jnp.ones((*kps.shape[:-1], 1), kps.dtype)], axis=-1)
    cam = jnp.einsum("nxy,njy->njx", exts, hom)[..., :3]
    xy = cam[..., :2] * jnp.asarray(focals) / jnp.where(cam[..., 2:3] == 0, 1.0, cam[..., 2:3])
    xy = jnp.where(jnp.isfinite(xy), xy, 0.0)
    xy = xy + jnp.asarray([W * 0.5, H * 0.5])
    return xy, cam


def normalize_screen_coordinates(x: jax.Array, w: float, h: float) -> jax.Array:
    """[0,w]x[0,h] pixels -> [-1,1] preserving aspect (run_gan.py:761-765)."""
    return x / w * 2.0 - jnp.asarray([1.0, h / w])


class FakePool:
    """Replay buffer of generated poses for discriminator training
    (reference Sample_from_Pool, run_gan.py:578-600). Host-side numpy."""

    def __init__(self, max_elements: int = 4096, seed: int = 0):
        self.max_elements = max_elements
        self.items: list = []
        self.rng = np.random.default_rng(seed)

    def __call__(self, batch: np.ndarray) -> np.ndarray:
        out = []
        for item in np.asarray(batch):
            if len(self.items) < self.max_elements:
                self.items.append(item)
                out.append(item)
            elif self.rng.random() > 0.5:
                idx = self.rng.integers(0, self.max_elements)
                out.append(self.items[idx].copy())
                self.items[idx] = item
            else:
                out.append(item)
        return np.stack(out)


def lambda_lr(base_lr: float, n_epochs: int, steps_per_epoch: int):
    """The reference's 'lambda' policy: linear decay to 0 over training
    (run_gan.py get_scheduler)."""

    def sched(step):
        epoch = step // max(steps_per_epoch, 1)
        return base_lr * jnp.maximum(0.0, 1.0 - epoch / max(n_epochs, 1))

    return sched


# 14-joint eval subset used by the SPIN feedback reward
# (reference run_gan.py:2096-2097)
SPIN_J14 = (1, 2, 4, 5, 7, 8, 12, 15, 16, 17, 18, 19, 20, 21)


def make_generator_step(
    fk_fn: Callable[[jax.Array], jax.Array],
    cfg: GenConfig = GenConfig(),
    lr: float = 1e-4,
    n_epochs: int = 50,
    steps_per_epoch: int = 1000,
    spin_coef: float = 0.1,
    grad_clip: float = 1.0,
    axis_name: Optional[str] = None,
):
    """Generator update (reference run_gan.py:2014-2107).

    The 3-D discriminator judges the generated axis-angle pose itself (as in
    the reference, which feeds `pose_ba` to Pos3dDiscriminator).

    fk_fn: bones (B, J, 3) -> joints (B, J, 3) (differentiable FK, the
    reference's get_smpl_l2ws_torch at scale 0.4). The SPIN feedback term is
    `1 - mpjpe(spin_pred, joints[sel])` on root-centred 14-joint subsets
    (reference :2093-2100): `spin_pred` is a constant (SPIN ran on rendered
    images, no grad), so the reward pushes the generator's own joints AWAY
    from what SPIN predicted — hard-pose mining.

    step(..., spin_pred (K, 14, 3), spin_sel (K,), spin_active scalar 0/1).

    axis_name: data-parallel mode for use under shard_map with `real_pose`
    sharded along the mesh axis and everything else replicated. The step
    then matches the single-device step on the concatenated batch exactly:
    noise is drawn GLOBALLY from the replicated key and sliced per device,
    BN runs synced (nn.layers.batchnorm axis_name), joints all_gather so
    `spin_sel` indexes the global batch, and per-device loss contributions
    are built to psum to the global loss (local sums over global
    denominators; the gathered spin term divided by axis_size), so
    psum(grads) IS the global gradient. Built by
    parallel.gan.make_parallel_generator_step.
    """
    opt = optax.chain(
        optax.clip_by_global_norm(grad_clip),
        optax.adam(lambda_lr(lr, n_epochs, steps_per_epoch)),
    )

    def loss_fn(g_params, g_state, d_params, key, real_pose, spin_pred,
                spin_sel, spin_active):
        if axis_name is None:
            noises = None
            n_dev = 1
        else:
            # replicate the single-device key-split structure at the GLOBAL
            # batch shape, then slice this device's rows: the concatenated
            # sharded forward sees exactly the single-device noise
            n_dev = jax.lax.axis_size(axis_name)
            b_loc = real_pose.shape[0]
            start = jax.lax.axis_index(axis_name) * b_loc
            sl = lambda a: jax.lax.dynamic_slice_in_dim(a, start, b_loc, 0)
            k_ba, k_rt = jax.random.split(key)
            k1, k2, k3 = jax.random.split(k_rt, 3)
            bg = b_loc * n_dev
            noises = {
                "ba": sl(jax.random.normal(k_ba, (bg, cfg.noise_ch))),
                "r": sl(jax.random.normal(k1, (bg, cfg.rt_noise_ch))),
                "eps": sl(jax.random.normal(k2, (bg, 3))),
                "t": sl(jax.random.normal(k3, (bg, cfg.rt_noise_ch))),
            }
        out, new_state = pose_generator_apply(
            g_params, g_state, key, real_pose, cfg,
            noises=noises, axis_name=axis_name,
        )
        # Only pose_ba (bone angles) enters the loss — the reference's
        # default train_gan behaves identically: its feedback render uses a
        # FIXED hard-coded extrinsic (run_gan.py:2023-2029) and its adv/spin
        # terms touch outputs_axis_angle only, so the R/T trunks receive no
        # gradient there either; Pos2dDiscriminator is likewise built but
        # unwired (SURVEY.md 2f).
        logits = pos3d_discriminator_apply(d_params, out["pose_ba"])
        # local-sum / global-count: psum over devices = the global mean loss
        adv = jnp.sum((logits - 1.0) ** 2) * 0.5 / (logits.shape[0] * n_dev)

        joints = fk_fn(out["pose_ba"])  # (B_local, J, 3)
        if axis_name is not None:
            # spin_sel indexes the GLOBAL batch (the trainer selected render
            # poses from the full generated set)
            joints = jax.lax.all_gather(joints, axis_name, axis=0, tiled=True)
        j_sel = jnp.take(joints, spin_sel, axis=0)[:, jnp.asarray(SPIN_J14)]
        j_sel = j_sel - j_sel[:, :1]
        pred = spin_pred - spin_pred[:, :1]
        # eps-safe norm: plain norm has NaN gradient at exactly-zero diffs
        # (root joints coincide after centring when feedback is inactive)
        err = jnp.mean(jnp.sqrt(jnp.sum((pred - j_sel) ** 2, axis=-1) + 1e-12))
        # computed identically on every device from the gathered joints, so
        # divide by n_dev to keep psum-of-contributions = the global term
        spin_loss = (1.0 - err) * spin_active / n_dev

        total = adv + spin_coef * spin_loss
        stats = {"adv_loss": adv, "spin_loss": spin_loss, "gen_loss": total}
        return total, (new_state, out, stats)

    @jax.jit
    def step(g_params, g_state, g_opt_state, d_params, key, real_pose,
             spin_pred, spin_sel, spin_active):
        (_, (new_state, out, stats)), grads = jax.value_and_grad(
            loss_fn, has_aux=True
        )(g_params, g_state, d_params, key, real_pose, spin_pred, spin_sel,
          spin_active)
        if axis_name is not None:
            grads = jax.lax.psum(grads, axis_name)
            stats = jax.lax.psum(stats, axis_name)
        updates, g_opt_state = opt.update(grads, g_opt_state, g_params)
        g_params = optax.apply_updates(g_params, updates)
        return g_params, new_state, g_opt_state, out, stats

    return opt, step


def make_discriminator_step(
    lr: float = 1e-4,
    n_epochs: int = 50,
    steps_per_epoch: int = 1000,
    grad_clip: float = 1.0,
    axis_name: Optional[str] = None,
):
    """Discriminator update with pooled fakes (reference train_dis,
    run_gan.py:1143-1178).

    axis_name: data-parallel mode (real/fake batches sharded along the mesh
    axis under shard_map). Per-device losses are local sums over global
    counts, so psum(grads) equals the single-device gradient on the
    concatenated batch; stats psum back to the global values. Built by
    parallel.gan.make_parallel_discriminator_step."""
    opt = optax.chain(
        optax.clip_by_global_norm(grad_clip),
        optax.adam(lambda_lr(lr, n_epochs, steps_per_epoch)),
    )
    def loss_fn(d_params, real_kp3d, fake_kp3d):
        n_dev = 1 if axis_name is None else jax.lax.axis_size(axis_name)
        real_logits = pos3d_discriminator_apply(d_params, real_kp3d)
        fake_logits = pos3d_discriminator_apply(d_params, fake_kp3d)
        loss = 0.5 * (
            jnp.sum((real_logits - 1.0) ** 2) / (real_logits.shape[0] * n_dev)
            + jnp.sum(fake_logits**2) / (fake_logits.shape[0] * n_dev)
        )
        return loss, {
            "dis_loss": loss,
            "real_acc": discriminator_accuracy(real_logits, 1.0) / n_dev,
            "fake_acc": discriminator_accuracy(fake_logits, 0.0) / n_dev,
        }

    @jax.jit
    def step(d_params, d_opt_state, real_kp3d, fake_kp3d):
        (_, stats), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            d_params, real_kp3d, jax.lax.stop_gradient(fake_kp3d)
        )
        if axis_name is not None:
            grads = jax.lax.psum(grads, axis_name)
            stats = jax.lax.psum(stats, axis_name)
        updates, d_opt_state = opt.update(grads, d_opt_state, d_params)
        d_params = optax.apply_updates(d_params, updates)
        return d_params, d_opt_state, stats

    return opt, step
