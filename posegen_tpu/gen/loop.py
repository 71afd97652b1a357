"""The PoseGen dataset-generation loop: G <-> NeRF render <-> SPIN feedback.

Capability parity with the reference's `train_gan`/`train`/`run_render`
(run_gan.py:1956-2337) and `train_spin` (:1849-1952), with the key
inefficiency fixed: the reference reloads the NeRF from disk inside EVERY
render call (run_gan.py:2308); here the renderer params stay device-resident
for the whole run, and rendered images go straight into SPIN without the
png-write/read round-trip (run_gan.py:2054-2081) — an optional sink still
writes the (image, pose) pairs out as the generated dataset.

Camera convention: the fixed extrinsic the reference uses for all feedback
renders (run_gan.py:2021-2028) is reproduced here as FEEDBACK_EXTRINSIC.
"""

from __future__ import annotations

import dataclasses
import os
from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from posegen_tpu.gen.gan import (
    SPIN_J14,
    FakePool,
    make_discriminator_step,
    make_generator_step,
)
from posegen_tpu.gen.generators import GenConfig, init_pose_generator, pose_generator_apply
from posegen_tpu.gen.discriminators import init_pos3d_discriminator
from posegen_tpu.gen.hmr import hmr_apply
from posegen_tpu.render.raycast import PoseCtx, RaycastConfig
from posegen_tpu.skeleton.cameras import nerf_extrinsic_to_c2w
from posegen_tpu.skeleton.geometry import get_kp_bounding_cylinder
from posegen_tpu.skeleton.kinematics import invert_rigid, smpl_l2ws

# fixed feedback camera (reference run_gan.py:2021-2028), ~65 deg yaw, 4.29m out
FEEDBACK_EXTRINSIC = np.array(
    [
        [-5.29919172e-01, -5.56525674e-09, 8.48048140e-01, -1.34771157e-07],
        [1.47262004e-01, 9.84807813e-01, 9.20194958e-02, 1.26640154e-08],
        [-8.35164413e-01, 1.73648166e-01, -5.21868549e-01, 4.28571429e00],
        [0.0, 0.0, 0.0, 1.0],
    ],
    dtype=np.float32,
)

IMAGENET_MEAN = np.array([0.485, 0.456, 0.406], np.float32)
IMAGENET_STD = np.array([0.229, 0.224, 0.225], np.float32)


@dataclasses.dataclass
class GanLoopConfig:
    """Workload knobs (reference run_gan.py:63-133 argparse defaults)."""

    n_epochs: int = 50
    lr_g: float = 1e-4
    lr_d: float = 1e-4
    df: int = 2  # D update period
    feedback_every: int = 5  # SPIN feedback period (reference :2041)
    feedback_start_epoch: int = 2
    rpi: int = 20  # renders per feedback call
    render_hw: int = 512
    render_focal: float = 1000.0
    crop: Tuple[int, int] = (100, 412)  # center crop (reference :2069)
    pose_scale: float = 0.4
    spin_coef: float = 0.1
    output_dir: Optional[str] = None  # write (image, pose) dataset when set
    # Render feedback frames only inside the SPIN crop window: every
    # downstream consumer (the in-loop SPIN forward AND the dataset
    # fine-tune reader) crops to `crop` before use (reference
    # run_gan.py:2069 image[100:412, 100:412]), so rays outside it are
    # dead work — ~2.5x of the feedback render at the reference camera.
    # The sink PNGs keep background-only margins outside the crop; set
    # False for byte-faithful full-frame renders.
    feedback_crop: bool = True


def fk_joints(bones: jax.Array, scale: float = 0.4) -> jax.Array:
    """Axis-angle (B, 24, 3) -> world joints (B, 24, 3)."""
    return smpl_l2ws(bones, scale=scale)[..., :3, 3]


class NeRFRenderer:
    """Resident renderer: params loaded once, one jit for all feedback calls."""

    def __init__(self, cfg: RaycastConfig, params: Dict[str, Any],
                 hw: int = 512, focal: float = 1000.0, pose_scale: float = 0.4,
                 chunk: int = 8192, white_bkgd: bool = False):
        self.cfg = cfg
        self.params = params
        self.hw = hw
        self.focal = focal
        self.pose_scale = pose_scale
        self.white_bkgd = white_bkgd  # reference run_gan --white_bkgd
        from posegen_tpu.parallel.mesh import auto_render_fn

        # multi-chip: the feedback renderer shards its 512^2 ray set over
        # the mesh (reference DataParallel covered run_gan's render too).
        # f16 readback: SPIN consumes ImageNet-normalized crops, far above
        # f16 rounding; halves the per-frame transfer. Single chip returns
        # render_fn=None -> render_image's memoized in-graph-raygen jit.
        self._render_fn, self.chunk = auto_render_fn(
            cfg, chunk, half_readback=True
        )

    def render_poses(self, bones: np.ndarray, c2ws: np.ndarray,
                     window=None) -> np.ndarray:
        """Render one image per pose -> (K, H, W, 3) float [0, 1]
        (reference run_render, run_gan.py:2299-2337, NeRF kept resident).

        Pose prep (FK, rigid inverse, cylinders) stays on-device; only the
        (K, 5) cylinder rows cross to the host for the 2D box math. All K
        images go through render_images_pipelined, which enqueues every
        chunk before any readback — the per-image drain of the old loop
        cost ~0.7 s/frame of chip idle on the tunneled host."""
        from posegen_tpu.render.image import render_images_pipelined

        l2ws = smpl_l2ws(jnp.asarray(bones), scale=self.pose_scale)
        kps = l2ws[..., :3, 3]
        skts = invert_rigid(l2ws)
        cyls_dev = get_kp_bounding_cylinder(kps, ext_scale=0.001).astype(
            jnp.float32
        )
        cyls = np.asarray(cyls_dev)
        bones_dev = jnp.asarray(bones)
        ctxs = [
            PoseCtx(
                kps=kps[k : k + 1],
                skts=skts[k : k + 1],
                bones=bones_dev[k : k + 1],
                cyls=cyls_dev[k : k + 1],
            )
            for k in range(bones.shape[0])
        ]
        return render_images_pipelined(
            self.cfg, self.params, self.hw, self.hw, self.focal,
            c2ws, ctxs, cyls, chunk=self.chunk,
            white_bkgd=self.white_bkgd, render_fn=self._render_fn,
            half_readback=True, window=window,
        )


def prepare_spin_input(imgs: np.ndarray, crop: Tuple[int, int] = (100, 412)) -> jax.Array:
    """Center-crop, resize to 224, ImageNet-normalize
    (reference run_gan.py:2066-2081)."""
    lo, hi = crop
    x = jnp.asarray(imgs[:, lo:hi, lo:hi])
    x = jax.image.resize(x, (x.shape[0], 224, 224, 3), "linear")
    return (x - IMAGENET_MEAN) / IMAGENET_STD


def probe_hardness(trainer: "GanTrainer", probe_real: np.ndarray,
                   probe_key: jax.Array) -> float:
    """Mean root-centred 14-joint SPIN error on poses generated from FIXED
    inputs + noise — the hardness of the generator's current output
    distribution against the current estimator. This is the quantity the
    feedback reward pushes up (gen/gan.py spin term; reference
    run_gan.py:2087-2096's `1 - mpjpe`), measured at matched inputs so
    epochs are comparable (the exp_mining probe, productized)."""
    out, _ = pose_generator_apply(
        trainer.g_params, trainer.g_state, probe_key,
        jnp.asarray(probe_real), trainer.gen_cfg,
    )
    bones = np.asarray(out["pose_ba"])
    c2w = nerf_extrinsic_to_c2w(FEEDBACK_EXTRINSIC)
    imgs = trainer.renderer.render_poses(
        bones, np.broadcast_to(c2w, (len(bones), 4, 4)),
        window=trainer.cfg.crop if trainer.cfg.feedback_crop else None,
    )
    pred = trainer._spin_fwd(
        trainer.spin_params, trainer.spin_state, jnp.asarray(imgs)
    )
    gt = fk_joints(jnp.asarray(bones), trainer.cfg.pose_scale)[
        :, jnp.asarray(SPIN_J14)
    ]
    pred = pred - pred[:, :1]
    gt = gt - gt[:, :1]
    return float(jnp.mean(jnp.linalg.norm(pred - gt, axis=-1)))


class GanTrainer:
    """Orchestrates the full loop (reference train(), run_gan.py:2259-2297)."""

    def __init__(
        self,
        loop_cfg: GanLoopConfig,
        renderer: Optional[NeRFRenderer],
        spin_params: Optional[Dict] = None,
        spin_state: Optional[Dict] = None,
        gen_cfg: GenConfig = GenConfig(),
        steps_per_epoch: int = 1000,
        seed: int = 0,
        mesh=None,
    ):
        self.cfg = loop_cfg
        self.gen_cfg = gen_cfg
        self.renderer = renderer
        self.spin_params = spin_params
        self.spin_state = spin_state
        self.key = jax.random.PRNGKey(seed)

        self.g_params, self.g_state = init_pose_generator(
            jax.random.PRNGKey(seed), gen_cfg
        )
        self.d_params = init_pos3d_discriminator(jax.random.PRNGKey(seed + 1))

        fk = lambda b: fk_joints(b, loop_cfg.pose_scale)
        if mesh is not None and mesh.size > 1:
            # data-parallel G/D steps over the mesh (sync-BN + psum'd grads;
            # matches the single-device steps exactly — parallel/gan.py).
            # Pose batches must divide by mesh.size; the steps check loudly.
            from posegen_tpu.parallel.gan import (
                make_parallel_discriminator_step,
                make_parallel_generator_step,
            )

            self.g_opt, self.g_step = make_parallel_generator_step(
                mesh, fk, gen_cfg, lr=loop_cfg.lr_g, n_epochs=loop_cfg.n_epochs,
                steps_per_epoch=steps_per_epoch, spin_coef=loop_cfg.spin_coef,
            )
            self.d_opt, self.d_step = make_parallel_discriminator_step(
                mesh, lr=loop_cfg.lr_d, n_epochs=loop_cfg.n_epochs,
                steps_per_epoch=steps_per_epoch,
            )
        else:
            self.g_opt, self.g_step = make_generator_step(
                fk, gen_cfg, lr=loop_cfg.lr_g, n_epochs=loop_cfg.n_epochs,
                steps_per_epoch=steps_per_epoch, spin_coef=loop_cfg.spin_coef,
            )
            self.d_opt, self.d_step = make_discriminator_step(
                lr=loop_cfg.lr_d, n_epochs=loop_cfg.n_epochs,
                steps_per_epoch=steps_per_epoch,
            )
        self.g_opt_state = self.g_opt.init(self.g_params)
        self.d_opt_state = self.d_opt.init(self.d_params)
        self.fake_pool = FakePool(seed=seed)
        self.iter_num = 0
        self.epoch = 0
        self._render_count = 0
        self._last_bones: Optional[np.ndarray] = None
        self._png_pool = None
        self._png_futs: list = []

        def _spin_fwd(p, s, imgs):
            # crop/normalize + ResNet-50 SPIN + FK in ONE compiled program —
            # eager dispatch of the feedback forward dominated the path
            from posegen_tpu.skeleton.kinematics import smpl_l2ws_from_rots

            x = prepare_spin_input(imgs, self.cfg.crop)
            rotmat, _, _, _ = hmr_apply(p, s, x)
            l2ws = smpl_l2ws_from_rots(rotmat, scale=self.cfg.pose_scale)
            return l2ws[..., :3, 3][:, jnp.asarray(SPIN_J14)]

        self._spin_fwd = jax.jit(_spin_fwd)

    def _next_key(self) -> jax.Array:
        self.key, k = jax.random.split(self.key)
        return k

    def spin_feedback(self, bones: np.ndarray, sel: np.ndarray) -> jax.Array:
        """Render selected poses, run SPIN, return predicted 14-joint sets
        (K, 14, 3) — constants w.r.t. G (reference run_gan.py:2041-2091)."""
        c2w = nerf_extrinsic_to_c2w(FEEDBACK_EXTRINSIC)
        c2ws = np.broadcast_to(c2w, (len(sel), 4, 4))
        imgs = self.renderer.render_poses(
            bones[sel], c2ws,
            window=self.cfg.crop if self.cfg.feedback_crop else None,
        )

        if self.cfg.output_dir:  # optional dataset sink
            self._save_renders(imgs, bones[sel])

        joints14 = self._spin_fwd(
            self.spin_params, self.spin_state, jnp.asarray(imgs)
        )
        return jax.lax.stop_gradient(joints14)

    def _save_renders(self, imgs: np.ndarray, bones: np.ndarray) -> None:
        """(image, pose) dataset export (reference run_gan.py:2049-2059,
        2333-2337: render_output/{run}/image/%05d.png + poses npys).

        PNG encodes run on a small writer pool: zlib compression releases
        the GIL, so on the 1-core host the ~0.1 s/frame encode otherwise
        serializes against the next feedback render's dispatch. flush_sink()
        joins the pool (called before checkpoints and by consumers that
        read the sink back)."""
        img_dir = os.path.join(self.cfg.output_dir, "image")
        os.makedirs(img_dir, exist_ok=True)
        if self._png_pool is None:
            from concurrent.futures import ThreadPoolExecutor

            self._png_pool = ThreadPoolExecutor(max_workers=2)

        def _write(path: str, img: np.ndarray) -> None:
            import imageio.v2 as imageio

            # compress_level 1: ~4x faster zlib pass on the 1-core host; the
            # sink is a training dataset, size is cheaper than host stalls
            imageio.imwrite(path, img, compress_level=1)

        u8 = (np.clip(imgs, 0, 1) * 255).astype(np.uint8)
        for i, img in enumerate(u8):
            idx = self._render_count + i
            self._png_futs.append(self._png_pool.submit(
                _write, os.path.join(img_dir, f"{idx:05d}.png"), img
            ))
        if len(self._png_futs) > 256:
            self.flush_sink()
        np.save(
            os.path.join(self.cfg.output_dir, f"poses_axis_angles{self._render_count}.npy"),
            bones,
        )
        self._render_count += len(imgs)

    def flush_sink(self) -> None:
        """Wait for queued dataset writes; re-raise the first failure."""
        futs, self._png_futs = self._png_futs, []
        for f in futs:
            f.result()

    def train_step(self, real_pose: np.ndarray) -> Dict[str, float]:
        """One GAN iteration (reference run_gan.py:1993-2120)."""
        real_pose = jnp.asarray(real_pose)
        use_feedback = (
            self.renderer is not None
            and self.spin_params is not None
            and self.epoch > self.cfg.feedback_start_epoch
            and self.iter_num % self.cfg.feedback_every == 0
        )
        rpi = min(self.cfg.rpi, real_pose.shape[0])
        key = self._next_key()
        if use_feedback:
            # pre-run the generator with the SAME key the update will use:
            # the rendered/SPIN-judged poses are exactly this iteration's
            # generated poses (reference run_gan.py:2041-2091 computes the
            # reward on the current forward). The BN state from this pre-pass
            # is discarded; g_step recomputes it identically.
            out_pre, _ = pose_generator_apply(
                self.g_params, self.g_state, key, real_pose, self.gen_cfg
            )
            bones_now = np.asarray(out_pre["pose_ba"])
            sel = np.random.default_rng(self.iter_num).integers(
                0, bones_now.shape[0], (rpi,)
            )
            spin_pred = self.spin_feedback(bones_now, sel)
            spin_sel = jnp.asarray(sel, jnp.int32)
            active = jnp.asarray(1.0)
        else:
            spin_pred = jnp.zeros((rpi, len(SPIN_J14), 3))
            spin_sel = jnp.zeros((rpi,), jnp.int32)
            active = jnp.asarray(0.0)

        self.g_params, self.g_state, self.g_opt_state, out, g_stats = self.g_step(
            self.g_params, self.g_state, self.g_opt_state, self.d_params,
            key, real_pose, spin_pred, spin_sel, active,
        )
        self._last_bones = np.asarray(out["pose_ba"])

        stats = {k: float(v) for k, v in g_stats.items()}
        if self.iter_num % self.cfg.df == 0:
            pooled = self.fake_pool(self._last_bones)
            self.d_params, self.d_opt_state, d_stats = self.d_step(
                self.d_params, self.d_opt_state, real_pose, jnp.asarray(pooled)
            )
            stats.update({k: float(v) for k, v in d_stats.items()})
        self.iter_num += 1
        return stats

    def train_epoch(self, pose_batches) -> Dict[str, float]:
        """Epoch stats are MEANS over the epoch's iterations (a last-iter
        snapshot hides the spin term entirely: feedback fires on iters where
        iter_num % feedback_every == 0, which the final iter usually isn't).
        `spin_loss` is averaged over the feedback iterations only and
        reported alongside their count."""
        sums: Dict[str, float] = {}
        counts: Dict[str, int] = {}
        for batch in pose_batches:
            for k, v in self.train_step(batch).items():
                if k == "spin_loss" and v == 0.0:
                    continue  # inactive-feedback iters carry a structural 0
                sums[k] = sums.get(k, 0.0) + v
                counts[k] = counts.get(k, 0) + 1
        self.epoch += 1
        out = {k: sums[k] / counts[k] for k in sums}
        out["n_feedback_iters"] = float(counts.get("spin_loss", 0))
        return out

    # -- checkpoint / resume (the reference persists only SPIN checkpoints,
    # run_gan.py:1947 — its G/D state is lost on interruption; here the full
    # GAN run resumes exactly: params, BN state, both optimizers, PRNG key,
    # the fake-replay pool incl. its RNG bit state, and loop counters) --

    def save_checkpoint(self, path: str) -> str:
        import pickle

        self.flush_sink()  # the checkpoint's render_count must match disk

        from posegen_tpu.train.checkpoints import _flatten

        flat = _flatten({
            "g_params": self.g_params, "g_state": self.g_state,
            "g_opt_state": self.g_opt_state,
            "d_params": self.d_params, "d_opt_state": self.d_opt_state,
            "key": self.key,
        })
        flat["iter_num"] = np.asarray(self.iter_num)
        flat["epoch"] = np.asarray(self.epoch)
        flat["render_count"] = np.asarray(self._render_count)
        if self.fake_pool.items:
            flat["pool_items"] = np.stack(self.fake_pool.items)
        flat["pool_rng_state"] = np.frombuffer(
            pickle.dumps(self.fake_pool.rng.bit_generator.state), np.uint8
        )
        os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
        np.savez(path, **flat)
        return path

    def load_checkpoint(self, path: str) -> "GanTrainer":
        import pickle

        import jax.numpy as _jnp

        from posegen_tpu.train.checkpoints import _unflatten_into

        raw = dict(np.load(path))
        tree = _unflatten_into(
            {
                "g_params": self.g_params, "g_state": self.g_state,
                "g_opt_state": self.g_opt_state,
                "d_params": self.d_params, "d_opt_state": self.d_opt_state,
                "key": self.key,
            },
            raw,
        )
        self.g_params, self.g_state = tree["g_params"], tree["g_state"]
        self.g_opt_state = tree["g_opt_state"]
        self.d_params, self.d_opt_state = tree["d_params"], tree["d_opt_state"]
        self.key = _jnp.asarray(tree["key"])
        self.iter_num = int(raw["iter_num"])
        self.epoch = int(raw["epoch"])
        self._render_count = int(raw["render_count"])
        self.fake_pool.items = (
            list(raw["pool_items"]) if "pool_items" in raw else []
        )
        self.fake_pool.rng.bit_generator.state = pickle.loads(
            raw["pool_rng_state"].tobytes()
        )
        return self
