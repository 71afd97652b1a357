"""SPIN fine-tuning driver over generated renders (+ optional MPII mix).

Capability parity with reference `train_spin` (run_gan.py:1849-1952): epochs
over the NeRF-rendered (image, pose) dataset with the hinge-filtered
scale-normalized joint loss, optional MPII passes (no hinge), periodic 3DPW
evaluation, checkpoints per epoch.
"""

from __future__ import annotations

import os
from typing import Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

from posegen_tpu.gen.datasets import MPIIPoseDataset, RenderedPoseDataset
from posegen_tpu.gen.spin_train import make_ski_finetune_step, make_spin_finetune_step


def train_spin(
    spin_params: Dict,
    spin_state: Dict,
    render_dir: str,
    mpii_annot: Optional[str] = None,
    mpii_img_dir: Optional[str] = None,
    epochs: int = 10,
    batch_size: int = 32,
    lr: float = 5e-5,  # reference --lr_spin default (run_gan.py:79)
    pose_scale: float = 0.4,
    crop=(100, 412),
    res: int = 224,
    ckpt_dir: Optional[str] = None,
    evaluator=None,
    hinge: Optional[float] = 0.02,  # reference run_gan.py:1890-1914 filter
    seed: int = 0,
    mesh=None,
):
    """Fine-tune SPIN; returns (params, opt metrics history).

    mesh: data-parallel fine-tuning over the device mesh
    (parallel/gan.make_parallel_spin_finetune_step) — batches are trimmed
    to a mesh-size multiple (ragged tails dropped, as a torch DataLoader
    with drop_last would)."""
    nerf_ds = RenderedPoseDataset(render_dir, crop=crop, res=res, pose_scale=pose_scale)
    if len(nerf_ds) == 0:
        raise FileNotFoundError(f"no rendered (image, pose) pairs under {render_dir}")
    mpii_ds = (
        MPIIPoseDataset(mpii_annot, mpii_img_dir, res=res, pose_scale=pose_scale)
        if mpii_annot and mpii_img_dir
        else None
    )

    if mesh is not None and mesh.size > 1:
        from posegen_tpu.parallel.gan import make_parallel_spin_finetune_step

        if batch_size % mesh.size != 0:
            raise ValueError(
                f"batch_size ({batch_size}) must divide over the "
                f"{mesh.size}-device mesh"
            )
        opt_h, step_hinge = make_parallel_spin_finetune_step(
            mesh, lr=lr, pose_scale=pose_scale, hinge=hinge
        )
        _, step_plain = make_parallel_spin_finetune_step(
            mesh, lr=lr, pose_scale=pose_scale, hinge=None
        )
        trim = lambda b: {
            k2: v[: (v.shape[0] // mesh.size) * mesh.size] for k2, v in b.items()
        }
    else:
        opt_h, step_hinge = make_spin_finetune_step(lr=lr, pose_scale=pose_scale, hinge=hinge)
        _, step_plain = make_spin_finetune_step(lr=lr, pose_scale=pose_scale, hinge=None)
        trim = lambda b: b
    opt_state = opt_h.init(spin_params)

    key = jax.random.PRNGKey(seed)
    history = []
    for epoch in range(epochs):
        # NeRF-render passes (hinge filter, reference run_gan.py:1890-1914)
        losses = []
        for i, b in enumerate(nerf_ds.batches(batch_size, seed=seed + epoch)):
            b = trim(b)
            if next(iter(b.values())).shape[0] == 0:
                continue
            key, k = jax.random.split(key)
            spin_params, opt_state, stats = step_hinge(
                spin_params, spin_state, opt_state,
                jnp.asarray(b["image"]), jnp.asarray(b["pose"]), k,
            )
            losses.append(float(stats["spin_loss"]))
        # MPII mix passes (no hinge, reference :1916-1940)
        if mpii_ds is not None:
            idxs = np.random.default_rng(seed + epoch).permutation(len(mpii_ds))
            for s in range(0, len(idxs) - batch_size + 1, batch_size):
                items = [mpii_ds[int(i)] for i in idxs[s : s + batch_size]]
                b = {k2: np.stack([it[k2] for it in items]) for k2 in items[0]}
                key, k = jax.random.split(key)
                spin_params, opt_state, stats = step_plain(
                    spin_params, spin_state, opt_state,
                    jnp.asarray(b["image"]), jnp.asarray(b["pose"]), k,
                )
                losses.append(float(stats["spin_loss"]))

        entry = {"epoch": epoch, "spin_loss": float(np.mean(losses)) if losses else 0.0}
        if evaluator is not None:
            entry["eval"] = evaluator(spin_params, spin_state)
        history.append(entry)
        print(f"spin epoch {epoch}: {entry}")

        if ckpt_dir:  # per-epoch checkpoints (reference :1946-1951)
            os.makedirs(ckpt_dir, exist_ok=True)
            from posegen_tpu.train.checkpoints import _flatten

            np.savez(
                os.path.join(ckpt_dir, f"spin_{epoch:03d}.npz"),
                **_flatten({"params": spin_params, "state": spin_state}),
            )
    return spin_params, history


def train_ski(
    spin_params: Dict,
    spin_state: Dict,
    ski_root: str,
    smpl_neutral,
    J_regressor,
    split: str = "train2/train",  # reference's train split path (:2677)
    epochs: int = 1,
    batch_size: int = 32,
    lr: float = 5e-5,
    res: int = 224,
    ckpt_dir: Optional[str] = None,
    evaluator=None,
    seed: int = 0,
):
    """Fine-tune SPIN on SKI-Pose 3D-joint GT (reference train_ski,
    render_3dpw_testset.py:2659-2775): shuffled epochs over the SKI train
    split with the mesh-regressed scale-matched MPJPE loss, per-epoch eval
    hook (the reference calls evaluate_ski). Returns (params, history)."""
    from posegen_tpu.evals.harness import SkiDataset

    ds = SkiDataset(ski_root, split=split, res=res)
    if len(ds) == 0:
        raise FileNotFoundError(f"no SKI samples under {ski_root}/{split}")
    opt, step = make_ski_finetune_step(smpl_neutral, J_regressor, lr=lr)
    opt_state = opt.init(spin_params)

    key = jax.random.PRNGKey(seed)
    history = []
    for epoch in range(epochs):
        idxs = np.random.default_rng(seed + epoch).permutation(len(ds))
        losses = []
        for s in range(0, len(idxs) - batch_size + 1, batch_size) or [0]:
            items = [ds[int(i)] for i in idxs[s : s + batch_size]]
            images = np.stack([it["image"] for it in items])
            gts = np.stack([it["pose_3d"] for it in items])
            key, k = jax.random.split(key)
            spin_params, opt_state, stats = step(
                spin_params, spin_state, opt_state,
                jnp.asarray(images), jnp.asarray(gts), k,
            )
            losses.append(float(stats["spin_loss"]))
        entry = {"epoch": epoch, "ski_loss": float(np.mean(losses)) if losses else 0.0}
        if evaluator is not None:  # reference: evaluate_ski per epoch (:2775)
            entry["eval"] = evaluator(spin_params, spin_state)
        history.append(entry)
        print(f"ski epoch {epoch}: {entry}")
        if ckpt_dir:
            os.makedirs(ckpt_dir, exist_ok=True)
            from posegen_tpu.train.checkpoints import _flatten

            np.savez(
                os.path.join(ckpt_dir, f"spin_ski_{epoch:03d}.npz"),
                **_flatten({"params": spin_params, "state": spin_state}),
            )
    return spin_params, history
