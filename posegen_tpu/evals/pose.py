"""3-D pose metrics: MPJPE, Procrustes-aligned PA-MPJPE, PCK, AUC.

Capability parity with the reference's pose evaluation
(core/utils/evaluation_helpers.py:387-612 `procrustes`/
`Criterion3DPose_*`/`evaluate_pampjpe_from_smpl_params`, and the numpy
similarity transform + PCK in run_gan.py:1380-1464). Implemented batched in
JAX (SVD vmaps cleanly); thin numpy wrappers keep the eval CLIs host-simple.
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np


def mpjpe(pred: jax.Array, gt: jax.Array) -> jax.Array:
    """Mean per-joint position error. pred/gt: (..., J, 3)."""
    return jnp.mean(jnp.linalg.norm(pred - gt, axis=-1))


def similarity_transform(
    S1: jax.Array, S2: jax.Array
) -> Tuple[jax.Array, jax.Array, jax.Array, jax.Array]:
    """Optimal similarity transform (scale, R, t) aligning S1 -> S2.

    S1/S2: (J, 3). Returns (S1_hat, scale, R, t) — the classic orthogonal
    Procrustes solution with reflection fix (reference run_gan.py:1380-1434).
    """
    mu1 = jnp.mean(S1, axis=0, keepdims=True)
    mu2 = jnp.mean(S2, axis=0, keepdims=True)
    X1, X2 = S1 - mu1, S2 - mu2
    var1 = jnp.sum(X1**2)
    K = X1.T @ X2
    U, s, Vt = jnp.linalg.svd(K)
    # reflection guard: det(R) = +1
    d = jnp.sign(jnp.linalg.det(Vt.T @ U.T))
    D = jnp.diag(jnp.array([1.0, 1.0, 1.0]) * jnp.array([1.0, 1.0, d]))
    R = Vt.T @ D @ U.T
    scale = jnp.trace(jnp.diag(s) @ D) / jnp.maximum(var1, 1e-12)
    t = mu2.T - scale * (R @ mu1.T)
    S1_hat = scale * (R @ S1.T) + t
    return S1_hat.T, scale, R, t


def procrustes_align(pred: jax.Array, gt: jax.Array) -> jax.Array:
    """Batched Procrustes alignment of pred onto gt: (..., J, 3)."""
    flat_p = pred.reshape(-1, *pred.shape[-2:])
    flat_g = gt.reshape(-1, *gt.shape[-2:])
    aligned = jax.vmap(lambda a, b: similarity_transform(a, b)[0])(flat_p, flat_g)
    return aligned.reshape(pred.shape)


def pa_mpjpe(pred: jax.Array, gt: jax.Array) -> jax.Array:
    """Procrustes-aligned MPJPE (reconstruction error, run_gan.py:1437-1456)."""
    return mpjpe(procrustes_align(pred, gt), gt)


def per_joint_error(pred: jax.Array, gt: jax.Array, align: bool = False) -> jax.Array:
    if align:
        pred = procrustes_align(pred, gt)
    return jnp.linalg.norm(pred - gt, axis=-1)


def pck(errors: jax.Array, threshold: float = 0.150) -> jax.Array:
    """Fraction of joints strictly under `threshold` (meters; the reference
    computes `(pampjpe < 150).mean()` on mm errors and reports the raw
    fraction — evaluation_helpers.py:592-595)."""
    return jnp.mean((errors < threshold).astype(jnp.float32))


def auc(errors: jax.Array, max_threshold: float = 0.150, steps: int = 31) -> jax.Array:
    """Mean PCK over `steps` thresholds linspaced on [0, max_threshold]
    (the reference averages pck_at_t over linspace(0, 150, 31) rather than
    integrating — evaluation_helpers.py:597-603); returns a fraction."""
    ths = jnp.linspace(0.0, max_threshold, steps)
    pcks = jax.vmap(lambda t: jnp.mean((errors < t).astype(jnp.float32)))(ths)
    return jnp.mean(pcks)


def evaluate_pose_batch(
    pred: np.ndarray,
    gt: np.ndarray,
    pelvis_idx: Optional[Tuple[int, ...]] = None,
) -> dict:
    """Full metric suite for a batch of poses (meters in, mm out).

    pelvis_idx: joints whose mean is subtracted as root alignment
    (reference uses hip midpoints for 14-joint evals)."""
    pred = jnp.asarray(pred)
    gt = jnp.asarray(gt)
    if pelvis_idx is not None:
        pi = jnp.asarray(pelvis_idx)
        pred = pred - jnp.mean(pred[..., pi, :], axis=-2, keepdims=True)
        gt = gt - jnp.mean(gt[..., pi, :], axis=-2, keepdims=True)
    errs = per_joint_error(pred, gt)
    errs_pa = per_joint_error(pred, gt, align=True)
    return {
        "mpjpe": float(jnp.mean(errs)) * 1000.0,
        "pa_mpjpe": float(jnp.mean(errs_pa)) * 1000.0,
        "pck": float(pck(errs_pa)),
        "auc": float(auc(errs_pa)),
    }
