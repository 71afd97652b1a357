"""Skeleton-relative input encoders — pure functions.

Capability parity with reference core/encoders.py (world->local transforms
and the keypoint / bone / view encoder zoo). All functions are shape-stable
and vmap/jit friendly; the per-joint transform is expressed as one batched
einsum instead of the reference's expand/transpose/matmul dance
(reference encoders.py:8-37).

Shapes:
  pts:   (N_rays, N_samples, 3)      world-space query points
  skts:  (N_rays, N_joints, 4, 4)    world-to-local per joint
  kps:   (N_rays, N_joints, 3)       posed joint locations
  bones: (N_rays, N_joints, 3)       axis-angle joint rotations
  rays_d:(N_rays, 3)                 ray directions
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp

from posegen_tpu.skeleton.geometry import calculate_angle


def transform_batch_pts(pts: jax.Array, skts: jax.Array) -> jax.Array:
    """World points -> per-joint local coordinates.

    (N, S, 3), (N, J, 4, 4) -> (N, S, J, 3).
    """
    R = skts[..., :3, :3]  # (N, J, 3, 3)
    t = skts[..., :3, 3]  # (N, J, 3)
    # local = R @ p + t, broadcast over samples and joints
    return jnp.einsum("njab,nsb->nsja", R, pts) + t[:, None]


def transform_batch_rays(rays_d: jax.Array, skts: jax.Array) -> jax.Array:
    """Ray directions rotated into each joint frame: (N, 3) -> (N, 1, J, 3)."""
    R = skts[..., :3, :3]
    out = jnp.einsum("njab,nb->nja", R, rays_d)
    return out[:, None]


# ---------------------------------------------------------------------------
# keypoint-position encoders (reference encoders.py:101-169)
# ---------------------------------------------------------------------------

def reldist_encode(pts: jax.Array, pts_t: Optional[jax.Array], kps: jax.Array) -> jax.Array:
    """Per-joint distances (N, S, J) — the paper's `v` encoding."""
    if pts_t is not None:
        return jnp.linalg.norm(pts_t, axis=-1)
    return jnp.linalg.norm(pts[:, :, None] - kps[:, None], axis=-1)


def relpos_encode(pts: jax.Array, pts_t: Optional[jax.Array], kps: jax.Array) -> jax.Array:
    """Per-joint offsets flattened (N, S, J*3)."""
    if pts_t is not None:
        return pts_t.reshape(*pts_t.shape[:-2], -1)
    rel = pts[:, :, None] - kps[:, None]
    return rel.reshape(*rel.shape[:-2], -1)


def kpcat_encode(pts: jax.Array, pts_t: Optional[jax.Array], kps: jax.Array) -> jax.Array:
    """Concat world point with all keypoints (N, S, 3 + J*3)."""
    N, S = pts.shape[:2]
    kps_flat = kps.reshape(N, 1, -1)
    kps_exp = jnp.broadcast_to(kps_flat, (N, S, kps_flat.shape[-1]))
    return jnp.concatenate([pts, kps_exp], axis=-1)


# ---------------------------------------------------------------------------
# view / bone encoders (reference encoders.py:171-213)
# ---------------------------------------------------------------------------

def vecnorm_encode(vecs: jax.Array, refs: Optional[jax.Array] = None) -> jax.Array:
    """L2-normalise trailing 3-vectors and flatten joints: (..., J, 3) -> (..., J*3).

    If `refs` (N, S, ...) is given, broadcast the (N, 1, J*3) result over S.
    """
    n = vecs / jnp.maximum(jnp.linalg.norm(vecs, axis=-1, keepdims=True), 1e-12)
    n = n.reshape(*n.shape[:2], -1)
    if refs is not None:
        n = jnp.broadcast_to(n, (*refs.shape[:2], n.shape[-1]))
    return n


def rayang_encode(rays_t: jax.Array, pts_t: jax.Array) -> jax.Array:
    """Angle between local ray dir and local point dir, per joint (N, S, J)."""
    return calculate_angle(pts_t, rays_t)


def identity_expand_encode(inputs: jax.Array, refs: jax.Array) -> jax.Array:
    """Tile per-ray features across samples: (N, ...) -> (N, S, -1)."""
    N, S = refs.shape[:2]
    flat = inputs.reshape(N, 1, -1)
    return jnp.broadcast_to(flat, (N, S, flat.shape[-1]))


# ---------------------------------------------------------------------------
# dispatch tables mirroring the reference flag values
# (reference raycasters.py:251-305)
# ---------------------------------------------------------------------------

def kp_encoder_dims(kp_dist_type: str, n_joints: int) -> tuple[int, int]:
    """(input_dims, cutoff_dims) for a kp encoder flag value."""
    if kp_dist_type == "reldist":
        return n_joints, n_joints
    if kp_dist_type == "relpos":
        return n_joints * 3, n_joints
    if kp_dist_type == "cat":
        return n_joints * 3 + 3, n_joints
    if kp_dist_type == "querypts":
        return 3, 3
    raise NotImplementedError(f"kp_dist_type {kp_dist_type!r}")


def view_encoder_dims(view_type: str, n_joints: int) -> int:
    if view_type in ("relray", "world"):
        return n_joints * 3
    if view_type == "rayangle":
        return n_joints
    raise NotImplementedError(f"view_type {view_type!r}")


def bone_encoder_dims(bone_type: str, n_joints: int) -> int:
    if bone_type in ("reldir", "axisang"):
        return n_joints * 3
    if bone_type == "Nope":
        return 0
    raise NotImplementedError(f"bone_type {bone_type!r}")


def encode_kp(kp_dist_type: str, pts, pts_t, kps) -> jax.Array:
    if kp_dist_type == "reldist":
        return reldist_encode(pts, pts_t, kps)
    if kp_dist_type == "relpos":
        return relpos_encode(pts, pts_t, kps)
    if kp_dist_type == "cat":
        return kpcat_encode(pts, pts_t, kps)
    if kp_dist_type == "querypts":
        return pts
    raise NotImplementedError(f"kp_dist_type {kp_dist_type!r}")


def encode_view(view_type: str, rays_t, pts_t, rays_d) -> jax.Array:
    if view_type == "relray":
        return vecnorm_encode(rays_t, refs=pts_t)
    if view_type == "rayangle":
        return rayang_encode(rays_t, pts_t)
    if view_type == "world":
        return identity_expand_encode(rays_d, refs=pts_t)
    raise NotImplementedError(f"view_type {view_type!r}")


def encode_bone(bone_type: str, pts_t, bones) -> Optional[jax.Array]:
    if bone_type == "reldir":
        return _bone_reldir(pts_t)
    if bone_type == "axisang":
        return identity_expand_encode(bones, refs=pts_t)
    if bone_type == "Nope":
        return None
    raise NotImplementedError(f"bone_type {bone_type!r}")


def _bone_reldir(pts_t: jax.Array) -> jax.Array:
    """'reldir' bone encoding: normalised local point direction per joint,
    (N, S, J, 3) -> (N, S, J*3) (reference VecNormEncoder applied to pts_t)."""
    n = pts_t / jnp.maximum(jnp.linalg.norm(pts_t, axis=-1, keepdims=True), 1e-12)
    return n.reshape(*pts_t.shape[:2], -1)
