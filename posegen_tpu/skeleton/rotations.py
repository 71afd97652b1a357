"""Rotation algebra in pure JAX.

Replaces the reference's pytorch3d.transforms usage
(reference: core/utils/skeleton_utils.py:484-527; run_gan.py:38) with ~150
lines of batched, jit/vmap-friendly math. All functions accept arbitrary
leading batch dimensions and operate on the trailing axes.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

_EPS = 1e-8


def axisang_to_rot(axisang: jax.Array) -> jax.Array:
    """Axis-angle vectors (..., 3) -> rotation matrices (..., 3, 3).

    Rodrigues formula with a Taylor-safe branch near zero angle.
    """
    theta_sq = jnp.sum(axisang**2, axis=-1, keepdims=True)
    small = theta_sq < 1e-12
    # gradient-safe norm: sqrt sees a masked operand so d(sqrt)/dx at 0 never
    # produces NaN (the small branch below uses the first-order expansion
    # which bypasses theta entirely)
    theta = jnp.sqrt(jnp.where(small, jnp.ones_like(theta_sq), theta_sq))
    axis = axisang / theta
    x, y, z = axis[..., 0], axis[..., 1], axis[..., 2]
    zero = jnp.zeros_like(x)
    K = jnp.stack(
        [
            jnp.stack([zero, -z, y], axis=-1),
            jnp.stack([z, zero, -x], axis=-1),
            jnp.stack([-y, x, zero], axis=-1),
        ],
        axis=-2,
    )
    t = theta[..., None]
    sin_t, cos_t = jnp.sin(t), jnp.cos(t)
    eye = jnp.broadcast_to(jnp.eye(3, dtype=axisang.dtype), K.shape)
    rot = eye + sin_t * K + (1.0 - cos_t) * (K @ K)
    # first-order expansion for tiny angles: R ~ I + [w]_x
    w = axisang[..., None]
    wx, wy, wz = w[..., 0, :], w[..., 1, :], w[..., 2, :]
    zero1 = jnp.zeros_like(wx)
    K_small = jnp.stack(
        [
            jnp.concatenate([zero1, -wz, wy], axis=-1),
            jnp.concatenate([wz, zero1, -wx], axis=-1),
            jnp.concatenate([-wy, wx, zero1], axis=-1),
        ],
        axis=-2,
    )
    rot_small = eye + K_small
    return jnp.where(small[..., None], rot_small, rot)


def rot_to_axisang(rot: jax.Array) -> jax.Array:
    """Rotation matrices (..., 3, 3) -> axis-angle vectors (..., 3)."""
    return quat_to_axisang(rot_to_quat(rot))


def rot_to_quat(rot: jax.Array) -> jax.Array:
    """Rotation matrices (..., 3, 3) -> unit quaternions (..., 4) (w, x, y, z).

    Branch-free Shepperd's method: compute all four candidate solutions and
    pick the numerically best by largest diagonal combination.
    """
    m = rot
    m00, m01, m02 = m[..., 0, 0], m[..., 0, 1], m[..., 0, 2]
    m10, m11, m12 = m[..., 1, 0], m[..., 1, 1], m[..., 1, 2]
    m20, m21, m22 = m[..., 2, 0], m[..., 2, 1], m[..., 2, 2]

    def safe_sqrt(x):
        return jnp.sqrt(jnp.maximum(x, 0.0))

    q_abs = safe_sqrt(
        jnp.stack(
            [
                1.0 + m00 + m11 + m22,
                1.0 + m00 - m11 - m22,
                1.0 - m00 + m11 - m22,
                1.0 - m00 - m11 + m22,
            ],
            axis=-1,
        )
    )
    # candidate quaternions (unnormalised), one per pivot
    quat_by_w = jnp.stack([q_abs[..., 0] ** 2, m21 - m12, m02 - m20, m10 - m01], axis=-1)
    quat_by_x = jnp.stack([m21 - m12, q_abs[..., 1] ** 2, m10 + m01, m02 + m20], axis=-1)
    quat_by_y = jnp.stack([m02 - m20, m10 + m01, q_abs[..., 2] ** 2, m12 + m21], axis=-1)
    quat_by_z = jnp.stack([m10 - m01, m20 + m02, m21 + m12, q_abs[..., 3] ** 2], axis=-1)
    cands = jnp.stack([quat_by_w, quat_by_x, quat_by_y, quat_by_z], axis=-2)
    denom = 2.0 * jnp.maximum(q_abs, 0.1 * _EPS)[..., None]
    cands = cands / denom
    best = jnp.argmax(q_abs, axis=-1)
    quat = jnp.take_along_axis(cands, best[..., None, None].repeat(4, -1), axis=-2)[..., 0, :]
    return quat / jnp.linalg.norm(quat, axis=-1, keepdims=True)


def quat_to_axisang(quat: jax.Array) -> jax.Array:
    """Unit quaternions (..., 4) (w,x,y,z) -> axis-angle (..., 3)."""
    quat = jnp.where(quat[..., :1] < 0, -quat, quat)  # w >= 0 -> angle in [0, pi]
    w = jnp.clip(quat[..., 0], -1.0, 1.0)
    xyz = quat[..., 1:]
    norm = jnp.linalg.norm(xyz, axis=-1, keepdims=True)
    angle = 2.0 * jnp.arctan2(norm[..., 0], w)
    small = norm < 1e-6
    axis = xyz / jnp.where(small, jnp.ones_like(norm), norm)
    # small-angle: 2*xyz/w is the first-order axis-angle
    safe_w = jnp.where(jnp.abs(quat[..., :1]) < 1e-6, jnp.ones_like(quat[..., :1]), quat[..., :1])
    return jnp.where(small, 2.0 * xyz / safe_w, axis * angle[..., None])


def axisang_to_quat(axisang: jax.Array) -> jax.Array:
    """Axis-angle (..., 3) -> unit quaternions (..., 4) (w,x,y,z)."""
    theta = jnp.linalg.norm(axisang, axis=-1, keepdims=True)
    half = 0.5 * theta
    small = theta < 1e-6
    k = jnp.where(small, 0.5 - theta**2 / 48.0, jnp.sin(half) / jnp.where(small, 1.0, theta))
    return jnp.concatenate([jnp.cos(half), axisang * k], axis=-1)


def rot6d_to_rot(x: jax.Array) -> jax.Array:
    """6D rotation representation (..., 6) -> rotation matrices (..., 3, 3).

    Gram-Schmidt on the two encoded columns (Zhou et al. CVPR'19), matching
    the reference's column layout: the 6 numbers are the first two *columns*
    of R flattened row-major from a (3, 2) view
    (reference skeleton_utils.py:507-523 / run_gan.py:1188).
    """
    m = x.reshape(*x.shape[:-1], 3, 2)
    a1, a2 = m[..., 0], m[..., 1]
    b1 = a1 / jnp.maximum(jnp.linalg.norm(a1, axis=-1, keepdims=True), _EPS)
    a2_proj = jnp.sum(b1 * a2, axis=-1, keepdims=True) * b1
    b2u = a2 - a2_proj
    b2 = b2u / jnp.maximum(jnp.linalg.norm(b2u, axis=-1, keepdims=True), _EPS)
    b3 = jnp.cross(b1, b2)
    return jnp.stack([b1, b2, b3], axis=-1)


def rot_to_rot6d(rot: jax.Array) -> jax.Array:
    """Rotation matrices (..., 3, 3) -> 6D representation (..., 6).

    Takes the first two columns, flattened from the (3, 2) view row-major
    (i.e. interleaved [r00, r01, r10, r11, r20, r21]), the exact inverse of
    `rot6d_to_rot` and the reference's `rot[..., :3, :2].flatten(-2)`.
    """
    return rot[..., :3, :2].reshape(*rot.shape[:-2], 6)


def rot6d_to_axisang(x: jax.Array) -> jax.Array:
    return rot_to_axisang(rot6d_to_rot(x))


def bones_to_rot(bones: jax.Array) -> jax.Array:
    """Dispatch on representation size (3 = axis-angle, 6 = rot6d)."""
    if bones.shape[-1] == 3:
        return axisang_to_rot(bones)
    if bones.shape[-1] == 6:
        return rot6d_to_rot(bones)
    raise NotImplementedError(f"unknown bone representation dim {bones.shape[-1]}")
