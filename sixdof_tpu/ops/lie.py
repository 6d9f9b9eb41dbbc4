"""Closed-form Lie-group maps (SO(3)/SE(3)) and rotation representations.

TPU-native replacement for the reference's pytorch3d dependency
(reference Utils.py:11 `so3_exp_map, se3_exp_map, rotation_6d_to_matrix` and
`transformations.euler_matrix` at Utils.py:33).  Everything here is pure
`jax.numpy`, shape-polymorphic over leading batch dims, and autodiff-safe
(Taylor fallbacks near the identity).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

_EPS = 1e-8


def hat(v):
    """(...,3) -> (...,3,3) skew-symmetric cross-product matrix."""
    x, y, z = v[..., 0], v[..., 1], v[..., 2]
    zero = jnp.zeros_like(x)
    return jnp.stack(
        [
            jnp.stack([zero, -z, y], axis=-1),
            jnp.stack([z, zero, -x], axis=-1),
            jnp.stack([-y, x, zero], axis=-1),
        ],
        axis=-2,
    )


def so3_exp_map(log_rot):
    """Axis-angle (...,3) -> rotation matrices (...,3,3) (Rodrigues).

    Matches pytorch3d.transforms.so3_exp_map used by the refiner's rotation
    head (reference predict_pose_refine.py:222).
    """
    theta2 = jnp.sum(log_rot * log_rot, axis=-1)
    # safe denominators: the untaken where-branch is still differentiated, so
    # raw theta2 in a denominator poisons gradients at theta=0
    th2s = jnp.maximum(theta2, _EPS)
    theta = jnp.sqrt(th2s)
    sin_t_t = jnp.where(theta2 > _EPS, jnp.sin(theta) / theta, 1.0 - theta2 / 6.0)
    one_m_cos_t2 = jnp.where(theta2 > _EPS, (1.0 - jnp.cos(theta)) / th2s, 0.5 - theta2 / 24.0)
    K = hat(log_rot)
    KK = K @ K
    eye = jnp.eye(3, dtype=log_rot.dtype)
    return eye + sin_t_t[..., None, None] * K + one_m_cos_t2[..., None, None] * KK


def so3_log_map(R):
    """Rotation matrices (...,3,3) -> axis-angle (...,3).

    Robust at BOTH singularities: series near theta=0, and near theta=pi the
    axis is recovered from the symmetric part (the antisymmetric part
    axis*2sin(theta) vanishes there — e.g. diag(1,-1,-1) would map to the
    zero vector with the naive formula)."""
    trace = R[..., 0, 0] + R[..., 1, 1] + R[..., 2, 2]
    cos = jnp.clip((trace - 1.0) / 2.0, -1.0, 1.0)
    # off-diagonal differences give axis*2sin(theta)
    w = jnp.stack(
        [
            R[..., 2, 1] - R[..., 1, 2],
            R[..., 0, 2] - R[..., 2, 0],
            R[..., 1, 0] - R[..., 0, 1],
        ],
        axis=-1,
    )
    # theta via atan2(sin, cos): arccos of the trace alone is ill-conditioned
    # near pi (f32 trace error 1e-7 -> ~1e-4 theta error -> ~10% sin error)
    sin = 0.5 * jnp.linalg.norm(w, axis=-1)
    theta = jnp.arctan2(sin, cos)
    scale = jnp.where(theta > 1e-6, theta / jnp.maximum(2.0 * sin, 1e-12),
                      0.5 + theta * theta / 12.0)
    generic = w * scale[..., None]

    # near pi: R_ii = cos + a_i^2 (1-cos)  ->  |a_i|; signs from the
    # symmetric part S_ij = 2 a_i a_j (1-cos) relative to the largest |a_k|
    diag = jnp.stack([R[..., 0, 0], R[..., 1, 1], R[..., 2, 2]], axis=-1)
    a2 = jnp.clip((diag - cos[..., None]) / jnp.maximum(1.0 - cos[..., None], 1e-9), 0.0, 1.0)
    a = jnp.sqrt(a2)
    S = R + jnp.swapaxes(R, -1, -2)
    k = jax.nn.one_hot(jnp.argmax(a2, axis=-1), 3, dtype=R.dtype)
    Sk = jnp.einsum("...i,...ij->...j", k, S)  # row of the dominant axis
    # S's DIAGONAL carries a 2cos term (S_ii = 2R_ii), so force the dominant
    # element's sign to +1 explicitly; off-diagonals are 2 a_i a_j (1-cos)
    signs = jnp.where(k > 0.5, 1.0, jnp.where(Sk >= 0, 1.0, -1.0))
    axis = a * signs
    axis = axis / jnp.maximum(jnp.linalg.norm(axis, axis=-1, keepdims=True), 1e-9)
    near_pi = axis * theta[..., None]

    return jnp.where((theta > jnp.pi - 1e-3)[..., None], near_pi, generic)


def rotation_6d_to_matrix(d6):
    """Zhou et al. 6D rotation representation (...,6) -> (...,3,3).

    Matches pytorch3d.transforms.rotation_6d_to_matrix
    (reference predict_pose_refine.py:224).
    """
    a1, a2 = d6[..., :3], d6[..., 3:]
    b1 = a1 / jnp.linalg.norm(a1, axis=-1, keepdims=True).clip(_EPS)
    b2 = a2 - jnp.sum(b1 * a2, axis=-1, keepdims=True) * b1
    b2 = b2 / jnp.linalg.norm(b2, axis=-1, keepdims=True).clip(_EPS)
    b3 = jnp.cross(b1, b2)
    return jnp.stack([b1, b2, b3], axis=-2)


def matrix_to_rotation_6d(R):
    """(...,3,3) -> (...,6): first two rows, flattened."""
    return jnp.concatenate([R[..., 0, :], R[..., 1, :]], axis=-1)


def se3_exp_map(log_tf):
    """(...,6) [trans | rot] twist -> (...,4,4) homogeneous transforms."""
    v, w = log_tf[..., :3], log_tf[..., 3:]
    theta2 = jnp.sum(w * w, axis=-1)
    th2s = jnp.maximum(theta2, _EPS)  # safe denominator (see so3_exp_map)
    theta = jnp.sqrt(th2s)
    K = hat(w)
    KK = K @ K
    sin_t_t = jnp.where(theta2 > _EPS, jnp.sin(theta) / theta, 1.0 - theta2 / 6.0)
    one_m_cos_t2 = jnp.where(theta2 > _EPS, (1.0 - jnp.cos(theta)) / th2s, 0.5 - theta2 / 24.0)
    t_m_sin_t3 = jnp.where(
        theta2 > _EPS, (theta - jnp.sin(theta)) / (th2s * theta), 1.0 / 6.0 - theta2 / 120.0
    )
    eye = jnp.eye(3, dtype=log_tf.dtype)
    R = eye + sin_t_t[..., None, None] * K + one_m_cos_t2[..., None, None] * KK
    V = eye + one_m_cos_t2[..., None, None] * K + t_m_sin_t3[..., None, None] * KK
    t = (V @ v[..., None])[..., 0]
    out = jnp.zeros((*log_tf.shape[:-1], 4, 4), dtype=log_tf.dtype)
    out = out.at[..., :3, :3].set(R)
    out = out.at[..., :3, 3].set(t)
    out = out.at[..., 3, 3].set(1.0)
    return out


def euler_matrix(rx, ry, rz):
    """4x4 rotation from static-xyz Euler angles.

    Matches `transformations.euler_matrix(rx, ry, rz)` with the default
    'sxyz' convention used to build in-plane rotations
    (reference estimater.py:111, Utils.py:828): R = Rz @ Ry @ Rx.
    Host-side helper; returns numpy.
    """
    cx, sx = np.cos(rx), np.sin(rx)
    cy, sy = np.cos(ry), np.sin(ry)
    cz, sz = np.cos(rz), np.sin(rz)
    Rx = np.array([[1, 0, 0], [0, cx, -sx], [0, sx, cx]])
    Ry = np.array([[cy, 0, sy], [0, 1, 0], [-sy, 0, cy]])
    Rz = np.array([[cz, -sz, 0], [sz, cz, 0], [0, 0, 1]])
    out = np.eye(4)
    out[:3, :3] = Rz @ Ry @ Rx
    return out


def rotation_geodesic_distance(R1, R2):
    """Geodesic angle (radians) between rotations; batched.

    Matches mycpp Utils::rotationGeodesicDistance
    (reference mycpp/src/Utils.cpp:21-26).
    """
    m = jnp.matmul(R1, jnp.swapaxes(R2, -1, -2))
    cos = (m[..., 0, 0] + m[..., 1, 1] + m[..., 2, 2] - 1.0) / 2.0
    return jnp.arccos(jnp.clip(cos, -1.0, 1.0))


def normalize_rotation(pose):
    """Remove per-column scale from the rotation block (no-shear assumption).

    Mirrors reference Utils.py:270-276 `normalizeRotation`.
    """
    pose = jnp.asarray(pose)
    scales = jnp.linalg.norm(pose[..., :3, :3], axis=-2)
    new_rot = pose[..., :3, :3] / scales[..., None, :]
    return pose.at[..., :3, :3].set(new_rot)
