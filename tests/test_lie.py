import jax.numpy as jnp
import numpy as np
import pytest

from sixdof_tpu.ops import lie


def random_rotations(rng, n):
    """Uniform-ish random rotations via QR."""
    A = rng.randn(n, 3, 3)
    Q, R = np.linalg.qr(A)
    det = np.linalg.det(Q)
    Q[det < 0, :, 0] *= -1
    return Q


def test_so3_exp_log_roundtrip(rng):
    w = rng.randn(64, 3) * 1.5
    R = np.asarray(lie.so3_exp_map(jnp.asarray(w)))
    w2 = np.asarray(lie.so3_log_map(jnp.asarray(R)))
    R2 = np.asarray(lie.so3_exp_map(jnp.asarray(w2)))
    # float32 + angles approaching pi: the log map loses precision there
    np.testing.assert_allclose(R, R2, atol=2e-3)


def test_so3_exp_is_rotation(rng):
    w = rng.randn(16, 3)
    R = np.asarray(lie.so3_exp_map(jnp.asarray(w)))
    np.testing.assert_allclose(R @ np.swapaxes(R, -1, -2), np.tile(np.eye(3), (16, 1, 1)), atol=1e-5)
    np.testing.assert_allclose(np.linalg.det(R), np.ones(16), atol=1e-5)


def test_so3_exp_small_angle(rng):
    w = rng.randn(8, 3) * 1e-8
    R = np.asarray(lie.so3_exp_map(jnp.asarray(w)))
    np.testing.assert_allclose(R, np.tile(np.eye(3), (8, 1, 1)), atol=1e-6)


def test_so3_exp_known_value():
    # 90 deg about z
    w = jnp.asarray([[0.0, 0.0, np.pi / 2]])
    R = np.asarray(lie.so3_exp_map(w))[0]
    expected = np.array([[0, -1, 0], [1, 0, 0], [0, 0, 1.0]])
    np.testing.assert_allclose(R, expected, atol=1e-6)


def test_rotation_6d_roundtrip(rng):
    R = random_rotations(rng, 32)
    d6 = np.asarray(lie.matrix_to_rotation_6d(jnp.asarray(R)))
    R2 = np.asarray(lie.rotation_6d_to_matrix(jnp.asarray(d6)))
    np.testing.assert_allclose(R, R2, atol=1e-5)


def test_se3_exp_translation_only(rng):
    v = rng.randn(8, 3)
    log_tf = np.concatenate([v, np.zeros((8, 3))], axis=-1)
    T = np.asarray(lie.se3_exp_map(jnp.asarray(log_tf)))
    np.testing.assert_allclose(T[:, :3, 3], v, atol=1e-5)
    np.testing.assert_allclose(T[:, :3, :3], np.tile(np.eye(3), (8, 1, 1)), atol=1e-6)


def test_euler_matrix_sxyz():
    # matches transformations.euler_matrix convention: R = Rz @ Ry @ Rx
    rx, ry, rz = 0.3, -0.2, 1.1
    M = lie.euler_matrix(rx, ry, rz)
    cx, sx = np.cos(rx), np.sin(rx)
    Rx = np.array([[1, 0, 0], [0, cx, -sx], [0, sx, cx]])
    cy, sy = np.cos(ry), np.sin(ry)
    Ry = np.array([[cy, 0, sy], [0, 1, 0], [-sy, 0, cy]])
    cz, sz = np.cos(rz), np.sin(rz)
    Rz = np.array([[cz, -sz, 0], [sz, cz, 0], [0, 0, 1]])
    np.testing.assert_allclose(M[:3, :3], Rz @ Ry @ Rx, atol=1e-12)
    # only-z rotation matches a pure z rotation
    Mz = lie.euler_matrix(0, 0, rz)
    np.testing.assert_allclose(Mz[:3, :3], Rz, atol=1e-12)


def test_geodesic_distance(rng):
    R = random_rotations(rng, 4)
    d = np.asarray(lie.rotation_geodesic_distance(jnp.asarray(R), jnp.asarray(R)))
    np.testing.assert_allclose(d, 0.0, atol=1e-3)
    w = np.array([[0, 0, 0.7]])
    R2 = np.asarray(lie.so3_exp_map(jnp.asarray(w)))
    d = np.asarray(lie.rotation_geodesic_distance(jnp.asarray(np.eye(3)[None]), jnp.asarray(R2)))
    np.testing.assert_allclose(d, 0.7, atol=1e-5)


def test_so3_log_map_near_pi():
    """The naive off-diagonal log vanishes at 180 deg (e.g. diag(1,-1,-1));
    the symmetric-part branch must recover the axis, and theta must come from
    atan2 (trace-only arccos loses ~10% magnitude just outside pi)."""
    import numpy as np

    from sixdof_tpu.ops.lie import so3_exp_map, so3_log_map

    # canonical axis-aligned flips
    for i, d in enumerate([np.diag([1.0, -1, -1]), np.diag([-1.0, 1, -1]),
                           np.diag([-1.0, -1, 1])]):
        w = np.asarray(so3_log_map(jnp.asarray(d[None])))[0]
        assert abs(np.linalg.norm(w) - np.pi) < 1e-3
        assert abs(abs(w[i]) - np.pi) < 1e-3

    rng = np.random.RandomState(3)
    for trial in range(50):
        a = rng.randn(3)
        a /= np.linalg.norm(a)
        th = np.pi - rng.uniform(0, 5e-3) if trial % 2 else np.pi
        R = np.asarray(so3_exp_map(jnp.asarray((a * th)[None])))[0]
        w = np.asarray(so3_log_map(jnp.asarray(R[None])))[0]
        R2 = np.asarray(so3_exp_map(jnp.asarray(w[None])))[0]
        assert np.abs(R2 - R).max() < 5e-3, (a, th)
