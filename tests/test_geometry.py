import jax.numpy as jnp
import numpy as np

from sixdof_tpu.ops import geometry as geo
from sixdof_tpu.ops import hypotheses as hyp


def test_transform_pts_roundtrip(rng):
    pts = rng.randn(100, 3)
    tf = np.eye(4)
    tf[:3, :3] = np.asarray(
        __import__("sixdof_tpu.ops.lie", fromlist=["lie"]).so3_exp_map(jnp.asarray(rng.randn(1, 3)))
    )[0]
    tf[:3, 3] = rng.randn(3)
    out = np.asarray(geo.transform_pts(jnp.asarray(pts), jnp.asarray(tf)))
    back = np.asarray(geo.transform_pts(jnp.asarray(out), jnp.asarray(np.linalg.inv(tf))))
    np.testing.assert_allclose(back, pts, atol=1e-5)


def test_transform_pts_batched_broadcast(rng):
    pts = rng.randn(10, 3)
    tfs = np.tile(np.eye(4)[None], (5, 1, 1))
    tfs[:, :3, 3] = rng.randn(5, 3)
    out = np.asarray(geo.transform_pts(jnp.asarray(pts), jnp.asarray(tfs)))
    assert out.shape == (5, 10, 3)
    np.testing.assert_allclose(out, pts[None] + tfs[:, None, :3, 3], atol=1e-6)


def test_depth2xyzmap_inverts_projection(rng):
    H, W = 48, 64
    K = np.array([[60.0, 0, 32], [0, 60.0, 24], [0, 0, 1]])
    depth = rng.rand(H, W) + 0.5
    xyz = np.asarray(geo.depth2xyzmap(jnp.asarray(depth), jnp.asarray(K)))
    # re-project each xyz and check pixel coords
    uv = np.asarray(geo.project_points(jnp.asarray(xyz.reshape(-1, 3)), jnp.asarray(K)))
    us, vs = np.meshgrid(np.arange(W), np.arange(H))
    np.testing.assert_allclose(uv[:, 0].reshape(H, W), us, atol=1e-3)
    np.testing.assert_allclose(uv[:, 1].reshape(H, W), vs, atol=1e-3)
    np.testing.assert_allclose(xyz[..., 2], depth, atol=1e-6)


def test_depth2xyzmap_batch_matches_single(rng):
    H, W = 24, 32
    K = np.array([[50.0, 0, 16], [0, 55.0, 12], [0, 0, 1]])
    depth = (rng.rand(2, H, W) + 0.3).astype(np.float32)
    depth[0, :4, :4] = 0  # invalid patch
    single0 = np.asarray(geo.depth2xyzmap(jnp.asarray(depth[0]), jnp.asarray(K)))
    batch = np.asarray(
        geo.depth2xyzmap_batch(jnp.asarray(depth), jnp.asarray(np.tile(K[None], (2, 1, 1))))
    )
    np.testing.assert_allclose(batch[0], single0, atol=1e-5)


def test_egocentric_delta_roundtrip(rng):
    from sixdof_tpu.ops.lie import so3_exp_map

    A = np.tile(np.eye(4)[None], (7, 1, 1))
    A[:, :3, :3] = np.asarray(so3_exp_map(jnp.asarray(rng.randn(7, 3))))
    A[:, :3, 3] = rng.randn(7, 3)
    B = np.tile(np.eye(4)[None], (7, 1, 1))
    B[:, :3, :3] = np.asarray(so3_exp_map(jnp.asarray(rng.randn(7, 3))))
    B[:, :3, 3] = rng.randn(7, 3)
    td, rd = geo.pose_to_egocentric_delta_pose(jnp.asarray(A), jnp.asarray(B))
    B2 = np.asarray(geo.egocentric_delta_pose_to_pose(jnp.asarray(A), td, rd))
    np.testing.assert_allclose(B2, B, atol=1e-5)


def test_crop_window_tf_centers_object():
    K = np.array([[600.0, 0, 320], [0, 600.0, 240], [0, 0, 1]])
    pose = np.eye(4)
    pose[:3, 3] = [0.05, -0.02, 0.8]
    tfs = np.asarray(
        geo.compute_crop_window_tf_batch(
            jnp.asarray(pose[None], dtype=jnp.float32), jnp.asarray(K, dtype=jnp.float32),
            crop_ratio=1.2, out_size=(160, 160), mesh_diameter=0.2,
        )
    )
    # center of object projects to crop center
    uv = K @ pose[:3, 3]
    uv = uv[:2] / uv[2]
    crop_uv = tfs[0] @ np.array([uv[0], uv[1], 1.0])
    np.testing.assert_allclose(crop_uv[:2], [80, 80], atol=1.5)


def test_icosphere_counts():
    v, f = hyp.icosphere(subdivisions=0)
    assert v.shape == (12, 3) and f.shape == (20, 3)
    v, f = hyp.icosphere(subdivisions=1)
    assert v.shape == (42, 3) and f.shape == (80, 3)
    np.testing.assert_allclose(np.linalg.norm(v, axis=1), 1.0, atol=1e-12)


def test_sample_views_look_at_origin():
    poses = hyp.sample_views_icosphere(n_views=40)
    assert poses.shape == (42, 4, 4)
    # each pose: rotation orthonormal, camera z-axis points to origin
    for p in poses[:5]:
        R = p[:3, :3]
        np.testing.assert_allclose(R @ R.T, np.eye(3), atol=1e-9)
        z = R[:, 2]
        dir_to_origin = -p[:3, 3] / np.linalg.norm(p[:3, 3])
        np.testing.assert_allclose(z, dir_to_origin, atol=1e-9)


def test_rotation_grid_cluster():
    grid = hyp.make_rotation_grid(min_n_views=40, inplane_step=60)
    # reference gets 252 pre-cluster; clustering at 30deg should keep most
    assert 100 <= len(grid) <= 252
    # no two kept rotations within 30 deg
    import jax.numpy as jnp

    from sixdof_tpu.ops.lie import rotation_geodesic_distance

    R = jnp.asarray(grid[:, :3, :3])
    d = np.array(rotation_geodesic_distance(R[:, None], R[None]))
    d[np.arange(len(grid)), np.arange(len(grid))] = np.pi
    assert d.min() >= np.deg2rad(30) - 1e-3


def test_symmetry_tfs_from_info():
    tfs = geo.symmetry_tfs_from_info({}, 5)
    assert tfs.shape == (1, 4, 4)
    tfs = geo.symmetry_tfs_from_info(
        {"symmetries_continuous": [{"axis": [0, 0, 1], "offset": [0, 0, 0]}]}, 90
    )
    assert tfs.shape == (5, 4, 4)  # identity + 4 discrete steps


def test_transform_pts_batch_equals_points_count(rng):
    """tf (B,4,4) on pts (N,3) must give (B,N,3) even when B == N — the old
    value-based broadcast test silently flipped to per-point application on
    that coincidence."""
    n = 7
    pts = rng.randn(n, 3)
    tfs = np.tile(np.eye(4)[None], (n, 1, 1))
    tfs[:, :3, 3] = rng.randn(n, 3)
    out = np.asarray(geo.transform_pts(jnp.asarray(pts), jnp.asarray(tfs)))
    assert out.shape == (n, n, 3)
    np.testing.assert_allclose(out, pts[None] + tfs[:, None, :3, 3], atol=1e-6)
    # per-point application stays expressible via an explicit point axis
    per = np.asarray(geo.transform_pts(jnp.asarray(pts[:, None]), jnp.asarray(tfs)))
    assert per.shape == (n, 1, 3)
    np.testing.assert_allclose(per[:, 0], pts + tfs[:, :3, 3], atol=1e-6)
