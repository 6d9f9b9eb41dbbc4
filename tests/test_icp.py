import jax.numpy as jnp
import numpy as np

from sixdof_tpu.io.mesh_io import PointCloud
from sixdof_tpu.ops import icp as icp_ops
from sixdof_tpu.ops import pointcloud as pc
from sixdof_tpu.ops.lie import euler_matrix


def make_surface(rng, n=2000, extent=100.0):
    """Wavy surface patch (mm units) with analytic structure for ICP."""
    xy = (rng.rand(n, 2) - 0.5) * extent
    z = 8.0 * np.sin(xy[:, 0] / 18.0) + 5.0 * np.cos(xy[:, 1] / 23.0)
    return np.concatenate([xy, z[:, None]], axis=-1)


def pad(points, size):
    out = np.zeros((size, 3), dtype=np.float32)
    out[: len(points)] = points
    mask = np.zeros(size, dtype=bool)
    mask[: len(points)] = True
    return jnp.asarray(out), jnp.asarray(mask)


def test_nearest_neighbors_masked(rng):
    ref = rng.randn(100, 3).astype(np.float32)
    mask = np.ones(100, dtype=bool)
    mask[50:] = False
    q = ref[:10] + 1e-4
    idx, dist = icp_ops.nearest_neighbors(jnp.asarray(q), jnp.asarray(ref), jnp.asarray(mask))
    np.testing.assert_array_equal(np.asarray(idx), np.arange(10))
    assert np.asarray(dist).max() < 1e-3
    # queries near masked-out points must not match them
    q2 = ref[60:62] + 1e-4
    idx2, _ = icp_ops.nearest_neighbors(jnp.asarray(q2), jnp.asarray(ref), jnp.asarray(mask))
    assert np.all(np.asarray(idx2) < 50)


def test_icp_recovers_known_transform(rng):
    tgt_np = make_surface(rng, 3000)
    tgt_pcd = PointCloud(tgt_np)
    pc.estimate_normals(tgt_pcd, radius=8, max_nn=12)

    true_tf = euler_matrix(0.03, -0.02, 0.05)
    true_tf[:3, 3] = [3.0, -2.0, 4.0]
    src_np = make_surface(rng, 1500)  # different sampling of the same surface

    # source = true_tf^-1(target samples): icp should find ~true_tf
    inv = np.linalg.inv(true_tf)
    src_np = src_np @ inv[:3, :3].T + inv[:3, 3]

    src, src_mask = pad(src_np, 2048)
    tgt, tgt_mask = pad(tgt_np, 4096)
    tgt_normals, _ = pad(tgt_pcd.normals, 4096)

    res = icp_ops.icp_point_to_plane(
        src, src_mask, tgt, tgt_normals, tgt_mask,
        jnp.eye(4, dtype=jnp.float32), max_dist=10.0, max_iter=40,
    )
    est = np.asarray(res.transformation)
    err_t = np.linalg.norm(est[:3, 3] - true_tf[:3, 3])
    err_r = np.linalg.norm(est[:3, :3] - true_tf[:3, :3])
    assert float(res.fitness) > 0.9
    assert err_t < 1.0, f"translation error {err_t}"  # < 1 mm
    assert err_r < 0.02, f"rotation error {err_r}"


def test_evaluate_registration_perfect():
    pts = np.mgrid[0:10, 0:10].reshape(2, -1).T.astype(np.float32)
    pts3 = np.concatenate([pts, np.zeros((100, 1), np.float32)], axis=-1)
    src, src_mask = pad(pts3, 128)
    tgt, tgt_mask = pad(pts3, 128)
    fit, rmse = icp_ops.evaluate_registration(
        src, src_mask, tgt, tgt_mask, jnp.eye(4, dtype=jnp.float32), 0.5
    )
    assert float(fit) == 1.0
    assert float(rmse) < 1e-5


def test_icp_batch_restarts(rng):
    tgt_np = make_surface(rng, 2000)
    tgt_pcd = PointCloud(tgt_np)
    pc.estimate_normals(tgt_pcd, radius=8, max_nn=12)
    src_np = tgt_np[:1000] + rng.randn(1000, 3) * 0.01

    src, src_mask = pad(src_np, 1024)
    tgt, tgt_mask = pad(tgt_np, 2048)
    tgt_normals, _ = pad(tgt_pcd.normals, 2048)

    inits = np.tile(np.eye(4, dtype=np.float32)[None], (4, 1, 1))
    inits[1, 2, 3] = 5.0
    inits[2, 0, 3] = -4.0
    inits[3, :3, :3] = euler_matrix(0, 0, 0.1)[:3, :3]
    res = icp_ops.icp_batch(
        src, src_mask, tgt, tgt_normals, tgt_mask,
        jnp.asarray(inits), jnp.asarray([5.0, 5.0, 5.0, 5.0]), max_iter=30,
    )
    assert np.asarray(res.fitness).shape == (4,)
    assert float(np.asarray(res.fitness).max()) > 0.95


def test_voxel_downsample_semantics(rng):
    pts = np.array([[0.1, 0.1, 0.1], [0.2, 0.2, 0.2], [5.1, 5.1, 5.1]])
    pcd = PointCloud(pts)
    out = pc.voxel_down_sample(pcd, 1.0)
    assert len(out) == 2
    assert np.any(np.all(np.isclose(out.points, [0.15, 0.15, 0.15]), axis=1))


def test_plane_segmentation(rng):
    plane_pts = np.concatenate(
        [(rng.rand(500, 2) - 0.5) * 100, rng.randn(500, 1) * 0.1], axis=-1
    )
    blob = rng.randn(100, 3) * 5 + np.array([0, 0, 30.0])
    pcd = PointCloud(np.concatenate([plane_pts, blob]))
    model, inliers = pc.segment_plane(pcd, distance_threshold=1.0, num_iterations=100)
    normal = model[:3] / np.linalg.norm(model[:3])
    assert abs(normal[2]) > 0.99
    assert 450 <= len(inliers) <= 520


def test_largest_cluster(rng):
    a = rng.randn(300, 3) * 2
    b = rng.randn(50, 3) * 2 + np.array([100, 0, 0])
    pcd = PointCloud(np.concatenate([a, b]))
    out = pc.filter_largest_cluster(pcd, eps=10, min_points=10)
    assert len(out) == 300


def test_statistical_outliers(rng):
    core = rng.randn(500, 3)
    outliers = rng.randn(5, 3) * 0.1 + 50.0
    pcd = PointCloud(np.concatenate([core, outliers]))
    out = pc.remove_statistical_outliers(pcd, nb_neighbors=20, std_ratio=2.0)
    assert len(out) <= 500
    assert np.abs(out.points).max() < 10


def test_background_removal(rng):
    bg = rng.rand(200, 3) * 100
    obj = rng.rand(100, 3) * 10 + 500
    pcd = PointCloud(np.concatenate([bg[:100] + rng.randn(100, 3) * 0.5, obj]))
    out = pc.background_removal(pcd, PointCloud(bg), threshold=10.0)
    assert len(out) == 100
    assert out.points.min() > 400
