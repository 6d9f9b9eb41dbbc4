import jax.numpy as jnp
import numpy as np

from sixdof_tpu.app import defect_projection as dp
from sixdof_tpu.io.mesh_io import TriMesh
from sixdof_tpu.ops import raytrace as rt


def quad_mesh(z=2.0, half=1.0):
    """Square at depth z facing the origin."""
    v = np.array(
        [[-half, -half, z], [half, -half, z], [half, half, z], [-half, half, z]]
    )
    f = np.array([[0, 1, 2], [0, 2, 3]])
    return TriMesh(v, f)


def test_ray_hits_quad():
    mesh = quad_mesh()
    tri, tri_mask = rt.mesh_to_tri_verts(mesh.vertices, mesh.faces)
    dirs = np.array([[0, 0, 1.0], [0.4, 0, 1.0], [5.0, 0, 1.0]])
    dirs /= np.linalg.norm(dirs, axis=-1, keepdims=True)
    t = np.asarray(
        rt.ray_mesh_intersect(
            jnp.zeros((3, 3)), jnp.asarray(dirs, dtype=jnp.float32),
            jnp.ones(3, dtype=bool), jnp.asarray(tri), jnp.asarray(tri_mask),
        )
    )
    np.testing.assert_allclose(t[0], 2.0, atol=1e-5)  # straight-on hit
    assert np.isfinite(t[1])  # oblique hit
    assert np.isinf(t[2])  # miss


def test_first_hit_of_two_quads():
    v = np.concatenate([quad_mesh(2.0).vertices, quad_mesh(3.0).vertices])
    f = np.concatenate([quad_mesh(2.0).faces, quad_mesh(3.0).faces + 4])
    mesh = TriMesh(v, f)
    pts, inten = dp.intersect_rays_with_mesh(
        mesh, np.array([[0, 0, 1.0]]), np.zeros(3), np.array([0.7])
    )
    np.testing.assert_allclose(pts[0, 2], 2.0, atol=1e-5)
    assert inten[0] == 0.7


def test_masked_rays_and_tris():
    mesh = quad_mesh()
    tri, tri_mask = rt.mesh_to_tri_verts(mesh.vertices, mesh.faces)
    dirs = jnp.asarray(np.tile([[0, 0, 1.0]], (4, 1)), dtype=jnp.float32)
    mask = jnp.asarray([True, False, True, False])
    t = np.asarray(
        rt.ray_mesh_intersect(jnp.zeros((4, 3)), dirs, mask, jnp.asarray(tri), jnp.asarray(tri_mask))
    )
    assert np.isfinite(t[0]) and np.isfinite(t[2])
    assert np.isinf(t[1]) and np.isinf(t[3])


def test_heatmap_to_rays_padded():
    hm = np.zeros((40, 60))
    hm[10, 20] = 0.9
    hm[30, 40] = 0.8
    K = jnp.asarray(np.array([[50.0, 0, 30], [0, 50.0, 20], [0, 0, 1]], dtype=np.float32))
    dirs, inten, mask = rt.heatmap_to_rays(jnp.asarray(hm), K, threshold=0.5, max_points=16)
    assert int(np.asarray(mask).sum()) == 2
    d = np.asarray(dirs)[np.asarray(mask)]
    np.testing.assert_allclose(np.linalg.norm(d, axis=-1), 1.0, atol=1e-6)
    # the strongest pixel comes first (top-k order)
    assert np.asarray(inten)[0] == 0.9


def test_heatmap_to_points_matches_numpy():
    hm = np.random.RandomState(0).rand(20, 30)
    pts = dp.heatmap_to_points(hm, 0.8)
    assert len(pts) == int((hm > 0.8).sum())
    for x, y, i in pts[:5]:
        assert hm[y, x] == i


def test_ray_tracing_end_to_end(tmp_path):
    """Full ray_tracing flow with a scene-dir extrinsics file."""
    import json, os

    os.makedirs(tmp_path / "configs", exist_ok=True)
    ext = {
        "color_to_depth": {
            "rotation_matrix": np.eye(3).tolist(),
            "translation_vector": [[0.0, 0.0, 0.0]],
        },
        "depth_to_color": {
            "rotation_matrix": np.eye(3).tolist(),
            "translation_vector": [[0.0, 0.0, 0.0]],
        },
    }
    with open(tmp_path / "configs" / "camera_extrinsics.json", "w") as f:
        json.dump(ext, f)

    mesh = quad_mesh(z=500.0, half=200.0)  # mm scale
    heatmap = np.zeros((48, 64))
    heatmap[20:28, 30:38] = 0.9
    intr = dp.PinholeCameraIntrinsic.from_params(64, 48, 60.0, 60.0, 32.0, 24.0)
    pcd, mesh_out = dp.ray_tracing(str(tmp_path), mesh, heatmap, intr, heatmap_threshold=0.75)
    assert len(pcd) == 64  # every thresholded pixel hits the big quad
    np.testing.assert_allclose(pcd.points[:, 2], 500.0, atol=1e-2)
    assert pcd.colors is not None


def test_create_heatmap_overlay_shape():
    img = np.random.RandomState(0).randint(0, 255, (32, 32, 3), dtype=np.uint8)
    hm = np.random.RandomState(1).rand(32, 32)
    out = dp.create_heatmap_overlay(img, hm)
    assert out.shape == (32, 32, 3) and out.dtype == np.uint8


def test_align_to_surface(rng):
    from sixdof_tpu.io.mesh_io import PointCloud

    surf = np.concatenate([(rng.rand(500, 2) - 0.5) * 10, np.zeros((500, 1))], axis=-1)
    target = PointCloud(surf)
    defects = np.array([[0.0, 0.0, 0.5, 1.0], [1.0, 1.0, -0.3, 0.5]])
    offs, aligned = dp.align_to_surface(defects, target, offset=0.1)
    assert np.abs(aligned[:, 2]).max() < 1e-9
    np.testing.assert_allclose(np.linalg.norm(offs - aligned, axis=-1), 0.1, atol=1e-6)
