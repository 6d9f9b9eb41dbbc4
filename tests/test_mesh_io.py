import numpy as np

from sixdof_tpu.io import mesh_io


def make_box_mesh():
    v = np.array(
        [
            [0, 0, 0], [1, 0, 0], [1, 1, 0], [0, 1, 0],
            [0, 0, 1], [1, 0, 1], [1, 1, 1], [0, 1, 1],
        ],
        dtype=np.float64,
    )
    f = np.array(
        [
            [0, 2, 1], [0, 3, 2], [4, 5, 6], [4, 6, 7],
            [0, 1, 5], [0, 5, 4], [2, 3, 7], [2, 7, 6],
            [1, 2, 6], [1, 6, 5], [3, 0, 4], [3, 4, 7],
        ]
    )
    return mesh_io.TriMesh(v, f)


def test_obj_roundtrip(tmp_path):
    m = make_box_mesh()
    m.vertex_colors = np.tile(np.array([[200, 100, 50.0]]), (8, 1))
    p = str(tmp_path / "box.obj")
    mesh_io.save_mesh(p, m)
    m2 = mesh_io.load_mesh(p)
    np.testing.assert_allclose(m2.vertices, m.vertices, atol=1e-6)
    np.testing.assert_array_equal(m2.faces, m.faces)
    np.testing.assert_allclose(m2.vertex_colors, m.vertex_colors, atol=1.0)


def test_ply_mesh_roundtrip(tmp_path):
    m = make_box_mesh()
    p = str(tmp_path / "box.ply")
    mesh_io.save_mesh(p, m)
    m2 = mesh_io.load_mesh(p)
    np.testing.assert_allclose(m2.vertices, m.vertices, atol=1e-5)
    np.testing.assert_array_equal(m2.faces, m.faces)


def test_ply_pointcloud_roundtrip(tmp_path, rng):
    pts = rng.randn(100, 3)
    colors = rng.rand(100, 3)
    normals = rng.randn(100, 3)
    normals /= np.linalg.norm(normals, axis=1, keepdims=True)
    pcd = mesh_io.PointCloud(pts, colors=colors, normals=normals)
    p = str(tmp_path / "cloud.ply")
    mesh_io.save_point_cloud(p, pcd)
    pcd2 = mesh_io.load_point_cloud(p)
    np.testing.assert_allclose(pcd2.points, pts, atol=1e-5)
    np.testing.assert_allclose(pcd2.colors, colors, atol=1 / 255.0)
    np.testing.assert_allclose(pcd2.normals, normals, atol=1e-5)


def test_vertex_normals_box():
    m = make_box_mesh()
    vn = m.vertex_normals
    np.testing.assert_allclose(np.linalg.norm(vn, axis=1), 1.0, atol=1e-9)
    # corner normals of a cube point outward diagonally
    assert np.dot(vn[0], np.array([-1, -1, -1]) / np.sqrt(3)) > 0.9


def test_transform_and_sampling(rng):
    m = make_box_mesh()
    pts = m.sample_points(500)
    assert len(pts) == 500
    assert pts.points.min() >= -1e-9 and pts.points.max() <= 1 + 1e-9
    tf = np.eye(4)
    tf[:3, 3] = [1, 2, 3]
    m.apply_transform(tf)
    assert m.vertices.min() >= 1 - 1e-9


def test_pointcloud_select_by_index(rng):
    pcd = mesh_io.PointCloud(rng.randn(10, 3))
    sel = pcd.select_by_index([0, 1, 2])
    assert len(sel) == 3
    inv = pcd.select_by_index([0, 1, 2], invert=True)
    assert len(inv) == 7


def test_decimate_mesh_vertex_clustering():
    """LOD decimation: triangle count shrinks to target, shape is preserved,
    closed meshes stay closed, attributes survive."""
    import numpy as np

    from sixdof_tpu.io.mesh_io import TriMesh, decimate_mesh
    from sixdof_tpu.ops.hypotheses import icosphere

    v, f = icosphere(subdivisions=4)  # 2562 verts, 5120 faces
    colors = np.tile([[200.0, 40.0, 90.0]], (len(v), 1))
    mesh = TriMesh(v * 0.05, f, vertex_colors=colors)
    assert mesh.is_watertight()

    dec = decimate_mesh(mesh, target_tris=800)
    assert 100 < len(dec.faces) <= 800
    # shape preserved: vertices still on a ~0.05 sphere
    r = np.linalg.norm(dec.vertices, axis=1)
    assert abs(np.median(r) - 0.05) < 0.004
    assert dec.is_watertight()
    assert dec.vertex_colors is not None
    np.testing.assert_allclose(dec.vertex_colors.mean(axis=0), [200.0, 40.0, 90.0], atol=1e-6)

    # explicit voxel size path + no-op when already small
    dec2 = decimate_mesh(mesh, voxel_size=0.02)
    assert len(dec2.faces) < len(mesh.faces)
    same = decimate_mesh(dec, target_tris=10000)
    assert len(same.faces) == len(dec.faces)


def test_signed_volume_orientation_gates_backface_cull():
    """An inward-wound closed mesh passes is_watertight() (winding is
    consistent) but must NOT enable backface culling: signed_volume() < 0
    detects it (estimater.py gate)."""
    import numpy as np

    from sixdof_tpu.io.mesh_io import TriMesh
    from sixdof_tpu.ops.hypotheses import icosphere

    v, f = icosphere(subdivisions=2)
    outward = TriMesh(v * 0.05, f)
    assert outward.is_watertight()
    assert outward.signed_volume() > 0

    inward = TriMesh(v * 0.05, f[:, ::-1].copy())  # flip every face
    assert inward.is_watertight()  # still consistently wound...
    assert inward.signed_volume() < 0  # ...but inward: culling invalid
    # the two volumes are exact negatives
    assert abs(inward.signed_volume() + outward.signed_volume()) < 1e-12
