

def test_point_click_paths_headless(tmp_path):
    """choose_points/create_mesh/ray_tracing_points/depth_projection_points/
    visualize — the reference's interactive tools (src/defect_projection.py
    :94-135, :188-194, :565-611, :632-649, :495-525) driven headlessly."""
    import json
    import os

    import numpy as np

    from sixdof_tpu.app import defect_projection as dp
    from sixdof_tpu.io.mesh_io import PointCloud

    # choose_points headless: passthrough
    img = np.zeros((40, 60, 3), np.uint8)
    assert dp.choose_points(img, points=[(5, 7), (10.0, 9.0)]) == [(5, 7), (10, 9)]

    # a dense sphere cloud at z=500mm; create_mesh crust ~ sphere surface
    rng = np.random.RandomState(0)
    d = rng.randn(4000, 3)
    d /= np.linalg.norm(d, axis=1, keepdims=True)
    pts = d * 30.0 + np.array([0, 0, 500.0])
    cloud = PointCloud(pts)
    mesh = dp.create_mesh(cloud, resolution=48)
    assert len(mesh.vertices) > 100
    r = np.linalg.norm(mesh.vertices - np.array([0, 0, 500.0]), axis=1)
    assert abs(np.median(r) - 30.0) < 6.0  # crust sits near the point radius

    # scene dir with identity extrinsics for ray_tracing_points
    scene = str(tmp_path)
    os.makedirs(f"{scene}/configs")
    with open(f"{scene}/configs/camera_extrinsics.json", "w") as f:
        json.dump({
            "color_to_depth": {"rotation_matrix": np.eye(3).tolist(),
                               "translation_vector": [[0.0, 0.0, 0.0]]},
            "depth_to_color": {"rotation_matrix": np.eye(3).tolist(),
                               "translation_vector": [[0.0, 0.0, 0.0]]},
        }, f)
    K = dp.PinholeCameraIntrinsic.from_params(60, 40, 100.0, 100.0, 30.0, 20.0)
    pcd, m = dp.ray_tracing_points(scene, cloud, K, img, points=[(30, 20)])
    assert len(pcd) >= 1
    # the central ray should hit the near side of the sphere (z ~ 470)
    assert abs(pcd.points[0][2] - 470.0) < 8.0

    # depth_projection_points with a flat synthetic depth image
    depth = np.full((40, 60), 470.0)
    off, ali, p3d = dp.depth_projection_points(depth, K, cloud, points=[(30, 20)])
    assert p3d.shape == (1, 3) and abs(p3d[0, 2] - 470.0) < 1e-6
    assert ali.shape == (1, 3)

    # visualize headless -> PLY snapshot
    out = str(tmp_path / "snap.ply")
    dp.visualize([pcd, m], out_path=out)
    assert os.path.exists(out)
