"""Neural object field: encoders, marching tetrahedra, tiny end-to-end fit."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from sixdof_tpu.models import object_field as of
from sixdof_tpu.ops.marching import marching_tetrahedra


def test_marching_tet_sphere():
    R = 48
    lin = np.linspace(-1, 1, R)
    g = np.stack(np.meshgrid(lin, lin, lin, indexing="ij"), axis=-1)
    sdf = np.linalg.norm(g, axis=-1) - 0.6
    verts, faces = marching_tetrahedra(sdf, 0.0)
    assert len(verts) > 500 and len(faces) > 1000
    # vertices lie near the r=0.6 sphere (in index coords -> world)
    world = verts / (R - 1) * 2 - 1
    r = np.linalg.norm(world, axis=-1)
    assert abs(np.mean(r) - 0.6) < 0.02
    assert np.std(r) < 0.02
    # normals point outward
    from sixdof_tpu.io.mesh_io import TriMesh

    m = TriMesh(world, faces)
    fn = m.face_normals
    centers = world[faces].mean(axis=1)
    agree = np.einsum("ij,ij->i", fn, centers / np.linalg.norm(centers, axis=-1, keepdims=True))
    assert (agree > 0).mean() > 0.98


def test_hash_grid_encode_shapes_and_interp():
    spec = of.HashGridSpec(n_levels=4, base_res=4, finest_res=16, log2_hashmap_size=10)
    key = jax.random.PRNGKey(0)
    table = of.init_hash_grid(key, spec)
    x = jnp.asarray(np.random.RandomState(0).uniform(-1, 1, (32, 3)).astype(np.float32))
    feats = of.hash_grid_encode(table, x, spec)
    assert feats.shape == (32, spec.out_dim)
    # continuity: tiny perturbation -> tiny feature change
    f2 = of.hash_grid_encode(table, x + 1e-5, spec)
    assert float(jnp.abs(feats - f2).max()) < 1e-2


def test_sh_encode_constant_and_linear():
    d = jnp.asarray([[0.0, 0.0, 1.0], [1.0, 0.0, 0.0]])
    sh = np.asarray(of.sh_encode(d, degree=3))
    assert sh.shape == (2, 9)
    np.testing.assert_allclose(sh[:, 0], 0.28209479, atol=1e-6)


def test_ray_box_intersect():
    o = jnp.asarray([[0.0, 0.0, -2.0], [5.0, 5.0, 5.0]])
    d = jnp.asarray([[0.0, 0.0, 1.0], [0.0, 0.0, 1.0]])
    near, far = of.ray_box_intersect(o, d)
    np.testing.assert_allclose(np.asarray(near), [1.0, 0.0], atol=1e-6)
    np.testing.assert_allclose(np.asarray(far)[0], 3.0, atol=1e-6)


@pytest.mark.slow
def test_object_field_fits_sphere():
    """Tiny synthetic fit: render a sphere's depth from a few views and check
    the recovered mesh radius."""
    from sixdof_tpu.ops.lie import euler_matrix

    R_img = 48
    K = np.array([[60.0, 0, 24], [0, 60.0, 24], [0, 0, 1]])
    radius = 0.05
    rgbs, depths, masks, cam_in_obs = [], [], [], []
    for k in range(4):
        # camera on a circle looking at the origin
        ang = k * np.pi / 2
        cam_pos = np.array([0.25 * np.sin(ang), 0, -0.25 * np.cos(ang)])
        z_axis = -cam_pos / np.linalg.norm(cam_pos)
        x_axis = np.cross([0, 1, 0], z_axis)
        x_axis /= np.linalg.norm(x_axis)
        y_axis = np.cross(z_axis, x_axis)
        cam_in_ob = np.eye(4)
        cam_in_ob[:3, 0], cam_in_ob[:3, 1], cam_in_ob[:3, 2] = x_axis, y_axis, z_axis
        cam_in_ob[:3, 3] = cam_pos

        # analytic sphere depth in this camera
        ob_in_cam = np.linalg.inv(cam_in_ob)
        c = ob_in_cam[:3, 3]  # sphere center in cam
        us, vs = np.meshgrid(np.arange(R_img), np.arange(R_img))
        dirs = np.stack([(us - K[0, 2]) / K[0, 0], (vs - K[1, 2]) / K[1, 1],
                         np.ones_like(us, float)], axis=-1)
        dn = dirs / np.linalg.norm(dirs, axis=-1, keepdims=True)
        b = dn @ c
        disc = b**2 - (c @ c - radius**2)
        hit = disc > 0
        t = b - np.sqrt(np.where(hit, disc, 0))
        depth = np.where(hit, t * dn[..., 2], 0.0)  # z-depth
        rgbs.append(np.full((R_img, R_img, 3), 180, dtype=np.uint8))
        depths.append(depth)
        masks.append(hit.astype(np.uint8))
        cam_in_obs.append(cam_in_ob)

    cfg = of.ObjectFieldConfig(n_step=80, n_rand=512, n_samples=32,
                               n_samples_around_depth=32, lrate=0.01)
    runner = of.ObjectFieldRunner(cfg, K, np.stack(rgbs), np.stack(depths),
                                  np.stack(masks), np.stack(cam_in_obs),
                                  spec=of.HashGridSpec(n_levels=8, base_res=8,
                                                       finest_res=64,
                                                       log2_hashmap_size=15))
    losses = runner.train(80, log_every=0)
    assert losses[-1] < losses[0]
    mesh = runner.extract_mesh(resolution=48)
    assert len(mesh.vertices) > 100
    mesh = runner.mesh_to_real_world(mesh)
    r = np.linalg.norm(mesh.vertices, axis=-1)
    assert abs(np.median(r) - radius) < 0.02, f"median radius {np.median(r)} vs {radius}"


def test_occupancy_grid_query_and_spans():
    rng = np.random.RandomState(0)
    # occupied shell: points on a sphere of radius 0.5
    d = rng.randn(2000, 3)
    d /= np.linalg.norm(d, axis=1, keepdims=True)
    pts = d * 0.5
    grid = of.OccupancyGrid(pts, resolution=32, dilate=1)
    assert bool(grid.query(jnp.asarray([[0.5, 0.0, 0.0]]))[0])
    assert not bool(grid.query(jnp.asarray([[0.95, 0.95, 0.95]]))[0])
    # ray through the middle: span brackets the sphere
    o = jnp.asarray([[0.0, 0.0, -1.0]])
    dd = jnp.asarray([[0.0, 0.0, 1.0]])
    near, far = grid.ray_near_far(o, dd)
    assert 0.3 < float(near[0]) < 0.6
    assert 1.4 < float(far[0]) < 1.7
