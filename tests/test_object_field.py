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


def test_hash_grid_encode_custom_vjp_matches_autodiff():
    """The per-level-scatter custom backward (_lookup_col) must produce the
    same table/x gradients as plain autodiff of the same math."""
    spec = of.HashGridSpec(n_levels=4, base_res=4, finest_res=16, log2_hashmap_size=10)
    table = of.init_hash_grid(jax.random.PRNGKey(0), spec)
    x = jnp.asarray(np.random.RandomState(1).uniform(-0.99, 0.99, (64, 3)).astype(np.float32))

    def plain_encode(table, x):
        idx, w = of.hash_grid_indices(x, spec)
        outs = [jnp.sum(w * table[:, f][idx], axis=0) for f in range(spec.level_dim)]
        return jnp.transpose(jnp.stack(outs), (2, 1, 0)).reshape(x.shape[0], spec.out_dim)

    cot = jnp.asarray(np.random.RandomState(2).randn(64, spec.out_dim).astype(np.float32))

    def loss_custom(t, x):
        return jnp.sum(of.hash_grid_encode(t, x, spec) * cot)

    def loss_plain(t, x):
        return jnp.sum(plain_encode(t, x) * cot)

    gt_c, gx_c = jax.grad(loss_custom, argnums=(0, 1))(table, x)
    gt_p, gx_p = jax.grad(loss_plain, argnums=(0, 1))(table, x)
    np.testing.assert_allclose(np.asarray(gt_c), np.asarray(gt_p), atol=1e-5)
    np.testing.assert_allclose(np.asarray(gx_c), np.asarray(gx_p), atol=1e-4)
    # values match too
    np.testing.assert_allclose(np.asarray(of.hash_grid_encode(table, x, spec)),
                               np.asarray(plain_encode(table, x)), atol=1e-6)


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
    # multi-view fit quality: chamfer vs the ground-truth sphere
    from sixdof_tpu.metrics import chamfer_distance
    from sixdof_tpu.ops.hypotheses import icosphere
    from sixdof_tpu.io.mesh_io import TriMesh

    gv, gf = icosphere(subdivisions=3, radius=radius)
    cd = chamfer_distance(mesh, TriMesh(gv, gf), n_sample=5000)
    assert cd < 0.01, f"chamfer {cd*1e3:.2f} mm vs GT sphere (radius {radius*1e3:.0f} mm)"


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


def _tiny_runner(n_step=5):
    """Minimal 2-view runner over a flat depth patch (fast to construct)."""
    R = 24
    K = np.array([[30.0, 0, 12], [0, 30.0, 12], [0, 0, 1]])
    rgbs, depths, masks, cam_in_obs = [], [], [], []
    for k in range(2):
        depth = np.full((R, R), 0.3)
        mask = np.ones((R, R), np.uint8)
        rgb = np.full((R, R, 3), 120, np.uint8)
        pose = np.eye(4)
        pose[2, 3] = -0.3 + 0.02 * k
        rgbs.append(rgb); depths.append(depth); masks.append(mask); cam_in_obs.append(pose)
    cfg = of.ObjectFieldConfig(n_step=n_step, n_rand=128, n_samples=8,
                               n_samples_around_depth=8, lrate=0.01)
    return of.ObjectFieldRunner(cfg, K, np.stack(rgbs), np.stack(depths),
                                np.stack(masks), np.stack(cam_in_obs),
                                spec=of.HashGridSpec(n_levels=4, base_res=4,
                                                     finest_res=16,
                                                     log2_hashmap_size=10))


def test_save_load_roundtrip(tmp_path):
    """Checkpoint/resume: params survive orbax save+restore bit-for-bit and a
    restored runner keeps training (reference save_weights semantics,
    nerf_runner.py:393-421)."""
    r1 = _tiny_runner()
    r1.train(3, log_every=0)
    path = str(tmp_path / "field_ckpt")
    r1.save_weights(path)

    r2 = _tiny_runner()
    r2.load_weights(path)
    assert r2.global_step == r1.global_step
    np.testing.assert_array_equal(np.asarray(r2.params.table), np.asarray(r1.params.table))
    for a, b in zip(jax.tree.leaves(r1.params), jax.tree.leaves(r2.params)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    # resumed runner can keep training
    losses = r2.train(2, log_every=0)
    assert np.isfinite(losses).all()


def test_bake_texture_atlas():
    """UV texture bake: per-face atlas where each texel's color equals the
    field color at its barycentric surface point (the reference's intended-
    but-broken mesh_texture_from_train_images output, nerf_runner.py:1121)."""
    from sixdof_tpu.io.mesh_io import TriMesh, load_mesh, save_mesh

    r = _tiny_runner(n_step=2)
    r.train(2, log_every=0)
    # a small octahedron in the normalized frame
    v = np.array([[0.3, 0, 0], [-0.3, 0, 0], [0, 0.3, 0], [0, -0.3, 0],
                  [0, 0, 0.3], [0, 0, -0.3]])
    f = np.array([[0, 2, 4], [2, 1, 4], [1, 3, 4], [3, 0, 4],
                  [2, 0, 5], [1, 2, 5], [3, 1, 5], [0, 3, 5]])
    mesh = TriMesh(v, f)
    baked = r.bake_texture(mesh, cell=8)

    T = len(f)
    assert baked.texture is not None and baked.uv is not None
    assert len(baked.vertices) == 3 * T and len(baked.faces) == T
    assert baked.uv.min() >= 0.0 and baked.uv.max() <= 1.0
    S = baked.texture.shape[0]
    assert baked.texture.shape == (S, S, 3)

    # texel under corner-0's uv matches the field color at vertex 0 of face 0
    import jax.nn
    import jax.numpy as jnp

    u0, v0 = baked.uv[0]
    x = int(round(u0 * S - 0.5)); y = int(round((1.0 - v0) * S - 0.5))
    texel = baked.texture[y, x].astype(np.float64)
    sdf, geo = of.field_sdf(r.params, jnp.asarray(v[f[0, 0]][None], dtype=jnp.float32), r.spec)
    n0 = np.cross(v[f[0, 1]] - v[f[0, 0]], v[f[0, 2]] - v[f[0, 0]])
    n0 = n0 / np.linalg.norm(n0)
    ff = r.params.frame_features[0][None]
    # the bake queries with the INWARD normal (training view dirs run
    # camera->surface, against the outward normal)
    expect = np.asarray(jax.nn.sigmoid(of.field_color(
        r.params, geo, jnp.asarray(-n0[None], dtype=jnp.float32), ff, r.cfg.sh_degree))) * 255
    assert np.abs(texel - expect[0]).max() < 3.0

    # textured OBJ round-trips with uv + texture image
    import tempfile, os
    with tempfile.TemporaryDirectory() as d:
        p = os.path.join(d, "baked.obj")
        save_mesh(p, baked)
        back = load_mesh(p)
        assert back.texture is not None
        assert back.uv is not None


def test_chamfer_distance_metric():
    """chamfer_distance is ~0 for identical meshes and ~offset for shifted."""
    from sixdof_tpu.metrics import chamfer_distance
    from sixdof_tpu.ops.hypotheses import icosphere
    from sixdof_tpu.io.mesh_io import TriMesh

    v, f = icosphere(subdivisions=3, radius=0.1)
    a = TriMesh(v, f)
    # floor is the point-sampling density: ~sqrt(area/n)/2 ≈ 0.003 here
    assert chamfer_distance(a, a, n_sample=4000) < 5e-3
    # disjoint spheres 1.0 apart (radius 0.1): every nearest-neighbor
    # distance lies in [offset - 2r, offset] = [0.8, 1.0]
    b = TriMesh(v + np.array([1.0, 0, 0]), f)
    cd = chamfer_distance(a, b, n_sample=4000)
    assert 0.8 <= cd <= 1.0


def test_get_optimized_poses():
    """Pose export (reference get_optimized_poses_in_real_world,
    nerf_helpers.py:224-250): frame 0 is returned exactly as given (pinned),
    and with zero learned deltas every frame round-trips."""
    r = _tiny_runner()
    out0 = r.get_optimized_poses()
    # zero deltas: exact un-normalization round trip for all frames
    expect = r.poses_normalized.copy()
    expect[:, :3, 3] = expect[:, :3, 3] / r.sc_factor - np.asarray(r.translation)
    np.testing.assert_allclose(out0, expect.astype(np.float32), atol=1e-5)

    r.train(3, log_every=0)
    out = r.get_optimized_poses()
    # frame 0 pinned to identity correction even after training
    np.testing.assert_allclose(out[0], out0[0], atol=1e-5)
    # corrections are tanh-bounded: translations move < max_trans/sc_factor
    shift = np.linalg.norm(out[:, :3, 3] - out0[:, :3, 3], axis=-1)
    assert (shift <= r.cfg.max_trans / r.sc_factor + 1e-5).all()
