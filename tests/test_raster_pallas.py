"""Pallas raster kernel (interpret mode on CPU) vs the XLA scan path."""
import jax
import jax.numpy as jnp
import numpy as np

from sixdof_tpu.io import mesh_io
from sixdof_tpu.ops import rasterize as ras
from sixdof_tpu.ops.pallas.raster_kernel import group_coefficients, rasterize_zbuffer_pallas


def box_mesh():
    v = np.array(
        [[-0.05, -0.04, -0.03], [0.05, -0.04, -0.03], [0.05, 0.04, -0.03], [-0.05, 0.04, -0.03],
         [-0.05, -0.04, 0.03], [0.05, -0.04, 0.03], [0.05, 0.04, 0.03], [-0.05, 0.04, 0.03]]
    )
    f = np.array([[0, 2, 1], [0, 3, 2], [4, 5, 6], [4, 6, 7], [0, 1, 5], [0, 5, 4],
                  [2, 3, 7], [2, 7, 6], [1, 2, 6], [1, 6, 5], [3, 0, 4], [3, 4, 7]])
    return mesh_io.TriMesh(v, f)


def test_pallas_kernel_matches_xla_scan():
    mesh = box_mesh()
    arrays = ras.make_mesh_arrays(mesh)
    K = jnp.asarray(np.array([[300.0, 0, 64], [0, 300.0, 64], [0, 0, 1]], dtype=np.float32))
    H = W = 128
    poses = np.tile(np.eye(4, dtype=np.float32)[None], (3, 1, 1))
    poses[:, 2, 3] = [0.4, 0.5, 0.6]
    poses[1, :3, :3] = np.array(
        [[0.936, -0.275, 0.218], [0.289, 0.957, -0.033], [-0.2, 0.094, 0.975]], dtype=np.float32
    )
    poses = jnp.asarray(poses)

    # XLA reference path
    ref = ras.render_batch(arrays, poses, K, None, out_hw=(H, W), use_pallas=False)

    # pallas kernel path (interpret mode on CPU)
    def setup(pose):
        p_cam = arrays.pos @ pose[:3, :3].T + pose[:3, 3]
        z = p_cam[:, 2]
        uvw = p_cam @ K.T
        uv = uvw[:, :2] / jnp.maximum(uvw[:, 2:3], 0.001)
        return uv, z

    uv, z = jax.vmap(setup)(poses)
    coef, valid = jax.vmap(lambda u, zz: ras._tri_setup(u, zz, arrays.faces, 0.001))(uv, z)
    grouped = group_coefficients(coef, valid, tri_chunk=32)
    zbuf, tid = rasterize_zbuffer_pallas(grouped, H, W, tri_chunk=32, tile=512, interpret=True)

    for b in range(3):
        ref_d = np.asarray(ref["depth"][b]).reshape(-1)
        got_d = np.asarray(zbuf[b])
        cover_ref = ref_d > 0
        cover_got = got_d > 0
        assert np.mean(cover_ref != cover_got) < 0.005
        both = cover_ref & cover_got
        np.testing.assert_allclose(got_d[both], ref_d[both], atol=1e-4)


def test_render_batch_pallas_interpret_full():
    """Full render_batch through the pallas path (interpret) vs XLA."""
    mesh = box_mesh()
    mesh.vertex_colors = np.tile(np.array([[200, 120, 60.0]]), (8, 1))
    arrays = ras.make_mesh_arrays(mesh)
    K = np.array([[300.0, 0, 64], [0, 300.0, 48], [0, 0, 1]])
    pose = np.eye(4, dtype=np.float32)
    pose[:3, 3] = [0.01, 0.0, 0.45]
    # interpret mode: patch the kernel call to interpret=True via monkeypatch
    import functools

    import sixdof_tpu.ops.pallas.raster_kernel as rk

    orig = rk.rasterize_zbuffer_pallas
    rk.rasterize_zbuffer_pallas = functools.partial(orig, interpret=True)
    try:
        out_p = ras.render_batch(arrays, jnp.asarray(pose[None]), jnp.asarray(K, dtype=jnp.float32),
                                 None, out_hw=(96, 128), use_pallas=True)
    finally:
        rk.rasterize_zbuffer_pallas = orig
    out_x = ras.render_batch(arrays, jnp.asarray(pose[None]), jnp.asarray(K, dtype=jnp.float32),
                             None, out_hw=(96, 128), use_pallas=False)
    a_p = np.asarray(out_p["alpha"][0])
    a_x = np.asarray(out_x["alpha"][0])
    assert np.mean(a_p != a_x) < 0.005
    both = (a_p > 0) & (a_x > 0)
    np.testing.assert_allclose(
        np.asarray(out_p["color"][0])[both], np.asarray(out_x["color"][0])[both], atol=1e-4
    )
    np.testing.assert_allclose(
        np.asarray(out_p["depth"][0])[both], np.asarray(out_x["depth"][0])[both], atol=1e-4
    )


def test_raytrace_pallas_matches_xla():
    from sixdof_tpu.ops import raytrace as rt
    from sixdof_tpu.ops.pallas.raytrace_kernel import (
        pack_rays, pack_tris, ray_mesh_intersect_pallas,
    )

    rng = np.random.RandomState(0)
    mesh = box_mesh()
    tri, tri_mask = rt.mesh_to_tri_verts(mesh.vertices, mesh.faces)
    n = 300
    dirs = rng.randn(n, 3)
    dirs[:, 2] = np.abs(dirs[:, 2]) + 0.5
    dirs /= np.linalg.norm(dirs, axis=1, keepdims=True)
    origins = np.zeros((n, 3), dtype=np.float32)
    origins[:, 2] = -0.5
    mask = np.ones(n, dtype=bool)
    mask[::7] = False

    ref = np.asarray(rt.ray_mesh_intersect(
        jnp.asarray(origins), jnp.asarray(dirs, dtype=jnp.float32), jnp.asarray(mask),
        jnp.asarray(tri), jnp.asarray(tri_mask), use_pallas=False,
    ))
    rays_p = pack_rays(jnp.asarray(origins), jnp.asarray(dirs, dtype=jnp.float32),
                       jnp.asarray(mask), tile=512)
    tris_p = pack_tris(jnp.asarray(tri), jnp.asarray(tri_mask), tri_chunk=16)
    got = np.asarray(ray_mesh_intersect_pallas(rays_p, tris_p, tile=512, tri_chunk=16,
                                               interpret=True))[:n]
    finite = np.isfinite(ref)
    assert (np.isfinite(got) == finite).all()
    np.testing.assert_allclose(got[finite], ref[finite], atol=1e-5)


def sphere_mesh(n_lat=20, n_lon=32, r=0.05):
    """Closed UV sphere: (n_lat*n_lon*2) triangles — large enough to trigger
    the banded raster path (T >= 512)."""
    lat = np.linspace(0, np.pi, n_lat + 1)
    lon = np.linspace(0, 2 * np.pi, n_lon, endpoint=False)
    verts = [(0, 0, r), (0, 0, -r)]
    ring_start = []
    for i in range(1, n_lat):
        ring_start.append(len(verts))
        for j in range(n_lon):
            verts.append((r * np.sin(lat[i]) * np.cos(lon[j]),
                          r * np.sin(lat[i]) * np.sin(lon[j]),
                          r * np.cos(lat[i])))
    faces = []
    for j in range(n_lon):
        faces.append([0, ring_start[0] + j, ring_start[0] + (j + 1) % n_lon])
        faces.append([1, ring_start[-1] + (j + 1) % n_lon, ring_start[-1] + j])
    for i in range(len(ring_start) - 1):
        a, b = ring_start[i], ring_start[i + 1]
        for j in range(n_lon):
            j2 = (j + 1) % n_lon
            faces.append([a + j, b + j, b + j2])
            faces.append([a + j, b + j2, a + j2])
    v = np.asarray(verts)
    colors = (np.abs(v) / r * 255).clip(0, 255)
    return mesh_io.TriMesh(v, np.asarray(faces), vertex_colors=colors)


def test_banded_raster_matches_scan():
    """Row-band binned pallas path (T>=512 triggers banding) vs XLA scan."""
    mesh = sphere_mesh()
    arrays = ras.make_mesh_arrays(mesh)
    assert arrays.faces.shape[0] >= 512
    K = np.array([[300.0, 0, 64], [0, 300.0, 48], [0, 0, 1]])
    poses = np.tile(np.eye(4, dtype=np.float32)[None], (2, 1, 1))
    poses[:, 2, 3] = [0.4, 0.55]
    poses[1, :3, :3] = np.array(
        [[0.936, -0.275, 0.218], [0.289, 0.957, -0.033], [-0.2, 0.094, 0.975]], dtype=np.float32
    )
    import functools

    import sixdof_tpu.ops.pallas.raster_kernel as rk

    H, W = 96, 128  # band_rows=8 -> TILE=1024 (aligned), 12 bands
    orig = rk.rasterize_zbuffer_pallas
    rk.rasterize_zbuffer_pallas = functools.partial(orig, interpret=True)
    try:
        out_b = ras.render_batch(arrays, jnp.asarray(poses), jnp.asarray(K, dtype=jnp.float32),
                                 None, out_hw=(H, W), use_pallas=True, band_min_tris=512)
    finally:
        rk.rasterize_zbuffer_pallas = orig
    out_x = ras.render_batch(arrays, jnp.asarray(poses), jnp.asarray(K, dtype=jnp.float32),
                             None, out_hw=(H, W), use_pallas=False)
    for b in range(2):
        a_b = np.asarray(out_b["alpha"][b])
        a_x = np.asarray(out_x["alpha"][b])
        assert np.mean(a_b != a_x) < 0.005, f"pose {b}: alpha mismatch"
        both = (a_b > 0) & (a_x > 0)
        assert both.sum() > 200
        np.testing.assert_allclose(np.asarray(out_b["depth"][b])[both],
                                   np.asarray(out_x["depth"][b])[both], atol=1e-4)
        np.testing.assert_allclose(np.asarray(out_b["color"][b])[both],
                                   np.asarray(out_x["color"][b])[both], atol=1e-3)
        np.testing.assert_allclose(np.asarray(out_b["xyz_map"][b])[both],
                                   np.asarray(out_x["xyz_map"][b])[both], atol=1e-4)


def test_backface_cull_identical_on_closed_mesh():
    """Culling must not change the image of a watertight mesh (it only
    removes always-occluded work)."""
    mesh = sphere_mesh(n_lat=10, n_lon=16)
    arrays = ras.make_mesh_arrays(mesh)
    K = np.array([[300.0, 0, 64], [0, 300.0, 48], [0, 0, 1]])
    pose = np.eye(4, dtype=np.float32)
    pose[:3, 3] = [0.01, -0.01, 0.4]
    a = ras.render_batch(arrays, jnp.asarray(pose[None]), jnp.asarray(K, dtype=jnp.float32),
                         None, out_hw=(96, 128), use_pallas=False, backface_cull=False)
    b = ras.render_batch(arrays, jnp.asarray(pose[None]), jnp.asarray(K, dtype=jnp.float32),
                         None, out_hw=(96, 128), use_pallas=False, backface_cull=True)
    # identical except a handful of grazing silhouette pixels where only a
    # backface numerically covered the sample
    da = np.asarray(a["alpha"]) != np.asarray(b["alpha"])
    assert da.mean() < 1e-3, f"alpha changed on {da.mean():.2%} of pixels"
    dd = np.abs(np.asarray(a["depth"]) - np.asarray(b["depth"]))
    assert (dd > 1e-5).mean() < 1e-3
    both = (np.asarray(a["alpha"]) > 0) & (np.asarray(b["alpha"]) > 0) & (dd <= 1e-5)
    np.testing.assert_allclose(np.asarray(a["color"])[both], np.asarray(b["color"])[both],
                               atol=1e-5)
