"""Rasterizer validated against an independent numpy scanline reference."""
import jax.numpy as jnp
import numpy as np

from sixdof_tpu.io import mesh_io
from sixdof_tpu.ops import rasterize as ras
from sixdof_tpu.ops import warp as warp_ops
from sixdof_tpu.ops.geometry import compute_crop_window_tf_batch


def box_mesh(size=(0.1, 0.08, 0.06)):
    sx, sy, sz = np.array(size) / 2
    v = np.array(
        [
            [-sx, -sy, -sz], [sx, -sy, -sz], [sx, sy, -sz], [-sx, sy, -sz],
            [-sx, -sy, sz], [sx, -sy, sz], [sx, sy, sz], [-sx, sy, sz],
        ]
    )
    f = np.array(
        [
            [0, 2, 1], [0, 3, 2], [4, 5, 6], [4, 6, 7],
            [0, 1, 5], [0, 5, 4], [2, 3, 7], [2, 7, 6],
            [1, 2, 6], [1, 6, 5], [3, 0, 4], [3, 4, 7],
        ]
    )
    colors = (np.abs(v) / np.abs(v).max() * 255).astype(np.float64)
    return mesh_io.TriMesh(v, f, vertex_colors=colors)


def numpy_raster_depth(verts_cam, faces, K, crop_tf, H, W):
    """Slow per-pixel reference: perspective-correct z at each pixel."""
    uvw = verts_cam @ K.T
    uv = uvw[:, :2] / uvw[:, 2:3]
    uvh = np.concatenate([uv, np.ones((len(uv), 1))], axis=-1)
    uvc = (uvh @ crop_tf.T)[:, :2]
    z = verts_cam[:, 2]
    depth = np.zeros((H, W))
    zbuf = np.full((H, W), np.inf)
    for tri in faces:
        p0, p1, p2 = uvc[tri[0]], uvc[tri[1]], uvc[tri[2]]
        area = (p1[0] - p0[0]) * (p2[1] - p0[1]) - (p1[1] - p0[1]) * (p2[0] - p0[0])
        if abs(area) < 1e-12:
            continue
        xmin = max(int(np.floor(min(p0[0], p1[0], p2[0]))), 0)
        xmax = min(int(np.ceil(max(p0[0], p1[0], p2[0]))), W - 1)
        ymin = max(int(np.floor(min(p0[1], p1[1], p2[1]))), 0)
        ymax = min(int(np.ceil(max(p0[1], p1[1], p2[1]))), H - 1)
        for py in range(ymin, ymax + 1):
            for px in range(xmin, xmax + 1):
                w0 = (p2[0] - p1[0]) * (py - p1[1]) - (p2[1] - p1[1]) * (px - p1[0])
                w1 = (p0[0] - p2[0]) * (py - p2[1]) - (p0[1] - p2[1]) * (px - p2[0])
                w2 = (p1[0] - p0[0]) * (py - p0[1]) - (p1[1] - p0[1]) * (px - p0[0])
                l0, l1, l2 = w0 / area, w1 / area, w2 / area
                if l0 < 0 or l1 < 0 or l2 < 0:
                    continue
                inv_z = l0 / z[tri[0]] + l1 / z[tri[1]] + l2 / z[tri[2]]
                zz = 1.0 / inv_z
                if zz < zbuf[py, px]:
                    zbuf[py, px] = zz
                    depth[py, px] = zz
    return depth


K = np.array([[400.0, 0, 120], [0, 400.0, 90], [0, 0, 1]])


def test_depth_matches_numpy_reference():
    mesh = box_mesh()
    arrays = ras.make_mesh_arrays(mesh)
    pose = np.eye(4, dtype=np.float32)
    pose[:3, 3] = [0.01, -0.005, 0.5]
    pose[:3, :3] = np.array(
        [[0.936, -0.275, 0.218], [0.289, 0.957, -0.033], [-0.200, 0.094, 0.975]]
    )
    H, W = 180, 240
    out = ras.render_batch(arrays, jnp.asarray(pose[None]), K, None, out_hw=(H, W))
    depth = np.asarray(out["depth"][0])
    verts_cam = mesh.vertices @ pose[:3, :3].T + pose[:3, 3]
    ref = numpy_raster_depth(verts_cam, mesh.faces, K, np.eye(3), H, W)
    # coverage within a couple of boundary pixels
    cover_ours = depth > 0
    cover_ref = ref > 0
    disagree = np.mean(cover_ours != cover_ref)
    assert disagree < 0.01, f"coverage disagreement {disagree}"
    both = cover_ours & cover_ref
    assert both.sum() > 500
    np.testing.assert_allclose(depth[both], ref[both], atol=1e-4)


def test_render_in_crop_window():
    mesh = box_mesh()
    arrays = ras.make_mesh_arrays(mesh)
    pose = np.eye(4, dtype=np.float32)
    pose[:3, 3] = [0.0, 0.0, 0.5]
    crop = compute_crop_window_tf_batch(
        jnp.asarray(pose[None]), jnp.asarray(K, dtype=jnp.float32),
        crop_ratio=1.2, out_size=(160, 160), mesh_diameter=0.15,
    )
    out = ras.render_batch(arrays, jnp.asarray(pose[None]), K, crop, out_hw=(160, 160))
    alpha = np.asarray(out["alpha"][0])
    assert alpha.sum() > 2000  # object visible and reasonably sized
    # object is centered in the crop
    ys, xs = np.where(alpha > 0)
    assert abs(xs.mean() - 80) < 8 and abs(ys.mean() - 80) < 8
    # depth ~ 0.5 where covered
    d = np.asarray(out["depth"][0])
    assert abs(np.median(d[d > 0]) - 0.5) < 0.06
    # xyz z-channel equals depth
    xyz = np.asarray(out["xyz_map"][0])
    np.testing.assert_allclose(xyz[..., 2], d, atol=1e-5)


def test_batched_poses_differ():
    mesh = box_mesh()
    arrays = ras.make_mesh_arrays(mesh)
    poses = np.tile(np.eye(4, dtype=np.float32)[None], (3, 1, 1))
    poses[:, 2, 3] = [0.4, 0.5, 0.6]
    out = ras.render_batch(arrays, jnp.asarray(poses), K, None, out_hw=(96, 128))
    areas = np.asarray(out["alpha"]).sum(axis=(1, 2))
    assert areas[0] > areas[1] > areas[2] > 0  # nearer pose covers more pixels


def test_lighting_modulates_faces():
    mesh = box_mesh()
    mesh.vertex_colors = np.full((8, 3), 255.0)
    arrays = ras.make_mesh_arrays(mesh)
    pose = np.eye(4, dtype=np.float32)
    pose[:3, 3] = [0, 0, 0.5]
    # rotate so two faces visible with different normals
    th = 0.6
    pose[:3, :3] = np.array(
        [[np.cos(th), 0, np.sin(th)], [0, 1, 0], [-np.sin(th), 0, np.cos(th)]]
    )
    out = ras.render_batch(arrays, jnp.asarray(pose[None]), K, None, out_hw=(180, 240))
    color = np.asarray(out["color"][0])
    alpha = np.asarray(out["alpha"][0])
    vals = np.unique(np.round(color[alpha > 0][:, 0], 2))
    assert len(vals) >= 2  # different shading on differently oriented faces


def test_warp_identity_and_shift():
    img = np.zeros((20, 30, 3), dtype=np.float32)
    img[5, 7] = [1.0, 2.0, 3.0]
    tf = np.eye(3, dtype=np.float32)[None]
    out = np.asarray(warp_ops.warp_perspective(jnp.asarray(img), jnp.asarray(tf), (20, 30)))
    np.testing.assert_allclose(out[0], img, atol=1e-6)
    # 2x scale about origin maps src pixel (7,5) to dst (14,10)
    tf2 = np.diag([2.0, 2.0, 1.0]).astype(np.float32)[None]
    out2 = np.asarray(
        warp_ops.warp_perspective(jnp.asarray(img), jnp.asarray(tf2), (40, 60), mode="nearest")
    )
    np.testing.assert_allclose(out2[0, 10, 14], [1, 2, 3], atol=1e-6)


def test_warp_matches_raster_convention():
    """Rendering full-frame then warping to the crop equals rendering into the
    crop directly (up to resampling error) — the alignment property the
    refiner depends on."""
    mesh = box_mesh()
    arrays = ras.make_mesh_arrays(mesh)
    pose = np.eye(4, dtype=np.float32)
    pose[:3, 3] = [0.02, 0.01, 0.45]
    crop = compute_crop_window_tf_batch(
        jnp.asarray(pose[None]), jnp.asarray(K, dtype=jnp.float32),
        crop_ratio=1.2, out_size=(64, 64), mesh_diameter=0.15,
    )
    direct = np.asarray(
        ras.render_batch(arrays, jnp.asarray(pose[None]), K, crop, out_hw=(64, 64))["depth"][0]
    )
    full = ras.render_batch(arrays, jnp.asarray(pose[None]), K, None, out_hw=(180, 240))
    warped = np.asarray(
        warp_ops.warp_perspective(full["depth"][0], crop, (64, 64), mode="nearest")
    )[0]
    cover_d = direct > 0
    cover_w = warped > 0
    assert np.mean(cover_d != cover_w) < 0.08
    both = cover_d & cover_w
    np.testing.assert_allclose(direct[both], warped[both], atol=0.01)


def test_warp_crop_batch_matches_generic():
    rng = np.random.RandomState(3)
    img = rng.rand(40, 50, 3).astype(np.float32)
    tfs = np.zeros((2, 3, 3), dtype=np.float32)
    tfs[0] = np.array([[2.0, 0, -8], [0, 2.0, -4], [0, 0, 1]])
    tfs[1] = np.array([[0.5, 0, 3], [0, 0.8, 1], [0, 0, 1]])
    for mode in ["bilinear", "nearest"]:
        ref = np.asarray(warp_ops.warp_perspective(jnp.asarray(img), jnp.asarray(tfs), (32, 32), mode=mode))
        sep = np.asarray(warp_ops.warp_crop_batch(jnp.asarray(img), jnp.asarray(tfs), (32, 32), mode=mode))
        np.testing.assert_allclose(sep, ref, atol=2e-5)
