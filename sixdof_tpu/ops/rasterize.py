"""Batched triangle rasterization for render-and-compare pose estimation.

TPU-native replacement for nvdiffrast (reference Utils.py:133-219
`nvdiffrast_render`): renders N pose hypotheses of one mesh directly into
their 160x160 crop windows, with z-buffering, perspective-correct barycentric
interpolation of camera-space xyz / vertex colors / UVs, bilinear texture
lookup, vertex-normal interpolation and Lambertian shading
(w_ambient=0.8, w_diffuse=0.5, light_dir +z — Utils.py:133,201-212).

Design notes (vs the reference's GL pipeline):
- no OpenGL detour: vertices project straight to image pixel coordinates via
  K, then the per-hypothesis 3x3 crop transform (the reference's bbox2d
  clip-space trick, Utils.py:171-181) is applied in pixel space.  Output is
  already image-oriented — the reference's final Y-flips (Utils.py:215-218)
  are unnecessary;
- the z-buffer scan runs over triangle chunks under `lax.scan` with the
  hypothesis batch `vmap`ped, keeping the live working set at
  (pose_chunk, tri_chunk, H, W) in VMEM-friendly tiles; XLA fuses the edge
  functions and the min-z select into one VPU pass;
- pixels sample at integer coordinates in the K convention (u=j at the pixel
  center), matching ops/warp.py so rendered and warped-real crops align.

No gradients are needed (the reference renders under inference_mode).
"""
from __future__ import annotations

import functools
from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp
import numpy as np


class MeshArrays(NamedTuple):
    """Device-resident mesh in raster-ready form (see make_mesh_arrays)."""

    pos: jnp.ndarray  # (V,3) f32 object-frame vertices
    faces: jnp.ndarray  # (T,3) i32
    vnormals: jnp.ndarray  # (V,3) f32 unit vertex normals
    vertex_color: Optional[jnp.ndarray]  # (V,3) f32 in [0,1], or None
    uv: Optional[jnp.ndarray]  # (V,2) f32, or None
    tex: Optional[jnp.ndarray]  # (Ht,Wt,3) f32 in [0,1], or None


def make_mesh_arrays(mesh, max_tex_size=None) -> MeshArrays:
    """TriMesh -> MeshArrays (reference Utils.py:104-130 make_mesh_tensors).

    Texture V coordinate is flipped (uv[:,1] = 1-v) exactly like the
    reference; meshes without colors get uniform grey 128/255.
    """
    vertex_color = None
    uv = None
    tex = None
    if mesh.texture is not None and mesh.uv is not None:
        img = mesh.texture
        if max_tex_size is not None and max(img.shape[:2]) > max_tex_size:
            import cv2

            scale = max_tex_size / max(img.shape[:2])
            img = cv2.resize(img, dsize=None, fx=scale, fy=scale)
        tex = jnp.asarray(img, dtype=jnp.float32) / 255.0
        uv_np = np.array(mesh.uv, dtype=np.float32)
        uv_np[:, 1] = 1.0 - uv_np[:, 1]
        uv = jnp.asarray(uv_np)
    else:
        vc = mesh.vertex_colors
        if vc is None:
            vc = np.tile(np.array([[128.0, 128.0, 128.0]]), (len(mesh.vertices), 1))
        vc = np.asarray(vc, dtype=np.float32)
        if vc.max() > 1.0:
            vc = vc / 255.0
        vertex_color = jnp.asarray(vc)
    return MeshArrays(
        pos=jnp.asarray(mesh.vertices, dtype=jnp.float32),
        faces=jnp.asarray(mesh.faces, dtype=jnp.int32),
        vnormals=jnp.asarray(mesh.vertex_normals, dtype=jnp.float32),
        vertex_color=vertex_color,
        uv=uv,
        tex=tex,
    )


def _tri_setup(uv_crop, z_cam, faces, znear):
    """Per-triangle raster setup: edge-function + 1/z plane coefficients.

    Edge functions are LINEAR in pixel coordinates, so evaluating a triangle
    chunk over all pixels is a (4C,3)x(3,P) matmul — MXU work instead of
    gather-heavy VPU broadcasting.  Returns (coef (T,4,3), sign (T,), valid
    (T,)) where rows of coef are [w0,w1,w2,inv_z] plane equations (w already
    divided by the signed area, so li = coef_i . [px,py,1] and inside means
    li*sign >= 0 ... actually li are the true barycentrics; inside = all >=0).
    """
    v0 = uv_crop[faces[:, 0]]
    v1 = uv_crop[faces[:, 1]]
    v2 = uv_crop[faces[:, 2]]
    z0, z1, z2 = z_cam[faces[:, 0]], z_cam[faces[:, 1]], z_cam[faces[:, 2]]
    area = (v1[:, 0] - v0[:, 0]) * (v2[:, 1] - v0[:, 1]) - (v1[:, 1] - v0[:, 1]) * (
        v2[:, 0] - v0[:, 0]
    )
    valid = (jnp.abs(area) > 1e-12) & (z0 > znear) & (z1 > znear) & (z2 > znear)
    inv_area = jnp.where(valid, 1.0 / jnp.where(jnp.abs(area) > 1e-12, area, 1.0), 0.0)

    def edge_coef(a, b):
        # w(p) = (bx-ax)(py-ay) - (by-ay)(px-ax) -> [A,B,C] . [px,py,1]
        ex = b[:, 0] - a[:, 0]
        ey = b[:, 1] - a[:, 1]
        return jnp.stack([-ey, ex, ey * a[:, 0] - ex * a[:, 1]], axis=-1)

    c0 = edge_coef(v1, v2) * inv_area[:, None]  # barycentric l0 plane
    c1 = edge_coef(v2, v0) * inv_area[:, None]
    c2 = edge_coef(v0, v1) * inv_area[:, None]
    # 1/z interpolates linearly: inv_z(p) = sum li * (1/zi)
    iz = (
        c0 * (1.0 / z0)[:, None] + c1 * (1.0 / z1)[:, None] + c2 * (1.0 / z2)[:, None]
    )
    coef = jnp.stack([c0, c1, c2, iz], axis=1)  # (T,4,3)
    return coef, valid


def _rasterize_one(uv_crop, z_cam, faces, out_hw, tri_chunk, znear):
    """Z-buffer rasterization of one hypothesis.

    @uv_crop: (V,2) crop-space vertex coords; @z_cam: (V,) camera depths.
    Returns (tri_id (H,W) int32 [-1 = miss], bary (H,W,3), z (H,W)).
    """
    H, W = out_hw
    P = H * W
    T = faces.shape[0]
    pad = (-T) % tri_chunk
    coef, valid = _tri_setup(uv_crop, z_cam, faces, znear)
    coef_p = jnp.pad(coef, ((0, pad), (0, 0), (0, 0)))
    valid_p = jnp.pad(valid, (0, pad))
    n_chunks = (T + pad) // tri_chunk

    px = jnp.tile(jnp.arange(W, dtype=jnp.float32)[None, :], (H, 1)).reshape(P)
    py = jnp.repeat(jnp.arange(H, dtype=jnp.float32), W)
    pix = jnp.stack([px, py, jnp.ones_like(px)], axis=0)  # (3,P)

    def chunk_step(carry, chunk_idx):
        zbuf, tid = carry
        c = jax.lax.dynamic_slice(coef_p, (chunk_idx * tri_chunk, 0, 0), (tri_chunk, 4, 3))
        vt = jax.lax.dynamic_slice(valid_p, (chunk_idx * tri_chunk,), (tri_chunk,))
        # (C,4,P) plane evaluation — elementwise (exact fp32): a matmul would
        # run bf16 on the MXU and thin-triangle coefficients (1/area) blow the
        # error up to O(1) barycentric units
        vals = (
            c[..., 0:1] * pix[0][None, None]
            + c[..., 1:2] * pix[1][None, None]
            + c[..., 2:3]
        )
        l0, l1, l2, inv_z = vals[:, 0], vals[:, 1], vals[:, 2], vals[:, 3]
        inside = (l0 >= 0) & (l1 >= 0) & (l2 >= 0) & vt[:, None]
        z = jnp.where(inside & (inv_z > 1e-12), 1.0 / jnp.maximum(inv_z, 1e-12), jnp.inf)

        best = jnp.argmin(z, axis=0)  # (P,)
        zmin = jnp.min(z, axis=0)
        closer = zmin < zbuf
        new_tid = jnp.where(closer, chunk_idx * tri_chunk + best.astype(jnp.int32), tid)
        new_z = jnp.where(closer, zmin, zbuf)
        return (new_z, new_tid), None

    init = (
        jnp.full((P,), jnp.inf, dtype=jnp.float32),
        jnp.full((P,), -1, dtype=jnp.int32),
    )
    (zbuf, tid), _ = jax.lax.scan(chunk_step, init, jnp.arange(n_chunks))

    # recompute the winner's barycentrics once per pixel (cheaper than
    # carrying them through the scan); elementwise for exact fp32
    cw = coef_p[jnp.maximum(tid, 0)]  # (P,4,3)
    lw = cw[:, :3, 0] * pix[0][:, None] + cw[:, :3, 1] * pix[1][:, None] + cw[:, :3, 2]
    tid = tid.reshape(H, W)
    bary = lw.reshape(H, W, 3)
    zbuf = jnp.where(tid >= 0, zbuf.reshape(H, W), 0.0)
    return tid, bary, zbuf


def _interpolate(vertex_attr, faces, tid, bary, z_cam, zbuf):
    """Perspective-correct per-pixel attribute interpolation.

    @vertex_attr: (V,D); returns (H,W,D), zero where tid<0.
    """
    f = faces[jnp.maximum(tid, 0)]  # (H,W,3)
    a = vertex_attr[f]  # (H,W,3,D)
    z = z_cam[f]  # (H,W,3)
    w = bary / jnp.maximum(z, 1e-12)  # (H,W,3)
    num = jnp.sum(w[..., None] * a, axis=-2)  # elementwise: exact fp32
    out = num * zbuf[..., None]
    return jnp.where((tid >= 0)[..., None], out, 0.0)


def _sample_texture(tex, uv):
    """Bilinear texture sample; @uv: (H,W,2) in [0,1]; @tex: (Ht,Wt,3)."""
    Ht, Wt = tex.shape[:2]
    x = jnp.clip(uv[..., 0], 0.0, 1.0) * (Wt - 1)
    y = jnp.clip(uv[..., 1], 0.0, 1.0) * (Ht - 1)
    x0 = jnp.floor(x).astype(jnp.int32)
    y0 = jnp.floor(y).astype(jnp.int32)
    x1 = jnp.minimum(x0 + 1, Wt - 1)
    y1 = jnp.minimum(y0 + 1, Ht - 1)
    fx = (x - x0)[..., None]
    fy = (y - y0)[..., None]
    c00 = tex[y0, x0]
    c01 = tex[y0, x1]
    c10 = tex[y1, x0]
    c11 = tex[y1, x1]
    return (
        c00 * (1 - fx) * (1 - fy)
        + c01 * fx * (1 - fy)
        + c10 * (1 - fx) * fy
        + c11 * fx * fy
    )


@functools.partial(
    jax.jit,
    static_argnames=("out_hw", "tri_chunk", "pose_chunk", "get_normal", "use_light",
                     "use_pallas"),
)
def render_batch(
    mesh: MeshArrays,
    poses,
    K,
    crop_tfs=None,
    out_hw=(160, 160),
    znear=0.001,
    tri_chunk=64,
    pose_chunk=32,
    get_normal=False,
    use_light=True,
    w_ambient=0.8,
    w_diffuse=0.5,
    light_dir=(0.0, 0.0, 1.0),
    use_pallas=None,
):
    """Render N hypotheses into their crop windows.

    @poses: (B,4,4) object-in-camera (OpenCV convention);
    @K: (3,3); @crop_tfs: (B,3,3) full-image->crop pixel transform or None.
    Returns dict: color (B,H,W,3) in [0,1], depth (B,H,W) camera z,
    xyz_map (B,H,W,3) camera-frame, alpha (B,H,W), normal (opt).
    """
    B = poses.shape[0]
    H, W = out_hw
    poses = poses.astype(jnp.float32)
    K = jnp.asarray(K, dtype=jnp.float32)
    if crop_tfs is None:
        crop_tfs = jnp.tile(jnp.eye(3, dtype=jnp.float32)[None], (B, 1, 1))
    light = jnp.asarray(light_dir, dtype=jnp.float32)
    light = light / jnp.linalg.norm(light)

    def vertex_setup(pose, crop_tf):
        R, t = pose[:3, :3], pose[:3, 3]
        p_cam = mesh.pos @ R.T + t  # (V,3)
        z = p_cam[:, 2]
        uvw = p_cam @ K.T  # (V,3)
        uv = uvw[:, :2] / jnp.maximum(uvw[:, 2:3], znear)
        uvh = jnp.concatenate([uv, jnp.ones_like(uv[:, :1])], axis=-1)
        uv_crop = (uvh @ crop_tf.T)[:, :2]
        return p_cam, z, uv_crop

    def shade(pose, p_cam, z, tid, bary, zbuf):
        R = pose[:3, :3]
        alpha = (tid >= 0).astype(jnp.float32)

        xyz = _interpolate(p_cam, mesh.faces, tid, bary, z, zbuf)
        if mesh.tex is not None:
            uv_px = _interpolate(mesh.uv, mesh.faces, tid, bary, z, zbuf)
            color = _sample_texture(mesh.tex, uv_px)
        else:
            color = _interpolate(mesh.vertex_color, mesh.faces, tid, bary, z, zbuf)

        n_cam_v = mesh.vnormals @ R.T  # (V,3)
        normal = None
        if get_normal or use_light:
            normal = _interpolate(n_cam_v, mesh.faces, tid, bary, z, zbuf)
            normal = normal / jnp.maximum(jnp.linalg.norm(normal, axis=-1, keepdims=True), 1e-12)
        if use_light:
            # per-vertex diffuse then interpolate, like dr.interpolate of
            # diffuse_intensity (reference Utils.py:206-207)
            nv = n_cam_v / jnp.maximum(jnp.linalg.norm(n_cam_v, axis=-1, keepdims=True), 1e-12)
            diffuse_v = jnp.clip(jnp.sum(nv * (-light)[None], axis=-1), 0.0, 1.0)[:, None]
            diffuse = _interpolate(diffuse_v, mesh.faces, tid, bary, z, zbuf)[..., 0]
            color = color * w_ambient + diffuse[..., None] * color * w_diffuse
        color = jnp.clip(color, 0.0, 1.0) * alpha[..., None]
        out = {"color": color, "depth": zbuf, "xyz_map": xyz, "alpha": alpha}
        if get_normal:
            out["normal"] = normal
        return out

    def render_one(pose, crop_tf):
        p_cam, z, uv_crop = vertex_setup(pose, crop_tf)
        tid, bary, zbuf = _rasterize_one(uv_crop, z, mesh.faces, (H, W), tri_chunk, znear)
        return shade(pose, p_cam, z, tid, bary, zbuf)

    if use_pallas is None:
        use_pallas = jax.default_backend() not in ("cpu",)
    if use_pallas:
        from .pallas.raster_kernel import group_coefficients, rasterize_zbuffer_pallas

        p_cam, z_all, uv_all = jax.vmap(vertex_setup)(poses, crop_tfs.astype(jnp.float32))
        coef, valid = jax.vmap(lambda uv, z: _tri_setup(uv, z, mesh.faces, znear))(
            uv_all, z_all
        )
        pc = 128
        grouped = group_coefficients(coef, valid, tri_chunk=pc)
        zbuf_flat, tid_flat = rasterize_zbuffer_pallas(grouped, H, W, tri_chunk=pc)

        T_pad = grouped.shape[1] * pc
        coef_pad = jnp.pad(coef, ((0, 0), (0, T_pad - coef.shape[1]), (0, 0), (0, 0)))

        def finish(pose, p_cam_i, z_i, zbuf_i, tid_i, coef_i):
            tid2 = tid_i.reshape(H, W)
            zb = zbuf_i.reshape(H, W)
            # winner barycentrics recomputed once per pixel
            px = jnp.tile(jnp.arange(W, dtype=jnp.float32)[None, :], (H, 1)).reshape(-1)
            py = jnp.repeat(jnp.arange(H, dtype=jnp.float32), W)
            pix = jnp.stack([px, py, jnp.ones_like(px)], axis=0)
            cw = coef_i[jnp.maximum(tid2.reshape(-1), 0)]
            lw = (cw[:, :3, 0] * pix[0][:, None] + cw[:, :3, 1] * pix[1][:, None]
                  + cw[:, :3, 2])
            bary = lw.reshape(H, W, 3)
            return shade(pose, p_cam_i, z_i, tid2, bary, zb)

        outs = jax.vmap(finish)(poses, p_cam, z_all, zbuf_flat, tid_flat, coef_pad)
        return outs

    # chunk the hypothesis batch to bound the (chunk, tri_chunk, H, W) temps
    pose_chunk = min(pose_chunk, B)
    pad = (-B) % pose_chunk
    poses_p = jnp.concatenate([poses, jnp.tile(jnp.eye(4, dtype=jnp.float32)[None], (pad, 1, 1))])
    crops_p = jnp.concatenate([crop_tfs.astype(jnp.float32),
                               jnp.tile(jnp.eye(3, dtype=jnp.float32)[None], (pad, 1, 1))])
    poses_c = poses_p.reshape(-1, pose_chunk, 4, 4)
    crops_c = crops_p.reshape(-1, pose_chunk, 3, 3)
    outs = jax.lax.map(lambda pc_: jax.vmap(render_one)(pc_[0], pc_[1]), (poses_c, crops_c))
    return {k: v.reshape(-1, *v.shape[2:])[:B] for k, v in outs.items()}
