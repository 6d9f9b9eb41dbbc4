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


def _rasterize_one(uv_crop, z_cam, faces, out_hw, tri_chunk, znear, valid_override=None):
    """Z-buffer rasterization of one hypothesis.

    @uv_crop: (V,2) crop-space vertex coords; @z_cam: (V,) camera depths.
    @valid_override: optional (T,) bool replacing the computed validity
    (e.g. with backface culling folded in).
    Returns (tri_id (H,W) int32 [-1 = miss], bary (H,W,3), z (H,W)).
    """
    H, W = out_hw
    P = H * W
    T = faces.shape[0]
    pad = (-T) % tri_chunk
    coef, valid = _tri_setup(uv_crop, z_cam, faces, znear)
    if valid_override is not None:
        valid = valid_override
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


def _attr_plane_table(vertex_attr, faces, z_cam, coef):
    """Per-triangle screen-space attribute planes.

    Perspective-correct interpolation attr(p) = z(p) * sum_k l_k(p) a_k/z_k is
    LINEAR in (px,py,1) once the barycentric planes are folded in:
    attr(p) = z(p) * (A px + B py + C), [A,B,C] = sum_k (a_k/z_k) c_k.
    Folding at setup time turns per-pixel shading into ONE fp32 row gather of
    3*D floats per pixel — no faces/vertex/barycentric gathers (the per-pixel
    gather cascade dominated render time on TPU; see round-2 notes).

    @vertex_attr: (V,D); @coef: (T,4,3) bary planes from _tri_setup.
    Returns (T+1, 3*D) FLAT rows [A(D) | B(D) | C(D)] (attr = A px + B py
    + C); row T = zeros for tid == -1 misses.  Flat because a (T+1, 3, D)
    array's (3, D) minor dims tile to (8, 128) in HBM — an ~85x footprint
    and gather-traffic blowup; the flat row keeps the table dense and the
    per-pixel gather contiguous.
    """
    a = vertex_attr[faces]  # (T,3,D)
    z = jnp.maximum(z_cam[faces], 1e-12)[..., None]  # (T,3,1)
    planes = jnp.einsum("tkc,tkd->tcd", coef[:, :3, :], a / z)  # (T,3coef,D)
    flat = planes.reshape(planes.shape[0], -1)  # (T, 3D)
    return jnp.concatenate([flat, jnp.zeros_like(flat[:1])], axis=0)


_NEVER_ROW = np.zeros((4, 3), dtype=np.float32)
_NEVER_ROW[0] = [0.0, 0.0, -1.0]  # l0(p) == -1: never inside


def _bin_triangles_bands(coef, valid, vy, faces, n_bands, band_rows, cap, vz=None):
    """Row-band triangle binning for the banded z-buffer kernel.

    Each band of `band_rows` pixel rows gets the <= cap triangles whose
    y-extent overlaps it (selection via top_k over a rank key — XLA-native,
    no ragged shapes).  Callers size cap so real workloads never overflow
    (crop windows scale with the object, so per-band occupancy is stable by
    construction); if a degenerate pose DOES overflow a band, the candidates
    kept are the NEAREST by camera z (when @vz is given) so the dropped
    triangles are the ones a z-buffer would most likely occlude anyway —
    never an arbitrary id-ordered cut.

    @coef: (B,T,4,3); @valid: (B,T); @vy: (B,V) crop-space vertex y;
    @vz: optional (B,V) camera-space vertex z for the nearest-first rank.
    Returns (banded_coef (B,nb,cap,4,3), ids (B,nb,cap) int32 [T = pad]).
    """
    B, T = valid.shape
    ty = vy[:, faces]  # (B,T,3)
    ymin = ty.min(axis=-1)
    ymax = ty.max(axis=-1)
    lo = (jnp.arange(n_bands, dtype=jnp.float32) * band_rows)[None, :, None]
    hi = lo + (band_rows - 1)
    overlap = (
        (ymax[:, None, :] >= lo) & (ymin[:, None, :] <= hi) & valid[:, None, :]
    )  # (B,nb,T)
    if vz is not None:
        tzmin = vz[:, faces].min(axis=-1)  # (B,T)
        key = jnp.where(overlap, -tzmin[:, None, :], -jnp.inf)
        topv, topi = jax.lax.top_k(key, cap)  # (B,nb,cap) nearest-first
        ids = jnp.where(jnp.isfinite(topv), topi, T).astype(jnp.int32)
    else:
        tid = jnp.arange(T, dtype=jnp.int32)
        key = jnp.where(overlap, 2 * T - tid[None, None, :], T - tid[None, None, :])
        topv, topi = jax.lax.top_k(key, cap)  # (B,nb,cap)
        ids = jnp.where(topv > T, topi, T).astype(jnp.int32)

    never = jnp.asarray(_NEVER_ROW)[None]
    coef_ext = jnp.concatenate([coef, jnp.broadcast_to(never, (B, 1, 4, 3))], axis=1)
    flat = ids.reshape(B, -1)
    banded = jnp.take_along_axis(coef_ext, flat[:, :, None, None], axis=1)
    return banded.reshape(B, n_bands, cap, 4, 3), ids


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
                     "use_pallas", "backface_cull", "band_min_tris",
                     "pallas_tri_chunk", "pallas_tile"),
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
    pallas_tri_chunk=128,
    get_normal=False,
    use_light=True,
    w_ambient=0.8,
    w_diffuse=0.5,
    light_dir=(0.0, 0.0, 1.0),
    use_pallas=None,
    backface_cull=False,
    band_min_tris=4096,
    pallas_tile=2048,
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
        # vertex/projection math in full fp32 (precision=_HI): the TPU's
        # default bf16 matmul passes jitter projected vertices ~0.4 px and
        # camera-frame positions ~2 mm, which the analytic depth consumers
        # (scorer, track polish) can feel
        _HI = jax.lax.Precision.HIGHEST
        R, t = pose[:3, :3], pose[:3, 3]
        p_cam = jnp.matmul(mesh.pos, R.T, precision=_HI) + t  # (V,3)
        z = p_cam[:, 2]
        uvw = jnp.matmul(p_cam, K.T, precision=_HI)  # (V,3)
        uv = uvw[:, :2] / jnp.maximum(uvw[:, 2:3], znear)
        uvh = jnp.concatenate([uv, jnp.ones_like(uv[:, :1])], axis=-1)
        uv_crop = jnp.matmul(uvh, crop_tf.T, precision=_HI)[:, :2]
        return p_cam, z, uv_crop

    T = mesh.faces.shape[0]
    px = jnp.tile(jnp.arange(W, dtype=jnp.float32)[None, :], (H, 1)).reshape(-1)
    py = jnp.repeat(jnp.arange(H, dtype=jnp.float32), W)

    def _attr_table(pose, z, coef):
        """Per-pose (T+1,3,D) screen-plane table over all shade channels."""
        R = pose[:3, :3]
        n_cam_v = mesh.vnormals @ R.T  # (V,3)
        chans = []
        if mesh.tex is not None:
            chans.append(mesh.uv)
        else:
            chans.append(mesh.vertex_color)
        if use_light:
            # per-vertex diffuse then interpolate, like dr.interpolate of
            # diffuse_intensity (reference Utils.py:206-207)
            nv = n_cam_v / jnp.maximum(jnp.linalg.norm(n_cam_v, axis=-1, keepdims=True), 1e-12)
            chans.append(jnp.clip(jnp.sum(nv * (-light)[None], axis=-1), 0.0, 1.0)[:, None])
        if get_normal:
            chans.append(n_cam_v)
        attr_v = jnp.concatenate(chans, axis=-1)
        return _attr_plane_table(attr_v, mesh.faces, z, coef)

    n_base = 2 if mesh.tex is not None else 3

    def shade(crop_tf, table, ids, tid, zbuf):
        """Packed-plane shading: ONE fp32 row gather per pixel (attribute
        screen-planes, _attr_plane_table) + z-buffer backprojection for xyz.
        Replaces the faces/vertex/barycentric per-pixel gather cascade that
        dominated render time on TPU.

        @table: (R,3D) flat plane rows [A|B|C] (last row = zeros for miss);
        @ids: (P,) row index per pixel; @tid: (H,W) for the alpha mask.
        """
        alpha = (tid >= 0).astype(jnp.float32)
        g = table[ids]  # (P,3D) — the single gather, one contiguous row
        D = table.shape[-1] // 3
        zb = zbuf.reshape(-1)
        attr = (g[:, :D] * px[:, None] + g[:, D:2 * D] * py[:, None]
                + g[:, 2 * D:]) * zb[:, None]

        o = n_base
        if mesh.tex is not None:
            color = _sample_texture(mesh.tex, attr[:, :2].reshape(H, W, 2))
        else:
            color = attr[:, :3].reshape(H, W, 3)
        if use_light:
            diffuse = attr[:, o : o + 1].reshape(H, W, 1)
            o += 1
            color = color * w_ambient + diffuse * color * w_diffuse
        normal = None
        if get_normal:
            normal = attr[:, o : o + 3].reshape(H, W, 3)
            normal = normal / jnp.maximum(
                jnp.linalg.norm(normal, axis=-1, keepdims=True), 1e-12
            )

        # xyz by backprojection: uv_crop = (crop_tf @ K) xyz/z, so
        # xyz = z * (crop_tf @ K)^-1 (px,py,1) — exact at pixel centers,
        # no interpolation table needed
        Minv = jnp.linalg.inv(jnp.matmul(crop_tf, K, precision=jax.lax.Precision.HIGHEST))
        ray = jnp.matmul(jnp.stack([px, py, jnp.ones_like(px)], axis=-1), Minv.T,
                         precision=jax.lax.Precision.HIGHEST)  # (P,3)
        xyz = (ray * zb[:, None]).reshape(H, W, 3)

        color = jnp.clip(color, 0.0, 1.0) * alpha[..., None]
        out = {"color": color, "depth": zbuf, "xyz_map": xyz, "alpha": alpha}
        if get_normal:
            out["normal"] = normal
        return out

    p_cam, z_all, uv_all = jax.vmap(vertex_setup)(poses, crop_tfs.astype(jnp.float32))
    coef, valid = jax.vmap(lambda uv, z: _tri_setup(uv, z, mesh.faces, znear))(uv_all, z_all)
    if backface_cull:
        # exact facing test in camera space (independent of image-plane
        # winding conventions): outward normal vs the view ray to v0.  Only
        # valid for watertight meshes, where backfaces are always occluded —
        # halves raster work (nvdiffrast does not cull, Utils.py:182; for
        # closed meshes the image is identical)
        def facing(pc_):
            v0 = pc_[mesh.faces[:, 0]]
            n = jnp.cross(pc_[mesh.faces[:, 1]] - v0, pc_[mesh.faces[:, 2]] - v0)
            return jnp.sum(n * v0, axis=-1) < 0.0

        valid = valid & jax.vmap(facing)(p_cam)

    tables = jax.vmap(_attr_table)(poses, z_all, coef)  # (B,T+1,3,D)

    if use_pallas is None:
        use_pallas = jax.default_backend() not in ("cpu",)
    band_rows = 8
    # banding pays only when the triangle count is large enough that the
    # brute-force (tri x pixel) kernel dwarfs the binning overhead (top_k +
    # candidate gathers cost ~200ms at B=252); below that the flat kernel +
    # backface culling wins (measured r2: T=1280 banded 560ms vs flat 304ms)
    use_banded = (
        use_pallas and T >= band_min_tris and H % band_rows == 0
        and (band_rows * W) % 128 == 0
    )
    if use_banded:
        from .pallas.raster_kernel import group_banded, rasterize_zbuffer_pallas

        pc = pallas_tri_chunk
        n_bands = H // band_rows
        # cap: generous static bound on per-band candidates; the kernel skips
        # chunks beyond each band's true count, so a large cap costs nothing
        cap = int(min(T + ((-T) % pc), ((T // 2) // pc + 1) * pc))  # pc-multiple
        banded, ids_band = _bin_triangles_bands(
            coef, valid, uv_all[..., 1], mesh.faces, n_bands, band_rows, cap,
            vz=z_all,
        )
        counts = (ids_band < T).sum(axis=-1).astype(jnp.int32)  # (B,nb)
        grouped = group_banded(banded, tri_chunk=pc)
        zbuf_flat, tid_flat = rasterize_zbuffer_pallas(
            grouped, H, W, tri_chunk=pc, tile=band_rows * W, counts=counts
        )
        zbuf = zbuf_flat.reshape(B, H, W)
        tid = tid_flat.reshape(B, H, W)

        # shade from the FULL plane table: map each pixel's band-local
        # candidate index back to its original triangle id through ids_band
        # (one extra int gather per pixel) instead of materializing the
        # banded table rows — a (B, nb*cap, 3, D) gather is O(10x T) rows at
        # high triangle counts and blew past HBM at T=5k x B=252, while the
        # chained int->row gathers stay O(pixels).  ids_band pads with T,
        # which is exactly the full table's zero miss-row.
        band_of_px = (jnp.arange(H * W, dtype=jnp.int32) // (band_rows * W))

        def pixel_ids(ids_band_i, tid_i):
            t_ = tid_i.reshape(-1)
            orig = ids_band_i[band_of_px, jnp.maximum(t_, 0)]  # (P,)
            return jnp.where(t_ < 0, T, orig)

        ids_px = jax.vmap(pixel_ids)(ids_band, tid)
        return jax.vmap(shade)(crop_tfs.astype(jnp.float32), tables, ids_px, tid, zbuf)

    if use_pallas:
        from .pallas.raster_kernel import group_coefficients, rasterize_zbuffer_pallas

        pc = pallas_tri_chunk
        if backface_cull:
            # compact valid triangles to the front per pose so the kernel's
            # per-tile chunk skip (counts) drops the backface chunks —
            # without this, culled triangles still occupy chunks and culling
            # saves nothing in the flat path (z-buffering is order-
            # independent, so reordering is free; tid is mapped back through
            # the permutation).  Bit-exact vs the uncompacted path.
            order = jnp.argsort(~valid, axis=1, stable=True)  # (B,T) valid-first
            coef_c = jnp.take_along_axis(coef, order[..., None, None], axis=1)
            valid_c = jnp.take_along_axis(valid, order, axis=1)
            counts = valid.sum(axis=1).astype(jnp.int32)  # (B,)
            grouped = group_coefficients(coef_c, valid_c, tri_chunk=pc)
            zbuf_flat, tid_c = rasterize_zbuffer_pallas(
                grouped, H, W, tri_chunk=pc, tile=pallas_tile,
                counts=counts[:, None],  # (B, n_tiles) bcast
            )
            # compacted tid -> original triangle id
            tid_orig = jnp.take_along_axis(
                order, jnp.maximum(tid_c, 0).astype(jnp.int64), axis=1
            )
            tid_flat = jnp.where(tid_c >= 0, tid_orig.astype(jnp.int32), -1)
        else:
            grouped = group_coefficients(coef, valid, tri_chunk=pc)
            zbuf_flat, tid_flat = rasterize_zbuffer_pallas(grouped, H, W, tri_chunk=pc,
                                                           tile=pallas_tile)
        tid = tid_flat.reshape(B, H, W)
        zbuf = zbuf_flat.reshape(B, H, W)
    else:
        # chunk the hypothesis batch to bound the (chunk, tri_chunk, H, W) temps
        pose_chunk = min(pose_chunk, B)
        pad = (-B) % pose_chunk
        uv_p = jnp.concatenate([uv_all, jnp.zeros((pad, *uv_all.shape[1:]))])
        z_p = jnp.concatenate([z_all, jnp.ones((pad, *z_all.shape[1:]))])
        valid_p = jnp.concatenate([valid, jnp.zeros((pad, T), dtype=valid.dtype)])

        def raster_one(uv, z, va):
            t_, _, zb = _rasterize_one(uv, z, mesh.faces, (H, W), tri_chunk, znear,
                                       valid_override=va)
            return t_, zb

        tid_c, zbuf_c = jax.lax.map(
            lambda uz: jax.vmap(raster_one)(uz[0], uz[1], uz[2]),
            (uv_p.reshape(-1, pose_chunk, *uv_all.shape[1:]),
             z_p.reshape(-1, pose_chunk, *z_all.shape[1:]),
             valid_p.reshape(-1, pose_chunk, T)),
        )
        tid = tid_c.reshape(-1, H, W)[:B]
        zbuf = zbuf_c.reshape(-1, H, W)[:B]

    def pixel_ids_full(tid_i):
        t_ = tid_i.reshape(-1)
        return jnp.where((t_ < 0) | (t_ >= T), T, t_)

    ids_px = jax.vmap(pixel_ids_full)(tid)
    return jax.vmap(shade)(crop_tfs.astype(jnp.float32), tables, ids_px, tid, zbuf)
