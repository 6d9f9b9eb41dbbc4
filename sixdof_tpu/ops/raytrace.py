"""Batched ray–mesh intersection (Möller–Trumbore) for defect projection.

TPU-native replacement for Open3D's BVH RaycastingScene
(reference src/defect_projection.py:225-266 `intersect_rays_with_mesh`).
All (ray, triangle) pairs are tested in tiles — pure MXU/VPU work with static
shapes, no tree build.  At the app's scale (thousands of heatmap rays x a
CAD mesh) one fused dispatch beats host-side BVH construction + traversal.

Rays and triangle soup are padded; misses return t = +inf.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

_RAY_CHUNK = 512


@functools.partial(jax.jit, static_argnames=("use_pallas",))
def ray_mesh_intersect(origins, dirs, ray_mask, tri_verts, tri_mask, use_pallas=None):
    """First-hit distances of rays against a triangle soup.

    @origins/dirs: (N,3) rays (dirs need not be unit; t is in dir units);
    @ray_mask: (N,) valid-ray mask;
    @tri_verts: (T,3,3) triangle vertices; @tri_mask: (T,).
    Returns t_hit (N,) — +inf for misses/masked rays.
    On TPU the pair-space sweep runs as a Pallas kernel with the min-t
    accumulator VMEM-resident (ops/pallas/raytrace_kernel.py).
    """
    if use_pallas is None:
        use_pallas = jax.default_backend() not in ("cpu",)
    if use_pallas:
        from .pallas.raytrace_kernel import pack_rays, pack_tris, ray_mesh_intersect_pallas

        n = origins.shape[0]
        rays_p = pack_rays(origins, dirs, ray_mask)
        tris_p = pack_tris(tri_verts, tri_mask)
        return ray_mesh_intersect_pallas(rays_p, tris_p)[:n]

    v0 = tri_verts[:, 0]
    e1 = tri_verts[:, 1] - v0  # (T,3)
    e2 = tri_verts[:, 2] - v0
    inf = jnp.asarray(jnp.inf, dtype=origins.dtype)

    def chunk_fn(args):
        o, d, m = args  # (C,3),(C,3),(C,)
        # Moller-Trumbore, broadcast (C,T)
        p = jnp.cross(d[:, None], e2[None])  # (C,T,3)
        det = jnp.sum(p * e1[None], axis=-1)  # (C,T)
        inv_det = jnp.where(jnp.abs(det) > 1e-12, 1.0 / det, 0.0)
        s = o[:, None] - v0[None]  # (C,T,3)
        u = jnp.sum(s * p, axis=-1) * inv_det
        q = jnp.cross(s, e1[None])  # (C,T,3)
        v = jnp.sum(q * d[:, None], axis=-1) * inv_det
        t = jnp.sum(q * e2[None], axis=-1) * inv_det
        # small barycentric slack keeps shared triangle edges watertight
        eps = 1e-6
        hit = (
            (jnp.abs(det) > 1e-12)
            & (u >= -eps) & (v >= -eps) & (u + v <= 1.0 + eps)
            & (t > 1e-6)
            & tri_mask[None]
        )
        t = jnp.where(hit, t, inf)
        tmin = jnp.min(t, axis=-1)  # (C,)
        return jnp.where(m, tmin, inf)

    n = origins.shape[0]
    if n <= _RAY_CHUNK:
        return chunk_fn((origins, dirs, ray_mask))
    pad = (-n) % _RAY_CHUNK
    o = jnp.pad(origins, ((0, pad), (0, 0))).reshape(-1, _RAY_CHUNK, 3)
    d = jnp.pad(dirs, ((0, pad), (0, 0))).reshape(-1, _RAY_CHUNK, 3)
    m = jnp.pad(ray_mask, (0, pad)).reshape(-1, _RAY_CHUNK)
    t = jax.lax.map(chunk_fn, (o, d, m))
    return t.reshape(-1)[:n]


def heatmap_to_rays(heatmap, K, threshold, max_points):
    """Thresholded heatmap pixels -> unit rays + intensities (padded).

    Vectorizes the reference's per-pixel Python loops
    (src/defect_projection.py:165-179 heatmap_to_points, :196-223
    compute_rays) into top-k selection with static output shape.

    Returns (dirs (M,3), intensities (M,), mask (M,)) with M = max_points.
    """
    heatmap = jnp.asarray(heatmap)
    H, W = heatmap.shape
    flat = heatmap.reshape(-1)
    above = flat > threshold
    score = jnp.where(above, flat, -jnp.inf)
    M = min(max_points, H * W)
    vals, idx = jax.lax.top_k(score, M)
    mask = vals > threshold
    ys = (idx // W).astype(jnp.float32)
    xs = (idx % W).astype(jnp.float32)
    fx, fy, cx, cy = K[0, 0], K[1, 1], K[0, 2], K[1, 2]
    dirs = jnp.stack([(xs - cx) / fx, (ys - cy) / fy, jnp.ones_like(xs)], axis=-1)
    dirs = dirs / jnp.linalg.norm(dirs, axis=-1, keepdims=True)
    intensities = jnp.where(mask, vals, 0.0)
    return dirs, intensities, mask


def mesh_to_tri_verts(vertices, faces):
    """(V,3),(F,3) -> padded (T,3,3) triangle soup + mask (host-side)."""
    tri = np.asarray(vertices)[np.asarray(faces)]  # (F,3,3)
    return tri.astype(np.float32), np.ones(len(tri), dtype=bool)
