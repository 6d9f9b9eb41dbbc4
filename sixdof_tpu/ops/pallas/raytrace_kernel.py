"""Pallas TPU kernel for batched ray-mesh intersection (Moller-Trumbore).

Tiles the (ray, triangle) pair space: grid = (ray_tile, tri_chunk) with the
min-t accumulator in VMEM scratch across the chunk dimension.  All arithmetic
is (C, TILE)-shaped VPU work built from (C,1) x (1,TILE) broadcasts, so no
transposes/relayouts occur in-kernel.

Layout contract (prepared by pack_rays / pack_tris):
- rays: (n_tiles, 8, TILE)  rows = [ox oy oz dx dy dz valid pad]
- tris: (K, C, 16)          cols = [v0(3) e1(3) e2(3) pad...]; degenerate
                            triangles have e1 = e2 = 0 (det==0 -> miss).
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_INF = 3.0e38


def _kernel(rays_ref, tris_ref, t_out, t_acc, *, K):
    k = pl.program_id(1)

    @pl.when(k == 0)
    def _():
        t_acc[...] = jnp.full(t_acc.shape, _INF, dtype=jnp.float32)

    r = rays_ref[0]  # (8, TILE)
    ox, oy, oz = r[0:1], r[1:2], r[2:3]  # (1,TILE)
    dx, dy, dz = r[3:4], r[4:5], r[5:6]
    valid_ray = r[6:7] > 0.5

    tr = tris_ref[0]  # (C, 16)
    v0x, v0y, v0z = tr[:, 0:1], tr[:, 1:2], tr[:, 2:3]  # (C,1)
    e1x, e1y, e1z = tr[:, 3:4], tr[:, 4:5], tr[:, 5:6]
    e2x, e2y, e2z = tr[:, 6:7], tr[:, 7:8], tr[:, 8:9]

    # p = d x e2  -> (C,TILE)
    px = dy * e2z - dz * e2y
    py = dz * e2x - dx * e2z
    pz = dx * e2y - dy * e2x
    det = px * e1x + py * e1y + pz * e1z
    inv_det = jnp.where(jnp.abs(det) > 1e-12, 1.0 / det, 0.0)
    # s = o - v0
    sx = ox - v0x
    sy = oy - v0y
    sz = oz - v0z
    u = (sx * px + sy * py + sz * pz) * inv_det
    # q = s x e1
    qx = sy * e1z - sz * e1y
    qy = sz * e1x - sx * e1z
    qz = sx * e1y - sy * e1x
    v = (qx * dx + qy * dy + qz * dz) * inv_det
    t = (qx * e2x + qy * e2y + qz * e2z) * inv_det
    eps = 1e-6
    hit = (
        (jnp.abs(det) > 1e-12)
        & (u >= -eps) & (v >= -eps) & (u + v <= 1.0 + eps)
        & (t > 1e-6)
        & valid_ray
    )
    t = jnp.where(hit, t, _INF)
    tmin = jnp.min(t, axis=0, keepdims=True)  # (1,TILE)
    t_acc[...] = jnp.minimum(t_acc[...], tmin)

    @pl.when(k == K - 1)
    def _():
        t_out[0] = t_acc[...]


@functools.partial(jax.jit, static_argnames=("tile", "tri_chunk", "interpret"))
def ray_mesh_intersect_pallas(rays_packed, tris_packed, tile=1024, tri_chunk=256,
                              interpret=False):
    """@rays_packed: (n_tiles, 8, TILE); @tris_packed: (K, C, 16).

    Returns t_hit (n_tiles*TILE,) with +inf for misses.
    """
    n_tiles = rays_packed.shape[0]
    K = tris_packed.shape[0]
    t = pl.pallas_call(
        functools.partial(_kernel, K=K),
        grid=(n_tiles, K),
        in_specs=[
            pl.BlockSpec((1, 8, tile), lambda r, k: (r, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tri_chunk, 16), lambda r, k: (k, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, 1, tile), lambda r, k: (r, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n_tiles, 1, tile), jnp.float32),
        scratch_shapes=[pltpu.VMEM((1, tile), jnp.float32)],
        interpret=interpret,
    )(rays_packed, tris_packed)
    out = t.reshape(-1)
    return jnp.where(out >= _INF, jnp.inf, out)


def pack_rays(origins, dirs, mask, tile=1024):
    """(N,3),(N,3),(N,) -> (n_tiles, 8, TILE) kernel layout."""
    n = origins.shape[0]
    pad = (-n) % tile
    o = jnp.pad(origins.astype(jnp.float32), ((0, pad), (0, 0)))
    d = jnp.pad(dirs.astype(jnp.float32), ((0, pad), (0, 0)))
    m = jnp.pad(mask.astype(jnp.float32), (0, pad))
    rows = jnp.concatenate(
        [o.T, d.T, m[None], jnp.zeros((1, n + pad), jnp.float32)], axis=0
    )  # (8, N_pad)
    return rows.reshape(8, -1, tile).transpose(1, 0, 2)  # (n_tiles, 8, TILE)


def pack_tris(tri_verts, tri_mask, tri_chunk=256):
    """(T,3,3),(T,) -> (K, C, 16) kernel layout (v0, e1, e2, pad)."""
    tri_verts = jnp.asarray(tri_verts, dtype=jnp.float32)
    v0 = tri_verts[:, 0]
    e1 = tri_verts[:, 1] - v0
    e2 = tri_verts[:, 2] - v0
    m = jnp.asarray(tri_mask)[:, None]
    e1 = jnp.where(m, e1, 0.0)  # degenerate -> det 0 -> miss
    e2 = jnp.where(m, e2, 0.0)
    data = jnp.concatenate([v0, e1, e2, jnp.zeros((len(v0), 7), jnp.float32)], axis=-1)
    T = data.shape[0]
    pad = (-T) % tri_chunk
    data = jnp.pad(data, ((0, pad), (0, 0)))
    return data.reshape(-1, tri_chunk, 16)
