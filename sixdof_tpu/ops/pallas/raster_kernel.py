"""Pallas TPU kernel for the z-buffer rasterization core.

The rasterizer's inner loop — evaluate triangle-chunk edge functions over a
pixel tile, select the nearest covering triangle — is the framework's hottest
custom op (252 hypotheses x ~10 renders per registration).  The XLA scan
version (ops/rasterize.py:_rasterize_one) materializes (chunk, pixels)
intermediates in HBM between scan steps; this kernel keeps the z/tid
accumulators in VMEM *scratch* across the tri-chunk grid dimension and writes
each (pose, pixel-tile) result exactly once:

  grid = (pose, pixel_tile, tri_chunk)   [tri_chunk fastest]
  - per step: VPU broadcast plane evals + fused inside test + max-inv-z
    select (z = 1/iz is monotone, so accumulating max iz gives the same
    winner while deferring the expensive reciprocal to one (1,TILE) op at
    the final chunk)
  - accumulators never round-trip HBM; outputs are written at the last chunk
  - triangle validity is folded into the plane coefficients at setup
    (invalid rows evaluate to "never inside"), so the kernel is branch-free.

Mosaic constraints shape the layout: outputs are (B, n_tiles, TILE) with one
private (1,1,TILE) block per (pose, pixel-tile) — blocks are write-only, so
they must never be shared across grid cells that finish at different times.

Layout contract: coefficients arrive as (B, K, 4C, 3) with rows GROUPED
[all l0 | all l1 | all l2 | all inv_z] so in-kernel slices are contiguous.
"""
from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_BIG = 3.0e38  # python scalar: jnp constants would be captured tracers


def _kernel(cnt_ref, coef_ref, z_out, tid_out, iz_acc, tid_acc, pxy, *, C, TILE, W, K, NT,
            mxu=False):
    b = pl.program_id(0)
    t = pl.program_id(1)
    k = pl.program_id(2)

    @pl.when(k == 0)
    def _():
        # pixel coordinates are a function of (t) only — compute once per
        # (pose, tile) instead of per tri-chunk and park them in scratch.
        # In mxu form the scratch holds the full (8, TILE) pixel matrix
        # [px; py; 1; 0...] so the chunk step is a single dot_general.
        pid = t * TILE + jax.lax.broadcasted_iota(jnp.int32, (1, TILE), 1)
        pxy[0:1] = (pid % W).astype(jnp.float32)
        pxy[1:2] = (pid // W).astype(jnp.float32)
        if mxu:
            pxy[2:3] = jnp.ones((1, TILE), jnp.float32)
            pxy[3:8] = jnp.zeros((5, TILE), jnp.float32)
        # accumulate MAX inverse-z, not min z: 1/iz is monotone, so the
        # winner is identical, but the (C,TILE) reciprocal the old min-z
        # form paid per chunk collapses to ONE (1,TILE) reciprocal at the
        # final chunk (divides are the VPU's slowest lane op)
        iz_acc[...] = jnp.zeros((1, TILE), dtype=jnp.float32)
        tid_acc[...] = jnp.full((1, TILE), -1, dtype=jnp.int32)

    # banded candidate lists are front-packed: chunks beyond this tile's
    # candidate count are all never-inside padding — skip their compute
    # (cnt arrives via scalar prefetch, flat (B*NT,))
    @pl.when(k * C < cnt_ref[b * NT + t])
    def _():
        # operand blocks are component-major (8, 4C) — minor dim 4C is
        # lane-aligned, so the HBM array is DENSE.  The previous (4C, 3)
        # layout padded the minor dim 3 -> 128 lanes in HBM (T(8,128)
        # tiling): a 42x footprint/traffic blowup that OOM'd the banded
        # path at T=5k x B=252 (27.7 GB for a 650 MB table).
        if mxu:
            # vals[i,j] = sum_k coef[k,i] * P[k,j]: contract the stored
            # (8,4C) block against the (8,TILE) pixel matrix directly — no
            # transpose, no (4C,1)->(4C,TILE) lane broadcasts.  Precision
            # HIGHEST runs the MXU's 6-pass bf16 f32 emulation: thin
            # triangles carry huge coefficients (1/area), so plain bf16
            # edge error reaches O(1) barycentric units (measured), but the
            # 6-pass split recovers ~f32 mantissa coverage.
            vals = jax.lax.dot_general(
                coef_ref[0, 0, 0], pxy[...],
                (((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
                precision=jax.lax.Precision.HIGHEST,
            )  # (4C, TILE)
        else:
            px = pxy[0:1]
            py = pxy[1:2]
            # One small (8,4C)->(4C,8) tile transpose per chunk buys back
            # the dense layout; plane evaluation is exact fp32 on the VPU.
            c = jnp.transpose(coef_ref[0, 0, 0])  # (4C, 8); cols 0..2 live
            vals = c[:, 0:1] * px + c[:, 1:2] * py + c[:, 2:3]  # (4C, TILE)
        l0 = vals[0:C]
        l1 = vals[C : 2 * C]
        l2 = vals[2 * C : 3 * C]
        iz = vals[3 * C : 4 * C]
        # inside <=> min(l0,l1,l2) >= 0: two mins + one compare replace
        # three compares + two ands
        m3 = jnp.minimum(l0, jnp.minimum(l1, l2))
        key = jnp.where((m3 >= 0) & (iz > 1e-12), iz, -1.0)  # (C,TILE)

        izmax = jnp.max(key, axis=0, keepdims=True)  # (1,TILE)
        idx = jax.lax.broadcasted_iota(jnp.int32, (C, TILE), 0)
        cand = jnp.where(key >= izmax, idx, jnp.int32(2**30))
        tbest = jnp.min(cand, axis=0, keepdims=True)  # (1,TILE)

        # strict >: earlier chunks win exact-iz ties (matches min-z form)
        closer = izmax > iz_acc[...]
        iz_acc[...] = jnp.where(closer, izmax, iz_acc[...])
        tid_acc[...] = jnp.where(closer, k * C + tbest, tid_acc[...])

    @pl.when(k == K - 1)
    def _():
        miss = tid_acc[...] < 0
        z_out[0, 0] = jnp.where(miss, 0.0, 1.0 / jnp.maximum(iz_acc[...], 1e-12))
        tid_out[0, 0] = tid_acc[...]


@functools.partial(jax.jit, static_argnames=("H", "W", "tri_chunk", "tile", "interpret",
                                             "mxu"))
def rasterize_zbuffer_pallas(coef_grouped, H, W, tri_chunk=128, tile=2048, interpret=False,
                             counts=None, mxu=None):
    """@coef_grouped: (B, K, 8, 4C) grouped plane coefficients, or
    (B, n_tiles, K, 8, 4C) per-pixel-tile (banded) coefficients — in the
    banded form, pixel tile t only tests its own candidate chunks (the tile
    size must then equal the band size the binning used).  Layout is
    component-major: row j of the (8, 4C) block holds coefficient component
    j (px, py, const; rows 3..7 zero pad to the sublane tile) for all 4C
    candidate rows — minor dim 4C keeps the HBM array dense (see _kernel).
    @counts: optional (B, n_tiles) int32 candidate counts per tile; chunks
    beyond a tile's count skip their compute (front-packed padding).

    Returns (zbuf (B, H*W) [0 where miss], tid (B, H*W) int32 [-1 = miss]).
    In the banded form tid indexes the tile's LOCAL candidate list.
    """
    if mxu is None:
        # experiment toggle (resolved at trace time; static per jit cache key):
        # evaluate the chunk planes on the MXU instead of VPU broadcasts
        mxu = os.environ.get("SIXDOF_RASTER_MXU", "0") == "1"
    banded = coef_grouped.ndim == 5
    if not banded:
        B, K, _, C4 = coef_grouped.shape
        coef_grouped = coef_grouped[:, None]
    else:
        B, _, K, _, C4 = coef_grouped.shape
    C = C4 // 4
    P = H * W
    pad = (-P) % tile
    P_pad = P + pad
    n_tiles = P_pad // tile
    if banded and coef_grouped.shape[1] != n_tiles:
        raise ValueError(
            f"banded coef tiles {coef_grouped.shape[1]} != pixel tiles {n_tiles}"
        )
    if counts is None:
        counts_flat = jnp.full((B * n_tiles,), K * C, dtype=jnp.int32)
    else:
        counts_flat = jnp.broadcast_to(
            counts.astype(jnp.int32), (B, n_tiles)
        ).reshape(-1)

    grid = (B, n_tiles, K)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, 1, 1, 8, C4),
                         (lambda b, t, k, *_: (b, t, k, 0, 0)) if banded
                         else (lambda b, t, k, *_: (b, 0, k, 0, 0))),
        ],
        out_specs=[
            # one private (pose, pixel-tile) block each — Pallas output blocks
            # are write-only, so a block shared across poses would be
            # clobbered by later revisits
            pl.BlockSpec((1, 1, 1, tile), lambda b, t, k, *_: (b, t, 0, 0)),
            pl.BlockSpec((1, 1, 1, tile), lambda b, t, k, *_: (b, t, 0, 0)),
        ],
        scratch_shapes=[
            pltpu.VMEM((1, tile), jnp.float32),
            pltpu.VMEM((1, tile), jnp.int32),
            # px/py rows; the mxu form fills all 8 rows ([px; py; 1; 0..])
            pltpu.VMEM((8, tile), jnp.float32),
        ],
    )
    zbuf, tid = pl.pallas_call(
        functools.partial(_kernel, C=C, TILE=tile, W=W, K=K, NT=n_tiles, mxu=mxu),
        grid_spec=grid_spec,
        out_shape=[
            # trailing (1, tile) block dims satisfy Mosaic (dim==array dim)
            jax.ShapeDtypeStruct((B, n_tiles, 1, tile), jnp.float32),
            jax.ShapeDtypeStruct((B, n_tiles, 1, tile), jnp.int32),
        ],
        interpret=interpret,
    )(counts_flat, coef_grouped)
    zbuf = zbuf.reshape(B, P_pad)[:, :P]
    tid = tid.reshape(B, P_pad)[:, :P]
    return zbuf, tid


def group_banded(banded_coef, tri_chunk=128):
    """(B,nb,cap,4,3) banded coefficients -> (B,nb,K,8,4C) component-major
    grouped blocks; lane r = [all l0 | all l1 | all l2 | all inv_z] candidate
    rows per chunk, sublane j = coefficient component (same layout contract
    as group_coefficients; padding rows are already never-inside)."""
    B, nb, cap, _, _ = banded_coef.shape
    K = cap // tri_chunk
    c = banded_coef.reshape(B, nb, K, tri_chunk, 4, 3).transpose(0, 1, 2, 5, 4, 3)
    c = c.reshape(B, nb, K, 3, 4 * tri_chunk)
    return jnp.pad(c, ((0, 0), (0, 0), (0, 0), (0, 5), (0, 0)))


def group_coefficients(coef, valid, tri_chunk=128):
    """(B,T,4,3) interleaved + validity -> (B,K,8,4C) component-major grouped
    blocks for the kernel (minor dim 4C keeps the HBM layout dense; the
    sublane pad 3->8 makes the zero rows explicit instead of hidden tiling).

    Invalid/padded triangles get l0 = [0,0,-1] (never inside).
    """
    B, T, _, _ = coef.shape
    pad = (-T) % tri_chunk
    coef = jnp.pad(coef, ((0, 0), (0, pad), (0, 0), (0, 0)))
    valid = jnp.pad(valid, ((0, 0), (0, pad)))
    never = jnp.zeros((1, 1, 4, 3), dtype=coef.dtype).at[0, 0, 0].set(
        jnp.asarray([0.0, 0.0, -1.0])
    )
    coef = jnp.where(valid[..., None, None], coef, never)
    K = (T + pad) // tri_chunk
    # (B,K,C,4,3) -> component-major (B,K,3,4,C) -> (B,K,3,4C) -> pad 3->8
    c = coef.reshape(B, K, tri_chunk, 4, 3).transpose(0, 1, 4, 3, 2)
    c = c.reshape(B, K, 3, 4 * tri_chunk)
    return jnp.pad(c, ((0, 0), (0, 0), (0, 5), (0, 0)))
