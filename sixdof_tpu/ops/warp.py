"""Batched homography warps (kornia.warp_perspective replacement).

The reference crops real RGB/depth/xyz maps into per-hypothesis 160x160
windows with kornia.geometry.transform.warp_perspective
(reference predict_pose_refine.py:63-76, predict_score.py:89-99).  Here the
warp is a plain bilinear/nearest gather under jit — one fused XLA gather per
batch, sharing the pixel-center convention of ops/rasterize.py (u = column
index at the pixel center), so rendered and warped crops stay aligned.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp


@functools.partial(jax.jit, static_argnames=("out_hw", "mode"))
def warp_crop_batch(img, tfs, out_hw, mode="bilinear"):
    """Axis-aligned-affine batched crop warp as two interpolation MATMULS.

    The crop transforms produced by compute_crop_window_tf_batch are always
    `diag(sx,sy)+t` (no rotation/shear/projective terms), so resampling is
    separable: out = Ry @ img @ Cx^T with per-pose 1-D interpolation matrices.
    On TPU this turns a 32M-element random gather (slow) into ~100 GFLOP of
    MXU work (fast).  Zero padding outside the source, matching
    warp_perspective.

    @img: (H,W,C); @tfs: (B,3,3) src->dst; returns (B,Ho,Wo,C).
    """
    squeeze = img.ndim == 2
    if squeeze:
        img = img[..., None]
    H, W, C = img.shape
    Ho, Wo = out_hw
    tfs = tfs.astype(jnp.float32)
    sx, tx = tfs[:, 0, 0], tfs[:, 0, 2]
    sy, ty = tfs[:, 1, 1], tfs[:, 1, 2]

    def interp_matrix(scale, shift, n_out, n_src):
        # src = (dst - shift)/scale per pose -> (B, n_out)
        dst = jnp.arange(n_out, dtype=jnp.float32)[None]
        src = (dst - shift[:, None]) / scale[:, None]
        if mode == "nearest":
            idx = jnp.round(src).astype(jnp.int32)
            valid = (src >= -0.5) & (src <= n_src - 0.5)
            idx = jnp.clip(idx, 0, n_src - 1)
            M = jax.nn.one_hot(idx, n_src, dtype=jnp.float32)
            return M * valid[..., None]
        x0 = jnp.floor(src)
        frac = src - x0
        x0i = x0.astype(jnp.int32)
        valid = (src >= 0) & (src <= n_src - 1)
        M = (
            jax.nn.one_hot(jnp.clip(x0i, 0, n_src - 1), n_src, dtype=jnp.float32)
            * (1 - frac)[..., None]
            + jax.nn.one_hot(jnp.clip(x0i + 1, 0, n_src - 1), n_src, dtype=jnp.float32)
            * frac[..., None]
        )
        return M * valid[..., None]

    Ry = interp_matrix(sy, ty, Ho, H)  # (B,Ho,H)
    Cx = interp_matrix(sx, tx, Wo, W)  # (B,Wo,W)
    hi = jax.lax.Precision.HIGHEST  # xyz maps are metric: bf16 passes cost mm
    tmp = jnp.einsum("bhH,HWc->bhWc", Ry, img, precision=hi)
    out = jnp.einsum("bhWc,bwW->bhwc", tmp, Cx, precision=hi)
    if squeeze:
        out = out[..., 0]
    return out


@functools.partial(jax.jit, static_argnames=("out_hw", "mode"))
def warp_perspective(img, tfs, out_hw, mode="bilinear"):
    """Warp an image into B crop windows.

    @img: (H,W,C) or (H,W) source image;
    @tfs: (B,3,3) source-pixel -> crop-pixel transforms (forward, like
          kornia: dst(x) = src(M^-1 x));
    @out_hw: (H_out, W_out).
    Returns (B,H_out,W_out,C) (or (B,H_out,W_out) for 2-D input).
    Out-of-bounds samples are zero (kornia zero padding_mode).
    """
    squeeze = img.ndim == 2
    if squeeze:
        img = img[..., None]
    H, W, C = img.shape
    Ho, Wo = out_hw
    inv = jnp.linalg.inv(tfs.astype(jnp.float32))  # (B,3,3)

    xs = jnp.arange(Wo, dtype=jnp.float32)
    ys = jnp.arange(Ho, dtype=jnp.float32)
    gx, gy = jnp.meshgrid(xs, ys)  # (Ho,Wo)
    grid = jnp.stack([gx, gy, jnp.ones_like(gx)], axis=-1)  # (Ho,Wo,3)

    src = jnp.einsum("bij,hwj->bhwi", inv, grid)
    sx = src[..., 0] / src[..., 2]
    sy = src[..., 1] / src[..., 2]

    def gather(iy, ix):
        iy_c = jnp.clip(iy, 0, H - 1)
        ix_c = jnp.clip(ix, 0, W - 1)
        return img[iy_c, ix_c]  # (B,Ho,Wo,C)

    if mode == "nearest":
        ix = jnp.round(sx).astype(jnp.int32)
        iy = jnp.round(sy).astype(jnp.int32)
        out = gather(iy, ix)
        valid = (sx >= -0.5) & (sx <= W - 0.5) & (sy >= -0.5) & (sy <= H - 0.5)
    elif mode == "bilinear":
        x0 = jnp.floor(sx).astype(jnp.int32)
        y0 = jnp.floor(sy).astype(jnp.int32)
        fx = (sx - x0)[..., None]
        fy = (sy - y0)[..., None]
        out = (
            gather(y0, x0) * (1 - fx) * (1 - fy)
            + gather(y0, x0 + 1) * fx * (1 - fy)
            + gather(y0 + 1, x0) * (1 - fx) * fy
            + gather(y0 + 1, x0 + 1) * fx * fy
        )
        valid = (sx >= 0) & (sx <= W - 1) & (sy >= 0) & (sy <= H - 1)
    else:
        raise ValueError(mode)
    out = jnp.where(valid[..., None], out, 0.0)
    if squeeze:
        out = out[..., 0]
    return out
