"""Depth-map preprocessing: erosion + bilateral filter as fused XLA stencils.

TPU-native equivalents of the reference's two NVIDIA-Warp GPU kernels
(reference Utils.py:304-343 `bilateral_filter_depth_kernel`,
:359-384 `erode_depth_kernel`), with bit-identical window semantics:

- erode: a pixel survives iff <= ratio_thres of its (2r+1)^2 in-bounds
  neighborhood is "bad" (invalid depth or >depth_diff_thres away).
- bilateral: Gaussian(space)+Gaussian(range) weighted mean over valid
  neighbors within 1 cm of the window's valid-mean depth.

Both are expressed as a stack of (2r+1)^2 shifted slices over a padded map —
XLA fuses the whole thing into one VPU loop; there is no gather/scatter.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np


def _window_stack(depth, radius, pad_value):
    """(H,W) -> (K,H,W) stack of shifted copies; out-of-bounds = pad_value."""
    H, W = depth.shape
    padded = jnp.pad(depth, radius, constant_values=pad_value)
    slices = []
    for dv in range(-radius, radius + 1):
        for du in range(-radius, radius + 1):
            slices.append(
                jax.lax.dynamic_slice(padded, (dv + radius, du + radius), (H, W))
            )
    return jnp.stack(slices, axis=0)


@functools.partial(jax.jit, static_argnames=("radius",))
def erode_depth(depth, radius=2, depth_diff_thres=0.001, ratio_thres=0.8, zfar=100.0):
    """Zero out depth pixels whose window is mostly invalid/discontinuous.

    Mirrors reference Utils.py:359-395 (erode_depth): neighbor is bad if its
    depth is <1mm, >=zfar, or differs from the center by >depth_diff_thres;
    the center is zeroed when bad_count/total > ratio_thres.  Out-of-bounds
    neighbors are excluded from the count (not treated as bad).
    """
    depth = depth.astype(jnp.float32)
    win = _window_stack(depth, radius, pad_value=jnp.nan)
    in_bounds = ~jnp.isnan(win)
    win0 = jnp.where(in_bounds, win, 0.0)
    bad = in_bounds & (
        (win0 < 0.001) | (win0 >= zfar) | (jnp.abs(win0 - depth[None]) > depth_diff_thres)
    )
    total = jnp.sum(in_bounds, axis=0).astype(jnp.float32)
    bad_cnt = jnp.sum(bad, axis=0).astype(jnp.float32)
    return jnp.where(bad_cnt / total > ratio_thres, 0.0, depth)


@functools.partial(jax.jit, static_argnames=("radius",))
def bilateral_filter_depth(depth, radius=2, zfar=100.0, sigma_d=2.0, sigma_r=100000.0):
    """Two-pass windowed bilateral filter on a depth map.

    Mirrors reference Utils.py:304-356: first the mean of valid window depths,
    then a Gaussian(space)xGaussian(range) weighted average over valid
    neighbors within 1 cm of that mean.  Pixels with no valid neighbors (or
    zero weight) become 0.
    """
    depth = depth.astype(jnp.float32)
    win = _window_stack(depth, radius, pad_value=jnp.nan)
    in_bounds = ~jnp.isnan(win)
    win0 = jnp.where(in_bounds, win, 0.0)
    valid = in_bounds & (win0 >= 0.001) & (win0 < zfar)

    num_valid = jnp.sum(valid, axis=0).astype(jnp.float32)
    mean_depth = jnp.sum(jnp.where(valid, win0, 0.0), axis=0) / jnp.maximum(num_valid, 1.0)

    # precomputed spatial Gaussian per offset
    offs = np.arange(-radius, radius + 1)
    dv, du = np.meshgrid(offs, offs, indexing="ij")
    spatial = np.exp(-(du.astype(np.float64) ** 2 + dv**2) / (2.0 * sigma_d**2)).reshape(-1)
    spatial = jnp.asarray(spatial, dtype=jnp.float32)[:, None, None]

    center = depth[None]
    rng = jnp.exp(-((center - win0) ** 2) / (2.0 * sigma_r**2))
    w = spatial * rng
    use = valid & (jnp.abs(win0 - mean_depth[None]) < 0.01)
    w = jnp.where(use, w, 0.0)
    sum_w = jnp.sum(w, axis=0)
    out = jnp.sum(w * win0, axis=0) / jnp.maximum(sum_w, 1e-12)
    return jnp.where((sum_w > 0) & (num_valid > 0), out, 0.0)


@functools.partial(jax.jit, static_argnames=("radius",))
def preprocess_depth(depth, radius=2, zfar=100.0):
    """Fused erode -> bilateral, as called at the top of register/track_one
    (reference estimater.py:171-172, :255-256)."""
    return bilateral_filter_depth(erode_depth(depth, radius=radius, zfar=zfar),
                                  radius=radius, zfar=zfar)
