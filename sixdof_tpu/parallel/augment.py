"""Jittable sensor-degradation augmentation for on-device training pairs.

The r3 eval track degrades B-sides with tools/sensor_model.py (numpy, scene
build time); nets trained on CLEAN composited pairs have never seen those
artifacts, so this module applies the same degradation family inside the
jitted batch synthesis (parallel/train.py) — per-sample randomized:

RGB   — exposure gain, gamma, white-balance error, blended 5x5 blur,
        shot + read noise, uint8 quantization.
XYZ/z — range-dependent axial noise, edge dropout (invalid -> 0),
        low-frequency blob holes.

Approximation notes vs the host model: blur is one fixed-sigma kernel blended
per-sample (per-sample sigmas would need per-sample kernels); holes come from
a thresholded low-frequency noise field instead of rasterized circles.  Both
preserve the statistics that matter (local smoothing level, contiguous
invalid blobs).

**Held-out eval-only families (r3 verdict item 6).**  The train-time family
is deliberately a strict subset of the eval sensor model
(tools/sensor_model.py): flying pixels, calibration error, mask error, and
the sequence-level artifacts (exposure drift, motion blur) are NEVER
synthesized here, so robustness numbers on the *_sensor scenes measure
generalization beyond the training distribution, not memorization of it.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp


def _gauss_kernel5(sigma=1.0):
    x = jnp.arange(5.0) - 2.0
    g = jnp.exp(-0.5 * (x / sigma) ** 2)
    g = g / g.sum()
    return g


def _blur5(img, sigma=1.0):
    """Separable 5x5 gaussian blur, (N,H,W,C), edge-replicate padding."""
    g = _gauss_kernel5(sigma)
    pad = [(0, 0), (2, 2), (0, 0), (0, 0)]
    x = jnp.pad(img, pad, mode="edge")
    x = sum(g[i] * x[:, i : i + img.shape[1]] for i in range(5))
    pad = [(0, 0), (0, 0), (2, 2), (0, 0)]
    x = jnp.pad(x, pad, mode="edge")
    x = sum(g[i] * x[:, :, i : i + img.shape[2]] for i in range(5))
    return x


def _pool(x, op, size=3):
    """(N,H,W) min/max pool with 'same' shape."""
    init = jnp.inf if op == "min" else -jnp.inf
    fn = jax.lax.min if op == "min" else jax.lax.max
    return jax.lax.reduce_window(
        x, init, fn, (1, size, size), (1, 1, 1), "SAME")


def degrade_rgb_batch(key, rgb, strength=1.0):
    """(N,H,W,3) in [0,1] -> photometrically degraded, per-sample randoms."""
    N = rgb.shape[0]
    kg, kgam, kwb, kbl, ksh, krd = jax.random.split(key, 6)
    gain = 2.0 ** (jax.random.uniform(kg, (N, 1, 1, 1), minval=-0.35, maxval=0.35)
                   * strength)
    gamma = 1.0 + jax.random.uniform(kgam, (N, 1, 1, 1), minval=-0.15, maxval=0.20) \
        * strength
    wb = 1.0 + jax.random.uniform(kwb, (N, 1, 1, 3), minval=-0.08, maxval=0.08) \
        * strength
    img = jnp.clip(rgb * gain * wb, 0.0, 1.0) ** gamma
    blend = jax.random.uniform(kbl, (N, 1, 1, 1)) * strength
    img = (1.0 - blend) * img + blend * _blur5(img, sigma=1.0)
    shot = jax.random.normal(ksh, img.shape) * (0.015 * strength) * jnp.sqrt(
        jnp.clip(img, 0.01, 1.0))
    read = jax.random.normal(krd, img.shape) * (0.008 * strength)
    img = jnp.clip(img + shot + read, 0.0, 1.0)
    return jnp.round(img * 255.0) / 255.0


def degrade_xyz_batch(key, xyz, strength=1.0):
    """(N,H,W,3) camera-space points (0 = invalid) -> sensor-degraded.

    All z modifications rescale the full xyz along the pixel ray (xyz = ray*z)
    so the point stays on its line of sight, exactly like a real depth sensor
    error does.
    """
    N, H, W = xyz.shape[:3]
    kax, ku, khole, kth = jax.random.split(key, 4)
    z = xyz[..., 2]
    valid = z > 1e-6

    # axial noise: sigma(z) = 1.2mm + 1.9mm (z-0.4)^2
    sigma = (0.0012 + 0.0019 * (z - 0.4) ** 2) * strength
    z_noisy = z + jax.random.normal(kax, z.shape) * sigma

    # discontinuities: invalid treated as far so object/background borders
    # and object/invalid borders both count.  NOTE: only dropout here —
    # flying pixels are a held-out eval-only family (module docstring).
    big = jnp.where(valid, z, 1e3)  # invalid = "far": valid/invalid borders count
    edge = (_pool(big, "max", 3) - _pool(big, "min", 3)) > 0.012
    u = jax.random.uniform(ku, z.shape)
    drop = edge & valid & (u < 0.40 * strength)
    z_new = z_noisy

    # blob holes: thresholded low-frequency field (8x8 noise upsampled)
    field = jax.random.uniform(khole, (N, 8, 8))
    field = jax.image.resize(field, (N, H, W), method="bilinear")
    thresh = 0.04 * strength * jax.random.uniform(kth, (N, 1, 1), minval=0.0, maxval=2.0)
    hole = field < thresh

    keep = valid & ~drop & ~hole
    scale = jnp.where(valid, z_new / jnp.maximum(z, 1e-6), 0.0)
    out = xyz * scale[..., None]
    return jnp.where(keep[..., None], out, 0.0)


def maybe_degrade_pair(key, rgbB, xyzB, p_sensor=0.5, strength=1.0):
    """Apply the sensor model to a random subset of the batch.

    Per-sample Bernoulli(p_sensor) — the net sees both clean and degraded
    B-sides, like a deployment sees both good and bad frames.
    """
    ksel, kr, kx = jax.random.split(key, 3)
    N = rgbB.shape[0]
    sel = jax.random.bernoulli(ksel, p_sensor, (N, 1, 1, 1))
    rgb_d = degrade_rgb_batch(kr, rgbB, strength)
    xyz_d = degrade_xyz_batch(kx, xyzB, strength)
    return (jnp.where(sel, rgb_d, rgbB), jnp.where(sel, xyz_d, xyzB))
