"""Depth filters vs a direct numpy port of the reference Warp kernels."""
import numpy as np
import jax.numpy as jnp

from sixdof_tpu.ops import depth_filter as df


def erode_ref(depth, radius=2, depth_diff_thres=0.001, ratio_thres=0.8, zfar=100.0):
    H, W = depth.shape
    out = np.zeros_like(depth)
    for h in range(H):
        for w in range(W):
            d_ori = depth[h, w]
            bad = 0.0
            total = 0.0
            for u in range(w - radius, w + radius + 1):
                if u < 0 or u >= W:
                    continue
                for v in range(h - radius, h + radius + 1):
                    if v < 0 or v >= H:
                        continue
                    cur = depth[v, u]
                    total += 1
                    if cur < 0.001 or cur >= zfar or abs(cur - d_ori) > depth_diff_thres:
                        bad += 1
            out[h, w] = 0.0 if bad / total > ratio_thres else d_ori
    return out


def bilateral_ref(depth, radius=2, zfar=100.0, sigmaD=2.0, sigmaR=100000.0):
    H, W = depth.shape
    out = np.zeros_like(depth)
    for h in range(H):
        for w in range(W):
            mean_depth = 0.0
            num_valid = 0
            for u in range(w - radius, w + radius + 1):
                if u < 0 or u >= W:
                    continue
                for v in range(h - radius, h + radius + 1):
                    if v < 0 or v >= H:
                        continue
                    cur = depth[v, u]
                    if 0.001 <= cur < zfar:
                        num_valid += 1
                        mean_depth += cur
            if num_valid == 0:
                continue
            mean_depth /= num_valid
            center = depth[h, w]
            sw = 0.0
            s = 0.0
            for u in range(w - radius, w + radius + 1):
                if u < 0 or u >= W:
                    continue
                for v in range(h - radius, h + radius + 1):
                    if v < 0 or v >= H:
                        continue
                    cur = depth[v, u]
                    if 0.001 <= cur < zfar and abs(cur - mean_depth) < 0.01:
                        weight = np.exp(
                            -float((u - w) ** 2 + (h - v) ** 2) / (2.0 * sigmaD**2)
                            - (center - cur) ** 2 / (2.0 * sigmaR**2)
                        )
                        sw += weight
                        s += weight * cur
            if sw > 0 and num_valid > 0:
                out[h, w] = s / sw
    return out


def make_depth(rng, H=24, W=32):
    depth = 0.8 + 0.002 * rng.randn(H, W).astype(np.float32)
    depth[5:8, 5:8] = 0.0  # hole
    depth[12, 20] = 2.5  # spike
    depth[:2, :] = 0.0003  # invalid band
    return depth.astype(np.float32)


def test_erode_matches_reference(rng):
    depth = make_depth(rng)
    ours = np.asarray(df.erode_depth(jnp.asarray(depth)))
    ref = erode_ref(depth)
    np.testing.assert_allclose(ours, ref, atol=1e-6)


def test_bilateral_matches_reference(rng):
    depth = make_depth(rng)
    ours = np.asarray(df.bilateral_filter_depth(jnp.asarray(depth)))
    ref = bilateral_ref(depth)
    np.testing.assert_allclose(ours, ref, atol=1e-5)


def test_pipeline_keeps_flat_regions(rng):
    depth = np.full((20, 20), 0.7, dtype=np.float32)
    out = np.asarray(df.preprocess_depth(jnp.asarray(depth)))
    np.testing.assert_allclose(out, depth, atol=1e-5)
