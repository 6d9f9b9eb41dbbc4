"""Sensor degradation model sanity (tools/sensor_model.py).

The model exists to break eval circularity (VERDICT r2 item 1): degraded
B-sides must differ from the clean renders in the specific ways real RGB-D
sensors do — range-dependent axial noise, edge dropout/flying pixels, holes,
photometric shifts — while keeping the underlying geometry recoverable.
"""
import os
import sys

import numpy as np
import pytest

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "tools"))

from sensor_model import degrade_depth, degrade_mask, degrade_rgb, perturb_K  # noqa: E402


@pytest.fixture
def rng():
    return np.random.RandomState(0)


def _step_depth(H=96, W=128):
    """Foreground square at 0.5 m over a background plane at 0.7 m."""
    d = np.full((H, W), 0.7, np.float32)
    d[24:72, 40:88] = 0.5
    d[:4] = 0.0  # an invalid strip, like a real frame edge
    return d


def test_depth_axial_noise_and_quantization(rng):
    d = np.full((64, 64), 0.6, np.float32)
    out = degrade_depth(d, rng, strength=1.0)
    valid = out > 0
    resid = out[valid] - 0.6
    # noise present but small (sigma ~1.3 mm at 0.6 m), mm-quantized
    assert 0.0003 < resid.std() < 0.01
    assert np.allclose(out * 1000, np.round(out * 1000), atol=1e-4)


def test_depth_noise_grows_with_range(rng):
    near = degrade_depth(np.full((128, 128), 0.5, np.float32), rng, 1.0)
    far = degrade_depth(np.full((128, 128), 2.5, np.float32), rng, 1.0)
    s_near = (near[near > 0] - 0.5).std()
    s_far = (far[far > 0] - 2.5).std()
    assert s_far > 2.0 * s_near  # quadratic range model


def test_depth_edges_get_dropout_and_flying_pixels(rng):
    d = _step_depth()
    out = degrade_depth(d, rng, strength=1.0)
    # dropout: some valid edge pixels became holes
    edge_band = np.zeros_like(d, bool)
    edge_band[22:26, 38:90] = True
    assert ((d > 0) & (out == 0) & edge_band).sum() > 5
    # flying pixels: depths strictly between the two surfaces appear
    between = (out > 0.52) & (out < 0.68)
    assert between.sum() > 5
    # interior of the foreground stays near 0.5 m (recoverable geometry)
    inner = out[34:62, 50:78]
    inner_valid = inner[inner > 0]
    assert np.abs(np.median(inner_valid) - 0.5) < 0.005


def test_depth_blob_holes(rng):
    d = np.full((240, 320), 0.8, np.float32)
    out = degrade_depth(d, rng, strength=1.0)
    holes = (out == 0).sum()
    assert holes > 20  # poisson(3) circles of r 3-13 — virtually certain
    assert holes < d.size * 0.2  # but the frame is still mostly valid


def test_depth_zero_strength_is_identity_up_to_quantization(rng):
    d = _step_depth()
    out = degrade_depth(d, rng, strength=0.0)
    np.testing.assert_allclose(out, np.round(d * 1000) / 1000, atol=1e-6)
    assert (out[d == 0] == 0).all()


def test_rgb_degradation_changes_stats_but_stays_bounded(rng):
    img = np.tile(np.linspace(0, 1, 64, dtype=np.float32)[None, :, None], (64, 1, 3))
    out = degrade_rgb(img, rng, strength=1.0)
    assert out.min() >= 0 and out.max() <= 1
    assert np.abs(out - img).mean() > 0.01  # photometrically shifted
    # channels shift DIFFERENTLY (white-balance error)
    deltas = [np.abs(out[..., c] - img[..., c]).mean() for c in range(3)]
    assert max(deltas) - min(deltas) > 1e-4
    assert out.shape == img.shape


def test_perturb_K_is_small_but_nonzero(rng):
    K = np.array([[600.0, 0, 320.0], [0, 600.0, 240.0], [0, 0, 1]])
    Kp = perturb_K(K, rng, strength=1.0)
    assert Kp[0, 0] != K[0, 0] and abs(Kp[0, 0] / K[0, 0] - 1) < 0.005
    assert abs(Kp[0, 2] - K[0, 2]) <= 2.0 and Kp[0, 2] != K[0, 2]
    assert Kp[2, 2] == 1.0 and Kp[0, 1] == 0.0


def test_degrade_mask_perturbs_boundary_only(rng):
    m = np.zeros((96, 96), np.uint8)
    m[30:70, 30:70] = 255
    out = degrade_mask(m, rng, strength=1.0)
    assert set(np.unique(out)) <= {0, 255}
    diff = (out > 0) != (m > 0)
    assert diff.sum() > 0
    # interior and far exterior untouched
    assert (out[40:60, 40:60] == 255).all()
    assert (out[:20] == 0).all()


def test_sequence_drift_correlated_and_bounded(rng):
    from sensor_model import sequence_drift

    g = sequence_drift(200, rng, 1.0)
    assert g.shape == (200,)
    assert (g >= 0.7 - 1e-6).all() and (g <= 1.42).all()
    # temporal correlation: adjacent frames move less than distant ones
    d1 = np.abs(np.diff(g)).mean()
    d10 = np.abs(g[10:] - g[:-10]).mean()
    assert d1 < d10


def test_motion_blur_directional(rng):
    from sensor_model import motion_blur_rgb

    img = np.zeros((40, 40, 3), np.float32)
    img[20, 20] = 1.0  # point source
    out = motion_blur_rgb(img, np.array([12.0, 0.0]), 1.0)
    # energy preserved, spread along x only
    assert abs(out.sum() - img.sum()) < 1e-3
    row_spread = (out[:, :, 0].sum(axis=1) > 1e-4).sum()
    col_spread = (out[:, :, 0].sum(axis=0) > 1e-4).sum()
    assert col_spread > row_spread  # horizontal streak
    # sub-pixel motion is a no-op
    out2 = motion_blur_rgb(img, np.array([0.3, 0.2]), 1.0)
    np.testing.assert_array_equal(out2, img)
