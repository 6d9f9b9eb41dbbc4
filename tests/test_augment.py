"""In-graph sensor augmentation (parallel/augment.py): jittable, per-sample,
and statistically matching the host sensor model it mirrors."""
import jax
import jax.numpy as jnp
import numpy as np

from sixdof_tpu.parallel.augment import (
    degrade_rgb_batch,
    degrade_xyz_batch,
    maybe_degrade_pair,
)


def _xyz_scene(N=2, H=48, W=64):
    """Foreground square at z=0.5 over background z=0.7, camera-space xyz."""
    ys, xs = np.mgrid[0:H, 0:W].astype(np.float32)
    z = np.full((H, W), 0.7, np.float32)
    z[12:36, 20:44] = 0.5
    x = (xs - W / 2) / 300.0 * z
    y = (ys - H / 2) / 300.0 * z
    xyz = np.stack([x, y, z], axis=-1)
    xyz[:3] = 0.0  # invalid strip
    return jnp.asarray(np.tile(xyz[None], (N, 1, 1, 1)))


def test_rgb_batch_properties():
    key = jax.random.PRNGKey(0)
    rgb = jnp.tile(jnp.linspace(0, 1, 64)[None, None, :, None], (3, 48, 1, 3))
    out = jax.jit(degrade_rgb_batch)(key, rgb)
    out = np.asarray(out)
    assert out.shape == rgb.shape
    assert out.min() >= 0 and out.max() <= 1
    # per-sample randomization: different samples degraded differently
    assert np.abs(out[0] - out[1]).mean() > 1e-3
    # quantized to uint8 steps
    np.testing.assert_allclose(out * 255, np.round(out * 255), atol=1e-4)


def test_xyz_batch_rays_preserved():
    key = jax.random.PRNGKey(1)
    xyz = _xyz_scene()
    out = np.asarray(jax.jit(degrade_xyz_batch)(key, xyz))
    src = np.asarray(xyz)
    valid = (out[..., 2] > 1e-6) & (src[..., 2] > 1e-6)
    # every surviving point stays on its pixel ray: x/z and y/z unchanged
    np.testing.assert_allclose(out[valid][:, 0] / out[valid][:, 2],
                               src[valid][:, 0] / src[valid][:, 2], atol=1e-5)
    # invalid strip stays invalid
    assert (out[:, :3] == 0).all()
    # interior of the foreground survives and stays near z=0.5
    inner = out[:, 20:30, 28:38, 2]
    inner_valid = inner[inner > 0]
    assert inner_valid.size > 50
    assert np.abs(np.median(inner_valid) - 0.5) < 0.01


def test_xyz_batch_edge_artifacts_and_holes():
    key = jax.random.PRNGKey(2)
    xyz = _xyz_scene(N=4)
    out = np.asarray(degrade_xyz_batch(key, xyz))
    src = np.asarray(xyz)
    z_out, z_src = out[..., 2], src[..., 2]
    # dropout: some previously-valid pixels became invalid
    dropped = (z_src > 0) & (z_out == 0)
    assert dropped.sum() > 20
    # flying pixels are a HELD-OUT eval-only family (augment.py docstring /
    # r3 verdict item 6): the trainer must NOT synthesize between-surface z
    # values beyond what axial noise explains (the surfaces sit at 0.5/0.7;
    # sigma there is ~1.3 mm, so anything deeper than 5 sigma into the gap
    # would be a flying-pixel artifact)
    between = (z_out > 0.51) & (z_out < 0.69)
    assert between.sum() == 0


def test_maybe_degrade_pair_selects_per_sample():
    key = jax.random.PRNGKey(3)
    rgb = jnp.full((8, 32, 32, 3), 0.5)
    xyz = _xyz_scene(N=8, H=32, W=32)
    rgb_out, xyz_out = jax.jit(maybe_degrade_pair)(key, rgb, xyz, 0.5, 1.0)
    rgb_out = np.asarray(rgb_out)
    changed = np.array([np.abs(rgb_out[i] - 0.5).max() > 1e-6 for i in range(8)])
    # p=0.5 over 8 samples: overwhelmingly likely to see both kinds
    assert changed.any() and not changed.all()
    # p=0 is the identity
    r0, x0 = maybe_degrade_pair(key, rgb, xyz, 0.0, 1.0)
    np.testing.assert_array_equal(np.asarray(r0), np.asarray(rgb))
    np.testing.assert_array_equal(np.asarray(x0), np.asarray(xyz))
