"""Micro-profile render_batch internals: z-buffer kernel vs shading."""
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_compile_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)


def t(fn, *args, n=5):
    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(n):
        out = fn(*args)
        jax.block_until_ready(out)
    return (time.perf_counter() - t0) / n


def main():
    import logging

    logging.disable(logging.INFO)
    from sixdof_tpu.io.mesh_io import load_mesh
    from sixdof_tpu.ops.geometry import compute_crop_window_tf_batch
    from sixdof_tpu.ops.pallas.raster_kernel import group_coefficients, rasterize_zbuffer_pallas
    from sixdof_tpu.ops.rasterize import _tri_setup, make_mesh_arrays, render_batch

    repo = os.path.join(os.path.dirname(os.path.abspath(__file__)), "..")
    mesh = load_mesh(f"{repo}/demo_data/synth_box/mesh/model_scaled_down.obj")
    marr = make_mesh_arrays(mesh)
    K = jnp.asarray([[300.0, 0, 192], [0, 300.0, 144], [0, 0, 1]], dtype=jnp.float32)

    N = 252
    rng = np.random.RandomState(0)
    poses = np.tile(np.eye(4, dtype=np.float32)[None], (N, 1, 1))
    poses[:, :3, 3] = [0.0, 0.0, 0.5]
    from sixdof_tpu.ops.lie import so3_exp_map

    poses[:, :3, :3] = np.asarray(so3_exp_map(jnp.asarray(rng.randn(N, 3), dtype=jnp.float32)))
    poses = jnp.asarray(poses)
    diam = 0.1
    tf_crops = compute_crop_window_tf_batch(poses, K, crop_ratio=1.2, out_size=(160, 160),
                                            mesh_diameter=diam)

    H = W = 160

    @jax.jit
    def setup(poses, tf_crops):
        def vs(pose, crop_tf):
            R, tt = pose[:3, :3], pose[:3, 3]
            p_cam = marr.pos @ R.T + tt
            z = p_cam[:, 2]
            uvw = p_cam @ K.T
            uv = uvw[:, :2] / jnp.maximum(uvw[:, 2:3], 0.001)
            uvh = jnp.concatenate([uv, jnp.ones_like(uv[:, :1])], axis=-1)
            uv_crop = (uvh @ crop_tf.T)[:, :2]
            return p_cam, z, uv_crop

        p_cam, z_all, uv_all = jax.vmap(vs)(poses, tf_crops.astype(jnp.float32))
        coef, valid = jax.vmap(lambda uv, z: _tri_setup(uv, z, marr.faces, 0.001))(uv_all, z_all)
        return p_cam, z_all, coef, valid

    print(f"setup: {t(setup, poses, tf_crops)*1e3:.1f} ms")
    p_cam, z_all, coef, valid = setup(poses, tf_crops)

    @jax.jit
    def group(coef, valid):
        return group_coefficients(coef, valid, tri_chunk=128)

    print(f"group: {t(group, coef, valid)*1e3:.1f} ms")
    grouped = group(coef, valid)
    print(f"grouped shape: {grouped.shape}")

    zb = jax.jit(lambda g: rasterize_zbuffer_pallas(g, H, W, tri_chunk=128))
    print(f"zbuffer pallas: {t(zb, grouped)*1e3:.1f} ms")

    full = jax.jit(lambda p, c: render_batch(marr, p, K, c, out_hw=(160, 160), use_light=True))
    print(f"full render: {t(full, poses, tf_crops)*1e3:.1f} ms")


if __name__ == "__main__":
    main()
