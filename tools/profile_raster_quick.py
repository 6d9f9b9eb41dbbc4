"""Quick raster-kernel timing at the two register workload shapes, default
configs only (box pc=128/tile=2048, proc pc=128/tile=1024) — a 2-compile
subset of profile_raster_chunk for sessions with bad link weather.

Baselines at the round-5 session-4 kernel (min-z accumulator): box 200 ms,
proc 447 ms (PROGRESS_NOTES raster tiling sweep).
"""
import os, sys, time
sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))
import jax, jax.numpy as jnp, numpy as np
jax.config.update("jax_compilation_cache_dir", "/tmp/jax_compile_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from profile_raster_chunk import timeit_fn


def main():
    import logging; logging.disable(logging.INFO)
    from sixdof_tpu.io.mesh_io import load_mesh
    from sixdof_tpu.ops.rasterize import make_mesh_arrays, render_batch
    from sixdof_tpu.ops.geometry import compute_crop_window_tf_batch, compute_mesh_diameter
    from sixdof_tpu.parallel.procgen import make_procedural_mesh
    from sixdof_tpu.ops.hypotheses import make_rotation_grid

    repo = os.path.join(os.path.dirname(os.path.abspath(__file__)), "..")
    K = jnp.asarray([[600.0, 0, 320], [0, 600.0, 240], [0, 0, 1]])
    scenes = [
        ("box T=1280", load_mesh(f"{repo}/demo_data/synth_box/mesh/model_scaled_down.obj"), 128, 2048),
        ("proc T=5120", make_procedural_mesh(100, subdivisions=4), 128, 1024),
    ]
    grid = make_rotation_grid(min_n_views=40, inplane_step=60)
    H = W = 160
    for name, mesh, pc, tile in scenes:
        c = (mesh.vertices.min(0) + mesh.vertices.max(0)) / 2
        mesh.vertices = mesh.vertices - c
        arr = make_mesh_arrays(mesh)
        diam = compute_mesh_diameter(mesh.vertices, n_sample=2000)
        poses = jnp.asarray(np.asarray(grid), dtype=jnp.float32)
        poses = poses.at[:, 2, 3].set(0.55)
        tfs = compute_crop_window_tf_batch(poses, K, 1.2, (H, W), diam)
        fn = lambda: render_batch(
            arr, poses, K, tfs, out_hw=(H, W), backface_cull=True,
            pallas_tri_chunk=pc, pallas_tile=tile)["depth"].sum()
        t, s = timeit_fn(fn, n=5)
        print(f"{name} pc={pc} tile={tile}: {t*1e3:7.1f} ms (checksum {s:.3f})",
              flush=True)


if __name__ == "__main__":
    main()
