"""Raster kernel chunk-size sweep on the real chip: flat (box) and banded
(high-poly) paths at pc in {128, 256}, with backface culling as in register."""
import os, sys, time
sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))
import jax, jax.numpy as jnp, numpy as np
jax.config.update("jax_compilation_cache_dir", "/tmp/jax_compile_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

def timeit_fn(fn, *a, n=5, **k):
    out = fn(*a, **k); jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(n):
        out = fn(*a, **k); jax.block_until_ready(out)
    return (time.perf_counter() - t0) / n

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
        ("box T=1280", load_mesh(f"{repo}/demo_data/synth_box/mesh/model_scaled_down.obj")),
        ("proc T=5120", make_procedural_mesh(100, subdivisions=4)),
    ]
    grid = make_rotation_grid(min_n_views=40, inplane_step=60)
    for name, mesh in scenes:
        c = (mesh.vertices.min(0) + mesh.vertices.max(0)) / 2
        mesh.vertices = mesh.vertices - c
        arr = make_mesh_arrays(mesh)
        diam = compute_mesh_diameter(mesh.vertices, n_sample=2000)
        poses = jnp.asarray(np.tile(grid, (1, 1, 1)), dtype=jnp.float32)
        poses = poses.at[:, 2, 3].set(0.55)
        tfs = compute_crop_window_tf_batch(poses, K, 1.2, (160, 160), diam)
        for pc in (128, 256):
            for cull in (True,):
                t = timeit_fn(lambda: render_batch(arr, poses, K, tfs, out_hw=(160, 160),
                                                   backface_cull=cull, pallas_tri_chunk=pc))
                print(f"{name} pc={pc} cull={cull}: {t*1e3:.1f} ms  (B={poses.shape[0]})",
                      flush=True)

if __name__ == "__main__":
    main()
