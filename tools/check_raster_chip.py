"""Real-chip raster parity check: Pallas kernel vs XLA scan on the demo box
mesh (flat path) and a subdivided sphere (banded path).  The interpret-mode
tests (tests/test_raster_pallas.py) validate kernel semantics on CPU; this
validates the actual Mosaic lowering on the TPU — run after any kernel edit.

Exit 0 and prints OK lines when depth mismatch count is within the same
tolerance the CPU tests use (sub-pixel edge ties may differ).
"""
import os, sys
sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))
import jax, jax.numpy as jnp, numpy as np
jax.config.update("jax_compilation_cache_dir", "/tmp/jax_compile_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)


def main():
    import logging; logging.disable(logging.INFO)
    from sixdof_tpu.io.mesh_io import load_mesh
    from sixdof_tpu.ops.rasterize import make_mesh_arrays, render_batch
    from sixdof_tpu.ops.geometry import compute_crop_window_tf_batch, compute_mesh_diameter
    from sixdof_tpu.ops.hypotheses import make_rotation_grid
    from sixdof_tpu.parallel.procgen import make_procedural_mesh

    repo = os.path.join(os.path.dirname(os.path.abspath(__file__)), "..")
    K = jnp.asarray([[600.0, 0, 320], [0, 600.0, 240], [0, 0, 1]])
    grid = make_rotation_grid(min_n_views=12, inplane_step=120)
    H = W = 160
    fails = 0
    scenes = [
        ("box flat", load_mesh(f"{repo}/demo_data/synth_box/mesh/model_scaled_down.obj")),
        ("proc banded", make_procedural_mesh(7, subdivisions=4)),
    ]
    for name, mesh in scenes:
        c = (mesh.vertices.min(0) + mesh.vertices.max(0)) / 2
        mesh.vertices = mesh.vertices - c
        arr = make_mesh_arrays(mesh)
        diam = compute_mesh_diameter(mesh.vertices, n_sample=2000)
        poses = jnp.asarray(np.asarray(grid), dtype=jnp.float32)[:8]
        poses = poses.at[:, 2, 3].set(0.55)
        tfs = compute_crop_window_tf_batch(poses, K, 1.2, (H, W), diam)
        dp = np.asarray(render_batch(arr, poses, K, tfs, out_hw=(H, W),
                                     backface_cull=True, use_pallas=True)["depth"])
        dx = np.asarray(render_batch(arr, poses, K, tfs, out_hw=(H, W),
                                     backface_cull=True, use_pallas=False)["depth"])
        # edge pixels can legitimately differ (tie-break order); interiors must
        # agree to float tolerance
        close = np.isclose(dp, dx, rtol=1e-4, atol=1e-5)
        frac_diff = 1.0 - close.mean()
        max_err = np.abs(np.where(close, 0.0, dp - dx)).max()
        ok = frac_diff < 2e-3
        print(f"{name}: pixel mismatch frac {frac_diff:.2e}, worst |dz| among "
              f"mismatches {max_err:.4f} -> {'OK' if ok else 'FAIL'}", flush=True)
        fails += 0 if ok else 1
    sys.exit(1 if fails else 0)


if __name__ == "__main__":
    main()
