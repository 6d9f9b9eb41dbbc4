"""Per-stage register() breakdown on the real chip (VERDICT r1 item 1/9).

Times each jitted stage warm: render, refiner net forward, full refine scan,
scorer, and the host-side orchestration between them.
"""
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_compile_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)


def timeit_fn(fn, *args, n=3, **kw):
    out = fn(*args, **kw)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(n):
        out = fn(*args, **kw)
        jax.block_until_ready(out)
    return (time.perf_counter() - t0) / n, out


def main():
    import logging

    logging.disable(logging.INFO)
    from sixdof_tpu.estimater import FoundationPose
    from sixdof_tpu.io.mesh_io import load_mesh
    from sixdof_tpu.io.readers import DataReader
    from sixdof_tpu.models.predict import (
        PoseRefinePredictor,
        ScorePredictor,
        _make_AB,
        refine_poses_jit,
        score_poses_jit,
    )
    from sixdof_tpu.ops.depth_filter import bilateral_filter_depth, erode_depth
    from sixdof_tpu.ops.geometry import compute_crop_window_tf_batch, depth2xyzmap
    from sixdof_tpu.ops.rasterize import render_batch

    class Args:
        debug = 0
        box = None
        mesh = None
        voxel_size = None

    repo = os.path.join(os.path.dirname(os.path.abspath(__file__)), "..")
    SCENE = os.path.join(repo, "demo_data", "synth_box")
    reader = DataReader(base_dir=SCENE, shorter_side=288, zfar=np.inf, arguments=Args())
    mesh = load_mesh(f"{SCENE}/mesh/model_scaled_down.obj")
    rckpt = os.path.join(repo, "weights", "refiner")
    sckpt = os.path.join(repo, "weights", "scorer")
    refiner = PoseRefinePredictor(ckpt_dir=rckpt if os.path.exists(rckpt) else None)
    scorer = ScorePredictor(ckpt_dir=sckpt if os.path.exists(sckpt) else None)
    est = FoundationPose(model_pts=mesh.vertices, model_normals=mesh.vertex_normals,
                         mesh=mesh, refiner=refiner, scorer=scorer, prune_to=64)

    color = reader.get_color(0)
    depth = reader.get_depth(0)
    mask = reader.get_mask(color, 0).astype(bool)
    K = jnp.asarray(reader.color_K, dtype=jnp.float32)

    print(f"mesh: V={mesh.vertices.shape[0]} T={mesh.faces.shape[0]}")
    print(f"image: {color.shape}")

    d = jnp.asarray(depth, dtype=jnp.float32)
    t, d_f = timeit_fn(lambda x: bilateral_filter_depth(erode_depth(x, radius=2), radius=2), d)
    print(f"depth filters: {t*1e3:.1f} ms")
    depth_np = np.asarray(d_f)

    poses = est.generate_random_pose_hypo(K=reader.color_K, rgb=color, depth=depth_np, mask=mask)
    poses = jnp.asarray(poses, dtype=jnp.float32)
    rgb01 = jnp.asarray(color, dtype=jnp.float32) / 255.0
    xyz_map = depth2xyzmap(d_f, K)
    diam = float(est.diameter)
    marr = est.mesh_tensors

    for N in (252, 64):
        p = poses[:N]
        tf_crops = compute_crop_window_tf_batch(p, K, crop_ratio=1.2, out_size=(160, 160),
                                                mesh_diameter=diam)
        t, _ = timeit_fn(
            lambda pp, tt: render_batch(marr, pp, K, tt, out_hw=(160, 160), use_light=True),
            p, tf_crops)
        print(f"render_batch N={N}: {t*1e3:.1f} ms")

        t, ab = timeit_fn(
            jax.jit(lambda pp: _make_AB(marr, pp, rgb01, xyz_map, K, 1.2, diam, (160, 160),
                                        False, 0.001)[:2]), p)
        print(f"make_AB N={N}: {t*1e3:.1f} ms")
        A, B = ab

        net_fwd = jax.jit(lambda a, b: refiner.model.apply({"params": refiner.params}, a, b))
        t, _ = timeit_fn(net_fwd, A, B)
        print(f"refiner net fwd N={N}: {t*1e3:.1f} ms")

        for iters in (1, 2, 3):
            t, _ = timeit_fn(
                lambda pp: refine_poses_jit(
                    refiner.model, refiner.params, marr, pp, rgb01, xyz_map, K, diam,
                    1.2, 0.02, 0.3490658503988659, iterations=iters), p)
            print(f"refine_poses_jit N={N} iters={iters}: {t*1e3:.1f} ms")

        for mode in ("network", "depth", "hybrid"):
            t, _ = timeit_fn(
                lambda pp: score_poses_jit(
                    scorer.model, scorer.params, marr, pp, rgb01, xyz_map, K, diam, 1.2,
                    mode=mode), p)
            print(f"score_poses_jit N={N} mode={mode}: {t*1e3:.1f} ms")

    # full register warm
    est.register(K=reader.color_K, rgb=color, depth=depth, ob_mask=mask, iteration=5)
    t0 = time.perf_counter()
    est.register(K=reader.color_K, rgb=color, depth=depth, ob_mask=mask, iteration=5)
    print(f"register full (warm): {(time.perf_counter()-t0)*1e3:.1f} ms")


if __name__ == "__main__":
    main()
