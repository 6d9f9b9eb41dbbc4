"""Pre-populate the persistent XLA compile cache for a scene's pipeline.

The fused register cascade (models/predict.py::register_pipeline_jit) is one
large program whose first compile takes minutes; the tracking, ICP and
capture programs add more.  This tool traces and compiles every program the
app loop will dispatch for a given scene/config and leaves the executables in
the persistent cache (jax_compilation_cache_dir), so the first real
`run.py` invocation starts at interactive latency.

Run it once per deployment (or in the background while recording a scene):

    python tools/precompile.py [scene_dir] [--shorter_side 288] [--prune_to 64]

Cache keys depend on the traced shapes: scene resolution (shorter_side),
hypothesis count, prune schedule, crop sizes and the per-frame point-cloud
padding buckets.  The tool replays the scene's own frames, so the keys it
writes are exactly the ones the app will look up.
"""
from __future__ import annotations

import argparse
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("scene_dir", nargs="?",
                    default=os.path.join(REPO, "demo_data", "synth_box"))
    # IMPORTANT: must match the resolution run.py will use — cache keys
    # depend on traced shapes (run.py's default is native resolution = 0)
    ap.add_argument("--shorter_side", type=int, default=0,
                    help="0 = native resolution (run.py's default); pass the "
                         "same value you will pass to run.py")
    ap.add_argument("--prune_to", type=int, default=64)
    ap.add_argument("--est_refine_iter", type=int, default=5)
    ap.add_argument("--track_refine_iter", type=int, default=2)
    ap.add_argument("--cache_dir", default="/tmp/jax_compile_cache")
    args = ap.parse_args()

    import jax

    jax.config.update("jax_compilation_cache_dir", args.cache_dir)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    import logging

    logging.disable(logging.INFO)

    from sixdof_tpu.app.defect_projection import (
        compute_rays, heatmap_to_points, ray_tracing,
    )
    from sixdof_tpu.app.icp_pipeline import (
        CaptureContext, capture_event, preprocess_source, refine_pose_with_icp,
    )
    from sixdof_tpu.estimater import FoundationPose
    from sixdof_tpu.io.mesh_io import load_mesh
    from sixdof_tpu.io.readers import DataReader
    from sixdof_tpu.models.predict import PoseRefinePredictor, ScorePredictor

    class Args:
        debug = 0
        box = None
        mesh = None
        voxel_size = None

    t_all = time.perf_counter()
    reader = DataReader(base_dir=args.scene_dir,
                        shorter_side=args.shorter_side or None,
                        zfar=np.inf, arguments=Args())
    mesh = load_mesh(os.path.join(args.scene_dir, "mesh", "model_scaled_down.obj"))
    rckpt = os.path.join(REPO, "weights", "refiner")
    sckpt = os.path.join(REPO, "weights", "scorer")
    est = FoundationPose(
        model_pts=mesh.vertices, model_normals=mesh.vertex_normals, mesh=mesh,
        refiner=PoseRefinePredictor(ckpt_dir=rckpt if os.path.exists(rckpt) else None),
        scorer=ScorePredictor(ckpt_dir=sckpt if os.path.exists(sckpt) else None),
        prune_to=args.prune_to or None,
    )

    color = reader.get_color(0)
    depth = reader.get_depth(0)
    mask = reader.get_mask(color, 0).astype(bool)

    def step(name, fn):
        t0 = time.perf_counter()
        out = fn()
        print(f"[precompile] {name}: {time.perf_counter() - t0:.1f}s", flush=True)
        return out

    pose = step("register", lambda: est.register(
        K=reader.color_K, rgb=color, depth=depth, ob_mask=mask,
        iteration=args.est_refine_iter))

    init_tf = reader.color_to_depth @ reader.scale_translation_to_millimeters(pose)
    _, icp_result, _, target_processed = step("icp_refine", lambda: refine_pose_with_icp(
        reader.get_source(0), reader.target, reader.background, init_tf.copy(),
        reader.parameters))

    heatmap, _, _, _ = reader.get_heatmap(color)
    mesh_copy = reader.target_mesh.copy()
    mesh_copy.transform(np.linalg.inv(icp_result.transformation))
    step("ray_tracing", lambda: ray_tracing(
        reader.base_dir, mesh_copy, heatmap, reader.color_pinhole, 0.75))

    # tracking: both the cropped and the full-frame programs
    step("track (cropped)", lambda: est.track_one(
        rgb=color, depth=depth, K=reader.color_K, iteration=args.track_refine_iter))
    est.track_crop = False
    step("track (full frame)", lambda: est.track_one(
        rgb=color, depth=depth, K=reader.color_K, iteration=args.track_refine_iter))
    est.track_crop = True

    # capture events: every source-shape bucket in the scene
    pix = heatmap_to_points(heatmap, 0.75)
    if pix:
        rays, intensities = compute_rays(pix, reader.color_pinhole)
    else:
        rays, intensities = np.array([[0.0, 0.0, 1.0]]), np.zeros(1)
    ray_mask = np.ones(len(rays), dtype=bool)
    ctx = CaptureContext(target_processed, reader.target_mesh, reader.color_to_depth)
    for fi in range(1, len(reader)):
        sp, _, _ = preprocess_source(reader.get_source(fi), reader.background,
                                     reader.parameters, i=fi)
        step(f"capture (frame {fi})", lambda sp=sp: capture_event(
            sp, target_processed, init_tf.copy(), reader.parameters,
            reader.target_mesh, rays, ray_mask, intensities,
            reader.color_to_depth, ctx=ctx))

    n = len([f for f in os.listdir(args.cache_dir)]) if os.path.isdir(args.cache_dir) else 0
    print(f"[precompile] done in {time.perf_counter() - t_all:.1f}s; "
          f"cache {args.cache_dir} holds {n} entries", flush=True)


if __name__ == "__main__":
    main()
