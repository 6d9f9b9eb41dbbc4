"""Sweep coarse-to-fine prune configurations of the fused register cascade.

For each config: warm register latency + pose error vs GT on frame 0 of the
demo scene.  Run on TPU (compiles each config once; persistent cache makes
reruns cheap).
"""
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

import jax
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_compile_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)


def main():
    import logging

    logging.disable(logging.INFO)
    from sixdof_tpu.estimater import FoundationPose
    from sixdof_tpu.io.mesh_io import load_mesh
    from sixdof_tpu.io.readers import DataReader
    from sixdof_tpu.metrics import adds_err, rotation_angle_deg
    from sixdof_tpu.models.predict import PoseRefinePredictor, ScorePredictor

    class Args:
        debug = 0
        box = None
        mesh = None
        voxel_size = None

    repo = os.path.join(os.path.dirname(os.path.abspath(__file__)), "..")
    scene = sys.argv[1] if len(sys.argv) > 1 else "synth_box"
    SCENE = os.path.join(repo, "demo_data", scene)
    reader = DataReader(base_dir=SCENE, shorter_side=288, zfar=np.inf, arguments=Args())
    mesh = load_mesh(f"{SCENE}/mesh/model_scaled_down.obj")
    rckpt = os.path.join(repo, "weights", "refiner")
    sckpt = os.path.join(repo, "weights", "scorer")
    refiner = PoseRefinePredictor(ckpt_dir=rckpt if os.path.exists(rckpt) else None)
    scorer = ScorePredictor(ckpt_dir=sckpt if os.path.exists(sckpt) else None)

    color = reader.get_color(0)
    depth = reader.get_depth(0)
    mask = reader.get_mask(color, 0).astype(bool)
    gt = reader.get_gt_pose(0)

    configs = [
        ("prune64 (r2 default)", dict(prune_to=64)),
        ("sched 1x128,1x64", dict(prune_schedule=((1, 128), (1, 64)))),
        ("sched 1x128,1x48", dict(prune_schedule=((1, 128), (1, 48)))),
        ("sched 1x96,1x48", dict(prune_schedule=((1, 96), (1, 48)))),
    ]
    model_pts = None
    for name, kw in configs:
        est = FoundationPose(model_pts=mesh.vertices, model_normals=mesh.vertex_normals,
                             mesh=mesh, refiner=refiner, scorer=scorer, **kw)
        if model_pts is None:
            model_pts = np.asarray(est.pts)
        t0 = time.perf_counter()
        est.register(K=reader.color_K, rgb=color, depth=depth, ob_mask=mask, iteration=5)
        cold = time.perf_counter() - t0
        times = []
        for _ in range(3):
            t0 = time.perf_counter()
            pose = est.register(K=reader.color_K, rgb=color, depth=depth, ob_mask=mask,
                                iteration=5)
            times.append(time.perf_counter() - t0)
        rot = rotation_angle_deg(pose[:3, :3], gt[:3, :3])
        terr = np.linalg.norm(pose[:3, 3] - gt[:3, 3])
        adds = adds_err(pose, gt, model_pts)
        print(f"{name:24s} warm={min(times)*1e3:7.1f} ms (cold {cold:6.1f} s)  "
              f"rot={rot:7.2f} deg  t={terr*1e3:6.2f} mm  adds={adds*1e3:6.2f} mm",
              flush=True)


if __name__ == "__main__":
    main()
