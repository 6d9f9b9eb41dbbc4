"""Time-to-first-pose in a FRESH process, the app's startup pattern.

VERDICT r2 item 4 target: first register() <= 3 s with a warm persistent XLA
cache, first-ever compile <= 2 min.  This reproduces app/run.py's startup
exactly — construct predictors/engine, kick precompile_async (background
fused-register + track compiles; register() detours through the staged path
while the fused program is still in flight), then register frame 0 — and
prints a stage-by-stage timeline from interpreter start.

Usage: python tools/measure_cold_start.py [scene_dir] [--no-precompile]
"""
import os
import sys
import time

T0 = time.perf_counter()  # as close to process start as an in-script timer gets

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def mark(label, marks=[]):
    t = time.perf_counter() - T0
    marks.append((label, t))
    print(f"[{t:7.2f}s] {label}", flush=True)
    return t


def main():
    scene = sys.argv[1] if len(sys.argv) > 1 else os.path.join(REPO, "demo_data", "synth_box")
    use_precompile = "--no-precompile" not in sys.argv

    import numpy as np

    from sixdof_tpu.utils import enable_compile_cache, set_logging_format

    set_logging_format()
    enable_compile_cache()
    mark("imports (numpy + package)")

    import jax

    jax.devices()
    mark("jax backend up")

    from sixdof_tpu.estimater import FoundationPose
    from sixdof_tpu.io.mesh_io import load_mesh
    from sixdof_tpu.io.readers import DataReader
    from sixdof_tpu.models.predict import PoseRefinePredictor, ScorePredictor

    class Args:
        debug = 0
        box = None
        mesh = None
        voxel_size = None

    reader = DataReader(base_dir=scene, shorter_side=288, zfar=np.inf, arguments=Args())
    mesh = load_mesh(f"{scene}/mesh/model_scaled_down.obj")
    mark("reader + mesh")

    refiner = PoseRefinePredictor(ckpt_dir=os.path.join(REPO, "weights", "refiner"))
    scorer = ScorePredictor(ckpt_dir=os.path.join(REPO, "weights", "scorer"))
    mark("checkpoints loaded (device-resident)")

    est = FoundationPose(model_pts=mesh.vertices, model_normals=mesh.vertex_normals,
                         mesh=mesh, refiner=refiner, scorer=scorer, prune_to=64)
    mark("engine built (rotation grid clustered)")

    if use_precompile:
        est.precompile_async(reader.color_K, (reader.color_H, reader.color_W),
                             iteration=5, track_iteration=2)
        mark("precompile_async kicked (background)")

    color = reader.get_color(0)
    depth = reader.get_depth(0)
    mask = reader.get_mask(color, 0).astype(bool)
    mark("frame 0 loaded")

    t_reg = time.perf_counter()
    pose = est.register(K=reader.color_K, rgb=color, depth=depth, ob_mask=mask, iteration=5)
    reg_s = time.perf_counter() - t_reg
    total = mark(f"FIRST POSE (register {reg_s:.2f}s)")

    # a second register shows the steady-state (fused program, warm)
    t_reg = time.perf_counter()
    est.register(K=reader.color_K, rgb=color, depth=depth, ob_mask=mask, iteration=5)
    mark(f"second register ({time.perf_counter() - t_reg:.2f}s)")

    import json

    print(json.dumps({
        "time_to_first_pose_s": round(total, 2),
        "first_register_s": round(reg_s, 2),
        "precompile": use_precompile,
        "pose_t": [round(float(x), 4) for x in pose[:3, 3]],
    }), flush=True)


if __name__ == "__main__":
    main()
