"""Cold-start profiler: where does the first register() go? (VERDICT r2 item 4)

Splits the first-call cost of the fused register cascade into
  trace (jax.jit tracing/lowering, pure host python)
  compile (XLA compile, or persistent-cache deserialize when warm)
  execute (first dispatch + device transfer)
at the exact bench call (args captured via the same shim as flops_report).

Usage: python tools/profile_compile.py [scene_dir]
Needs the real device (run when the tunnel is healthy).
"""
from __future__ import annotations

import json
import os
import sys
import time

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def main(scene_dir=None, shorter_side=288):
    import logging

    logging.disable(logging.INFO)
    import jax

    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_compile_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    scene_dir = scene_dir or os.path.join(REPO, "demo_data", "synth_box")

    from sixdof_tpu.estimater import FoundationPose
    from sixdof_tpu.io.mesh_io import load_mesh
    from sixdof_tpu.io.readers import DataReader
    from sixdof_tpu.models import predict
    from sixdof_tpu.models.predict import PoseRefinePredictor, ScorePredictor

    class Args:
        debug = 0
        box = None
        mesh = None
        voxel_size = None

    t = {}
    t0 = time.perf_counter()
    reader = DataReader(base_dir=scene_dir, shorter_side=shorter_side, zfar=np.inf,
                        arguments=Args())
    mesh = load_mesh(f"{scene_dir}/mesh/model_scaled_down.obj")
    rckpt, sckpt = os.path.join(REPO, "weights", "refiner"), os.path.join(REPO, "weights", "scorer")
    est = FoundationPose(
        model_pts=mesh.vertices, model_normals=mesh.vertex_normals, mesh=mesh,
        refiner=PoseRefinePredictor(ckpt_dir=rckpt if os.path.exists(rckpt) else None),
        scorer=ScorePredictor(ckpt_dir=sckpt if os.path.exists(sckpt) else None),
        prune_to=64,
    )
    t["setup_s"] = time.perf_counter() - t0

    color = reader.get_color(0)
    depth = reader.get_depth(0)
    mask = reader.get_mask(color, 0).astype(bool)

    # capture the exact fused call without executing it
    class _Captured(Exception):
        pass

    box = {}
    orig = predict.register_pipeline_jit

    def shim(*args, **kwargs):
        box["args"], box["kwargs"] = args, kwargs
        raise _Captured()

    t0 = time.perf_counter()
    predict.register_pipeline_jit = shim
    try:
        est.register(K=reader.color_K, rgb=color, depth=depth, ob_mask=mask, iteration=5)
    except _Captured:
        pass
    finally:
        predict.register_pipeline_jit = orig
    t["host_pre_s"] = time.perf_counter() - t0  # depth filters, hypo gen, uploads

    t0 = time.perf_counter()
    lowered = orig.lower(*box["args"], **box["kwargs"])
    t["trace_lower_s"] = time.perf_counter() - t0

    t0 = time.perf_counter()
    compiled = lowered.compile()
    t["compile_s"] = time.perf_counter() - t0  # cache-hit deserialize when warm

    del compiled
    # first register through the normal path: re-traces and (if the runtime
    # shares lower().compile() results with the jit cache) skips the compile;
    # otherwise this exposes a second deserialize — informative either way
    t0 = time.perf_counter()
    est.register(K=reader.color_K, rgb=color, depth=depth, ob_mask=mask, iteration=5)
    t["first_register_after_precompile_s"] = time.perf_counter() - t0

    t0 = time.perf_counter()
    est.register(K=reader.color_K, rgb=color, depth=depth, ob_mask=mask, iteration=5)
    t["register_warm_s"] = time.perf_counter() - t0

    print(json.dumps({k: round(v, 3) for k, v in t.items()}, indent=1))
    return t


if __name__ == "__main__":
    main(sys.argv[1] if len(sys.argv) > 1 else None)
