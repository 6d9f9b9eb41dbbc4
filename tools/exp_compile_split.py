"""Experiment: can the fused register cascade's cold compile be cut by
compiling its stages as separate programs in parallel threads?

Times, with the persistent cache OFF (true cold compiles):
  1. each stage program sequentially:
       refine@coarse (full grid), score@coarse, refine@fine (pruned),
       score@fine
  2. the same four shapes (n offset by 1 to defeat the in-process cache)
     compiled in four concurrent threads — the wall-clock tells us whether
     the backend compiles concurrently.

If max(parallel) << sum(sequential), a staged-cold-start path is worth
building (VERDICT r2 item 4: first-ever compile <= 2 min).

Usage: python tools/exp_compile_split.py   (real TPU; ~10-15 min)
"""
from __future__ import annotations

import json
import os
import sys
import threading
import time

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def main():
    import logging

    logging.disable(logging.INFO)
    import jax
    import jax.numpy as jnp

    from sixdof_tpu.io.mesh_io import load_mesh
    from sixdof_tpu.models.predict import (
        PoseRefinePredictor, ScorePredictor, refine_poses_jit, score_poses_jit,
    )
    from sixdof_tpu.ops.rasterize import make_mesh_arrays

    scene = os.path.join(REPO, "demo_data", "synth_box")
    mesh = load_mesh(f"{scene}/mesh/model_scaled_down.obj")
    arrays = make_mesh_arrays(mesh)
    ref = PoseRefinePredictor(ckpt_dir=os.path.join(REPO, "weights", "refiner"))
    sc = ScorePredictor(ckpt_dir=os.path.join(REPO, "weights", "scorer"))

    H, W = 288, 384
    sd = jax.ShapeDtypeStruct
    f32 = jnp.float32
    diam, cr, tn, rn = 0.0973, 1.2, 0.02, 0.3490658503988659

    def stage_lowered(n, hw, iters, kind):
        if kind == "refine":
            return refine_poses_jit.lower(
                ref.model, ref.params, arrays, sd((n, 4, 4), f32), sd((H, W, 3), f32),
                sd((H, W, 3), f32), sd((3, 3), f32), diam, cr, tn, rn,
                iters, hw, False, "tracknet", "axis_angle", True)
        return score_poses_jit.lower(
            sc.model, sc.params, arrays, sd((n, 4, 4), f32), sd((H, W, 3), f32),
            sd((H, W, 3), f32), sd((3, 3), f32), diam, cr,
            hw, False, "hybrid", True)

    stages = [
        ("refine_coarse", dict(n=252, hw=(96, 96), iters=2, kind="refine")),
        ("score_coarse", dict(n=252, hw=(96, 96), iters=0, kind="score")),
        ("refine_fine", dict(n=64, hw=(160, 160), iters=3, kind="refine")),
        ("score_fine", dict(n=64, hw=(160, 160), iters=0, kind="score")),
    ]

    out = {"sequential": {}, "parallel": {}}
    for name, cfg in stages:
        t0 = time.perf_counter()
        stage_lowered(**cfg).compile()
        out["sequential"][name] = round(time.perf_counter() - t0, 1)
        print(f"seq {name}: {out['sequential'][name]}s", flush=True)

    # parallel trial on fresh keys (n-1 defeats the in-process cache)
    lowereds = []
    for name, cfg in stages:
        cfg = dict(cfg)
        cfg["n"] -= 1
        lowereds.append((name, stage_lowered(**cfg)))

    def compile_one(item, res):
        name, low = item
        t0 = time.perf_counter()
        low.compile()
        res[name] = round(time.perf_counter() - t0, 1)

    res = {}
    threads = [threading.Thread(target=compile_one, args=(it, res)) for it in lowereds]
    t0 = time.perf_counter()
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    out["parallel"] = res
    out["parallel_wall_s"] = round(time.perf_counter() - t0, 1)
    out["sequential_sum_s"] = round(sum(out["sequential"].values()), 1)
    print(json.dumps(out, indent=1))
    return out


if __name__ == "__main__":
    main()
