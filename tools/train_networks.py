"""Train the refiner + scorer for a scene's object and save checkpoints.

The reference downloads its network weights (README.md:34); they are not
bundled, so this tool fits both render-and-compare networks to the scene's
CAD model with on-device synthetic pair generation (parallel/train.py) and
writes orbax checkpoints under weights/{refiner,scorer} — the paths bench.py
and run.py auto-load.

Usage: python tools/train_networks.py [scene_dir] [refiner_steps] [scorer_steps]
"""
from __future__ import annotations

import json
import logging
import os
import sys
import time

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def main(scene_dir, refiner_steps=800, scorer_steps=400, out_dir=None):
    from sixdof_tpu.io.mesh_io import load_mesh
    from sixdof_tpu.models.networks import RefineNet, ScoreNetMultiPair
    from sixdof_tpu.ops.geometry import compute_mesh_diameter
    from sixdof_tpu.ops.rasterize import make_mesh_arrays
    from sixdof_tpu.parallel.train import (
        RefinerTrainer, ScorerTrainer, TrainConfig, save_params,
    )
    from sixdof_tpu.utils import set_logging_format

    set_logging_format()
    out_dir = out_dir or os.path.join(REPO, "weights")
    os.makedirs(out_dir, exist_ok=True)

    mesh = load_mesh(os.path.join(scene_dir, "mesh", "model_scaled_down.obj"))
    # train on the CENTERED mesh — estimater.reset_object centers it and all
    # inference renders use the centered geometry
    center = (mesh.vertices.min(axis=0) + mesh.vertices.max(axis=0)) / 2
    mesh.vertices = mesh.vertices - center
    arrays = make_mesh_arrays(mesh)
    diameter = compute_mesh_diameter(mesh.vertices, n_sample=10000)

    with open(os.path.join(scene_dir, "configs", "camera_intrinsics.json")) as f:
        intr = json.load(f)["color"]
    K = np.array([[intr["fx"], 0, intr["cx"]], [0, intr["fy"], intr["cy"]], [0, 0, 1]])

    cfg = TrainConfig(batch_size=32, input_hw=(160, 160), lr=1e-4,
                      z_range=(0.4, 0.8))

    logging.info(f"training refiner for {refiner_steps} steps (diameter {diameter:.3f})")
    rt = RefinerTrainer(RefineNet(c_in=6), arrays, K, diameter, cfg)
    t0 = time.time()
    losses = rt.train(refiner_steps, log_every=50)
    logging.info(f"refiner: {losses[0]:.4f} -> {losses[-1]:.4f} "
                 f"({(time.time()-t0)/max(len(losses),1):.2f}s/step)")
    save_params(os.path.join(out_dir, "refiner"), rt.params)

    logging.info(f"training scorer for {scorer_steps} steps")
    scfg = cfg._replace(n_hypotheses=12, lr=3e-4)
    st = ScorerTrainer(ScoreNetMultiPair(c_in=6), arrays, K, diameter, scfg)
    t0 = time.time()
    losses = st.train(scorer_steps, log_every=50)
    logging.info(f"scorer: {losses[0]:.4f} -> {losses[-1]:.4f} "
                 f"({(time.time()-t0)/max(len(losses),1):.2f}s/step)")
    save_params(os.path.join(out_dir, "scorer"), st.params)
    logging.info(f"checkpoints saved under {out_dir}")


if __name__ == "__main__":
    scene = sys.argv[1] if len(sys.argv) > 1 else os.path.join(REPO, "demo_data", "synth_box")
    rs = int(sys.argv[2]) if len(sys.argv) > 2 else 800
    ss = int(sys.argv[3]) if len(sys.argv) > 3 else 400
    main(scene, rs, ss)
