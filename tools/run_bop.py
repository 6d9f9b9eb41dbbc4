"""BOP-dataset evaluation campaign: FoundationPose over a BOP scene.

The reference repo handles YCB-V-style data through ad-hoc reader helpers
(datareader.py:575-581, :773-792) but ships no evaluation driver; this is the
standard campaign: for each frame, estimate the pose (register on the first /
on mask-available frames, track in between), score ADD / ADD-S against
scene_gt.json, and report AUC + recall like the BOP/YCB-V protocol.

Usage:
  python tools/run_bop.py <scene_dir> [--ob_id K] [--frames N]
      [--register_every M]   (M=0: register frame 0 only, track the rest)
      [--weights DIR]
Prints one JSON line.
"""
from __future__ import annotations

import argparse
import json
import os
import sys

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def main(scene_dir, ob_id=None, frames=None, register_every=0, weights="weights",
         shorter_side=None, prune_to=64, max_hypotheses=None):
    import logging

    logging.disable(logging.INFO)
    import jax

    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_compile_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from sixdof_tpu.estimater import FoundationPose
    from sixdof_tpu.io.bop_reader import BopSceneReader
    from sixdof_tpu.io.mesh_io import decimate_mesh
    from sixdof_tpu.metrics import add_err, adds_err, compute_auc, rotation_angle_deg
    from sixdof_tpu.models.predict import PoseRefinePredictor, ScorePredictor

    reader = BopSceneReader(scene_dir, ob_id=ob_id, shorter_side=shorter_side)
    mesh = reader.get_gt_mesh()
    if len(mesh.faces) > 5000:
        mesh = decimate_mesh(mesh, target_tris=5000)
    sym = reader.get_symmetry_tfs()

    rckpt = os.path.join(REPO, weights, "refiner")
    sckpt = os.path.join(REPO, weights, "scorer")
    est = FoundationPose(
        model_pts=mesh.vertices, model_normals=mesh.vertex_normals, mesh=mesh,
        symmetry_tfs=sym,
        refiner=PoseRefinePredictor(ckpt_dir=rckpt if os.path.exists(rckpt) else None),
        scorer=ScorePredictor(ckpt_dir=sckpt if os.path.exists(sckpt) else None),
        prune_to=prune_to,
    )
    if max_hypotheses and len(est.rot_grid) > max_hypotheses:
        step = len(est.rot_grid) // max_hypotheses
        est.rot_grid = est.rot_grid[::step][:max_hypotheses]
    model_pts = np.asarray(est.pts) + est.model_center

    n = min(frames or len(reader), len(reader))
    adds, add, rot, trans, used_register = [], [], [], [], []
    pose = None
    for i in range(n):
        color = reader.get_color(i)
        depth = reader.get_depth(i)
        do_register = pose is None or (register_every and i % register_every == 0)
        if do_register:
            mask = reader.get_mask(i)
            if mask.sum() < 16:
                continue
            pose = est.register(K=reader.get_K(i), rgb=color, depth=depth,
                                ob_mask=mask, iteration=5)
        else:
            pose = est.track_one(rgb=color, depth=depth, K=reader.get_K(i), iteration=2)
        used_register.append(bool(do_register))
        gt = reader.get_gt_pose(i)
        if gt is None:
            continue
        adds.append(adds_err(pose, gt, model_pts))
        add.append(add_err(pose, gt, model_pts))
        rot.append(rotation_angle_deg(pose[:3, :3], gt[:3, :3]))
        trans.append(float(np.linalg.norm(pose[:3, 3] - gt[:3, 3])))

    diam = reader.get_model_diameter() or est.diameter
    out = {
        "scene": reader.get_video_name(),
        "obj_id": reader.ob_id,
        "frames": len(adds),
        "registered_frames": int(sum(used_register)),
        "adds_mean_m": float(np.mean(adds)) if adds else -1,
        "add_mean_m": float(np.mean(add)) if add else -1,
        "adds_auc_0.1d": compute_auc(adds, max_val=0.1 * diam) if adds else -1,
        "adds_recall_0.1d": float(np.mean(np.asarray(adds) < 0.1 * diam)) if adds else -1,
        "add_recall_0.1d": float(np.mean(np.asarray(add) < 0.1 * diam)) if add else -1,
        "rot_err_deg_mean": float(np.mean(rot)) if rot else -1,
        "t_err_m_mean": float(np.mean(trans)) if trans else -1,
        "diameter_m": float(diam),
    }
    print(json.dumps(out))
    return out


if __name__ == "__main__":
    ap = argparse.ArgumentParser()
    ap.add_argument("scene_dir")
    ap.add_argument("--ob_id", type=int, default=None)
    ap.add_argument("--frames", type=int, default=None)
    ap.add_argument("--register_every", type=int, default=0)
    ap.add_argument("--weights", type=str, default="weights")
    ap.add_argument("--shorter_side", type=int, default=None)
    ap.add_argument("--prune_to", type=int, default=64)
    a = ap.parse_args()
    main(a.scene_dir, a.ob_id, a.frames, a.register_every, a.weights,
         a.shorter_side, a.prune_to)
