"""One-process candidate-weights evaluation (parity + flips + rank0).

The axon link stalls minutes on the FIRST transfers of every fresh process
when churned (r3 notes; measured 1016 s on 2026-08-20), so candidate
evaluation — 5 hybrid parity scenes, 2 network-mode flip checks, and the
clutter register-ranking probe — runs in ONE process here instead of 8
tool invocations.  All scenes share frame shapes, so the jit cache makes
scene 2..N nearly compile-free.

Usage: python tools/eval_candidate.py [weights_dir] [scenes...]
Writes JSON to <weights_dir>/EVAL.json and prints it.
"""
from __future__ import annotations

import json
import os
import sys

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def rank0_probe(scene_dir, wdir):
    """Refine the full rotation grid and report where the scorer's pick sits
    (eval_register.py's ranking section, importable form).  Returns rank0
    rot/ADD-S and the grid's best achievable numbers."""
    import jax.numpy as jnp

    from sixdof_tpu.estimater import FoundationPose
    from sixdof_tpu.io.mesh_io import load_mesh
    from sixdof_tpu.io.readers import DataReader
    from sixdof_tpu.metrics import adds_err, rotation_angle_deg
    from sixdof_tpu.models.predict import (
        PoseRefinePredictor, ScorePredictor, refine_poses_jit,
    )
    from sixdof_tpu.ops.depth_filter import preprocess_depth
    from sixdof_tpu.ops.geometry import depth2xyzmap

    class Args:
        debug = 0
        box = None
        mesh = None
        voxel_size = None

    reader = DataReader(base_dir=scene_dir, shorter_side=None, zfar=np.inf,
                        arguments=Args())
    mesh = load_mesh(f"{scene_dir}/mesh/model_scaled_down.obj")
    ref = PoseRefinePredictor(ckpt_dir=os.path.join(REPO, wdir, "refiner"))
    sc = ScorePredictor(ckpt_dir=os.path.join(REPO, wdir, "scorer"))
    est = FoundationPose(model_pts=mesh.vertices, model_normals=mesh.vertex_normals,
                         mesh=mesh, refiner=ref, scorer=sc)
    model_pts = np.asarray(est.pts)
    # Candidate's OCC_SUB marker — False | True | float gate ceiling.  Pass
    # verbatim: coercing to bool would probe a float-ceiling checkpoint at
    # the legacy 0.6 gate (train/inference mismatch) and EVAL.json would
    # lose the ceiling the accept/reject decision depends on.
    occ_sub = ref.cfg.get("occ_sub", False)

    color = reader.get_color(0)
    depth = reader.get_depth(0)
    gt = reader.get_gt_pose(0)
    pose_c_gt = gt @ np.linalg.inv(est.get_tf_to_centered_mesh())

    depth_f = preprocess_depth(jnp.asarray(depth, dtype=jnp.float32))
    xyz_map = depth2xyzmap(depth_f, jnp.asarray(reader.color_K, dtype=jnp.float32))
    rgb01 = jnp.asarray(color, dtype=jnp.float32) / 255.0
    K = jnp.asarray(reader.color_K, dtype=jnp.float32)

    mask = reader.get_mask(color, 0).astype(bool)
    center = est.guess_translation(depth=np.asarray(depth_f), mask=mask,
                                   K=reader.color_K)
    poses0 = est.rot_grid.copy()
    poses0[:, :3, 3] = center
    refined = np.asarray(refine_poses_jit(
        ref.model, ref.params, est.mesh_tensors,
        jnp.asarray(poses0, dtype=jnp.float32), rgb01, xyz_map, K,
        float(est.diameter), 1.2, 0.02, 0.3490658503988659, iterations=5,
        occ_sub=occ_sub))
    adds = np.array([adds_err(p, pose_c_gt, model_pts) for p in refined])
    rots = np.array([rotation_angle_deg(p[:3, :3], pose_c_gt[:3, :3]) for p in refined])
    scores, _ = sc.predict(mesh=est.mesh, rgb=color, depth=depth_f, K=reader.color_K,
                           ob_in_cams=refined, mesh_tensors=est.mesh_tensors,
                           mesh_diameter=est.diameter)
    order = np.argsort(-np.asarray(scores))
    i0 = int(order[0])
    return {
        "occ_sub": occ_sub,
        "rank0_rot_deg": float(rots[i0]),
        "rank0_adds_mm": float(adds[i0] * 1000),
        "grid_best_rot_deg": float(rots.min()),
        "grid_best_adds_mm": float(adds.min() * 1000),
        "true_best_rank": int(list(order).index(int(adds.argmin()))),
        "n_rot_lt10": int((rots < 10).sum()),
    }


def main(wdir="weights_cand_r4", scenes=None):
    os.environ["WEIGHTS_DIR"] = wdir
    import parity_check as pc

    scenes = scenes or ["synth_box", "synth_clutter", "synth_box_sensor",
                        "synth_clutter_sensor", "synth_occl"]
    results = {"weights_dir": wdir}
    for name in scenes:
        d = os.path.join(REPO, "demo_data", name)
        if not os.path.exists(d):
            continue
        print(f"== {name} (hybrid) ==", flush=True)
        results[name] = pc.main(d)
        results[name]["floor_breaches"] = pc.check_thresholds(name, results[name])

    # network-only scorer mode: the reference-faithful path; the flip test
    # is rot_err on frame 0 (a 180-deg flip reads as ~180)
    os.environ["SCORE_MODE"] = "network"
    for name in ("synth_box", "synth_clutter"):
        d = os.path.join(REPO, "demo_data", name)
        if not os.path.exists(d):
            continue
        print(f"== {name} (network) ==", flush=True)
        results[f"{name}_network"] = pc.main(d)
    del os.environ["SCORE_MODE"]

    print("== clutter rank0 probe ==", flush=True)
    results["clutter_rank0"] = rank0_probe(
        os.path.join(REPO, "demo_data", "synth_clutter"), wdir)
    print(json.dumps(results["clutter_rank0"], indent=1))

    out_path = os.path.join(REPO, wdir, "EVAL.json")
    with open(out_path, "w") as f:
        json.dump(results, f, indent=1)
    print(f"wrote {out_path}")
    return results


if __name__ == "__main__":
    wdir = sys.argv[1] if len(sys.argv) > 1 else "weights_cand_r4"
    main(wdir, sys.argv[2:] or None)
