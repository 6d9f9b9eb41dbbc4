"""Model-free mesh creation driver (reference bundlesdf/run_nerf.py:18-102).

Fits the neural object field to a recorded scene's masked RGB-D frames using
the tracked poses (annotated_poses/ or debug/ob_in_cam logs), extracts a
colored mesh, and writes it where the pose pipeline expects a CAD model —
closing the model-free loop: track -> reconstruct -> use as target mesh.

Usage: python tools/run_object_field.py [scene_dir] [out_mesh.obj] [steps]
"""
from __future__ import annotations

import glob
import os
import sys

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def main(scene_dir, out_mesh=None, steps=1000, resolution=128):
    if os.environ.get("FIELD_CPU"):  # CPU smoke runs while the TPU is busy
        from sixdof_tpu.utils import force_cpu

        force_cpu()
    import cv2

    from sixdof_tpu.models.object_field import (
        HashGridSpec, ObjectFieldConfig, run_neural_object_field,
    )
    from sixdof_tpu.io.mesh_io import save_mesh
    from sixdof_tpu.io.readers import DataReader
    from sixdof_tpu.utils import enable_compile_cache, set_logging_format

    set_logging_format()
    enable_compile_cache()

    class Args:
        debug = 0
        box = None
        mesh = None
        voxel_size = None

    reader = DataReader(base_dir=scene_dir, shorter_side=None, zfar=np.inf, arguments=Args())

    pose_files = sorted(glob.glob(f"{scene_dir}/annotated_poses/*.txt"))
    if not pose_files:
        pose_files = sorted(glob.glob(f"{REPO}/debug/ob_in_cam/*.txt"))
    if not pose_files:
        raise RuntimeError("no poses found (annotated_poses/ or debug/ob_in_cam/)")

    rgbs, depths, masks, cam_in_obs = [], [], [], []
    mask0 = reader.get_mask(reader.get_color(0), 0)
    for i in range(min(len(reader), len(pose_files))):
        color = reader.get_color(i)
        depth = reader.get_depth(i)
        ob_in_cam = np.loadtxt(pose_files[i]).reshape(4, 4)
        cam_in_obs.append(np.linalg.inv(ob_in_cam))
        rgbs.append(color)
        depths.append(depth)
        # per-frame masks when the scene ships them (YCBInEOAT contract,
        # datareader.py:639-646); else frame-0 mask / object-depth band
        mask_path = f"{scene_dir}/masks/{i:04d}.png"
        if i == 0:
            masks.append((mask0 > 0).astype(np.uint8))
        elif os.path.exists(mask_path):
            m = cv2.imread(mask_path, -1)
            if m.ndim == 3:
                m = m[..., 0]
            masks.append((m > 0).astype(np.uint8))
        else:
            m = (depth > 0.001) & (np.abs(depth - np.median(depth[mask0 > 0])) < 0.2)
            masks.append(m.astype(np.uint8))

    cfg = ObjectFieldConfig(n_step=steps)
    # FIELD_LOG2 overrides the hash-table size (r5 ablation: 19 -> 52 MB
    # table + ~25% faster step; chamfer gate below arbitrates quality)
    spec = HashGridSpec(log2_hashmap_size=int(os.environ["FIELD_LOG2"])) \
        if os.environ.get("FIELD_LOG2") else HashGridSpec()
    mesh, runner = run_neural_object_field(
        cfg, np.asarray(reader.color_K), np.stack(rgbs), np.stack(depths),
        np.stack(masks), np.stack(cam_in_obs), resolution=resolution,
        train_steps=steps, ckpt_dir=f"{scene_dir}/field_ckpt", spec=spec,
    )
    out_mesh = out_mesh or f"{scene_dir}/mesh/model_free.obj"
    save_mesh(out_mesh, mesh)

    # campaign metrics (VERDICT r2 item 6): chamfer vs the scene's GT CAD
    # model when one exists (done = chamfer <= 2x the pose engine's voxel
    # size), plus a textured-OBJ artifact from the fitted field
    import json

    result = {"scene": os.path.basename(scene_dir.rstrip("/")), "steps": steps,
              "resumed_from_ckpt": False,  # single-session run (this tool
              # trains from scratch; tools/extract_field_mesh.py is the
              # checkpoint-recovery path and stamps True)
              "log2_hashmap_size": int(spec.log2_hashmap_size),
              "mesh": out_mesh, "n_vertices": int(len(mesh.vertices)),
              "train_s": round(getattr(runner, "train_seconds", -1.0), 1),
              "step_s": round(getattr(runner, "train_seconds", -1.0) / max(steps, 1), 3),
              "final_loss": round(getattr(runner, "final_loss", -1.0), 4),
              "n_rand": int(cfg.n_rand),
              "n_samples": int(cfg.n_samples + cfg.n_samples_around_depth)}
    gt_path = f"{scene_dir}/mesh/model_scaled_down.obj"
    if os.path.exists(gt_path):
        from sixdof_tpu.io.mesh_io import load_mesh
        from sixdof_tpu.metrics import chamfer_distance
        from sixdof_tpu.ops.geometry import compute_mesh_diameter

        gt = load_mesh(gt_path)
        cd = chamfer_distance(mesh, gt, n_sample=8000)
        diam = compute_mesh_diameter(gt.vertices, n_sample=5000)
        vox = max(diam / 20.0, 0.003)  # estimater.reset_object's voxel size
        result.update(chamfer_m=float(cd), gt_diameter_m=float(diam),
                      vox_size_m=float(vox), chamfer_ok=bool(cd <= 2.0 * vox))
    try:
        # bake in the field's NORMALIZED frame (bake before mesh_to_real_world
        # — object_field.py:604), then convert the baked copy to real world
        mesh_norm = mesh.copy()
        mesh_norm.vertices = (mesh.vertices
                              + np.asarray(runner.translation).reshape(1, 3)) \
            * runner.sc_factor
        textured = runner.mesh_to_real_world(runner.bake_texture(mesh_norm))
        tex_path = out_mesh.replace(".obj", "_textured.obj")
        save_mesh(tex_path, textured)
        result["textured_mesh"] = tex_path
    except Exception as e:  # texture bake is an artifact, not a gate
        result["texture_error"] = str(e)
    with open(f"{scene_dir}/field_ckpt/campaign.json", "w") as f:
        json.dump(result, f, indent=1)
    print(json.dumps(result, indent=1))
    return out_mesh


if __name__ == "__main__":
    scene = sys.argv[1] if len(sys.argv) > 1 else os.path.join(REPO, "demo_data", "synth_box")
    out = sys.argv[2] if len(sys.argv) > 2 else None
    steps = int(sys.argv[3]) if len(sys.argv) > 3 else 1000
    main(scene, out, steps)


def run_batch(root_dir, pattern="*", steps=1000):
    """Directory-walking batch driver (reference run_nerf.py:77-102 ran YCBV /
    LINEMOD object lists); fits a field per scene folder under root_dir."""
    import glob as _glob

    scenes = sorted(d for d in _glob.glob(os.path.join(root_dir, pattern)) if os.path.isdir(d))
    outputs = []
    for scene in scenes:
        try:
            outputs.append(main(scene, steps=steps))
        except Exception as e:  # keep the campaign going like the reference drivers
            print(f"scene {scene} failed: {e}")
    return outputs
