"""Finish a field campaign from its checkpoint: extract mesh + metrics.

If a campaign dies after training (timeout, extraction failure), the
checkpoint saved by run_neural_object_field(ckpt_dir=...) still holds the
fitted field; this tool rebuilds the runner, loads it, and runs the
extraction + chamfer + texture-bake tail of tools/run_object_field.py
without re-training.

Usage: python tools/extract_field_mesh.py [scene_dir] [out_mesh.obj]
"""
from __future__ import annotations

import glob
import json
import os
import sys

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def main(scene_dir, out_mesh=None, resolution=128):
    import cv2

    from sixdof_tpu.io.mesh_io import save_mesh
    from sixdof_tpu.io.readers import DataReader
    from sixdof_tpu.models.object_field import ObjectFieldConfig, ObjectFieldRunner
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

    rgbs, depths, masks, cam_in_obs = [], [], [], []
    mask0 = reader.get_mask(reader.get_color(0), 0)
    for i in range(min(len(reader), len(pose_files))):
        color = reader.get_color(i)
        depth = reader.get_depth(i)
        cam_in_obs.append(np.linalg.inv(np.loadtxt(pose_files[i]).reshape(4, 4)))
        rgbs.append(color)
        depths.append(depth)
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

    ckpt = f"{scene_dir}/field_ckpt"
    runner = ObjectFieldRunner(ObjectFieldConfig(), np.asarray(reader.color_K),
                               np.stack(rgbs), np.stack(depths), np.stack(masks),
                               np.stack(cam_in_obs))
    runner.load_weights(ckpt)
    print(f"restored step {runner.global_step}")

    mesh = runner.extract_mesh(resolution=resolution)
    mesh = runner.color_mesh(mesh)
    mesh = runner.mesh_to_real_world(mesh)
    out_mesh = out_mesh or f"{scene_dir}/mesh/model_free.obj"
    save_mesh(out_mesh, mesh)

    result = {"scene": os.path.basename(scene_dir.rstrip("/")),
              "steps": int(runner.global_step), "mesh": out_mesh,
              "n_vertices": int(len(mesh.vertices)), "resumed_from_ckpt": True}
    gt_path = f"{scene_dir}/mesh/model_scaled_down.obj"
    if os.path.exists(gt_path):
        from sixdof_tpu.io.mesh_io import load_mesh
        from sixdof_tpu.metrics import chamfer_distance
        from sixdof_tpu.ops.geometry import compute_mesh_diameter

        gt = load_mesh(gt_path)
        cd = chamfer_distance(mesh, gt, n_sample=8000)
        diam = compute_mesh_diameter(gt.vertices, n_sample=5000)
        vox = max(diam / 20.0, 0.003)
        result.update(chamfer_m=float(cd), gt_diameter_m=float(diam),
                      vox_size_m=float(vox), chamfer_ok=bool(cd <= 2.0 * vox))
    try:
        mesh_norm = mesh.copy()
        mesh_norm.vertices = (mesh.vertices
                              + np.asarray(runner.translation).reshape(1, 3)) \
            * runner.sc_factor
        textured = runner.mesh_to_real_world(runner.bake_texture(mesh_norm))
        tex_path = out_mesh.replace(".obj", "_textured.obj")
        save_mesh(tex_path, textured)
        result["textured_mesh"] = tex_path
    except Exception as e:
        result["texture_error"] = str(e)
    with open(f"{ckpt}/campaign.json", "w") as f:
        json.dump(result, f, indent=1)
    print(json.dumps(result, indent=1))


if __name__ == "__main__":
    scene = sys.argv[1] if len(sys.argv) > 1 else os.path.join(REPO, "demo_data", "synth_box_recon")
    out = sys.argv[2] if len(sys.argv) > 2 else None
    main(scene, out)
