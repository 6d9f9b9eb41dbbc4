"""Synthesize a demo scene honoring the reference's on-disk contract.

The reference repo's demo_data is not bundled, so tests/benches generate a
hermetic scene (SURVEY.md §2.4 layout): a textured-ish object mesh placed in a
box scene, RGB-D rendered with ops/rasterize.py, plus point clouds, masks,
heatmap, and configs.  Frames orbit the camera slightly so tracking has
motion.

Usage: python tools/make_demo_scene.py [out_dir] [n_frames]
"""
from __future__ import annotations

import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from sixdof_tpu.utils import force_cpu  # noqa: E402

force_cpu()  # full-frame scene renders are a one-off host-side fixture build

import jax.numpy as jnp  # noqa: E402

from sixdof_tpu.io.mesh_io import PointCloud, TriMesh, save_mesh, save_point_cloud  # noqa: E402
from sixdof_tpu.ops.lie import euler_matrix  # noqa: E402
from sixdof_tpu.ops.rasterize import make_mesh_arrays, render_batch  # noqa: E402


def make_object_mesh(seed=0):
    """Bumpy ellipsoid (meters; diameter ~0.09 m) with per-vertex colors."""
    from sixdof_tpu.ops.hypotheses import icosphere

    v, f = icosphere(subdivisions=3)
    rng = np.random.RandomState(seed)
    # pronounced asymmetric bumps: rotation must be visually identifiable
    dirs = rng.randn(6, 3)
    dirs /= np.linalg.norm(dirs, axis=1, keepdims=True)
    amp = 0.22 * np.cos(3 * (v @ dirs.T) + rng.rand(6) * 6.28).sum(axis=1) / 6
    radii = np.array([0.048, 0.034, 0.027])
    verts = v * (1.0 + amp)[:, None] * radii[None]
    # high-frequency saturated texture (checker-ish octants + stripes): a
    # smooth gradient makes rotation nearly unobservable for render-and-compare
    checker = np.sign(np.sin(9.0 * v[:, 0]) * np.sin(7.0 * v[:, 1]) * np.sin(8.0 * v[:, 2]))
    stripes = np.sign(np.sin(14.0 * (v[:, 0] + 0.7 * v[:, 1])))
    r = 0.5 + 0.45 * checker
    g = 0.5 + 0.45 * stripes
    b = 0.5 + 0.5 * v[:, 2]
    colors = (np.stack([r, g, b], axis=-1) * 255).clip(0, 255)
    return TriMesh(verts, f, vertex_colors=colors)


def make_scene_plane(z=0.62, half=0.25, textured=False, seed=0):
    if not textured:
        v = np.array([[-half, -half, z], [half, -half, z], [half, half, z], [-half, half, z]])
        f = np.array([[0, 1, 2], [0, 2, 3]])
        colors = np.full((4, 3), 90.0)
        return TriMesh(v, f, vertex_colors=colors)
    # textured plane: a vertex grid with noise colors (harder for the
    # analytic color score and for mask-free registration)
    n = 24
    rng = np.random.RandomState(seed + 77)
    xs = np.linspace(-half, half, n)
    gx, gy = np.meshgrid(xs, xs)
    v = np.stack([gx.ravel(), gy.ravel(), np.full(n * n, z)], axis=-1)
    f = []
    for i in range(n - 1):
        for j in range(n - 1):
            a = i * n + j
            f.append([a, a + 1, a + n])
            f.append([a + 1, a + n + 1, a + n])
    base = 60 + 120 * rng.rand(n * n, 1)
    tint = rng.rand(n * n, 3) * 60
    colors = np.clip(base + tint, 0, 255)
    return TriMesh(v, np.array(f), vertex_colors=colors)


def make_target_part(seed=1):
    """Second demo object: an asymmetric 'machined part' — flattened bumpy
    ellipsoid body with a protruding lug, high-frequency texture.  Distinct
    shape family and texture from make_object_mesh (the training object), so
    cross-object evaluation is meaningful (VERDICT r1 item 4)."""
    from sixdof_tpu.ops.hypotheses import icosphere

    v, f = icosphere(subdivisions=3)
    rng = np.random.RandomState(seed)
    # body: strongly anisotropic, with a polar lug on +x
    lug = np.exp(-((v[:, 0] - 1.0) ** 2 + v[:, 1] ** 2 + v[:, 2] ** 2) / 0.18) * 0.75
    dirs = rng.randn(4, 3)
    dirs /= np.linalg.norm(dirs, axis=1, keepdims=True)
    bumps = 0.12 * np.cos(5 * (v @ dirs.T) + rng.rand(4) * 6.28).sum(axis=1) / 4
    radii = np.array([0.055, 0.030, 0.018])
    verts = v * (1.0 + bumps + lug)[:, None] * radii[None]
    rings = np.sign(np.sin(22.0 * v[:, 2] + 4.0 * np.arctan2(v[:, 1], v[:, 0])))
    patch = np.sign(np.sin(11.0 * v[:, 0]) * np.sin(9.0 * v[:, 1]))
    r = 0.55 + 0.40 * rings
    g = 0.45 + 0.35 * patch
    b = 0.35 + 0.30 * rings * patch
    colors = (np.stack([r, g, b], axis=-1) * 255).clip(0, 255)
    return TriMesh(verts, f, vertex_colors=colors)


def make_distractor(seed, radius=0.025):
    """Small textured blob used as clutter / occluder."""
    from sixdof_tpu.ops.hypotheses import icosphere

    v, f = icosphere(subdivisions=2)
    rng = np.random.RandomState(seed)
    amp = 0.25 * rng.randn(len(v), 3).mean(axis=1)
    verts = v * (1.0 + amp)[:, None] * radius
    colors = (rng.rand(1, 3) * 0.5 + 0.25) * 255 * np.ones((len(v), 1))
    return TriMesh(verts, f, vertex_colors=np.tile(colors.mean(axis=-1, keepdims=True), (1, 3))
                   + rng.rand(len(v), 3) * 60)


def merge(a: TriMesh, b: TriMesh) -> TriMesh:
    return TriMesh(
        np.concatenate([a.vertices, b.vertices]),
        np.concatenate([a.faces, b.faces + len(a.vertices)]),
        vertex_colors=np.concatenate([a.vertex_colors, b.vertex_colors]),
    )


def main(out_dir="demo_data/synth_box", n_frames=6, H=480, W=640, seed=0, variant="box",
         sensor=False, sensor_strength=1.0):
    """@variant: 'box' = the original single-object scene; 'clutter' = the
    harder second scene (different target object, textured plane, three
    distractor fixtures, one of them partially occluding the target).
    @sensor: apply the RGB-D sensor degradation model (tools/sensor_model.py)
    so the eval B-sides are NOT the pipeline's own clean renders: photometric
    shifts + blur + shot noise on RGB, edge dropout / flying pixels / holes /
    range-dependent noise on depth, segmenter-noise on the frame-0 mask, and
    a calibration error (rendered with true K', dataset reports nominal K)."""
    rng = np.random.RandomState(seed)
    os.makedirs(out_dir, exist_ok=True)
    for sub in ["rgb", "depth", "pcd", "masks", "mesh", "background", "heatmap", "configs",
                "annotated_poses"]:
        os.makedirs(f"{out_dir}/{sub}", exist_ok=True)

    K = np.array([[600.0, 0, W / 2], [0, 600.0, H / 2], [0, 0, 1]])
    # with the sensor model, the scene is rendered with the TRUE camera K_render
    # while the dataset reports the nominal K — a real rig's calibration error
    if sensor:
        from sensor_model import perturb_K

        K_render = perturb_K(K, rng, sensor_strength)
    else:
        K_render = K

    if variant in ("clutter", "occl"):
        obj = make_target_part(seed + 1)
        plane = make_scene_plane(textured=True, seed=seed)
        # static fixtures on the plane: two beside the target and ONE between
        # the camera and the target partially occluding it.  The 'occl'
        # variant grows + centers the front occluder so >=40% of the target's
        # projected pixels are hidden (VERDICT r2 item 5: the scorer/refiner
        # must survive heavy occlusion, predict_score.py:161-214).
        heavy = variant == "occl"
        front = (0.041, -0.010, 0.468) if heavy else (0.045, -0.012, 0.47)
        front_r = 0.036 if heavy else 0.028
        fixtures = []
        for k, (cx, cy, cz) in enumerate([(0.09, -0.05, 0.60), (-0.10, 0.06, 0.595),
                                          front]):
            d = make_distractor(seed + 10 + k, radius=front_r if k == 2 else 0.032)
            d.vertices = d.vertices + np.array([[cx, cy, cz]])
            fixtures.append(d)
        statics = plane
        for d in fixtures:
            statics = merge(statics, d)
    else:
        obj = make_object_mesh(seed)
        statics = make_scene_plane()

    # object pose in the color camera (meters)
    base_pose = euler_matrix(0.4, 0.2, 0.3)
    base_pose[:3, 3] = [0.01, -0.02, 0.55]

    # identity color<->depth extrinsics keep the synthetic scene simple
    extr = {
        "color_to_depth": {"rotation_matrix": np.eye(3).tolist(),
                           "translation_vector": [[0.0, 0.0, 0.0]]},
        "depth_to_color": {"rotation_matrix": np.eye(3).tolist(),
                           "translation_vector": [[0.0, 0.0, 0.0]]},
    }
    with open(f"{out_dir}/configs/camera_extrinsics.json", "w") as f:
        json.dump(extr, f, indent=2)
    intr = {
        "color": {"fx": K[0, 0], "fy": K[1, 1], "cx": K[0, 2], "cy": K[1, 2],
                  "width": W, "height": H},
        "depth": {"fx": K[0, 0], "fy": K[1, 1], "cx": K[0, 2], "cy": K[1, 2],
                  "width": W, "height": H},
    }
    with open(f"{out_dir}/configs/camera_intrinsics.json", "w") as f:
        json.dump(intr, f, indent=2)
    icp_params = {
        "debug_vis": False,
        "box": True,
        "mesh": False,
        "voxel_size": 2.0,
        "preprocess_target": {"max_pcd": 3000, "fpfh_radius": 20, "fpfh_max_nn": 60},
        "preprocess_source": {
            "down_sample": 4.0,
            "plane_removal": {"distance_threshold": 2.0, "num_iterations": 100},
            "fpfh_radius": 20,
            "fpfh_max_nn": 60,
        },
        "execute_global_registration": {
            "distance_threshold": 10.0,
            "correspondence_checkers": [{"value": 0.9}],
            "angle_threshold": 0.52,
            "ransac_criteria": {"iterations": 4000, "confidence": 0.999},
        },
        "refine_registration": {"distance_threshold": 5.0},
        "run_icp": {"fitness_threshold": 0.9, "rmse_threshold": 2.0, "n_restarts": 12, "max_iter": 15},
    }
    with open(f"{out_dir}/configs/icp_parameters.json", "w") as f:
        json.dump(icp_params, f, indent=2)

    # meshes: model.obj + model.ply in mm, model_scaled_down.obj in meters
    obj_mm = obj.copy()
    obj_mm.vertices = obj_mm.vertices * 1000.0
    save_mesh(f"{out_dir}/mesh/model.obj", obj_mm)
    save_mesh(f"{out_dir}/mesh/model_scaled_down.obj", obj)
    model_pcd = obj_mm.sample_points(20000, seed=1)
    save_point_cloud(f"{out_dir}/mesh/model.ply", model_pcd)

    # background: the empty-scene cloud in mm (depth frame) — plane plus any
    # static fixtures, exactly what a pre-capture of the scene without the
    # target would contain (reference background/box.ply contract)
    if variant == "clutter":
        bg_pcd = statics.sample_points(24000, seed=2)
        bg_pts = bg_pcd.points
    else:
        bg_pts = np.concatenate(
            [(rng.rand(20000, 2) - 0.5) * 0.5, np.full((20000, 1), 0.62)], axis=-1
        )
    if sensor:
        # the background pre-capture is itself a noisy sensor frame
        bg_pts = bg_pts + rng.randn(*np.shape(bg_pts)) * 0.0015
    save_point_cloud(f"{out_dir}/background/box.ply", PointCloud(bg_pts * 1000.0))

    # heatmap: gaussian blob, square array (contract: square, centered on color)
    hm_size = 480
    yy, xx = np.mgrid[0:hm_size, 0:hm_size]
    # project the object center into the heatmap frame: the heatmap is the
    # center square crop of the color image scaled to hm_size
    scale = hm_size / min(H, W)
    cx_full, cy_full = W / 2, H / 2
    uvw = K_render @ base_pose[:3, 3]
    u, v = uvw[0] / uvw[2], uvw[1] / uvw[2]
    u_hm = (u - (cx_full - min(H, W) / 2)) * scale
    v_hm = (v - (cy_full - min(H, W) / 2)) * scale
    heatmap = np.exp(-(((xx - u_hm) ** 2 + (yy - v_hm) ** 2) / (2 * 18.0**2)))
    np.save(f"{out_dir}/heatmap/0002.npy", heatmap.astype(np.float32))

    import cv2

    arrays_scene_obj = make_mesh_arrays(obj)
    arrays_plane = make_mesh_arrays(statics)

    if sensor:
        # sequence-level artifacts (eval-only families, sensor_model.py
        # docstring): auto-exposure drift + inter-frame motion blur
        from sensor_model import motion_blur_rgb, sequence_drift

        drift_gains = sequence_drift(n_frames, rng, sensor_strength)
    prev_uv = None
    poses = []
    for i in range(n_frames):
        if variant == "recon":
            # reconstruction track: the object spins a full revolution with a
            # tilt oscillation so every face (incl. poles) is observed — the
            # view-coverage a model-free fit needs (the reference's YCBInEOAT
            # videos rotate the object in-hand; bundlesdf/run_nerf.py fits
            # from such a track).  Rotating in the OBJECT frame keeps the
            # projected position fixed, so the target stays centered.
            spin = 2.0 * np.pi * i / n_frames
            tilt = 0.7 * np.sin(2.0 * np.pi * i / n_frames * 2.0)
            r_obj = euler_matrix(tilt, spin, 0.3 * np.sin(spin))
            pose = base_pose @ r_obj
            pose[:3, 3] = base_pose[:3, 3]
        else:
            # small camera orbit: perturb the object pose per frame
            delta = euler_matrix(0.015 * i, -0.01 * i, 0.02 * i)
            delta[:3, 3] = [0.002 * i, 0.001 * i, -0.003 * i]
            pose = delta @ base_pose
        poses.append(pose)

        rend_o = render_batch(arrays_scene_obj, jnp.asarray(pose[None], dtype=jnp.float32),
                              jnp.asarray(K_render, dtype=jnp.float32), None, out_hw=(H, W))
        rend_p = render_batch(arrays_plane, jnp.asarray(np.eye(4, dtype=np.float32)[None]),
                              jnp.asarray(K_render, dtype=jnp.float32), None, out_hw=(H, W))
        do = np.asarray(rend_o["depth"][0])
        dp = np.asarray(rend_p["depth"][0])
        co = np.asarray(rend_o["color"][0])
        cp = np.asarray(rend_p["color"][0])
        obj_front = (do > 0) & ((dp <= 0) | (do < dp))
        depth = np.where(obj_front, do, dp)
        color = np.where(obj_front[..., None], co, cp)
        if sensor:
            from sensor_model import degrade_depth, degrade_mask, degrade_rgb

            # optical chain order: motion blur (shutter), exposure drift
            # (gain), then per-frame noise/quantization
            uvw_i = K_render @ pose[:3, 3]
            uv_i = uvw_i[:2] / uvw_i[2]
            if prev_uv is not None:
                color = motion_blur_rgb(color, uv_i - prev_uv, sensor_strength)
            prev_uv = uv_i
            color = np.clip(color * drift_gains[i], 0.0, 1.0)
            depth = degrade_depth(depth, rng, sensor_strength)
            color = degrade_rgb(color, rng, sensor_strength)
        else:
            # light legacy noise (kept so the clean fixtures stay bit-stable)
            noise = rng.randn(H, W) * 0.0015
            depth = np.where(depth > 0, depth + noise, 0.0)
            color = np.clip(color + rng.randn(H, W, 3) * 0.01, 0, 1)

        cv2.imwrite(f"{out_dir}/rgb/rgb_{i:04d}.png", (color[..., ::-1] * 255).astype(np.uint8))
        cv2.imwrite(f"{out_dir}/depth/depth_{i:04d}.png", (depth * 1000).astype(np.uint16))
        if i == 0 or variant == "recon":
            # recon tracks ship per-frame masks (YCBInEOAT's masks/ contract,
            # datareader.py:639-646) — the field fit consumes them directly
            mask = (obj_front * 255).astype(np.uint8)
            if sensor:
                mask = degrade_mask(mask, rng, sensor_strength)
            cv2.imwrite(f"{out_dir}/masks/{i:04d}.png", mask)
        np.savetxt(f"{out_dir}/annotated_poses/{i:04d}.txt", pose.reshape(4, 4))

        # scene cloud in mm (depth frame)
        ys, xs = np.where(depth > 0)
        sel = rng.choice(len(ys), size=min(len(ys), 60000), replace=False)
        ys, xs = ys[sel], xs[sel]
        z = depth[ys, xs]
        px = (xs - K[0, 2]) * z / K[0, 0]
        py = (ys - K[1, 2]) * z / K[1, 1]
        cloud = np.stack([px, py, z], axis=-1) * 1000.0
        save_point_cloud(f"{out_dir}/pcd/cloud_{i:04d}.ply", PointCloud(cloud))

    print(f"wrote {n_frames} frames to {out_dir}")
    return out_dir


if __name__ == "__main__":
    out = sys.argv[1] if len(sys.argv) > 1 else "demo_data/synth_box"
    n = int(sys.argv[2]) if len(sys.argv) > 2 else 6
    if len(sys.argv) > 3:
        variant = sys.argv[3]
    elif "occl" in out:
        variant = "occl"
    elif "clutter" in out:
        variant = "clutter"
    elif "recon" in out:
        variant = "recon"
    else:
        variant = "box"
    sensor = "--sensor" in sys.argv or "sensor" in os.path.basename(out)
    if variant.endswith("_sensor"):
        variant = variant[: -len("_sensor")]
        sensor = True
    main(out, n, variant=variant, sensor=sensor)
