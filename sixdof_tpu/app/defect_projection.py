"""Defect projection: 2-D heatmap -> rays -> 3-D mesh intersections + overlay.

Public API mirrors the reference `src/defect_projection.py` (ray_tracing :527,
create_heatmap_overlay :319, heatmap_to_points :165, compute_rays :196,
intersect_rays_with_mesh :225, create_intersection_pcd :268, plus the
depth-projection alternative path :359-460).  The hot ray-mesh intersection
runs as a batched Moller-Trumbore device kernel (ops/raytrace.py) instead of
Open3D's BVH RaycastingScene.
"""
from __future__ import annotations

import json
import logging
import os
from dataclasses import dataclass

import jax.numpy as jnp
import numpy as np
from scipy.spatial import cKDTree

from ..io.mesh_io import PointCloud, TriMesh
from ..ops import raytrace as rt
from ..utils.colormap import apply_jet, jet_colormap

MAX_DEFECT_RAYS = 8192  # static padding for thresholded heatmap pixels


@dataclass
class PinholeCameraIntrinsic:
    """Open3D PinholeCameraIntrinsic stand-in."""

    width: int
    height: int
    intrinsic_matrix: np.ndarray

    @classmethod
    def from_params(cls, width, height, fx, fy, cx, cy):
        K = np.array([[fx, 0, cx], [0, fy, cy], [0, 0, 1.0]])
        return cls(width, height, K)


def load_intrinsics(json_file_path):
    """configs/camera_intrinsics.json -> (color, depth) pinhole intrinsics
    (reference src/defect_projection.py:29-63)."""
    with open(json_file_path, "r") as f:
        intr = json.load(f)
    depth = PinholeCameraIntrinsic.from_params(
        intr["depth"]["width"], intr["depth"]["height"],
        intr["depth"]["fx"], intr["depth"]["fy"], intr["depth"]["cx"], intr["depth"]["cy"],
    )
    color = PinholeCameraIntrinsic.from_params(
        intr["color"]["width"], intr["color"]["height"],
        intr["color"]["fx"], intr["color"]["fy"], intr["color"]["cx"], intr["color"]["cy"],
    )
    return color, depth


def load_extrinsics(file_path):
    """configs/camera_extrinsics.json -> (color_to_depth, depth_to_color)
    4x4 transforms (reference src/defect_projection.py:65-92)."""
    json_file_path = f"{file_path}/configs/camera_extrinsics.json"
    with open(json_file_path, "r") as f:
        data = json.load(f)

    def build(key):
        tf = np.eye(4)
        tf[:3, :3] = np.array(data[key]["rotation_matrix"])
        tv = np.array(data[key]["translation_vector"]).reshape(-1)
        tf[:3, 3] = tv[:3]
        return tf

    return build("color_to_depth"), build("depth_to_color")


def generate_centered_heatmap(image_shape, max_intensity=1.0, sigma=50):
    """Gaussian blob heatmap (reference :137-155)."""
    import cv2

    heatmap = np.zeros(image_shape)
    cy, cx = image_shape[0] // 2, image_shape[1] // 2
    heatmap[cy, cx] = max_intensity
    heatmap = cv2.GaussianBlur(heatmap, (0, 0), sigma)
    return heatmap / np.max(heatmap)


def heatmap_to_points(heatmap, threshold=0.5):
    """Thresholded pixel list [(x, y, intensity), ...] (reference :165-179)."""
    y_coords, x_coords = np.where(heatmap > threshold)
    intensities = heatmap[y_coords, x_coords]
    return list(zip(x_coords, y_coords, intensities))


def compute_rays(points, intrinsic):
    """2-D points (+intensity) -> unit rays (reference :196-223)."""
    K = intrinsic.intrinsic_matrix
    fx, fy, cx, cy = K[0, 0], K[1, 1], K[0, 2], K[1, 2]
    pts = np.asarray(points, dtype=np.float64).reshape(-1, 3)
    rays = np.stack(
        [(pts[:, 0] - cx) / fx, (pts[:, 1] - cy) / fy, np.ones(len(pts))], axis=-1
    )
    rays /= np.linalg.norm(rays, axis=-1, keepdims=True)
    return rays, pts[:, 2].copy()


def intersect_rays_with_mesh(mesh: TriMesh, rays, origin, intensities):
    """Batched Moller-Trumbore first hits (reference :225-266).

    Returns (intersection_points (M,3), intersection_intensities (M,)).
    """
    tri, tri_mask = rt.mesh_to_tri_verts(mesh.vertices, mesh.faces)
    n = len(rays)
    origins = np.tile(np.asarray(origin, dtype=np.float32)[None], (n, 1))
    t = np.asarray(
        rt.ray_mesh_intersect(
            jnp.asarray(origins),
            jnp.asarray(rays, dtype=jnp.float32),
            jnp.ones(n, dtype=bool),
            jnp.asarray(tri),
            jnp.asarray(tri_mask),
        )
    )
    valid = np.isfinite(t)
    pts = origins[valid] + np.asarray(rays)[valid] * t[valid, None]
    return pts, np.asarray(intensities)[valid]


def create_intersection_pcd(intersections, intensities):
    """Jet-colored defect point cloud (reference :268-294)."""
    rng = np.max(intensities) - np.min(intensities)
    normalized = (intensities - np.min(intensities)) / (rng if rng > 0 else 1.0)
    colors = jet_colormap(normalized)
    return PointCloud(intersections, colors=colors)


def project_debug_rays(rays, origin):
    """Fallback 'rays' cloud when nothing intersects (reference :296-317
    returned a LineSet; we return the extended ray endpoints as a red cloud)."""
    logging.info("No intersections found.")
    pts = np.vstack([np.tile(origin, (len(rays), 1)), origin + rays * 1000])
    pcd = PointCloud(pts)
    pcd.paint_uniform_color([1, 0, 0])
    return pcd


def create_heatmap_overlay(color_image, heatmap, min_intensity=0.1, max_intensity=0.9):
    """JET overlay at 0.8/0.2 blending (reference :319-341)."""
    hm_min, hm_max = np.min(heatmap), np.max(heatmap)
    normalized = (heatmap - hm_min) / max(hm_max - hm_min, 1e-12)
    clipped = np.clip(normalized, min_intensity, max_intensity)
    clipped = (clipped - min_intensity) / (max_intensity - min_intensity)
    heatmap_rgb = apply_jet((clipped * 255).astype(np.uint8))
    img = np.asarray(color_image)
    if img.ndim == 2:
        img = np.repeat(img[..., None], 3, axis=-1)
    elif img.shape[2] == 4:
        img = img[..., :3]
    overlay = (img.astype(np.float64) * 0.8 + heatmap_rgb.astype(np.float64) * 0.2)
    return np.clip(overlay, 0, 255).astype(np.uint8)


def save_overlay(overlay, save_path="overlay_image.png"):
    import cv2

    directory = os.path.dirname(save_path)
    if directory and not os.path.exists(directory):
        os.makedirs(directory)
    cv2.imwrite(save_path, overlay)


# ------------------------------------------------------------------- mains --


def ray_tracing(data_dir, target_mesh, heatmap, color_intrinsics, heatmap_threshold=0.5):
    """Project heatmap defects onto the posed mesh (reference :527-563).

    The mesh arrives posed in the DEPTH frame; rays live in the COLOR frame,
    so the mesh is moved by inv(color_to_depth) before intersecting.
    Returns (intersection_pcd_or_debug_rays, transformed_mesh).
    """
    origin = np.array([0.0, 0.0, 0.0])
    color_to_depth_trans, _ = load_extrinsics(data_dir)

    target_mesh_copy = target_mesh.copy()
    target_mesh_copy.transform(np.linalg.inv(color_to_depth_trans))
    points_with_intensity = heatmap_to_points(heatmap, heatmap_threshold)
    if len(points_with_intensity) == 0:
        return PointCloud(np.zeros((0, 3))), target_mesh_copy

    rays, intensities = compute_rays(points_with_intensity, color_intrinsics)
    intersections, intersection_intensities = intersect_rays_with_mesh(
        target_mesh_copy, rays, origin, intensities
    )

    if len(intersections) > 0:
        return create_intersection_pcd(intersections, intersection_intensities), target_mesh_copy
    return project_debug_rays(rays, origin), target_mesh_copy


# ----------------------------------------------- depth-projection alt path --


def heatmap_to_point3d(heatmap, depth_image, intrinsic, threshold=0.1):
    """Back-project thresholded heatmap pixels through the depth image
    (vectorized version of reference :359-395)."""
    H, W = heatmap.shape
    dh, dw = depth_image.shape
    h = min(H, dh)
    w = min(W, dw)
    hm = heatmap[:h, :w] / np.max(heatmap)
    dp = depth_image[:h, :w]
    ys, xs = np.where((hm > threshold) & (dp > 0))
    K = intrinsic.intrinsic_matrix
    depth = dp[ys, xs].astype(np.float64)
    x3d = (xs - K[0, 2]) * depth / K[0, 0]
    y3d = (ys - K[1, 2]) * depth / K[1, 1]
    return np.stack([x3d, y3d, depth * 0.98, hm[ys, xs]], axis=-1)


def align_to_surface(defect_points, target_pcd: PointCloud, offset=0.1):
    """Snap defect points to the nearest target surface point + normal offset
    (reference :417-460)."""
    from ..ops.pointcloud import estimate_normals

    if target_pcd.normals is None:
        estimate_normals(target_pcd, radius=0.1, max_nn=30)
    tree = cKDTree(target_pcd.points)
    _, idx = tree.query(np.asarray(defect_points)[:, :3], k=1, workers=-1)
    aligned = target_pcd.points[idx]
    offsets = aligned + target_pcd.normals[idx] * offset
    return offsets, aligned


def calc_coordinates(depth_image, points, intrinsic):
    """2-D clicks + depth -> 3-D coords (reference :462-493)."""
    K = intrinsic.intrinsic_matrix
    out = []
    for x, y in points:
        depth = depth_image[y, x]
        if depth == 0:
            logging.info(f"Depth is zero at coordinates x = {x}, y = {y}. Skipping this point.")
            continue
        out.append([(x - K[0, 2]) * depth / K[0, 0], (y - K[1, 2]) * depth / K[1, 1], depth])
    return np.array(out, dtype=np.float64)


def depth_projection_heatmap(depth_image, intrinsic, target, defects):
    """(reference :613-630)"""
    point3d = heatmap_to_point3d(defects, depth_image, intrinsic)
    offset_points, aligned_points = align_to_surface(point3d, target, offset=0.5)
    return offset_points, aligned_points, point3d


# ------------------------------------------------ point-click defect paths --
# Headless-safe equivalents of the reference's interactive tools
# (src/defect_projection.py:94-135 choose_points, :188-194 create_mesh,
#  :565-611 ray_tracing_points, :632-649 depth_projection_points,
#  :495-525 visualize).


def choose_points(image, points=None):
    """Select defect pixels on an image (reference :94-135).

    @points: pre-selected [(x, y), ...] — the headless path (from a config,
    the web viewer, or a test).  When omitted, opens the reference's
    matplotlib click collector (left-click adds, ESC finishes), which needs a
    display; on a headless host pass @points instead.
    """
    if points is not None:
        return [tuple(int(v) for v in p) for p in points]
    import matplotlib

    if matplotlib.get_backend().lower() == "agg":
        raise RuntimeError(
            "choose_points: no display available — pass points=[(x, y), ...] "
            "(the headless path) instead of interactive selection"
        )
    import matplotlib.pyplot as plt

    chosen = []
    fig, ax = plt.subplots()
    if image.ndim == 2 or (image.ndim == 3 and image.shape[2] == 1):
        ax.imshow(image, cmap="gray")
    else:
        ax.imshow(image)
    ax.set_title("Click to select points. Press ESC to finish.")

    def onclick(event):
        if event.button == 1 and event.xdata is not None and event.ydata is not None:
            chosen.append((int(event.xdata), int(event.ydata)))
            ax.plot(int(event.xdata), int(event.ydata), "ro")
            fig.canvas.draw()

    def onkey(event):
        if event.key == "escape":
            plt.close(fig)

    fig.canvas.mpl_connect("button_press_event", onclick)
    fig.canvas.mpl_connect("key_press_event", onkey)
    plt.show()
    return chosen


def create_mesh(pcd: PointCloud, resolution=64, iso=None):
    """Surface mesh from a point cloud (reference :188-194 uses Open3D
    Poisson).  Open3D-free stand-in: iso-surface of the unsigned distance
    field at ~1.5x the mean point spacing — a watertight 'crust' that rays
    intersect like the Poisson surface."""
    from scipy.spatial import cKDTree

    from ..io.mesh_io import TriMesh
    from ..ops.marching import marching_tetrahedra

    pts = np.asarray(pcd.points, dtype=np.float64)
    if len(pts) < 4:
        return TriMesh(np.zeros((0, 3)), np.zeros((0, 3), np.int64))
    lo = pts.min(axis=0)
    hi = pts.max(axis=0)
    pad = 0.05 * (hi - lo).max() + 1e-9
    lo, hi = lo - pad, hi + pad
    lin = [np.linspace(lo[k], hi[k], resolution) for k in range(3)]
    grid = np.stack(np.meshgrid(*lin, indexing="ij"), axis=-1).reshape(-1, 3)
    tree = cKDTree(pts)
    d, _ = tree.query(grid, k=1, workers=-1)
    if iso is None:
        # the crust must cover the sampling gaps: random (Poisson) surface
        # sampling leaves gaps ~2-2.5x the median nearest-neighbor distance,
        # and the band must span >1 grid voxel or marching misses it
        nn, _ = tree.query(pts, k=2, workers=-1)
        voxel = float((hi - lo).max()) / (resolution - 1)
        iso = max(2.5 * float(np.median(nn[:, 1])), 1.2 * voxel)
    field = (d - iso).reshape(resolution, resolution, resolution)
    verts, faces = marching_tetrahedra(field, 0.0)
    if len(verts) == 0:
        return TriMesh(np.zeros((0, 3)), np.zeros((0, 3), np.int64))
    verts = lo[None] + verts / (resolution - 1) * (hi - lo)[None]
    return TriMesh(verts, faces)


def ray_tracing_points(data_dir, target, intrinsic_parameters, image, points=None):
    """Point-click ray tracing against a reconstructed target surface
    (reference :565-611): mesh the target cloud, transform it into the color
    frame, cast rays through the selected pixels.

    Returns (intersection_pcd | debug_rays PointCloud, mesh TriMesh).
    """
    origin = np.zeros(3)
    color_to_depth_trans, _ = load_extrinsics(data_dir)

    mesh = create_mesh(target) if isinstance(target, PointCloud) else target.copy()
    mesh.vertices = (
        mesh.vertices @ np.linalg.inv(color_to_depth_trans)[:3, :3].T
        + np.linalg.inv(color_to_depth_trans)[:3, 3]
    )

    sel = choose_points(image, points=points)
    if not sel:
        return PointCloud(np.zeros((0, 3))), mesh
    pts = [(x, y, 1.0) for x, y in sel]
    rays, intensities = compute_rays(pts, intrinsic_parameters)
    hits, kept = intersect_rays_with_mesh(mesh, rays, origin, intensities)
    if len(hits) > 0:
        pcd = PointCloud(hits, colors=np.tile([[255.0, 0.0, 0.0]], (len(hits), 1)))
        return pcd, mesh
    logging.info("No intersections found.")
    return project_debug_rays(rays, origin), mesh


def depth_projection_points(depth_image, intrinsic, target, points=None):
    """Project selected depth-image pixels onto the target surface
    (reference :632-649).  Returns (offset_points, aligned_points, point3d).
    """
    sel = choose_points(depth_image, points=points)
    point3d = calc_coordinates(depth_image, sel, intrinsic)
    offset_points, aligned_points = align_to_surface(point3d, target, offset=0.5)
    return offset_points, aligned_points, point3d


def visualize(list_of_objects, out_path=None, data_queue=None):
    """Show meshes/point clouds (reference :495-525 opens an Open3D window).

    Headless equivalents, in priority order: push to the live web viewer's
    data queue (same payload as update_dash_data), or write a PLY snapshot of
    everything merged so any external viewer can open it.
    """
    from ..io.mesh_io import TriMesh, save_point_cloud

    pcds = [o for o in list_of_objects if isinstance(o, PointCloud)]
    meshes = [o for o in list_of_objects if isinstance(o, TriMesh)]
    if data_queue is not None:
        from .web_vis import update_dash_data

        update_dash_data(pcds, meshes[0] if meshes else None)
        return
    def as01(c):
        # normalize every source to [0,1] BEFORE merging: mixing 0-255 fills
        # with [0,1] defect colors would defeat save_ply's max()<=1 rescale
        # heuristic and write the defect colors as near-black uint8 0/1
        c = np.asarray(c, dtype=np.float64)
        return c / 255.0 if c.size and c.max() > 1.0 else c

    all_pts, all_cols = [], []
    for p in pcds:
        all_pts.append(np.asarray(p.points))
        all_cols.append(as01(p.colors) if p.colors is not None
                        else np.full((len(p.points), 3), 200.0 / 255.0))
    for m in meshes:
        all_pts.append(np.asarray(m.vertices))
        all_cols.append(as01(m.vertex_colors) if m.vertex_colors is not None
                        else np.full((len(m.vertices), 3), 120.0 / 255.0))
    if not all_pts:
        return
    out_path = out_path or "debug/visualize_snapshot.ply"
    import os

    os.makedirs(os.path.dirname(out_path) or ".", exist_ok=True)
    save_point_cloud(out_path, PointCloud(np.concatenate(all_pts),
                                          colors=np.concatenate(all_cols)))
    logging.info(f"visualize: wrote {out_path}")
