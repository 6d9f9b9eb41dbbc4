"""Classical pose refinement: preprocessing + z-search + parallel-restart ICP.

Public API mirrors the reference's `src/pose_estimation.py` (functions
`preprocess_target` :141, `preprocess_source` :187, `predict_z_axis_adjustment`
:624, `improve_result` :547, `refine_pose_with_icp` :749, `determine_pose`
:686) so callers of the reference can switch over 1:1.  Semantics differences,
both deliberate and TPU-motivated:

- the reference's <=50 *sequential* random-restart ICPs and its adaptive
  +-50mm z bisection become single batched device dispatches (`vmap` over
  candidates) — same search space, one kernel launch;
- the z adjustment is returned in the convention it is later APPLIED in
  (`tf[2,3] += z`); the reference tests with `-=` but applies with `+=`
  (src/pose_estimation.py:651 vs :789), which we do not reproduce;
- the initial transform is scored with a real evaluation rather than the
  hard-coded fitness=0.8/rmse=3.0 placeholder (reference :564-569).

Units: millimeters, matching the reference's ICP stage (run.py:95-96).
"""
from __future__ import annotations

import copy
import functools
import logging
from dataclasses import dataclass, field

import jax.numpy as jnp
import numpy as np

from ..io.mesh_io import PointCloud
from ..ops import icp as icp_ops
from ..ops import pointcloud as pc
from ..utils.logging_utils import timeit


@dataclass
class RegistrationResult:
    """Open3D RegistrationResult stand-in."""

    transformation: np.ndarray = field(default_factory=lambda: np.eye(4))
    fitness: float = 0.0
    inlier_rmse: float = 0.0


def _bucket(n, minimum=1024, maximum=1 << 20):
    size = minimum
    while size < n and size < maximum:
        size *= 2
    return size


def _pad_cloud(points, bucket=None):
    n = len(points)
    b = bucket or _bucket(n)
    pts = np.zeros((b, 3), dtype=np.float32)
    pts[:n] = points[:b]
    mask = np.zeros(b, dtype=bool)
    mask[: min(n, b)] = True
    return jnp.asarray(pts), jnp.asarray(mask)


def _pad_normals(normals, bucket):
    out = np.zeros((bucket, 3), dtype=np.float32)
    out[: len(normals)] = normals[:bucket]
    return jnp.asarray(out)


# ------------------------------------------------------------ preprocessing --


@timeit
def preprocess_target(pcd: PointCloud, param):
    """Cap target to max_pcd points + normals (+FPFH for global registration).

    Mirrors reference src/pose_estimation.py:141-183.
    """
    params = param["preprocess_target"]
    target_processed = pc.random_down_sample(pcd, params["max_pcd"])
    if len(target_processed) == len(pcd):
        logging.info(
            f":: Point cloud already has less than or exactly {params['max_pcd']} points."
        )
    pc.estimate_normals(target_processed, radius=2, max_nn=5)
    # FPFH only feeds the RANSAC global-registration path (--icp); the
    # FoundationPose-initialized path never reads it, so compute lazily
    target_fpfh = None
    if param.get("compute_fpfh", False):
        target_fpfh = _compute_fpfh(target_processed, params.get("fpfh_radius", 20.0),
                                    params.get("fpfh_max_nn", 100))
    return target_processed, target_fpfh


@timeit
def preprocess_source(pcd: PointCloud, background: PointCloud, param, i=0,
                      near_point=None, near_radius=None):
    """Scene-cloud cleanup: downsample, plane removal, background removal,
    largest-cluster, outlier removal.  Mirrors reference
    src/pose_estimation.py:187-268 step for step.

    @near_point/@near_radius: optional expected object position (mm) — the
    cluster step then keeps the cluster AT the object instead of the
    largest one (ops/pointcloud.py::filter_largest_cluster), which matters
    when an occluder cluster outweighs the half-hidden target.
    """
    params = param["preprocess_source"]
    down_sample = 5 if i > 0 else params["down_sample"]
    # the background (empty-scene) cloud is static across captures — cache its
    # downsample per (cloud, voxel) instead of recomputing every event
    cache = getattr(preprocess_source, "_bg_cache", None)
    ck = (id(background), float(down_sample))
    # the cached background object itself is pinned in the tuple: without it
    # CPython may recycle a freed cloud's id and serve another scene's
    # downsample (two readers in one process, e.g. parity_check 'all')
    if cache is not None and cache[0] == ck and cache[2] is background:
        background_d = cache[1]
    else:
        background_d = pc.voxel_down_sample(background, voxel_size=down_sample * 2)
        preprocess_source._bg_cache = (ck, background_d, background)
    pcd_down = pc.voxel_down_sample(pcd, voxel_size=down_sample)

    plane_model, inliers = pc.segment_plane(
        pcd_down,
        distance_threshold=params["plane_removal"]["distance_threshold"],
        num_iterations=params["plane_removal"]["num_iterations"],
    )
    if i == 0:
        pc.estimate_normals(pcd_down, radius=2, max_nn=5)
        average_normal = pc.compute_average_normal(pcd_down)
        logging.info(f":: Average Normal for Source = {average_normal}")
        # Our normal estimation deterministically orients normals toward the
        # camera; the reference relied on Open3D's *unoriented* normals
        # averaging away from it.  To keep the reference's intent — retain the
        # object side of the plane (toward the camera), drop the plane and
        # what lies beyond — the plane normal must point along the viewing
        # direction, i.e. opposite our camera-facing average normal.
        plane_model, _ = pc.flip_plane_normal_if_needed(plane_model, -average_normal)
    else:
        # The reference's i>0 path flips against a [1,1,1] placeholder
        # (src/pose_estimation.py:216-224) — whether the object side survives
        # then depends on the RANSAC plane's arbitrary normal sign, and the
        # losing sign silently discards the object, zeroing capture-time ICP
        # fitness.  Orient geometrically instead: keep the side the camera
        # (origin) is on, which is where the object stands on the plane.
        if plane_model[3] > 0:
            plane_model = [-v for v in plane_model]
    source_processed = pc.remove_points_below_plane(pcd_down, plane_model)

    if param.get("box"):
        source_processed = pc.background_removal(source_processed, background_d)
    else:
        source_processed = pc.remove_plane(pcd_down, inliers)
    if param.get("mesh"):
        # surface smoothing + uniform resample (the reference's ball-pivot
        # mesh detour, src/pose_estimation.py:433-464 — see
        # ops/pointcloud.py::smooth_resample for the equivalence argument)
        ms = params.get("mesh", {})
        source_processed = pc.smooth_resample(
            source_processed,
            radius=ms.get("radius", 5.0),
            n_iterations=ms.get("number_of_iterations", 10),
            n_points=ms.get("number_of_points", 3000),
        )
        pc.estimate_normals(source_processed, radius=2, max_nn=5)
    largest = pc.filter_largest_cluster(source_processed, near_point=near_point,
                                        near_radius=near_radius)
    if largest is not None:
        source_processed = largest
    source_processed = pc.remove_statistical_outliers(
        source_processed, nb_neighbors=75, std_ratio=0.01
    )

    source_fpfh = 0
    if i == 0:
        pc.estimate_normals(background_d, radius=2, max_nn=5)
        pc.estimate_normals(source_processed, radius=2, max_nn=5)
        if param.get("compute_fpfh", False):
            source_fpfh = _compute_fpfh(source_processed, params.get("fpfh_radius", 20.0),
                                        params.get("fpfh_max_nn", 100))
    return source_processed, source_processed, source_fpfh


def _compute_fpfh(pcd, radius, max_nn):
    from ..ops.features import compute_fpfh

    try:
        return compute_fpfh(pcd, radius=radius, max_nn=max_nn)
    except Exception as e:  # keep the main path alive if features fail
        logging.warning(f":: FPFH computation failed: {e}")
        return None


# ----------------------------------------------------------------- devices --


def _pad_target(target: PointCloud):
    """Padded device target (points, normals, mask), estimating normals if
    absent — shared by _DeviceClouds and CaptureContext so both capture
    paths stay bit-identical."""
    tb = _bucket(len(target))
    tgt, tgt_mask = _pad_cloud(target.points, tb)
    if target.normals is None:
        pc.estimate_normals(target, radius=2, max_nn=5)
    return tgt, _pad_normals(target.normals, tb), tgt_mask


class _DeviceClouds:
    """Padded device-resident source/target for one refinement session."""

    def __init__(self, source: PointCloud, target: PointCloud):
        self.src, self.src_mask = _pad_cloud(source.points)
        self.tgt, self.tgt_normals, self.tgt_mask = _pad_target(target)


class CaptureContext:
    """Device-resident constants for repeated capture events.

    The processed target cloud, the model-mesh triangles, the heatmap rays
    and the color->depth bridge are identical from one capture to the next;
    uploading them once removes most host->device round trips per event.
    On remote-TPU links each round trip costs ~45-300 ms depending on link
    state, and the capture path is latency- (not bandwidth-) bound, so this
    is what keeps capture events at ~0.2 s under degraded links.
    """

    def __init__(self, target_processed: PointCloud, model_mesh, color_to_depth):
        from ..ops import raytrace as rt

        self.tgt, self.tgt_normals, self.tgt_mask = _pad_target(target_processed)
        self._n_target = len(target_processed)
        self._n_faces = len(model_mesh.faces)
        tri, tri_mask = rt.mesh_to_tri_verts(model_mesh.vertices, model_mesh.faces)
        self.tri = jnp.asarray(tri)
        self.tri_mask = jnp.asarray(tri_mask)
        self._color_to_depth = np.asarray(color_to_depth, dtype=np.float64).copy()
        self.depth_to_color = jnp.asarray(
            np.linalg.inv(color_to_depth), dtype=jnp.float32
        )
        self._ray_key = None
        self._rays = None

    def check(self, target_processed, model_mesh, color_to_depth):
        """Guard against a context built for a different scene: the cached
        device constants silently win over the per-call arguments, so a
        mismatch would return wrong results with no error."""
        if (len(target_processed) != self._n_target
                or len(model_mesh.faces) != self._n_faces
                or not np.allclose(color_to_depth, self._color_to_depth)):
            raise ValueError(
                "CaptureContext was built for a different target/mesh/extrinsic "
                "than this capture_event call; rebuild the context"
            )

    def rays_device(self, ray_dirs, ray_mask, intensities):
        """Cache the padded heatmap rays on device, keyed by content."""
        dirs = np.ascontiguousarray(np.asarray(ray_dirs, dtype=np.float32))
        mask = np.ascontiguousarray(np.asarray(ray_mask, dtype=bool))
        inten = np.ascontiguousarray(np.asarray(intensities, dtype=np.float64))
        key = (dirs.shape, dirs.tobytes(), mask.tobytes(), inten.tobytes())
        if self._ray_key != key:
            self._rays = (jnp.asarray(dirs), jnp.asarray(mask), inten)
            self._ray_key = key
        return self._rays

    def restarts_device(self, parameters, n_restarts=None, seed=0):
        """Device-resident restart noise + thresholds, cached: the noise
        distribution is pose-independent (it multiplies the seed transform),
        so capture events reuse one upload instead of regenerating and
        re-uploading (K,4,4) host matrices every event.
        Returns (noise_dev (K,4,4), thresholds_dev (K,), base_thresh,
        max_iter, K)."""
        base_thresh = float(parameters["refine_registration"]["distance_threshold"])
        if n_restarts is None:
            n_restarts = int(parameters.get("run_icp", {}).get("n_restarts", 50))
        max_iter = int(parameters.get("run_icp", {}).get("max_iter", 30))
        key = (base_thresh, int(n_restarts), max_iter, int(seed))
        cached = getattr(self, "_restart_cache", None)
        if cached is not None and cached[0] == key:
            return cached[1]
        noise, thresholds = _restart_noise(base_thresh, n_restarts, seed)
        out = (jnp.asarray(noise, dtype=jnp.float32),
               jnp.asarray(thresholds), base_thresh, max_iter, int(n_restarts))
        self._restart_cache = (key, out)
        return out

    def pose_consts_device(self, tf_to_centered):
        """Device constants for capture_from_pose: the centered->original
        mesh compose and the mm color->depth extrinsic (both static per
        scene)."""
        cached = getattr(self, "_pose_consts", None)
        key = np.asarray(tf_to_centered, dtype=np.float64).tobytes()
        if cached is not None and cached[0] == key:
            return cached[1]
        out = (jnp.asarray(tf_to_centered, dtype=jnp.float32),
               jnp.asarray(self._color_to_depth, dtype=jnp.float32))
        self._pose_consts = (key, out)
        return out


# ------------------------------------------------------------------ search --


def predict_z_axis_adjustment(source, target, initial_fp_transformation, param,
                              max_adjustment=50, step=2.5, clouds=None):
    """Best z offset via a dense parallel ladder of 1-iteration ICP probes.

    Covers the same +-max_adjustment interval as the reference's adaptive
    bisection (src/pose_estimation.py:624-683) but evaluates every candidate
    at once on device.  Returns (best_adjustment, fitness, rmse), where
    applying `tf[2,3] += best_adjustment` yields the probed best transform.
    """
    dc = clouds or _DeviceClouds(source, target)
    zs = np.arange(-max_adjustment, max_adjustment + step / 2, step)
    tfs = np.tile(np.eye(4, dtype=np.float32)[None], (len(zs), 1, 1))
    base = np.asarray(initial_fp_transformation, dtype=np.float32)
    for k, z in enumerate(zs):
        t = base.copy()
        t[2, 3] += z
        tfs[k] = np.linalg.inv(t)  # source->target init, like inv() in reference
    res = icp_ops.icp_one_iter_batch(
        dc.src, dc.src_mask, dc.tgt, dc.tgt_normals, dc.tgt_mask,
        jnp.asarray(tfs),
        float(param["refine_registration"]["distance_threshold"]),
    )
    fit = np.asarray(res.fitness)
    rmse = np.asarray(res.inlier_rmse)
    order = np.lexsort((rmse, -fit))
    best = order[0]
    logging.info(
        f":: Best z-axis adjustment: {zs[best]:.2f}mm, Fitness: {fit[best]:.4f}, "
        f"RMSE: {rmse[best]:.4f}"
    )
    return float(zs[best]), float(fit[best]), float(rmse[best])


@functools.lru_cache(maxsize=32)
def _restart_noise(base_thresh, n_restarts, seed=0):
    """Pose-independent restart noise: the reference's distribution
    (threshold jitter U(0.8,1.2), rotation noise U(-0.01,0.01) rad,
    translation U(-x,x) with escalating x — src/pose_estimation.py:547-622)
    pre-spread over one parallel batch.  Row 0 is identity/base (the
    unperturbed seed).  Returns (noise (K,4,4) float64, thresholds (K,));
    deterministic per args and lru-cached — callers must not mutate."""
    rng = np.random.RandomState(seed)
    K = int(n_restarts)
    noise_tfs = np.zeros((K, 4, 4), dtype=np.float64)
    thresholds = np.zeros(K, dtype=np.float32)
    # escalating translation-noise amplitude across the batch (the reference
    # escalates x by +0.25 on failures; we pre-spread it)
    xs = np.concatenate([np.full(K // 2, 0.1), np.linspace(0.1, 1.0, K - K // 2)])
    from ..ops.lie import euler_matrix

    for k in range(K):
        if k == 0:
            noise_tfs[k] = np.eye(4)
            thresholds[k] = base_thresh
            continue
        thresholds[k] = base_thresh * rng.uniform(0.8, 1.2)
        noise = euler_matrix(*[rng.uniform(-0.01, 0.01) for _ in range(3)])
        noise[:3, 3] = rng.uniform(-xs[k], xs[k], 3)
        noise_tfs[k] = noise
    return noise_tfs, thresholds


def _build_restarts(current_result, parameters, n_restarts=None, seed=0):
    """Restart batch for improve_result/capture_event (host-seeded form).
    Returns (best_transformation, tfs (K,4,4), thresholds (K,), base_thresh,
    max_iter, K)."""
    if not hasattr(current_result, "fitness") or current_result.fitness is None:
        init_tf = np.asarray(current_result, dtype=np.float64)
    else:
        init_tf = np.asarray(current_result.transformation, dtype=np.float64)
    # improve_result receives target->source ("object in scene"); ICP refines
    # the inverse (source->target), like the reference's inv() at :572
    best_transformation = np.linalg.inv(init_tf)

    base_thresh = float(parameters["refine_registration"]["distance_threshold"])
    if n_restarts is None:
        n_restarts = int(parameters.get("run_icp", {}).get("n_restarts", 50))
    max_iter = int(parameters.get("run_icp", {}).get("max_iter", 30))
    K = n_restarts
    noise_tfs, thresholds = _restart_noise(base_thresh, K, seed)
    tfs = (noise_tfs @ best_transformation).astype(np.float32)
    return best_transformation, tfs, thresholds, base_thresh, max_iter, K


def improve_result(source_processed, original_target_processed, current_result,
                   parameter, n_restarts=None, seed=0, clouds=None):
    """Parallel random-restart point-to-plane refinement.

    Mirrors the search distribution of reference src/pose_estimation.py:547-622
    (threshold jitter U(0.8,1.2), rotation noise U(-0.01,0.01) rad, translation
    noise U(-x,x) with escalating x) but runs all restarts as one batched
    device call and keeps the argmax by (fitness, -rmse).
    Accepts either a RegistrationResult or a raw 4x4 matrix (the reference's
    fitness-attr duck check, :564-569).
    """
    parameters = copy.deepcopy(parameter)
    dc = clouds or _DeviceClouds(source_processed, original_target_processed)
    best_transformation, tfs, thresholds, base_thresh, max_iter, K = _build_restarts(
        current_result, parameters, n_restarts, seed
    )

    # restarts + the un-refined initial transform's score (never regress),
    # fused into one device dispatch (tunnel round trips cost ~45ms each)
    res, f0, r0 = icp_ops.icp_batch_with_eval(
        dc.src, dc.src_mask, dc.tgt, dc.tgt_normals, dc.tgt_mask,
        jnp.asarray(tfs), jnp.asarray(thresholds),
        jnp.asarray(best_transformation, dtype=jnp.float32), base_thresh,
        max_iter=max_iter,
    )
    fit = np.asarray(res.fitness)
    rmse = np.asarray(res.inlier_rmse)
    tf_all = np.asarray(res.transformation)
    fit = np.concatenate([fit, np.asarray(f0).reshape(1)])
    rmse = np.concatenate([rmse, np.asarray(r0).reshape(1)])
    tf_all = np.concatenate([tf_all, best_transformation[None].astype(np.float32)])

    valid = (fit > 0) & (rmse > 0)
    if not valid.any():
        # nothing converged: keep the initial transform (reference keeps its
        # running best rather than adopting a degenerate refinement)
        best = len(fit) - 1
        logging.info(":: No restart improved the result; keeping the initial transform")
    else:
        fit = np.where(valid, fit, -1.0)
        order = np.lexsort((rmse, -fit))
        best = order[0]
    logging.info(
        f":: Improved result: Fitness = {fit[best]:.4f}, RMSE = {rmse[best]:.4f} "
        f"(over {K} parallel restarts)"
    )
    out = RegistrationResult()
    out.fitness = float(fit[best])
    out.inlier_rmse = float(rmse[best])
    out.transformation = tf_all[best].astype(np.float64)
    return out


def capture_event(source_processed, target_processed, current_result, parameter,
                  model_mesh, ray_dirs, ray_mask, intensities, color_to_depth,
                  n_restarts=None, seed=0, clouds=None, ctx=None):
    """One defect-capture event as ONE device dispatch: restart ICP +
    initial-transform eval + best-pick + defect ray trace on the re-posed
    mesh (ops/icp.py::improve_and_raytrace).

    Same semantics as improve_result followed by ray_tracing
    (reference run.py:168-206) minus the intermediate host round trips.
    @model_mesh: TriMesh in the MODEL frame (mm); @ray_dirs/@ray_mask/
    @intensities: padded color-frame heatmap rays (ops/raytrace.py::
    heatmap_to_rays or defect_projection.compute_rays).
    Returns (RegistrationResult, intersection PointCloud).
    """
    import jax

    from ..ops import raytrace as rt
    from .defect_projection import create_intersection_pcd

    parameters = copy.deepcopy(parameter)
    best_transformation, tfs, thresholds, base_thresh, max_iter, K = _build_restarts(
        current_result, parameters, n_restarts, seed
    )
    if ctx is not None:
        ctx.check(target_processed, model_mesh, color_to_depth)
        src, src_mask = _pad_cloud(source_processed.points)
        tgt, tgt_normals, tgt_mask = ctx.tgt, ctx.tgt_normals, ctx.tgt_mask
        tri_d, tri_mask_d = ctx.tri, ctx.tri_mask
        rays_d, ray_mask_d, intensities = ctx.rays_device(ray_dirs, ray_mask, intensities)
        d2c = ctx.depth_to_color
    else:
        dc = clouds or _DeviceClouds(source_processed, target_processed)
        src, src_mask = dc.src, dc.src_mask
        tgt, tgt_normals, tgt_mask = dc.tgt, dc.tgt_normals, dc.tgt_mask
        tri, tri_mask = rt.mesh_to_tri_verts(model_mesh.vertices, model_mesh.faces)
        tri_d, tri_mask_d = jnp.asarray(tri), jnp.asarray(tri_mask)
        rays_d = jnp.asarray(ray_dirs, dtype=jnp.float32)
        ray_mask_d = jnp.asarray(ray_mask)
        d2c = jnp.asarray(np.linalg.inv(color_to_depth), dtype=jnp.float32)

    tf_all, fit, rmse, best, t_hit = icp_ops.improve_and_raytrace(
        src, src_mask, tgt, tgt_normals, tgt_mask,
        jnp.asarray(tfs), jnp.asarray(thresholds),
        jnp.asarray(best_transformation, dtype=jnp.float32), base_thresh,
        tri_d, tri_mask_d, rays_d, ray_mask_d, d2c,
        max_iter=max_iter,
    )
    # one batched readback instead of five sequential device->host transfers
    tf_all, fit, rmse, best, t = jax.device_get((tf_all, fit, rmse, best, t_hit))
    best = int(best)
    out = RegistrationResult()
    out.fitness = float(fit[best])
    out.inlier_rmse = float(rmse[best])
    out.transformation = tf_all[best].astype(np.float64)
    logging.info(
        f":: Capture event: Fitness = {out.fitness:.4f}, RMSE = {out.inlier_rmse:.4f} "
        f"(over {K} parallel restarts)"
    )
    hit = np.isfinite(t) & np.asarray(ray_mask)
    pts = np.asarray(ray_dirs)[hit] * t[hit, None]
    if len(pts) == 0:
        from ..io.mesh_io import PointCloud as _PC

        return out, _PC(np.zeros((0, 3)))
    return out, create_intersection_pcd(pts, np.asarray(intensities)[hit])


class PendingCapture:
    """Handle for an in-flight capture event (capture_event_async).

    Holds the device-side (tf_all, fit, rmse, best, t_hit) arrays with their
    D2H copies already started; `.result()` materializes (and caches) the
    same (RegistrationResult, intersection PointCloud) tuple capture_event
    returns.  Consuming the result a frame after dispatch overlaps both the
    device work and the tunnel round trip with the next frame's tracking.
    """

    __slots__ = ("_arrs", "_rays", "_mask", "_inten", "_n_restarts", "_out")

    def __init__(self, arrs, ray_dirs, ray_mask, intensities, n_restarts):
        self._arrs = arrs
        self._rays = np.asarray(ray_dirs)
        self._mask = np.asarray(ray_mask)
        self._inten = np.asarray(intensities)
        self._n_restarts = n_restarts
        self._out = None
        for a in arrs:
            try:  # start the D2H copies now; .result() later won't stall
                a.copy_to_host_async()
            except Exception:
                pass

    def result(self):
        if self._out is not None:
            return self._out
        import jax

        tf_all, fit, rmse, best, t = jax.device_get(self._arrs)
        best = int(best)
        out = RegistrationResult()
        out.fitness = float(fit[best])
        out.inlier_rmse = float(rmse[best])
        out.transformation = tf_all[best].astype(np.float64)
        logging.info(
            f":: Capture event: Fitness = {out.fitness:.4f}, "
            f"RMSE = {out.inlier_rmse:.4f} "
            f"(over {self._n_restarts} parallel restarts, async)"
        )
        hit = np.isfinite(t) & self._mask
        pts = self._rays[hit] * t[hit, None]
        if len(pts) == 0:
            from ..io.mesh_io import PointCloud as _PC

            self._out = (out, _PC(np.zeros((0, 3))))
        else:
            from .defect_projection import create_intersection_pcd

            self._out = (out, create_intersection_pcd(pts, self._inten[hit]))
        return self._out


def capture_event_async(source_processed, pose_dev, tf_to_centered, parameter,
                        ray_dirs, ray_mask, intensities, ctx: CaptureContext,
                        n_restarts=None, seed=0):
    """Dispatch one capture event seeded from the DEVICE tracked pose and
    return a PendingCapture immediately — no host synchronization on the
    dispatch path.

    Same search/result semantics as capture_event(..., ctx=ctx) seeded with
    `color_to_depth @ mm(pose)`, except the seed math runs in-graph from the
    un-synced tracked pose (ops/icp.py::capture_from_pose) and the result is
    read back asynchronously.  The app's dead-reckoning consumers tolerate a
    one-frame result lag (reference run.py:210), which turns the capture
    frame's ~3 tunnel round trips into zero.

    @pose_dev: device (4,4)/(1,4,4) CENTERED-mesh pose in color-cam meters —
    `PendingPose._dev` or `FoundationPose.pose_last`; @tf_to_centered:
    FoundationPose.get_tf_to_centered_mesh().  Requires a CaptureContext.
    """
    noise_d, thr_d, base_thresh, max_iter, K = ctx.restarts_device(
        parameter, n_restarts, seed)
    tf_center_d, c2d_d = ctx.pose_consts_device(tf_to_centered)
    rays_d, ray_mask_d, intensities = ctx.rays_device(ray_dirs, ray_mask, intensities)
    src, src_mask = _pad_cloud(source_processed.points)
    arrs = icp_ops.capture_from_pose(
        src, src_mask, ctx.tgt, ctx.tgt_normals, ctx.tgt_mask,
        pose_dev, tf_center_d, c2d_d, noise_d, thr_d, base_thresh,
        ctx.tri, ctx.tri_mask, rays_d, ray_mask_d, ctx.depth_to_color,
        max_iter=max_iter,
    )
    return PendingCapture(arrs, ray_dirs, ray_mask, intensities, K)


# ------------------------------------------------------------------- mains --


def refine_pose_with_icp(source, target, background, initial_fp_transformation, parameters):
    """Full classical refinement: preprocess + z-search + parallel restarts.

    Mirrors reference src/pose_estimation.py:749-822; same return tuple
    (target_transformed, best_result_icp, z_adjustment, target_processed).
    """
    param = copy.deepcopy(parameters)
    initial_fp_transformation = np.array(initial_fp_transformation, dtype=np.float64)

    source.paint_uniform_color([1, 0, 0])
    target.paint_uniform_color([0, 0, 1])

    target_processed, _ = preprocess_target(target, param)
    tb = target.points.max(axis=0) - target.points.min(axis=0)
    source_processed, _, _ = preprocess_source(
        source, background, param,
        near_point=initial_fp_transformation[:3, 3],
        near_radius=0.75 * float(np.linalg.norm(tb)))

    clouds = _DeviceClouds(source_processed, target_processed)

    z_adjustment, best_fitness, best_rmse = predict_z_axis_adjustment(
        source_processed, target_processed, initial_fp_transformation, param,
        clouds=clouds,
    )
    initial_fp_transformation[2, 3] += z_adjustment
    logging.info(f":: Predicted Z-axis adjustment: {z_adjustment:.2f}mm")

    result_icp = RegistrationResult()
    result_icp.fitness = best_fitness
    result_icp.inlier_rmse = best_rmse
    result_icp.transformation = initial_fp_transformation

    best_result_icp = improve_result(
        source_processed, target_processed, result_icp, param, clouds=clouds
    )
    logging.info(
        f"-- Final Results"
        f"\n:: Refine registration results: Inlier_rmse: {best_result_icp.inlier_rmse:.4f}, "
        f"Fitness: {best_result_icp.fitness:.4f}"
        f"\n:: Final Transformation Matrix:\n{np.linalg.inv(best_result_icp.transformation)}"
    )

    target_transformed = target.copy()
    target_transformed.transform(np.linalg.inv(best_result_icp.transformation))
    return target_transformed, best_result_icp, z_adjustment, target_processed


def refine_registration(source: PointCloud, target: PointCloud, transformation, param):
    """Single point-to-plane ICP run (Open3D registration_icp equivalent,
    reference src/pose_estimation.py:505-522)."""
    dc = _DeviceClouds(source, target)
    res = icp_ops.icp_batch(
        dc.src, dc.src_mask, dc.tgt, dc.tgt_normals, dc.tgt_mask,
        jnp.asarray(np.asarray(transformation, dtype=np.float32))[None],
        jnp.asarray([float(param["refine_registration"]["distance_threshold"])]),
        max_iter=30,
    )
    out = RegistrationResult()
    out.transformation = np.asarray(res.transformation[0], dtype=np.float64)
    out.fitness = float(res.fitness[0])
    out.inlier_rmse = float(res.inlier_rmse[0])
    return out


def run_icp(source_processed, target_processed, source_fpfh, target_fpfh, param):
    """Global registration (RANSAC on FPFH) + ICP refinement — the `--icp`
    path (reference src/pose_estimation.py:524-545)."""
    from ..ops.features import execute_global_registration

    result_ransac = execute_global_registration(
        source_processed, target_processed, source_fpfh, target_fpfh, param
    )
    result_icp = refine_registration(
        source_processed, target_processed, result_ransac.transformation, param
    )
    return result_icp, result_ransac


def determine_pose(source, target, background, initial_fp_transformation, parameters, icp=False):
    """Top-level pose determination with either the FoundationPose-init path or
    the pure global-registration path (reference src/pose_estimation.py:686-747)."""
    import time

    param = copy.deepcopy(parameters)
    if icp:
        param["compute_fpfh"] = True  # the RANSAC path consumes features
    source.paint_uniform_color([1, 0, 0])
    target.paint_uniform_color([0, 0, 1])
    start_time_total = time.perf_counter()
    target_processed, target_fpfh = preprocess_target(target, param)
    if icp:
        near, nr = None, None  # global registration has no prior pose
    else:
        tb = target.points.max(axis=0) - target.points.min(axis=0)
        near = np.asarray(initial_fp_transformation)[:3, 3]
        nr = 0.75 * float(np.linalg.norm(tb))
    source_processed, _, source_fpfh = preprocess_source(
        source, background, param, near_point=near, near_radius=nr)

    if icp:
        result_icp, result_ransac = run_icp(
            source_processed, target_processed, source_fpfh, target_fpfh, param
        )
        attempts = 1
        while (
            result_icp.fitness < param["run_icp"]["fitness_threshold"]
            or result_icp.inlier_rmse > param["run_icp"]["rmse_threshold"]
        ) and attempts < 10:
            result_icp, result_ransac = run_icp(
                source_processed, target_processed, source_fpfh, target_fpfh, param
            )
            attempts += 1
        result_icp.transformation = np.linalg.inv(result_icp.transformation)
        z_adjustment = 0
    else:
        clouds = _DeviceClouds(source_processed, target_processed)
        z_adjustment, best_fitness, best_rmse = predict_z_axis_adjustment(
            source_processed, target_processed, initial_fp_transformation, param,
            clouds=clouds,
        )
        initial_fp_transformation = np.array(initial_fp_transformation, dtype=np.float64)
        initial_fp_transformation[2, 3] += z_adjustment
        result_icp = RegistrationResult()
        result_icp.fitness = best_fitness
        result_icp.inlier_rmse = best_rmse
        result_icp.transformation = initial_fp_transformation

    best_result_icp = improve_result(source_processed, target_processed, result_icp, param)
    logging.info(
        f"-- Final Results"
        f"\n:: Refine registration results: Inlier_rmse: {best_result_icp.inlier_rmse:.4f}, "
        f"Fitness: {best_result_icp.fitness:.4f}"
        f"\n:: Pose Estimation Execution Time: {time.perf_counter() - start_time_total:.2f} seconds"
    )
    target_transformed = target.copy()
    target_transformed.transform(np.linalg.inv(best_result_icp.transformation))
    return target_transformed, best_result_icp, z_adjustment, target_processed


# ------------------------------------------------------------------- demos --


def demo_data(base_dir="demo_data/synth_box", frame="0000"):
    """Load the standalone-ICP demo inputs (reference src/pose_estimation.py:19-32)."""
    import json

    from ..io.mesh_io import load_point_cloud

    source = load_point_cloud(f"{base_dir}/pcd/cloud_{frame}.ply")
    background = load_point_cloud(f"{base_dir}/background/box.ply")
    target = load_point_cloud(f"{base_dir}/mesh/model.ply")

    pose_file = f"debug/ob_in_cam/{frame}.txt"
    if not __import__("os").path.exists(pose_file):
        pose_file = f"{base_dir}/annotated_poses/{frame}.txt"
    fp_transformation = np.loadtxt(pose_file).reshape(4, 4)
    scaled = fp_transformation.copy()
    scaled[:3, -1] *= 1000.0

    with open(f"{base_dir}/configs/camera_extrinsics.json") as f:
        ext = json.load(f)
    color_to_depth = np.eye(4)
    color_to_depth[:3, :3] = np.array(ext["color_to_depth"]["rotation_matrix"])
    color_to_depth[:3, 3] = np.array(ext["color_to_depth"]["translation_vector"]).reshape(-1)[:3]
    initial = color_to_depth @ scaled
    with open(f"{base_dir}/configs/icp_parameters.json") as f:
        icp_param = json.load(f)
    return target, source, background, initial, icp_param


def demo_icp(base_dir="demo_data/synth_box", tries=1, icp=False):
    """Standalone timed ICP replay (reference src/pose_estimation.py:824-859)."""
    import time

    target, source, background, initial, icp_param = demo_data(base_dir)
    t0 = time.perf_counter()
    for i in range(tries):
        determine_pose(source, target, background, initial.copy(), icp_param, icp=icp)
        logging.info(f"Try number {i}")
    total = time.perf_counter() - t0
    logging.info(f"Average time for {tries} iterations {total / tries}\n Total time {total}")
    return total / tries


if __name__ == "__main__":
    import sys

    from ..utils import set_logging_format

    set_logging_format()
    demo_icp(sys.argv[1] if len(sys.argv) > 1 else "demo_data/synth_box")
