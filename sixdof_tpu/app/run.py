"""Application loop: pose registration + tracking + ICP + defect projection.

Mirrors the reference `run.py:9-263` flow exactly (frame 0: register ->
mm-scale -> extrinsic compose -> refine_pose_with_icp -> delta_pose memo ->
ray_tracing -> Dash update; frames >=1: track_one -> capture-button branch or
delta-pose dead reckoning; per-frame `debug/ob_in_cam/%04d.txt` dumps), with:

- the live viewer thread on :8050 (app/web_vis.py, Dash-compatible API);
- headless-safe debug vis (cv2 windows only when a display exists);
- offline demo mode terminates at the end of the recorded sequence.
"""
from __future__ import annotations

import argparse
import copy
import logging
import os
import threading
import time
from collections import deque
from multiprocessing import Queue

import numpy as np

from ..estimater import FoundationPose
from ..io.mesh_io import load_mesh
from ..io.readers import DataReader
from ..models.predict import PoseRefinePredictor, ScorePredictor
from ..utils import set_logging_format, set_seed
from ..utils.profiling import StageTimer
from ..utils.vis import draw_posed_3d_box, draw_xyz_axis
from .defect_projection import (
    compute_rays,
    create_heatmap_overlay,
    heatmap_to_points,
    ray_tracing,
    save_overlay,
)
from .icp_pipeline import (
    CaptureContext, capture_event, capture_event_async, preprocess_source,
    refine_pose_with_icp,
)
from .web_vis import ASSETS_DIR, run_dash_app, update_dash_data


def transform_object(pcd_or_mesh, transformation):
    out = pcd_or_mesh.copy()
    out.transform(transformation)
    return out


def oriented_bounds(mesh):
    """PCA oriented bounding box (trimesh.bounds.oriented_bounds equivalent,
    reference run.py:28): returns (to_origin 4x4, extents 3)."""
    pts = np.asarray(mesh.vertices)
    c = pts.mean(axis=0)
    q = pts - c
    cov = q.T @ q
    _, vecs = np.linalg.eigh(cov)
    R = vecs[:, ::-1].T  # rows = principal axes, major first
    if np.linalg.det(R) < 0:
        R[2] *= -1
    local = q @ R.T
    mn, mx = local.min(axis=0), local.max(axis=0)
    extents = mx - mn
    to_origin = np.eye(4)
    to_origin[:3, :3] = R
    to_origin[:3, 3] = -(R @ c) - (mn + mx) / 2
    return to_origin, extents


def _enable_compile_cache():
    """Persistent XLA compile cache: the fused register cascade compiles in
    minutes; with the cache every later process (and anything pre-warmed by
    tools/precompile.py) starts at interactive latency.  SIXDOF_COMPILE_CACHE
    overrides the location; an empty value disables."""
    import jax

    cache_dir = os.environ.get("SIXDOF_COMPILE_CACHE", "/tmp/jax_compile_cache")
    try:
        if cache_dir and not jax.config.jax_compilation_cache_dir:
            jax.config.update("jax_compilation_cache_dir", cache_dir)
            jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception as e:  # cache is an optimization, never a requirement
        logging.warning(f"compile cache unavailable: {e}")


def main(args):
    _enable_compile_cache()
    data_queue = Queue()
    capture_queue = Queue()
    dash_thread = threading.Thread(
        target=run_dash_app, args=(data_queue, capture_queue), daemon=True
    )
    if not args.no_server:
        dash_thread.start()

    mesh = load_mesh(getattr(args, "mesh_file", None)
                     or f"{args.test_scene_dir}/mesh/model_scaled_down.obj")

    debug = args.debug
    debug_dir = args.debug_dir
    os.makedirs(f"{debug_dir}/track_vis", exist_ok=True)
    os.makedirs(f"{debug_dir}/ob_in_cam", exist_ok=True)

    to_origin, extents = oriented_bounds(mesh)
    bbox = np.stack([-extents / 2, extents / 2], axis=0).reshape(2, 3)

    repo_root = os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    default_sc = os.path.join(repo_root, "weights", "scorer")
    default_rf = os.path.join(repo_root, "weights", "refiner")
    scorer = ScorePredictor(
        ckpt_dir=args.scorer_ckpt or (default_sc if os.path.exists(default_sc) else None))
    refiner = PoseRefinePredictor(
        ckpt_dir=args.refiner_ckpt or (default_rf if os.path.exists(default_rf) else None))
    est = FoundationPose(
        model_pts=mesh.vertices, model_normals=mesh.vertex_normals, mesh=mesh,
        scorer=scorer, refiner=refiner, debug_dir=debug_dir, debug=debug,
        prune_to=args.prune_to or None,
        prune_schedule=_parse_prune_schedule(getattr(args, "prune_schedule", "")),
        track_crop=bool(getattr(args, "track_crop", 1)),
        polish_top=int(getattr(args, "polish_top", 0) or 0),
        polish_iters=int(getattr(args, "polish_iters", 2) or 0),
        depth_polish=bool(getattr(args, "depth_polish", 1)),
        track_polish=bool(getattr(args, "track_polish", 1)),
    )
    if args.max_hypotheses and len(est.rot_grid) > args.max_hypotheses:
        step = len(est.rot_grid) // args.max_hypotheses
        est.rot_grid = est.rot_grid[::step][: args.max_hypotheses]
        logging.info(f"rotation grid capped to {len(est.rot_grid)} hypotheses")
    logging.info("Estimator initialization done")

    if args.demo:
        reader = DataReader(base_dir=args.test_scene_dir, shorter_side=args.shorter_side,
                            zfar=np.inf, arguments=args)
    else:
        from ..io.readers import KinectReader

        logging.info("live demo")
        reader = KinectReader(base_dir=args.test_scene_dir,
                              capture_background=args.capture_background,
                              shorter_side=args.shorter_side, zfar=np.inf, arguments=args)

    # cold-start: compile the fused register + track programs in the
    # background while the camera/heatmap/web setup below proceeds — the
    # first register() joins the thread instead of paying the full compile
    # (or warm-cache load) on the critical path (reference run.py:32-41 is
    # interactive from process start)
    if getattr(args, "precompile", 1):
        est.precompile_async(reader.color_K, (reader.color_H, reader.color_W),
                             iteration=args.est_refine_iter,
                             track_iteration=args.track_refine_iter)

    has_display = bool(os.environ.get("DISPLAY"))

    i = 0
    intersection_pcds = []
    detect_defect = False
    frame_times = []
    pending_poses = deque()  # (frame_idx, PendingPose) awaiting host readback
    pending_captures = deque()  # (frame_idx, PendingPose, PendingCapture)
    timer = StageTimer()

    def drain_pending(keep_frame=None, leave=0):
        """Flush queued async poses to ob_in_cam in frame order, down to
        @leave entries.  A queued pose for @keep_frame is returned instead of
        written (the caller writes it as the current frame's pose)."""
        kept = None
        while len(pending_poses) > leave:
            j, h = pending_poses.popleft()
            if j == keep_frame:
                kept = h.numpy()
            else:
                np.savetxt(f"{debug_dir}/ob_in_cam/{j:04d}.txt", h.numpy())
        return kept

    def to_initial_tf(pose):
        """FoundationPose meters/color-cam -> ICP millimeters/depth-cam
        (reference run.py:95-96)."""
        return np.dot(reader.color_to_depth,
                      reader.scale_translation_to_millimeters(pose))

    def drain_captures(now=None):
        """Consume completed async capture events in frame order.

        The capture's ICP + ray trace were dispatched from the un-synced
        device pose (capture_event_async); its result is consumed here a few
        frames later — the same frame-lag tolerance the reference's own
        dead-reckoning already has (reference run.py:210) — so the device
        work AND the tunnel readback fully overlap subsequent tracking.
        @now: current frame index — entries younger than 4 frames are left
        in flight (their D2H copies are still settling); None drains all.
        """
        nonlocal previous_transformation, delta_pose, current_transformation, \
            target_mesh_copy
        while pending_captures:
            if now is not None and now - pending_captures[0][0] < 4:
                break
            j, pp, pcap = pending_captures.popleft()
            init_tf = to_initial_tf(pp.numpy())
            current_result, new_intersection_pcd = pcap.result()
            current_transformation = current_result.transformation
            delta_pose = np.linalg.inv(init_tf) @ np.linalg.inv(
                current_transformation
            )
            target_mesh_copy = transform_object(
                reader.target_mesh, np.linalg.inv(current_transformation)
            )
            relative_transformation = (
                np.linalg.inv(current_transformation) @ previous_transformation
            )
            for pcd in intersection_pcds:
                pcd.transform(relative_transformation)
            new_intersection_pcd.transform(reader.color_to_depth)
            intersection_pcds.append(new_intersection_pcd)
            previous_transformation = current_transformation
            update_dash_data(intersection_pcds, target_mesh_copy)

    reader.update()
    heatmap, color_original, heatmap_vis, _ = reader.get_heatmap(reader.get_color(i))
    overlay = create_heatmap_overlay(color_original, heatmap_vis)
    os.makedirs(ASSETS_DIR, exist_ok=True)
    save_overlay(overlay, os.path.join(ASSETS_DIR, "overlay.png"))

    target_processed = None
    previous_transformation = np.eye(4)
    delta_pose = np.eye(4)
    current_transformation = np.eye(4)

    n_frames = len(reader) if args.demo else float("inf")
    max_frames = args.max_frames if args.max_frames else n_frames

    while i < max_frames:
        logging.info(f"i: {i}")
        t0 = time.perf_counter()
        reader.update()
        color = reader.get_color(i if args.demo else None)
        depth = reader.get_depth(i if args.demo else None)
        source = reader.get_source(i if args.demo else None)
        if color is None or depth is None:
            continue
        if i == 0:
            mask = reader.get_mask(color, i).astype(bool)
            with timer.stage("register"):
                pose = est.register(K=reader.color_K, rgb=color, depth=depth, ob_mask=mask,
                                    iteration=args.est_refine_iter)

            initial_transformation = to_initial_tf(pose)

            with timer.stage("icp_refine"):
                _, initial_icp_result, _, target_processed = refine_pose_with_icp(
                    source, reader.target, reader.background, initial_transformation,
                    reader.parameters,
                )
            delta_pose = np.linalg.inv(initial_transformation) @ np.linalg.inv(
                initial_icp_result.transformation
            )
            current_transformation = initial_icp_result.transformation
            # device-resident constants for all later capture events
            capture_ctx = CaptureContext(
                target_processed, reader.target_mesh, reader.color_to_depth
            )

            target_mesh_copy = transform_object(
                reader.target_mesh, np.linalg.inv(initial_icp_result.transformation)
            )
            with timer.stage("ray_tracing"):
                defect_mesh_intersection_pcd, target_transformed = ray_tracing(
                    reader.base_dir, target_mesh_copy, heatmap, reader.color_pinhole,
                    heatmap_threshold=0.75,
                )
            defect_mesh_intersection_pcd.transform(reader.color_to_depth)
            intersection_pcds.append(defect_mesh_intersection_pcd)

            if debug >= 2:
                save_overlay(overlay, save_path=f"{debug_dir}/overlay/overlay_{i}.png")
            previous_transformation = initial_icp_result.transformation
            update_dash_data(intersection_pcds, target_mesh_copy)
        else:
            # frames that need the pose on the host NOW: captures (ICP +
            # defects consume it), debug vis, or pipelining disabled.  All
            # other frames track asynchronously: the pose chain stays on
            # device and the host readback lags `track_pipeline` frames —
            # identical poses, ~3x the steady-state FPS over the TPU tunnel
            # (the dispatch is ~5 ms; each host sync costs a ~25-45 ms
            # round-trip that the pipeline hides).
            want_capture = (not capture_queue.empty()) or bool(
                args.capture_every and i % args.capture_every == 0)
            pipeline_depth = getattr(args, "track_pipeline", 2)
            # pipelined mode: NOTHING forces a host sync — capture frames
            # dispatch their ICP + ray trace from the device pose
            # (capture_event_async) and the result is consumed next frame
            async_mode = debug < 1 and pipeline_depth > 0
            want_sync = not async_mode
            with timer.stage("track"):
                out = est.track_one(rgb=color, depth=depth, K=reader.color_K,
                                    iteration=args.track_refine_iter, sync=want_sync)
            drain_captures(now=i)  # consume settled captures (>=4 frames old)
            if want_sync:
                drain_pending()  # keep ob_in_cam writes ordered
                pose = out
            else:
                pending_poses.append((i, out))
                drain_pending(leave=pipeline_depth)
                pose = None  # dead-reckoning state has no consumer until the
                # next capture event resolves; skip the host math
            if pose is not None:
                initial_transformation = to_initial_tf(pose)

            if not capture_queue.empty():
                capture_queue.get()
                detect_defect = True
                logging.info("New Defect Detection initiated!")
            if args.capture_every and i % args.capture_every == 0:
                detect_defect = True

            if detect_defect and pose is None and not async_mode:
                # capture request landed between the pre-track queue check
                # and here (viewer thread): sync this frame's pose after all
                pose = drain_pending(keep_frame=i)
                initial_transformation = to_initial_tf(pose)
            if detect_defect:
                heatmap, color_original, heatmap_vis, _ = reader.get_heatmap(reader.get_color(i))
                overlay = create_heatmap_overlay(color_original, heatmap_vis)
                save_overlay(overlay, os.path.join(ASSETS_DIR, "overlay.png"))
                source_processed, _, _ = preprocess_source(
                    source, reader.background, reader.parameters, i=i
                )
                if debug >= 2:
                    save_overlay(overlay, save_path=f"{debug_dir}/overlay/overlay_{i}.png")
                # restart ICP + best-pick + defect ray trace fused into ONE
                # device dispatch (icp_pipeline.capture_event); equivalent to
                # improve_result followed by ray_tracing (reference
                # run.py:168-206), tested in tests/test_icp_pipeline.py
                pix = heatmap_to_points(heatmap, 0.75)
                if pix:
                    rays, intensities = compute_rays(pix, reader.color_pinhole)
                    ray_mask = np.ones(len(rays), dtype=bool)
                else:
                    # static-shape placeholder ray, masked OUT so no defect
                    # point is fabricated (reference returns an empty pcd
                    # when nothing clears the threshold)
                    rays = np.array([[0.0, 0.0, 1.0]])
                    intensities = np.zeros(1)
                    ray_mask = np.zeros(1, dtype=bool)
                if async_mode:
                    # dispatch from the un-synced device pose; consumed by
                    # drain_captures() next frame (one-frame lag, same
                    # results — tests/test_icp_pipeline.py async-vs-sync)
                    pcap = capture_event_async(
                        source_processed, out._dev,
                        est.get_tf_to_centered_mesh(), reader.parameters,
                        rays, ray_mask, intensities, ctx=capture_ctx,
                    )
                    pending_captures.append((i, out, pcap))
                else:
                    current_result, new_intersection_pcd = capture_event(
                        source_processed, target_processed, initial_transformation,
                        reader.parameters, reader.target_mesh, rays,
                        ray_mask, intensities,
                        reader.color_to_depth, ctx=capture_ctx,
                    )
                    current_transformation = current_result.transformation
                    delta_pose = np.linalg.inv(initial_transformation) @ np.linalg.inv(
                        current_transformation
                    )
                    target_mesh_copy = transform_object(
                        reader.target_mesh, np.linalg.inv(current_transformation)
                    )
                    relative_transformation = (
                        np.linalg.inv(current_transformation) @ previous_transformation
                    )
                    for pcd in intersection_pcds:
                        pcd.transform(relative_transformation)
                    new_intersection_pcd.transform(reader.color_to_depth)
                    intersection_pcds.append(new_intersection_pcd)
                    previous_transformation = current_transformation
                    update_dash_data(intersection_pcds, target_mesh_copy)
                detect_defect = False
            elif pose is not None:
                current_transformation = np.linalg.inv(initial_transformation @ delta_pose)

        if pose is not None:
            np.savetxt(f"{debug_dir}/ob_in_cam/{i:04d}.txt", pose.reshape(4, 4))
        frame_times.append(time.perf_counter() - t0)

        if debug >= 1:
            center_pose = pose @ np.linalg.inv(to_origin)
            vis = draw_posed_3d_box(reader.color_K, img=color.copy(), ob_in_cam=center_pose,
                                    bbox=bbox)
            vis = draw_xyz_axis(vis, ob_in_cam=center_pose, scale=0.1, K=reader.color_K,
                                thickness=3, transparency=0, is_input_rgb=True)
            if has_display:
                import cv2

                cv2.namedWindow("Tracking", cv2.WINDOW_NORMAL)
                cv2.imshow("Tracking", vis[..., ::-1])
                key = cv2.waitKey(1)
                if key & 0xFF == ord("q"):
                    print("Quitting...")
                    break
            if debug >= 2:
                import cv2

                cv2.imwrite(f"{debug_dir}/track_vis/{i:04d}.png", vis[..., ::-1])
        i += 1

    drain_captures()  # consume any in-flight capture event
    drain_pending()  # drain the readback pipeline
    reader.stop_camera()
    timer.log()
    if frame_times:
        fps = 1.0 / np.mean(frame_times[1:]) if len(frame_times) > 1 else 1.0 / frame_times[0]
        logging.info(f"frames: {len(frame_times)}  mean FPS (excl. frame 0): {fps:.2f}")
    return frame_times


def build_parser():
    """CLI mirroring the reference run.py:239-258; defaults come from the
    typed config tree (sixdof_tpu.config.PipelineConfig)."""
    from ..config import PipelineConfig

    pc = PipelineConfig()

    def str2bool(v):
        # `type=bool` would make --flag False parse as True (any non-empty
        # string is truthy); accept the usual spellings instead
        if isinstance(v, bool) or v is None:
            return v
        if v.lower() in ("1", "true", "yes", "y", "on"):
            return True
        if v.lower() in ("0", "false", "no", "n", "off"):
            return False
        raise argparse.ArgumentTypeError(f"expected a boolean, got {v!r}")

    parser = argparse.ArgumentParser()
    code_dir = os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    parser.add_argument("--mesh_file", type=str, default=None,
                        help="CAD mesh override (default: "
                             "{test_scene_dir}/mesh/model_scaled_down.obj)")
    parser.add_argument("--test_scene_dir", type=str, default=f"{code_dir}/{pc.test_scene_dir}")
    parser.add_argument("--est_refine_iter", type=int, default=pc.est_refine_iter)
    parser.add_argument("--track_refine_iter", type=int, default=pc.track_refine_iter)
    parser.add_argument("--debug", type=int, default=pc.debug)
    parser.add_argument("--debug_dir", type=str, default=f"{code_dir}/debug")
    parser.add_argument("--shorter_side", type=int, default=pc.shorter_side)
    parser.add_argument("--demo", action="store_true", default=pc.demo)
    parser.add_argument("--no-demo", dest="demo", action="store_false")
    parser.add_argument("--icp", default=pc.icp, type=str2bool)
    parser.add_argument("--info", default=True, type=str2bool)
    parser.add_argument("--box", type=str2bool, default=None)
    parser.add_argument("--mesh", type=str2bool, default=None)
    parser.add_argument("--capture_background", type=str2bool, default=pc.capture_background)
    parser.add_argument("--voxel_size", type=float, default=None)
    parser.add_argument("--refiner_ckpt", type=str, default=pc.refiner_ckpt)
    parser.add_argument("--scorer_ckpt", type=str, default=pc.scorer_ckpt)
    parser.add_argument("--max_frames", type=int, default=None)
    parser.add_argument("--capture_every", type=int, default=None,
                        help="auto-trigger defect capture every N frames (headless demo)")
    parser.add_argument("--no_server", action="store_true", help="skip the viewer thread")
    parser.add_argument("--prune_to", type=int, default=64,
                        help="coarse-to-fine registration: keep this many "
                             "hypotheses after 2 coarse iterations (0 = full "
                             "grid for all iterations, the reference behavior)")
    parser.add_argument("--max_hypotheses", type=int, default=None,
                        help="cap the rotation grid (speed/quality tradeoff)")
    parser.add_argument("--precompile", type=int, default=1,
                        help="compile the register/track programs in a "
                             "background thread at startup (1 = on)")
    parser.add_argument("--track_crop", type=int, default=1,
                        help="crop the uploaded frame around the tracked pose "
                             "(1 = on; identical poses, less link traffic)")
    parser.add_argument("--track_pipeline", type=int, default=3,
                        help="tracked-pose readback pipeline depth (0 = sync "
                             "every frame); poses are identical, the host "
                             "copy just lags this many frames (3 keeps ~30 ms "
                             "tunnel readbacks fully overlapped at ~30 FPS)")
    parser.add_argument("--prune_schedule", type=str, default="",
                        help="progressive coarse pruning stages as "
                             "'ITERSxKEEP,...' (e.g. '1x128,1x64'); overrides "
                             "--prune_to's single two-iteration cut")
    parser.add_argument("--polish_top", type=int, default=0,
                        help="after the final score, run extra refine "
                             "iterations on this many best hypotheses and "
                             "rank them alongside the originals (0 = off)")
    parser.add_argument("--polish_iters", type=int, default=2,
                        help="refine iterations per polished hypothesis")
    parser.add_argument("--depth_polish", type=int, default=1,
                        help="refine the registered pose with a coarse+fine "
                             "point-to-plane ICP of the masked observed cloud "
                             "against the model (1 = on; closes the learned "
                             "cascade's ~10-15 deg clutter residual to ~0)")
    parser.add_argument("--track_polish", type=int, default=1,
                        help="fuse the same depth polish into the per-frame "
                             "track program (in-graph, no extra dispatch; "
                             "halves clutter tracking drift)")
    return parser


def _parse_prune_schedule(spec: str):
    """'1x128,1x64' -> ((1, 128), (1, 64)); empty/None -> None."""
    if not spec:
        return None
    stages = []
    for part in spec.split(","):
        iters, keep = part.lower().split("x")
        stages.append((int(iters), int(keep)))
    return tuple(stages)


if __name__ == "__main__":
    args = build_parser().parse_args()
    set_logging_format()
    set_seed(0)
    main(args)
