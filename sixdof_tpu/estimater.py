"""FoundationPose engine: rotation-grid registration + frame-to-frame tracking.

Public API mirrors the reference `estimater.py` class `FoundationPose`
(reference estimater.py:16-266): `register(K, rgb, depth, ob_mask, iteration)`
and `track_one(rgb, depth, K, iteration)` with identical conventions
(meters, OpenCV color-camera frame, poses returned w.r.t. the ORIGINAL mesh
origin via the centered-mesh compose at :231).

TPU-first internals: depth preprocessing, hypothesis rendering, refinement
iterations and scoring are jitted device programs; the host only guesses the
initial translation from the mask (cheap numpy) and orchestrates.
"""
from __future__ import annotations

import logging
import os

import jax
import jax.numpy as jnp
import numpy as np

from .io.mesh_io import PointCloud, TriMesh
from .models.predict import PoseRefinePredictor, ScorePredictor
from .ops.depth_filter import bilateral_filter_depth, erode_depth
from .ops.geometry import compute_mesh_diameter, depth2xyzmap
from .ops.hypotheses import make_rotation_grid
from .ops.pointcloud import voxel_down_sample
from .ops.rasterize import make_mesh_arrays


class PendingPose:
    """Handle for an in-flight tracked pose (track_one(sync=False)).

    Holds the device-side pose; `.numpy()` materializes (and caches) the host
    4x4 in the original-mesh frame, identical to the sync return value.
    """

    __slots__ = ("_dev", "_tf", "_np")

    def __init__(self, dev, tf_to_centered_mesh):
        self._dev = dev
        self._tf = tf_to_centered_mesh
        self._np = None

    def numpy(self):
        if self._np is None:
            self._np = (
                np.asarray(self._dev).reshape(4, 4).astype(np.float64) @ self._tf
            )
        return self._np


class FoundationPose:
    def __init__(self, model_pts, model_normals, symmetry_tfs=None, mesh: TriMesh = None,
                 scorer: ScorePredictor = None, refiner: PoseRefinePredictor = None,
                 glctx=None, debug=0, debug_dir="debug/fp", prune_to=None,
                 device_mesh=None, coarse_hw=(96, 96), prune_schedule=None,
                 track_crop=True, polish_top=0, polish_iters=2, depth_polish=True,
                 track_polish=True):
        """@prune_to: optional coarse-to-fine registration — after 2 refine
        iterations over the full rotation grid, keep only the prune_to
        best-scoring hypotheses for the remaining iterations (roughly halves
        registration FLOPs; not in the reference).
        @prune_schedule: optional tuple of (iters, keep) coarse stages for
        progressive pruning (e.g. ((1, 128), (1, 64))); overrides prune_to's
        single two-iteration cut.  See models/predict.py::register_pipeline_jit.
        @coarse_hw: crop resolution for the full-grid coarse phase when
        prune_to is set (the survivors refine at the cfg's full resolution).
        Raster work scales with pixels, and the full-grid phase dominates
        registration, so 96x96 cuts register latency ~2x; None disables.
        @device_mesh: optional jax.sharding.Mesh — register() shards the
        hypothesis axis over its `data` axis (SURVEY.md §2.3); refinement,
        scoring and rendering then run collective-free across chips.
        @polish_top/@polish_iters: after the final score, run polish_iters
        extra refine iterations on the polish_top best hypotheses and rank
        them alongside the originals (models/predict.py cascade polish).
        The cascade's survivors start 30 deg apart, so the winner usually
        sits at the edge of the refiner's basin; polishing the best few is
        nearly free relative to the full-grid stages.  0 disables.
        @depth_polish: after the cascade picks its top pose, refine it with a
        coarse-then-fine point-to-plane ICP of the masked observed cloud
        against the model cloud (ops/icp.py::icp_polish_two_pass, one extra
        dispatch).  The learned refiner's clutter basin bottoms out at
        ~10-15 deg (crop-space scoring cannot separate nearer poses — the
        support-fraction silhouette bias measured in round 5); the depth
        polish closes that to ~0 deg on clutter and box without touching the
        learned weights.  Purely local: it cannot flip a symmetric pose.
        The reference has no counterpart (its register output goes straight
        to the app's ICP stage, estimater.py:157-238).
        @track_polish: fuse the same coarse+fine depth polish INTO the track
        program (models/predict.py::_track_depth_polish — in-graph, zero
        extra dispatches, correction-magnitude guarded).  Removes the net's
        geometric per-frame drift under clutter/sensor noise (clutter track
        rot mean 17 -> 7.4 deg, ADD-S better on every eval scene)."""
        self.gt_pose = None
        self.ignore_normal_flip = True
        self.prune_to = prune_to
        self.prune_schedule = tuple(tuple(s) for s in prune_schedule) \
            if prune_schedule else None
        self.polish_top = int(polish_top or 0)
        self.polish_iters = int(polish_iters or 0)
        self.depth_polish = bool(depth_polish)
        self.track_polish = bool(track_polish)
        self.coarse_hw = tuple(coarse_hw) if coarse_hw is not None else None
        self.device_mesh = device_mesh
        self.debug = debug
        self.debug_dir = debug_dir
        os.makedirs(debug_dir, exist_ok=True)

        self.reset_object(model_pts, model_normals, symmetry_tfs=symmetry_tfs, mesh=mesh)
        self.make_rotation_grid(min_n_views=40, inplane_step=60)

        # host-side crop of the uploaded frame around the tracked pose
        # (track_one): the network only ever reads a crop_ratio-sized window
        # around the object, so uploading the full frame wastes link bandwidth
        # AND relay CPU (the tunnel relay shares the single host core with
        # the numpy preprocessing).  The crop is conservative (margin x the
        # network's own window, re-centered every frame from a <=2-frame-old
        # pose) and falls back to the full frame whenever the object isn't
        # safely inside it.
        self.track_crop = bool(track_crop)
        self._track_crop_margin = 1.4
        self._crop_pose_host = None
        self._crop_size = None
        self._last_center_px = None
        from collections import deque as _deque

        self._pose_hist = _deque()

        self.scorer = scorer if scorer is not None else ScorePredictor()
        self.refiner = refiner if refiner is not None else PoseRefinePredictor()
        # AOT executables (utils/aot_cache): compiled track/register programs
        # keyed by shape — loaded from disk in ~0.4-2 s in a fresh process
        # instead of paying the server-side compile (the axon endpoint never
        # populates the local jit cache; AOT_EXPERIMENT.json)
        self._track_exec = {}
        self._register_exec = {}
        # watertight meshes render identically with backface culling, at half
        # the raster work (ops/rasterize.py; io/mesh_io.py::is_watertight)
        self.refiner.cfg["backface_cull"] = self.backface_cull
        self.scorer.cfg["backface_cull"] = self.backface_cull
        self.pose_last = None  # per the centered mesh

    # ------------------------------------------------------------- setup --

    def reset_object(self, model_pts, model_normals, symmetry_tfs=None, mesh: TriMesh = None):
        """Center the mesh at its bbox center and build device tensors
        (reference estimater.py:42-76)."""
        max_xyz = mesh.vertices.max(axis=0)
        min_xyz = mesh.vertices.min(axis=0)
        self.model_center = (min_xyz + max_xyz) / 2
        self.mesh_ori = mesh.copy()
        mesh = mesh.copy()
        mesh.vertices = mesh.vertices - self.model_center.reshape(1, 3)

        model_pts = mesh.vertices
        self.diameter = compute_mesh_diameter(model_pts=model_pts, n_sample=10000)
        self.vox_size = max(self.diameter / 20.0, 0.003)
        logging.info(f"self.diameter:{self.diameter}, vox_size:{self.vox_size}")
        self.dist_bin = self.vox_size / 2
        self.angle_bin = 20  # deg
        pcd = PointCloud(model_pts, normals=np.asarray(mesh.vertex_normals))
        pcd = voxel_down_sample(pcd, self.vox_size)
        self.max_xyz = pcd.points.max(axis=0)
        self.min_xyz = pcd.points.min(axis=0)
        self.pts = jnp.asarray(pcd.points, dtype=jnp.float32)
        nrm = pcd.normals / np.clip(np.linalg.norm(pcd.normals, axis=-1, keepdims=True), 1e-12, None)
        self.normals = jnp.asarray(nrm, dtype=jnp.float32)
        # padded device target for register()'s depth polish: a DENSE surface
        # sampling (centered frame).  The voxel-downsampled self.pts (spacing
        # ~= the polish's fine threshold) is too sparse — correspondence
        # quantization then biases the ICP optimum several degrees off
        # (measured: polishing an exact pose drifted it to 4.5 deg)
        dense = mesh.sample_points(16384, seed=0)
        tgt_p = dense.points.astype(np.float32)
        tn_p = dense.normals.astype(np.float32)
        self._polish_tgt = jnp.asarray(tgt_p)
        self._polish_tn = jnp.asarray(tn_p)
        self._polish_tmask = jnp.ones((len(tgt_p),), dtype=bool)
        # per-frame track polish budget: a 4096-pt target keeps the
        # HBM-bound NN tile ~1 ms/frame (register's one-shot polish keeps
        # the full 16k sampling)
        small = mesh.sample_points(4096, seed=1)
        self._polish_tgt_small = jnp.asarray(small.points.astype(np.float32))
        self._polish_tn_small = jnp.asarray(small.normals.astype(np.float32))
        self._polish_tmask_small = jnp.ones((4096,), dtype=bool)
        self.mesh = mesh
        self.mesh_tensors = make_mesh_arrays(mesh)
        # closed + consistently wound is necessary but not sufficient: the
        # winding must also be OUTWARD (positive signed volume), else culling
        # keeps the far surface and every render's depth is off by the
        # object thickness
        self.backface_cull = bool(mesh.is_watertight()) and mesh.signed_volume() > 0
        logging.info(f"backface_cull={self.backface_cull}")
        # refresh per-mesh state on predictors created before this reset
        for pred in (getattr(self, "refiner", None), getattr(self, "scorer", None)):
            if pred is not None:
                pred.cfg["backface_cull"] = self.backface_cull

        if symmetry_tfs is None:
            self.symmetry_tfs = np.eye(4)[None]
        else:
            self.symmetry_tfs = np.asarray(symmetry_tfs)
        logging.info("reset done")

    def get_tf_to_centered_mesh(self):
        tf_to_center = np.eye(4)
        tf_to_center[:3, 3] = -np.asarray(self.model_center)
        return tf_to_center

    def make_rotation_grid(self, min_n_views=40, inplane_step=60):
        """(reference estimater.py:104-122)"""
        rot_grid = make_rotation_grid(
            min_n_views=min_n_views, inplane_step=inplane_step,
            symmetry_tfs=self.symmetry_tfs, cluster_angle=30.0, cluster_dist=99999.0,
        )
        logging.info(f"after cluster, rot_grid:{rot_grid.shape}")
        self.rot_grid = rot_grid

    # ----------------------------------------------------------- helpers --

    def _register_scalar_args(self):
        """Positional scalars of the fused register call (traced as baked
        constants; identical values => identical program)."""
        ref = self.refiner
        return (float(self.diameter), float(ref.cfg["crop_ratio"]),
                float(ref.cfg["trans_normalizer"]), float(ref.cfg["rot_normalizer"]))

    def _register_pipeline_kwargs(self, iteration):
        """Static/keyword args of the fused register call — shared by
        register() and precompile_async so the precompiled program is
        byte-identical to the one register() requests."""
        ref, sc = self.refiner, self.scorer
        return dict(
            prune_to=int(self.prune_to) if self.prune_to else 0,
            prune_schedule=self.prune_schedule,
            coarse_iters=2, iterations=int(iteration),
            out_hw=tuple(ref.cfg["input_resize"]), coarse_hw=self.coarse_hw,
            normalize_xyz=bool(ref.cfg["normalize_xyz"]),
            trans_rep=ref.cfg["trans_rep"], rot_rep=ref.cfg["rot_rep"],
            score_mode=sc.cfg.get("score_mode", "hybrid"),
            backface_cull=self.backface_cull,
            # the scorer's own conventions (the staged path honors sc.cfg
            # via scorer.predict; the fused path must match)
            score_crop_ratio=float(sc.cfg["crop_ratio"]),
            score_normalize_xyz=bool(sc.cfg["normalize_xyz"]),
            score_hw=(tuple(sc.cfg["input_resize"])
                      if tuple(sc.cfg["input_resize"]) != tuple(ref.cfg["input_resize"])
                      else None),
            polish_top=self.polish_top, polish_iters=self.polish_iters,
            occ_sub=ref.cfg.get("occ_sub", False),  # False | True | float ceiling — pass verbatim (train/infer gate must match)
        )

    @staticmethod
    def _shape_sig(tree):
        """Shape/dtype signature of a pytree — part of every AOT cache key
        (an executable is only valid for the exact parameter shapes it was
        compiled for; shape drift falls back to a fresh compile)."""
        return tuple((tuple(l.shape), str(l.dtype)) for l in jax.tree.leaves(tree))

    def _track_polish_kwargs(self):
        """Dense-model polish arrays for the in-graph track polish, or
        nothing when disabled (the two variants are different programs)."""
        if not self.track_polish:
            return {}
        return dict(polish_tgt=self._polish_tgt_small,
                    polish_tn=self._polish_tn_small,
                    polish_tmask=self._polish_tmask_small)

    def _get_track_exec(self, H, W, iteration):
        """Compiled track executable for an (H,W) frame: in-process cache ->
        AOT disk cache -> compile (+store).  Call with the runtime arrays and
        scalars only — the statics are baked in."""
        from .models.predict import track_pose_jit
        from .utils import aot_cache

        ref = self.refiner
        ck = (H, W, int(iteration))
        comp = self._track_exec.get(ck)
        if comp is not None:
            return comp
        key = ("track", H, W, int(iteration), tuple(ref.cfg["input_resize"]),
               bool(ref.cfg["normalize_xyz"]), ref.cfg["trans_rep"],
               ref.cfg["rot_rep"], self.backface_cull,
               repr(ref.cfg.get("occ_sub", False)), self.track_polish,
               self._shape_sig(ref.params), self._shape_sig(self.mesh_tensors),
               self._register_scalar_args())
        comp = aot_cache.load("track", key)
        if comp is None:
            f32 = jnp.float32
            sd = jax.ShapeDtypeStruct
            comp = track_pose_jit.lower(
                ref.model, ref.params, self.mesh_tensors,
                sd((1, 4, 4), f32), sd((H, W, 5), jnp.uint8), sd((3, 3), f32),
                *self._register_scalar_args(),
                iterations=int(iteration),
                out_hw=tuple(ref.cfg["input_resize"]),
                normalize_xyz=bool(ref.cfg["normalize_xyz"]),
                trans_rep=ref.cfg["trans_rep"], rot_rep=ref.cfg["rot_rep"],
                backface_cull=self.backface_cull,
                occ_sub=ref.cfg.get("occ_sub", False),
                **self._track_polish_kwargs(),
            ).compile()
            aot_cache.store("track", key, comp)
        self._track_exec[ck] = comp
        return comp

    def _register_aot_key(self, n_hypo, H, W, iteration):
        ref, sc = self.refiner, self.scorer
        kw = self._register_pipeline_kwargs(iteration)
        return ("register", int(n_hypo), H, W, repr(sorted(kw.items())),
                self._shape_sig(ref.params), self._shape_sig(sc.params),
                self._shape_sig(self.mesh_tensors), self._register_scalar_args())

    def _get_register_exec(self, n_hypo, H, W, iteration):
        """Compiled fused-register executable (cascade as one dispatch):
        in-process cache -> AOT disk cache -> compile (+store)."""
        from .models.predict import register_pipeline_jit
        from .utils import aot_cache

        ref, sc = self.refiner, self.scorer
        ck = (int(n_hypo), H, W, int(iteration))
        comp = self._register_exec.get(ck)
        if comp is not None:
            return comp
        kw = self._register_pipeline_kwargs(iteration)
        key = self._register_aot_key(n_hypo, H, W, iteration)
        comp = aot_cache.load("register", key)
        if comp is None:
            f32 = jnp.float32
            sd = jax.ShapeDtypeStruct
            comp = register_pipeline_jit.lower(
                ref.model, ref.params, sc.model, sc.params, self.mesh_tensors,
                sd((int(n_hypo), 4, 4), f32), sd((H, W, 3), f32),
                sd((H, W), f32), sd((3, 3), f32),
                *self._register_scalar_args(), **kw,
            ).compile()
            aot_cache.store("register", key, comp)
        self._register_exec[ck] = comp
        return comp

    def precompile_async(self, K, image_hw, iteration=5, track_iteration=2):
        """Compile the fused register + track programs in background threads.

        Cold-start killer (the reference is interactive from process start,
        run.py:32-41).  With a warm AOT disk cache (utils/aot_cache) both
        programs deserialize in ~0.4-2 s and the threads finish almost
        immediately; on a cold cache the fused register pays its ~5 min
        server-side compile here instead of on the first register() call.
        Two threads with different roles:

        - fused register (the ~5 min cold-cache pole): while it is STILL
          compiling, register() detours through the staged path — four small
          programs that cold-compile in ~50 s total (measured:
          16.5/11.6/11.2/11.1 s, tools/exp_compile_split.py) and are pinned
          result-identical to the fused cascade by
          tests/test_register_pipeline.py.  First-ever pose lands in ~1 min
          instead of ~5; first-pose-with-AOT-cache in seconds.
        - track program: small; track_one() joins this thread only (never the
          fused one — tracking must not block minutes behind it).

        @K: 3x3 intrinsics (values irrelevant — only shape/dtype matter).
        @image_hw: (H, W) of the frames register()/track_one() will see.
        """
        import threading

        if self.device_mesh is not None:
            return None  # the sharded path compiles per-mesh programs

        H, W = int(image_hw[0]), int(image_hw[1])
        n = len(self.rot_grid)

        def _work_fused():
            try:
                import time as _time

                logging.info("precompile: fused register compile started")
                _t0 = _time.perf_counter()
                self._get_register_exec(n, H, W, iteration)
                logging.info(f"precompile: fused register ready "
                             f"({_time.perf_counter() - _t0:.1f}s)")
            except Exception as e:  # pragma: no cover - diagnostics only
                logging.warning(f"fused-register precompile failed (non-fatal): {e}")

        def _work_track():
            try:
                self._get_track_exec(H, W, track_iteration)
            except Exception as e:  # pragma: no cover - diagnostics only
                logging.warning(f"track precompile failed (non-fatal): {e}")

        tf = threading.Thread(target=_work_fused, daemon=True, name="sixdof-precompile-fused")
        tt = threading.Thread(target=_work_track, daemon=True, name="sixdof-precompile-track")
        tf.start()
        tt.start()
        self._precompile_fused_thread = tf
        self._precompile_track_thread = tt
        return tf

    def _fused_register_pending(self):
        """True while the background fused-register compile is in flight —
        register() then detours through the staged path instead of blocking."""
        t = getattr(self, "_precompile_fused_thread", None)
        return t is not None and t.is_alive()

    def _join_precompile(self):
        """Wait for an in-flight TRACK precompile (avoids a duplicate
        concurrent compile of the same program; no-op when none is running).
        Deliberately does not touch the fused-register thread."""
        t = getattr(self, "_precompile_track_thread", None)
        if t is not None and t.is_alive():
            logging.info("waiting for background track precompile")
            t.join()

    def _depth_polish(self, top_pose_centered, depth_np, ob_mask, K):
        """Refine the cascade's top pose against the masked observed cloud
        (coarse-then-fine point-to-plane ICP, one device dispatch).  Local
        only — cannot flip a symmetric pose; returns the input unchanged if
        the masked cloud is degenerate.  See __init__ @depth_polish."""
        from .ops.icp import icp_polish_two_pass

        vs, us = np.where((np.asarray(ob_mask) > 0) & (depth_np > 0.001))
        if len(us) < 64:
            return top_pose_centered
        Kn = np.asarray(K, dtype=np.float64)
        # visibility gate: under heavy occlusion the masked cloud covers only
        # a fraction of the object, and its depth optimum slides the pose
        # into the visible part — the r5 parity run measured the downstream
        # mm-ICP then diverging 35 mm on the 57%-occluded scene.  Estimate
        # the expected silhouette area by projecting the model cloud at the
        # top pose and skip the polish when the mask covers < 60% of it.
        p = np.asarray(top_pose_centered, dtype=np.float64)
        pc = np.asarray(self.pts) @ p[:3, :3].T + p[:3, 3]
        z = np.maximum(pc[:, 2], 1e-6)
        uu = np.clip(np.round(Kn[0, 0] * pc[:, 0] / z + Kn[0, 2]), 0, depth_np.shape[1] - 1)
        vv = np.clip(np.round(Kn[1, 1] * pc[:, 1] / z + Kn[1, 2]), 0, depth_np.shape[0] - 1)
        # dilate model pixels to the voxel footprint so sparse points
        # approximate the filled silhouette
        px_per_vox = float(max(Kn[0, 0], Kn[1, 1])) * self.vox_size / float(np.median(z))
        proj_area = len(set(zip(uu.astype(int) // max(1, int(px_per_vox)),
                                vv.astype(int) // max(1, int(px_per_vox))))) \
            * max(1, int(px_per_vox)) ** 2
        # bucket-dilated projection overestimates the silhouette ~1.3-1.7x
        # (edge points claim whole buckets), so the gate sits at 40%: the
        # 57%-occluded scene reads ~32% (skip), a conservative Otsu mask on a
        # fully visible object reads ~45-50% (polish)
        if len(us) < 0.4 * proj_area:
            logging.info(f":: depth polish skipped (mask {len(us)} px < 40% of "
                         f"projected ~{proj_area} px — heavy occlusion)")
            return top_pose_centered
        z = depth_np[vs, us]
        pts = np.stack([(us - Kn[0, 2]) * z / Kn[0, 0],
                        (vs - Kn[1, 2]) * z / Kn[1, 1], z], axis=-1).astype(np.float32)
        if len(pts) > 8192:
            pts = pts[np.random.RandomState(0).choice(len(pts), 8192, replace=False)]
        spad = 1 << int(np.ceil(np.log2(max(len(pts), 1024))))
        src = np.zeros((spad, 3), np.float32)
        src[: len(pts)] = pts
        smask = np.zeros(spad, bool)
        smask[: len(pts)] = True
        init = np.linalg.inv(np.asarray(top_pose_centered, dtype=np.float64)).astype(np.float32)
        d = float(self.diameter)
        # finest pass floored at 4 mm: below typical sensor depth noise the
        # point-to-plane optimum chases noise (measured +4 deg on the sensor
        # scene with an unfloored 0.025d pass)
        tf = icp_polish_two_pass(
            jnp.asarray(src), jnp.asarray(smask), self._polish_tgt,
            self._polish_tn, self._polish_tmask, jnp.asarray(init),
            0.1 * d, 0.05 * d, max(0.02 * d, 0.004),
        )
        return np.linalg.inv(np.asarray(tf, dtype=np.float64))

    def guess_translation(self, depth, mask, K):
        """Mask-center backprojection at median masked depth
        (reference estimater.py:135-154)."""
        vs, us = np.where(mask > 0)
        if len(us) == 0:
            logging.info("mask is all zero")
            return np.zeros(3)
        uc = (us.min() + us.max()) / 2.0
        vc = (vs.min() + vs.max()) / 2.0
        valid = (mask > 0) & (np.asarray(depth) >= 0.001)
        if not valid.any():
            logging.info("valid is empty")
            return np.zeros(3)
        zc = np.median(np.asarray(depth)[valid])
        center = np.linalg.inv(K) @ np.array([uc, vc, 1.0]).reshape(3, 1) * zc
        return center.reshape(3)

    def generate_random_pose_hypo(self, K, rgb, depth, mask, scene_pts=None):
        """(reference estimater.py:125-132)"""
        ob_in_cams = self.rot_grid.copy()
        center = self.guess_translation(depth=depth, mask=mask, K=K)
        ob_in_cams[:, :3, 3] = center.reshape(1, 3)
        return ob_in_cams

    # ------------------------------------------------------------- infer --

    def register(self, K, rgb, depth, ob_mask, ob_id=None, glctx=None, iteration=5):
        """Global pose estimation over the rotation grid
        (reference estimater.py:157-238)."""
        logging.info("Welcome")
        depth = jnp.asarray(np.asarray(depth), dtype=jnp.float32)
        depth = erode_depth(depth, radius=2)
        depth = bilateral_filter_depth(depth, radius=2)
        depth_np = np.asarray(depth)

        valid = (depth_np >= 0.001) & (np.asarray(ob_mask) > 0)
        if valid.sum() < 4:
            logging.info("valid too small, return")
            pose = np.eye(4)
            pose[:3, 3] = self.guess_translation(depth=depth_np, mask=ob_mask, K=K)
            return pose

        self.H, self.W = depth_np.shape[:2]
        self.K = K
        self.ob_id = ob_id
        self.ob_mask = ob_mask

        poses = self.generate_random_pose_hypo(K=K, rgb=rgb, depth=depth_np, mask=ob_mask)
        logging.info(f"poses:{poses.shape}")
        n_hypo = len(poses)
        if self.device_mesh is not None:
            from .parallel.sharding import shard_hypotheses

            poses, n_hypo = shard_hypotheses(jnp.asarray(poses, dtype=jnp.float32),
                                             self.device_mesh)

        if self.device_mesh is None and self._fused_register_pending():
            # a serialized executable on disk means the background thread is
            # seconds from ready (deserialize, not compile) — join briefly
            # rather than paying the ~50 s staged-path compile detour
            from .utils import aot_cache

            if aot_cache.has("register",
                             self._register_aot_key(n_hypo, self.H, self.W, iteration)):
                logging.info("register: AOT artifact on disk; joining precompile")
                self._precompile_fused_thread.join(timeout=60)

        if self.device_mesh is None and self.debug < 2 \
                and not self._fused_register_pending():
            # fused register: the whole coarse->prune->refine->score cascade
            # is ONE jitted dispatch (models/predict.py::register_pipeline_jit)
            # — one host round trip instead of ~6 (tunnel latency dominates
            # multi-stage host orchestration on remote TPU).  While the
            # background fused compile is still in flight (cold start), the
            # staged path below answers in ~1 min instead of blocking ~5.
            from .models.predict import register_pipeline_jit, to_rgb01

            ref, sc = self.refiner, self.scorer
            rgb01 = to_rgb01(rgb)
            logging.info("register: fused path")
            try:
                comp = self._get_register_exec(n_hypo, self.H, self.W, iteration)
                # statics are baked into the executable; pass runtime
                # arrays/scalars + the one non-static kwarg
                poses_sorted, scores_sorted = comp(
                    ref.params, sc.params, self.mesh_tensors,
                    jnp.asarray(poses, dtype=jnp.float32), rgb01, depth,
                    jnp.asarray(K, dtype=jnp.float32),
                    *self._register_scalar_args(),
                    score_crop_ratio=float(sc.cfg["crop_ratio"]),
                )
            except TypeError as e:  # arg-structure drift: never take the app down
                logging.warning(f"register AOT executable mismatch ({e}); "
                                "falling back to jit")
                poses_sorted, scores_sorted = register_pipeline_jit(
                    ref.model, ref.params, sc.model, sc.params, self.mesh_tensors,
                    jnp.asarray(poses, dtype=jnp.float32), rgb01, depth,
                    jnp.asarray(K, dtype=jnp.float32),
                    *self._register_scalar_args(),
                    **self._register_pipeline_kwargs(iteration),
                )
            poses_np = np.asarray(poses_sorted)
            scores_np = np.asarray(scores_sorted)
            logging.info(f"sorted scores (top5): {scores_np[:5]}")
            if self.depth_polish:
                poses_np = poses_np.copy()
                poses_np[0] = self._depth_polish(poses_np[0], depth_np, ob_mask, K)
            best_pose = poses_np[0] @ self.get_tf_to_centered_mesh()
            self.pose_last = poses_np[0]
            self._crop_pose_host = np.asarray(poses_np[0], dtype=np.float64)
            self._pose_hist.clear()
            self._last_center_px = None
            self.best_id = 0
            self.poses = poses_np
            self.scores = scores_np
            return best_pose

        logging.info("register: staged path"
                     + (" (fused compile in flight)" if self._fused_register_pending()
                        else ""))
        xyz_map = depth2xyzmap(depth, jnp.asarray(K, dtype=jnp.float32))
        schedule = self.prune_schedule
        if schedule is None and self.prune_to and self.prune_to < len(poses) \
                and iteration > 2:
            # coarse-to-fine: 2 iterations on the full grid, score, keep top-K
            schedule = ((2, self.prune_to),)
        for stage_iters, keep_k in schedule or ():
            if keep_k >= n_hypo or iteration <= stage_iters:
                continue
            coarse, _ = self.refiner.predict(
                mesh=self.mesh, mesh_tensors=self.mesh_tensors, rgb=rgb, depth=depth,
                K=K, ob_in_cams=poses, xyz_map=xyz_map, glctx=None,
                mesh_diameter=self.diameter, iteration=stage_iters, get_vis=False,
                out_hw=self.coarse_hw, backface_cull=self.backface_cull,
            )
            coarse_scores, _ = self.scorer.predict(
                mesh=self.mesh, rgb=rgb, depth=depth, K=K, ob_in_cams=coarse,
                mesh_tensors=self.mesh_tensors, glctx=None, mesh_diameter=self.diameter,
                out_hw=self.coarse_hw, backface_cull=self.backface_cull,
            )
            keep = np.argsort(-np.asarray(coarse_scores)[:n_hypo])[:keep_k]
            poses = np.asarray(coarse)[keep]
            n_hypo = len(poses)
            if self.device_mesh is not None:
                from .parallel.sharding import shard_hypotheses

                poses, n_hypo = shard_hypotheses(
                    jnp.asarray(poses, dtype=jnp.float32), self.device_mesh
                )
            iteration = iteration - stage_iters
        poses, vis = self.refiner.predict(
            mesh=self.mesh, mesh_tensors=self.mesh_tensors, rgb=rgb, depth=depth,
            K=K, ob_in_cams=poses, xyz_map=xyz_map, glctx=None,
            mesh_diameter=self.diameter, iteration=iteration, get_vis=self.debug >= 2,
            backface_cull=self.backface_cull,
        )
        if vis is not None:
            import cv2

            cv2.imwrite(f"{self.debug_dir}/vis_refiner.png", vis[..., ::-1])

        scores, vis = self.scorer.predict(
            mesh=self.mesh, rgb=rgb, depth=depth, K=K, ob_in_cams=poses,
            mesh_tensors=self.mesh_tensors, glctx=None, mesh_diameter=self.diameter,
            get_vis=self.debug >= 2, backface_cull=self.backface_cull,
        )

        scores_np = np.asarray(scores)[:n_hypo]
        poses_np = np.asarray(poses)[:n_hypo]
        if self.polish_top and self.polish_iters and self.polish_top <= n_hypo:
            # staged mirror of the fused cascade's top-K polish (see
            # models/predict.py::register_pipeline_jit): extra refine
            # iterations on the best few, ranked ALONGSIDE the originals
            top = np.argsort(-scores_np)[: self.polish_top]
            cand = poses_np[top]
            if self.device_mesh is not None:
                from .parallel.sharding import shard_hypotheses

                cand, n_cand = shard_hypotheses(
                    jnp.asarray(cand, dtype=jnp.float32), self.device_mesh)
            else:
                n_cand = len(cand)
            cand, _ = self.refiner.predict(
                mesh=self.mesh, mesh_tensors=self.mesh_tensors, rgb=rgb,
                depth=depth, K=K, ob_in_cams=cand, xyz_map=xyz_map, glctx=None,
                mesh_diameter=self.diameter, iteration=self.polish_iters,
                get_vis=False, backface_cull=self.backface_cull,
            )
            cand_scores, _ = self.scorer.predict(
                mesh=self.mesh, rgb=rgb, depth=depth, K=K, ob_in_cams=cand,
                mesh_tensors=self.mesh_tensors, glctx=None,
                mesh_diameter=self.diameter, backface_cull=self.backface_cull,
            )
            poses_np = np.concatenate([np.asarray(cand)[:n_cand], poses_np])
            scores_np = np.concatenate([np.asarray(cand_scores)[:n_cand], scores_np])
        ids = np.argsort(-scores_np)
        poses_np = poses_np[ids]
        logging.info(f"sorted scores (top5): {scores_np[ids][:5]}")
        if self.depth_polish:
            poses_np = poses_np.copy()
            poses_np[0] = self._depth_polish(poses_np[0], depth_np, ob_mask, K)

        best_pose = poses_np[0] @ self.get_tf_to_centered_mesh()
        self.pose_last = poses_np[0]
        self._crop_pose_host = np.asarray(poses_np[0], dtype=np.float64)
        self._pose_hist.clear()
        self._last_center_px = None
        self.best_id = ids[0]
        self.poses = poses_np
        self.scores = scores_np[ids]
        return best_pose

    def compute_add_err_to_gt_pose(self, poses):
        """ADD error vs self.gt_pose over the downsampled model points.

        The reference stubs this to -1 (estimater.py:241-245); we wire the
        real metric when gt_pose is set, keeping -1 otherwise.
        """
        if self.gt_pose is None:
            return -np.ones(len(poses))
        from .metrics import add_err

        model = np.asarray(self.pts)
        return np.array([add_err(np.asarray(p), np.asarray(self.gt_pose), model) for p in poses])

    def _crop_window(self, K, hw):
        """Conservative (oy, ox, size) upload crop around the tracked pose,
        or None for full frame.

        The window is margin x the network's own crop_ratio window around the
        <=2-frame-old host pose; size is fixed per session (rounded up to a
        multiple of 32) so tracking stays one compiled program, and only the
        offset moves with the object.  Falls back to the full frame when the
        object is too close (window would exceed the frame) or the projected
        center leaves the image.
        """
        p = self._crop_pose_host
        if p is None:
            return None
        tz = float(p[2, 3])
        if tz <= 1e-6:
            return None
        H, W = int(hw[0]), int(hw[1])
        f = max(float(K[0, 0]), float(K[1, 1]))
        crop_ratio = float(self.refiner.cfg.get("crop_ratio", 1.2))
        # what the network itself will sample vs what we upload (margin x)
        need_net = 2.0 * f * (0.5 * self.diameter * crop_ratio) / tz
        need = need_net * self._track_crop_margin
        if self._crop_size is None:
            size = max(64, int(np.ceil(need * 1.05 / 32.0) * 32))
            self._crop_size = 0 if size >= min(H, W) else size
        elif self._crop_size and need > 0.95 * self._crop_size:
            # the object came closer than the session's window was sized for;
            # stay on the (always-correct) full frame rather than recompiling
            # the track program mid-loop for a new shape
            logging.info(":: track_crop: object too close for the session "
                         "window, reverting to full-frame uploads")
            self._crop_size = 0
        if not self._crop_size or self._crop_size > min(H, W):
            return None  # disabled, or the frame shrank below the window
        size = self._crop_size
        u = float(K[0, 0]) * float(p[0, 3]) / tz + float(K[0, 2])
        v = float(K[1, 1]) * float(p[1, 3]) / tz + float(K[1, 2])
        if not (0.0 <= u < W and 0.0 <= v < H):
            self._last_center_px = None
            return None  # lost the object: give the net the whole frame
        # motion guard: the crop is centered on a pose ~lag frames stale, so
        # extrapolate the last observed per-frame image motion over the lag
        # and require it to fit in the window's slack around the net's window
        slack = 0.5 * (size - need_net)
        prev = self._last_center_px
        self._last_center_px = (u, v)
        if prev is not None:
            motion = float(np.hypot(u - prev[0], v - prev[1]))
            if motion * (len(self._pose_hist) + 1) + 4.0 > slack:
                return None  # moving too fast for the lagged window
        ox = int(np.clip(round(u - size / 2), 0, W - size))
        oy = int(np.clip(round(v - size / 2), 0, H - size))
        return oy, ox, size

    def _push_pose_hist(self, pose_dev):
        """Advance the host-side crop pose from completed async readbacks."""
        self._pose_hist.append(pose_dev)
        if len(self._pose_hist) > 2:
            old = self._pose_hist.popleft()
            # the async D2H copy started 2 frames ago; this materialize is
            # (nearly) free and never stalls the dispatch pipeline
            self._crop_pose_host = np.asarray(old, dtype=np.float64).reshape(4, 4)

    def track_one(self, rgb, depth, K, iteration, extra=None, sync=True):
        """Single-hypothesis refinement from the previous frame's pose
        (reference estimater.py:248-266).

        @sync=False returns a PendingPose handle instead of blocking on the
        device->host pose transfer: the pose chain stays ON DEVICE between
        frames (the previous pose feeds the next dispatch without a host
        round-trip) and an async D2H copy is started so `.numpy()` a frame or
        two later is nearly free.  Over the TPU tunnel the track computation
        itself is ~5 ms while each host sync costs ~25-45 ms, so pipelining
        the readback 2-3 frames deep raises tracking from ~16 to ~50+ FPS
        with bit-identical poses (the chained math is exactly the sync path).
        """
        if self.pose_last is None:
            logging.info("Please init pose by register first")
            raise RuntimeError
        from .models.predict import pack_rgbd, track_pose_jit

        ref = self.refiner
        rgb_np = np.ascontiguousarray(np.asarray(rgb))
        if rgb_np.dtype != np.uint8:
            rgb_np = (rgb_np * 255).clip(0, 255).astype(np.uint8) if rgb_np.max() <= 1.5 \
                else rgb_np.astype(np.uint8)
        depth_np = np.asarray(depth)
        if depth_np.dtype != np.uint16:  # mm-uint16: 4x less traffic
            depth_np = np.clip(depth_np * 1000.0, 0, 65535).astype(np.uint16)
        K_use = np.asarray(K, dtype=np.float64)
        if self.track_crop and self.debug < 2:
            win = self._crop_window(K_use, rgb_np.shape[:2])
            if win is not None:
                oy, ox, size = win
                rgb_np = rgb_np[oy : oy + size, ox : ox + size]
                depth_np = depth_np[oy : oy + size, ox : ox + size]
                K_use = K_use.copy()
                K_use[0, 2] -= ox
                K_use[1, 2] -= oy
        rgbd = pack_rgbd(np.ascontiguousarray(rgb_np), np.ascontiguousarray(depth_np))
        if isinstance(self.pose_last, jax.Array):  # chained: already on device
            pose_last_dev = jnp.reshape(self.pose_last, (1, 4, 4))
        else:
            pose_last_dev = jnp.asarray(
                np.asarray(self.pose_last).reshape(1, 4, 4), dtype=jnp.float32)
        self._join_precompile()
        try:
            comp = self._get_track_exec(int(rgbd.shape[0]), int(rgbd.shape[1]),
                                        int(iteration))
            pose, _depth_filtered = comp(
                ref.params, self.mesh_tensors, pose_last_dev,
                jnp.asarray(rgbd), jnp.asarray(K_use, dtype=jnp.float32),
                *self._register_scalar_args(),
                **self._track_polish_kwargs(),
            )
        except TypeError as e:  # arg-structure drift: never take the app down
            logging.warning(f"track AOT executable mismatch ({e}); "
                            "falling back to jit")
            pose, _depth_filtered = track_pose_jit(
                ref.model, ref.params, self.mesh_tensors,
                pose_last_dev,
                jnp.asarray(rgbd),
                jnp.asarray(K_use, dtype=jnp.float32), float(self.diameter),
                float(ref.cfg["crop_ratio"]), float(ref.cfg["trans_normalizer"]),
                float(ref.cfg["rot_normalizer"]), iterations=int(iteration),
                out_hw=tuple(ref.cfg["input_resize"]),
                normalize_xyz=bool(ref.cfg["normalize_xyz"]),
                trans_rep=ref.cfg["trans_rep"], rot_rep=ref.cfg["rot_rep"],
                backface_cull=self.backface_cull,
                occ_sub=ref.cfg.get("occ_sub", False),
                **self._track_polish_kwargs(),
            )
        logging.info("pose done")
        if self.debug >= 2:
            xyz_map = depth2xyzmap(_depth_filtered, jnp.asarray(K, dtype=jnp.float32))
            _, vis = ref.predict(
                mesh=self.mesh, mesh_tensors=self.mesh_tensors, rgb=rgb,
                depth=_depth_filtered, K=K, ob_in_cams=np.asarray(pose).reshape(1, 4, 4),
                xyz_map=xyz_map, mesh_diameter=self.diameter, iteration=1, get_vis=True,
            )
            if extra is not None:
                extra["vis"] = vis
        self.pose_last = pose  # device array: the chain never leaves the chip
        if not sync:
            try:  # start the D2H copy now; .numpy() later won't stall
                pose.copy_to_host_async()
            except Exception:
                pass
            self._push_pose_hist(pose)
            return PendingPose(pose, self.get_tf_to_centered_mesh())
        pose_np = np.asarray(pose).reshape(4, 4).astype(np.float64)
        # same 2-frame crop-centering lag as the pipelined path, so sync and
        # pipelined tracking pick identical crop offsets -> identical poses
        self._push_pose_hist(pose_np)
        return pose_np @ self.get_tf_to_centered_mesh()
