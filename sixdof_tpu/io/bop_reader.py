"""BOP-format scene reader (YCB-V / T-LESS / LineMOD directory layout).

The reference handles YCB-V data through ad-hoc helpers on its readers
(reference datareader.py:542,575-581 gt_pose_files/annotated_poses,
:773-792 get_occ_mask/get_gt_mesh with the videoname->object table); this
module provides the general BOP scene contract instead, which is what those
datasets actually ship as:

  <scene_dir>/
    rgb/000000.png            (or .jpg)
    depth/000000.png          (uint16; meters = value * depth_scale / 1000)
    mask_visib/000000_000000.png   (per-frame, per-gt-instance visible mask)
    mask/000000_000000.png         (full amodal mask, optional)
    scene_camera.json         {"0": {"cam_K": [9], "depth_scale": s}, ...}
    scene_gt.json             {"0": [{"cam_R_m2c": [9], "cam_t_m2c": [3] mm,
                                      "obj_id": k}], ...}
    scene_gt_info.json        {"0": [{"visib_fract": f, "bbox_visib": [...]}]}

  <models_dir>/ (dataset-level)
    obj_000001.ply ...
    models_info.json          {"1": {"diameter": mm, "symmetries_discrete":
                               [16 floats]..., "symmetries_continuous": ...}}

Everything is converted to the pipeline's conventions at the boundary:
meters, OpenCV camera frame, (4,4) float poses — the same contract
`DataReader` provides, so `FoundationPose.register/track_one` run unchanged.
"""
from __future__ import annotations

import glob
import json
import logging
import os

import numpy as np


class BopSceneReader:
    """Per-frame getters over one BOP scene directory.

    @ob_id: the BOP object id this reader tracks (scenes contain several
    instances; like the reference pipeline we follow one object).
    """

    def __init__(self, scene_dir, ob_id=None, models_dir=None, shorter_side=None,
                 zfar=np.inf):
        self.scene_dir = scene_dir
        self.zfar = zfar
        self.color_files = sorted(
            glob.glob(f"{scene_dir}/rgb/*.png") + glob.glob(f"{scene_dir}/rgb/*.jpg")
        )
        if not self.color_files:
            raise FileNotFoundError(f"no rgb frames under {scene_dir}/rgb")
        with open(f"{scene_dir}/scene_camera.json") as f:
            self.scene_camera = {int(k): v for k, v in json.load(f).items()}
        self.scene_gt = {}
        if os.path.exists(f"{scene_dir}/scene_gt.json"):
            with open(f"{scene_dir}/scene_gt.json") as f:
                self.scene_gt = {int(k): v for k, v in json.load(f).items()}
        self.scene_gt_info = {}
        if os.path.exists(f"{scene_dir}/scene_gt_info.json"):
            with open(f"{scene_dir}/scene_gt_info.json") as f:
                self.scene_gt_info = {int(k): v for k, v in json.load(f).items()}

        self.frame_ids = [
            int(os.path.splitext(os.path.basename(p))[0]) for p in self.color_files
        ]
        self.ob_id = ob_id if ob_id is not None else self._first_object_id()
        self.models_dir = models_dir or self._guess_models_dir()

        import cv2

        first = cv2.imread(self.color_files[0])
        self.color_H, self.color_W = first.shape[:2]
        self.downscale = 1.0
        if shorter_side is not None:
            self.downscale = shorter_side / min(self.color_H, self.color_W)
            self.color_H = int(self.color_H * self.downscale)
            self.color_W = int(self.color_W * self.downscale)

        self.models_info = {}
        if self.models_dir and os.path.exists(f"{self.models_dir}/models_info.json"):
            with open(f"{self.models_dir}/models_info.json") as f:
                self.models_info = {int(k): v for k, v in json.load(f).items()}

    # ------------------------------------------------------------- layout --

    def _first_object_id(self):
        if self.scene_gt:
            first = self.scene_gt[min(self.scene_gt)]
            if first:
                return int(first[0]["obj_id"])
        return None

    def _guess_models_dir(self):
        """BOP convention: <dataset_root>/models next to the scenes tree."""
        cur = os.path.abspath(self.scene_dir)
        for _ in range(4):
            cur = os.path.dirname(cur)
            for name in ("models", "models_eval", "models_fine"):
                cand = os.path.join(cur, name)
                if os.path.exists(os.path.join(cand, "models_info.json")):
                    return cand
        return None

    def __len__(self):
        return len(self.color_files)

    def get_video_name(self):
        return os.path.basename(os.path.normpath(self.scene_dir))

    # -------------------------------------------------------------- frames --

    def get_K(self, i=0):
        K = np.array(self.scene_camera[self.frame_ids[i]]["cam_K"], dtype=np.float64)
        K = K.reshape(3, 3).copy()
        if self.downscale != 1.0:
            K[:2] *= self.downscale
        return K

    @property
    def color_K(self):
        return self.get_K(0)

    def get_color(self, i=0):
        import cv2

        img = cv2.imread(self.color_files[i], cv2.IMREAD_COLOR)[..., ::-1]
        if self.downscale != 1.0:
            img = cv2.resize(img, (self.color_W, self.color_H),
                             interpolation=cv2.INTER_NEAREST)
        return np.ascontiguousarray(img)

    def get_depth(self, i=0):
        """Meters, zfar-clamped (reference get_depth semantics,
        datareader.py:758-763; BOP depth_scale honored)."""
        import cv2

        path = self.color_files[i].replace("/rgb/", "/depth/")
        path = os.path.splitext(path)[0] + ".png"
        d = cv2.imread(path, -1)
        scale = float(self.scene_camera[self.frame_ids[i]].get("depth_scale", 1.0))
        depth = d.astype(np.float64) * scale / 1000.0
        if self.downscale != 1.0:
            depth = cv2.resize(depth, (self.color_W, self.color_H),
                               interpolation=cv2.INTER_NEAREST)
        depth[(depth < 0.001) | (depth >= self.zfar)] = 0.0
        return depth

    def _gt_index(self, i):
        """Index of self.ob_id inside frame i's gt list (first instance)."""
        for j, g in enumerate(self.scene_gt.get(self.frame_ids[i], [])):
            if int(g["obj_id"]) == self.ob_id:
                return j
        return None

    def get_mask(self, i=0, visib_only=True):
        """Visible-part instance mask (mask_visib/) for the tracked object;
        falls back to the amodal mask/ directory."""
        import cv2

        j = self._gt_index(i)
        if j is None:
            return np.zeros((self.color_H, self.color_W), dtype=bool)
        sub = "mask_visib" if visib_only else "mask"
        path = f"{self.scene_dir}/{sub}/{self.frame_ids[i]:06d}_{j:06d}.png"
        if not os.path.exists(path) and visib_only:
            return self.get_mask(i, visib_only=False)
        if not os.path.exists(path):
            logging.info(f"no mask at {path}")
            return np.zeros((self.color_H, self.color_W), dtype=bool)
        m = cv2.imread(path, -1) > 0
        if self.downscale != 1.0:
            m = cv2.resize(m.astype(np.uint8), (self.color_W, self.color_H),
                           interpolation=cv2.INTER_NEAREST) > 0
        return m

    def get_gt_pose(self, i=0):
        """(4,4) object-in-camera pose in METERS, or None."""
        j = self._gt_index(i)
        if j is None:
            return None
        g = self.scene_gt[self.frame_ids[i]][j]
        pose = np.eye(4)
        pose[:3, :3] = np.array(g["cam_R_m2c"], dtype=np.float64).reshape(3, 3)
        pose[:3, 3] = np.array(g["cam_t_m2c"], dtype=np.float64).reshape(3) / 1000.0
        return pose

    def get_visib_fract(self, i=0):
        """GT visible fraction (occlusion level) from scene_gt_info.json."""
        j = self._gt_index(i)
        info = self.scene_gt_info.get(self.frame_ids[i])
        if j is None or info is None:
            return None
        return float(info[j].get("visib_fract", 1.0))

    def get_occ_mask(self, i=0):
        """Pixels of OTHER instances occluding ours: union of the other
        instances' visible masks intersected with our amodal mask
        (capability parity with reference get_occ_mask, datareader.py:773-786)."""
        import cv2

        fid = self.frame_ids[i]
        j = self._gt_index(i)
        occ = np.zeros((self.color_H, self.color_W), dtype=bool)
        if j is None:
            return occ.astype(np.uint8)
        amodal = self.get_mask(i, visib_only=False)
        for k in range(len(self.scene_gt.get(fid, []))):
            if k == j:
                continue
            path = f"{self.scene_dir}/mask_visib/{fid:06d}_{k:06d}.png"
            if os.path.exists(path):
                m = cv2.imread(path, -1) > 0
                if self.downscale != 1.0:
                    m = cv2.resize(m.astype(np.uint8), (self.color_W, self.color_H),
                                   interpolation=cv2.INTER_NEAREST) > 0
                occ |= m
        return (occ & amodal).astype(np.uint8)

    # -------------------------------------------------------------- models --

    def get_gt_mesh(self):
        """Load the tracked object's model mesh in METERS (BOP models are mm)."""
        from .mesh_io import load_mesh

        path = f"{self.models_dir}/obj_{self.ob_id:06d}.ply"
        mesh = load_mesh(path)
        mesh.vertices = mesh.vertices / 1000.0
        return mesh

    def get_model_diameter(self):
        """Meters, from models_info.json."""
        info = self.models_info.get(self.ob_id)
        return None if info is None else float(info["diameter"]) / 1000.0

    def get_symmetry_tfs(self, rot_angle_discrete=5):
        """(S,4,4) symmetry transforms in METERS from models_info.json
        (BOP annotation, parsed like reference Utils.py:806-834)."""
        from ..ops.geometry import symmetry_tfs_from_info

        info = self.models_info.get(self.ob_id)
        if info is None:
            return np.eye(4)[None]
        # symmetry_tfs_from_info already converts mm translations to meters
        return np.array(symmetry_tfs_from_info(info, rot_angle_discrete=rot_angle_discrete),
                        dtype=np.float64)
