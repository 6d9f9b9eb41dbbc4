"""Scene readers: offline demo-data replay + live Azure-Kinect capture.

Mirrors the reference `datareader.py`: `DataReader` (offline, :508-792),
`KinectReader` (live, :10-505) and `YcbineoatReader` (:795-926), honoring the
same on-disk scene contract (SURVEY.md §2.4):

  configs/{camera_intrinsics,camera_extrinsics,icp_parameters}.json
  rgb/*.png  depth/*.png (mm uint16)  pcd/cloud_*.ply  masks/0000.png
  mesh/{model.obj, model.ply, model_scaled_down.obj}
  background/box.ply  heatmap/0002.npy

The offline reader is the hermetic test backend; the Kinect reader degrades
gracefully when pykinect_azure is absent (it is not bundled on TPU hosts).
"""
from __future__ import annotations

import glob
import json
import logging
import os
import time

import numpy as np

from ..app.defect_projection import PinholeCameraIntrinsic
from .mesh_io import load_mesh, load_point_cloud


def _load_extrinsics_json(base_dir):
    with open(f"{base_dir}/configs/camera_extrinsics.json", "r") as f:
        data = json.load(f)

    def build(key):
        tf = np.eye(4)
        tf[:3, :3] = np.array(data[key]["rotation_matrix"])
        tf[:3, 3] = np.array(data[key]["translation_vector"]).reshape(-1)[:3]
        return tf

    c2d = build("color_to_depth")
    d2c = build("depth_to_color")
    return c2d, d2c


class _ReaderCommon:
    """Shared mask/heatmap/config logic, identical offline and live."""

    def update_config(self, args):
        """CLI overrides onto icp_parameters.json (reference datareader.py:556-567).

        Precedence CLI > JSON > dataclass defaults, routed through the typed
        config tree (sixdof_tpu.config.IcpConfig); `self.icp_config` keeps the
        typed form, the returned dict keeps the reference's nesting for the
        pipeline functions.
        """
        cfg = self.get_icp_config()
        if args is not None:
            cfg = cfg.apply_cli_overrides(args)
        self.icp_config = cfg
        return cfg.to_reference_dict()

    def get_icp_config(self):
        from ..config import IcpConfig

        path = f"{self.base_dir}/configs/icp_parameters.json"
        if os.path.exists(path):
            return IcpConfig.from_json(path)
        return IcpConfig()

    def get_parameters(self):
        with open(f"{self.base_dir}/configs/icp_parameters.json", "r") as f:
            return json.load(f)

    def get_mask(self, color_image, i=None):
        """masks/0000.png, else Otsu auto-mask written back
        (reference datareader.py:597-637)."""
        import cv2

        try:
            mask_path = f"{self.base_dir}/masks/0000.png"
            if not os.path.exists(mask_path):
                raise FileNotFoundError("Mask file not found")
            mask = cv2.imread(mask_path, -1)
            if mask.ndim == 3:
                for c in range(3):
                    if mask[..., c].sum() > 0:
                        mask = mask[..., c]
                        break
            return (
                cv2.resize(mask, (self.color_W, self.color_H), interpolation=cv2.INTER_NEAREST)
                .astype(bool)
                .astype(np.uint8)
            )
        except (FileNotFoundError, AttributeError, TypeError):
            try:
                gray = cv2.cvtColor(color_image, cv2.COLOR_BGR2GRAY)
                _, binary = cv2.threshold(gray, 0, 255, cv2.THRESH_BINARY + cv2.THRESH_OTSU)
                refined = cv2.bitwise_not(binary)
                kernel = np.ones((3, 3), np.uint8)
                refined = cv2.morphologyEx(refined, cv2.MORPH_OPEN, kernel, iterations=2)
                refined = cv2.morphologyEx(refined, cv2.MORPH_CLOSE, kernel, iterations=2)
                os.makedirs(f"{self.base_dir}/masks", exist_ok=True)
                # `refined` is already 0/255; a *255 would overflow uint8 to
                # {0,1} and write a black mask
                cv2.imwrite(f"{self.base_dir}/masks/0000.png", refined.astype(np.uint8))
                return (
                    cv2.resize(refined, (self.color_W, self.color_H),
                               interpolation=cv2.INTER_NEAREST).astype(bool).astype(np.uint8)
                )
            except Exception as e:
                print(f"Error generating mask: {e}")
                return np.zeros((self.color_H, self.color_W), dtype=np.uint8)

    def get_heatmap(self, color_image):
        """heatmap/0002.npy center-crop-aligned to the color frame
        (reference datareader.py:639-675)."""
        import cv2

        heatmap_data = np.load(f"{self.base_dir}/heatmap/0002.npy")
        heatmap_size = heatmap_data.shape[0]
        scale = heatmap_size / min(color_image.shape[:2])
        new_height = int(color_image.shape[0] * scale)
        new_width = int(color_image.shape[1] * scale)
        color_resized = cv2.resize(color_image, (new_width, new_height),
                                   interpolation=cv2.INTER_AREA)
        start_y = (new_height - heatmap_size) // 2
        start_x = (new_width - heatmap_size) // 2
        color_cropped = color_resized[start_y : start_y + heatmap_size,
                                      start_x : start_x + heatmap_size]
        heatmap = heatmap_data - np.min(heatmap_data)
        heatmap = heatmap / np.max(heatmap)
        H0 = int(self.color_H / self.downscale)
        W0 = int(self.color_W / self.downscale)
        output_size = min(H0, W0)
        heatmap_vis = cv2.resize(heatmap, (output_size, output_size),
                                 interpolation=cv2.INTER_LINEAR)
        color_original = cv2.resize(color_cropped, (output_size, output_size),
                                    interpolation=cv2.INTER_NEAREST)
        heatmap_full = np.zeros((H0, W0))
        y_start = (H0 - output_size) // 2
        x_start = (W0 - output_size) // 2
        heatmap_full[y_start : y_start + output_size, x_start : x_start + output_size] = heatmap_vis
        return heatmap_full, color_original, heatmap_vis, color_original

    def get_extrinsics(self):
        self.color_to_depth, self.depth_to_color = _load_extrinsics_json(self.base_dir)
        self.inverse_color_to_depth = np.linalg.inv(self.color_to_depth)
        self.inverse_depth_to_color = np.linalg.inv(self.depth_to_color)

    def get_background(self):
        self.background = load_point_cloud(f"{self.base_dir}/background/box.ply")

    def get_target(self):
        self.target_mesh = load_mesh(f"{self.base_dir}/mesh/model.obj")
        self.target_mesh.compute_vertex_normals()
        self.target = load_point_cloud(f"{self.base_dir}/mesh/model.ply")

    def get_initial_pose(self):
        return np.eye(4)

    def scale_translation_to_millimeters(self, pose):
        out = pose.copy()
        out[:3, -1] *= 1000
        return out

    def build_pinhole_intrinsics(self, width, height, K):
        return PinholeCameraIntrinsic.from_params(
            width, height, K[0][0], K[1][1], K[0][2], K[1][2]
        )


class DataReader(_ReaderCommon):
    """Offline demo-data replay (reference datareader.py:508-792)."""

    def __init__(self, base_dir, downscale=1, shorter_side=None, zfar=np.inf, arguments=None):
        import cv2

        import threading

        self.base_dir = base_dir
        self.downscale = downscale
        self.zfar = zfar
        self.color_files = sorted(glob.glob(f"{self.base_dir}/rgb/*.png"))
        self.file_id = 0
        self._pf_cache = {}
        self._pf_inflight = {}
        self._pf_lock = threading.Lock()
        self.parameters = self.update_config(arguments)
        self.get_intrinsics()
        self.get_extrinsics()

        self.color_K = np.array(self.color_K)
        self.id_strs = [os.path.basename(f).replace(".png", "") for f in self.color_files]
        self.color_H, self.color_W = cv2.imread(self.color_files[0]).shape[:2]
        self.depth_H, self.depth_W = cv2.imread(
            self._depth_path(self.color_files[0]), -1
        ).shape[:2]

        if shorter_side is None:
            shorter_side = min(self.color_H, self.color_W, self.depth_H, self.depth_W)
        self.downscale = shorter_side / min(self.color_H, self.color_W)
        logging.info(f"shorter_side: {shorter_side}; downscale: {self.downscale}")

        self.color_H = int(self.color_H * self.downscale)
        self.color_W = int(self.color_W * self.downscale)
        self.color_K[:2] *= self.downscale
        self.get_background()
        self.get_target()
        self.gt_pose_files = sorted(glob.glob(f"{self.base_dir}/annotated_poses/*"))

    def get_video_name(self):
        return self.base_dir.split("/")[-1]

    def __len__(self):
        return len(self.color_files)

    def get_gt_pose(self, i=0):
        try:
            return np.loadtxt(self.gt_pose_files[i]).reshape(4, 4)
        except Exception:
            logging.info("GT pose not found, return None")
            return None

    def update(self):
        return

    def get_intrinsics(self):
        with open(f"{self.base_dir}/configs/camera_intrinsics.json", "r") as f:
            intr = json.load(f)
        self.depth_K = [
            [intr["depth"]["fx"], 0, intr["depth"]["cx"]],
            [0, intr["depth"]["fy"], intr["depth"]["cy"]],
            [0, 0, 1],
        ]
        self.color_K = [
            [intr["color"]["fx"], 0, intr["color"]["cx"]],
            [0, intr["color"]["fy"], intr["color"]["cy"]],
            [0, 0, 1],
        ]
        self.depth_H = intr["depth"]["height"]
        self.depth_W = intr["depth"]["width"]
        self.color_H = intr["color"]["height"]
        self.color_W = intr["color"]["width"]
        self.depth_pinhole = self.build_pinhole_intrinsics(self.depth_W, self.depth_H, self.depth_K)
        self.color_pinhole = self.build_pinhole_intrinsics(self.color_W, self.color_H, self.color_K)

    def _load_color(self, i):
        import cv2

        color = cv2.imread(self.color_files[i], cv2.IMREAD_COLOR)[..., ::-1]  # BGR->RGB
        return cv2.resize(color, (self.color_W, self.color_H), interpolation=cv2.INTER_NEAREST)

    @staticmethod
    def _depth_path(color_path):
        """Depth twin of a color path: swap ONLY the rgb directory and the
        rgb_ filename prefix — a whole-string replace corrupts scene roots
        that merely contain 'rgb' (e.g. /data/rgbd_scans/...)."""
        d, b = os.path.split(color_path)
        parent, leaf = os.path.split(d)
        if leaf == "rgb":
            d = os.path.join(parent, "depth")
        if b.startswith("rgb"):
            b = "depth" + b[3:]
        return os.path.join(d, b)

    def _load_depth(self, i):
        import cv2

        depth = cv2.imread(self._depth_path(self.color_files[i]), -1) / 1e3
        depth = cv2.resize(depth, (self.color_W, self.color_H), interpolation=cv2.INTER_NEAREST)
        depth[(depth < 0.001) | (depth >= self.zfar)] = 0
        return depth

    def _prefetched(self, kind, i, loader):
        """Serve frame i, then decode frame i+1 on a background thread so the
        tracking loop's disk+PNG-decode cost overlaps the device step (the
        live KinectReader gets this overlap for free from the camera driver;
        offline replay should match)."""
        import threading

        with self._pf_lock:
            cache = self._pf_cache.setdefault(kind, {})
            inflight = self._pf_inflight.setdefault(kind, set())
            val = cache.get(i)
        if val is None:
            val = loader(i)
        nxt = i + 1
        spawn = False
        with self._pf_lock:
            # keep the just-served frame cached: capture frames read the same
            # index twice (track + heatmap) and must not re-decode
            cache[i] = val
            for k in [k for k in cache if k < i]:
                del cache[k]  # bounded: holds only frames i and i+1
            if nxt < len(self.color_files) and nxt not in cache and nxt not in inflight:
                inflight.add(nxt)
                spawn = True
        if spawn:

            def work():
                out = loader(nxt)
                with self._pf_lock:
                    inflight.discard(nxt)
                    cache[nxt] = out

            threading.Thread(target=work, daemon=True).start()
        return val

    def get_color(self, i=0):
        return self._prefetched("color", i, self._load_color)

    def get_depth(self, i=0):
        return self._prefetched("depth", i, self._load_depth)

    def get_source(self, i=0):
        pcd_path = (
            self.color_files[i]
            .replace("/rgb/", "/pcd/")
            .replace(".png", ".ply")
            .replace("/rgb_", "/cloud_")
        )
        return load_point_cloud(pcd_path)

    def get_xyz_map(self, i=0):
        from ..ops.geometry import depth2xyzmap
        import jax.numpy as jnp

        return np.asarray(
            depth2xyzmap(jnp.asarray(self.get_depth(i)), jnp.asarray(self.color_K))
        )

    def stop_camera(self):
        return


class KinectReader(_ReaderCommon):
    """Live Azure-Kinect capture (reference datareader.py:10-505).

    Requires pykinect_azure; raises a clear error otherwise so offline demo
    environments (TPU hosts) do not pay the dependency.
    """

    COLOR_RESOLUTIONS = {1: (1280, 720), 2: (1920, 1080), 3: (2560, 1440),
                         4: (2048, 1536), 5: (3840, 2160), 6: (4096, 3072)}
    DEPTH_MODES = {1: (320, 288), 2: (640, 576), 3: (512, 512), 4: (1024, 1024),
                   5: (1024, 1024)}

    def __init__(self, base_dir, capture_background=False, downscale=1, shorter_side=None,
                 zfar=np.inf, arguments=None):
        try:
            import pykinect_azure as pykinect
        except ImportError as e:
            raise RuntimeError(
                "KinectReader requires pykinect_azure (live capture); use "
                "DataReader for recorded scenes"
            ) from e
        self._pykinect = pykinect
        pykinect.initialize_libraries()
        self.base_dir = base_dir
        self.downscale = downscale
        self.zfar = zfar
        self.file_id = 0
        self.color_files = []
        self.id_strs = []
        self.parameters = self.update_config(arguments)
        self.device, self.device_config = self.initialize()
        self.get_intrinsics()
        self.get_extrinsics()

        if shorter_side is None:
            shorter_side = min(self.color_H, self.color_W, self.depth_H, self.depth_W)
        self.downscale = shorter_side / min(self.color_H, self.color_W)
        self.color_H = int(self.color_H * self.downscale)
        self.color_W = int(self.color_W * self.downscale)
        self.color_K = np.array(self.color_K)
        self.depth_K = np.array(self.depth_K)
        self.color_K[:2] *= self.downscale
        self.depth_K[:2] *= self.downscale

        self.last_color = None
        self.last_depth = None
        self.last_points = None
        self.capture_background = capture_background
        if capture_background:
            self.background = self.capture_new_background()
        else:
            self.get_background()
        self.get_target()

    def initialize(self):
        pykinect = self._pykinect
        device_config = pykinect.default_configuration
        device_config.color_format = pykinect.K4A_IMAGE_FORMAT_COLOR_BGRA32
        device_config.color_resolution = pykinect.K4A_COLOR_RESOLUTION_720P
        device_config.depth_mode = pykinect.K4A_DEPTH_MODE_NFOV_2X2BINNED
        device = pykinect.start_device(config=device_config)
        time.sleep(1)
        return device, device_config

    def stop_camera(self):
        self.device.stop_cameras()
        self.device.close()

    def get_video_name(self):
        return "KinectLiveStream"

    def __len__(self):
        # live stream has no end; len() requires an int (float("inf") raises
        # TypeError in CPython), so report the largest representable length
        import sys

        return sys.maxsize

    def get_gt_pose(self, i):
        logging.info("GT pose not available for live data")
        return None

    def update(self):
        color_image, depth_image, points = self.capture_frame()
        self.last_color = color_image
        self.last_depth = depth_image
        self.last_points = points
        self.file_id += 1

    def get_intrinsics(self):
        calibration = self.device.get_calibration(
            self.device_config.depth_mode, self.device_config.color_resolution
        )
        dp = calibration.depth_params
        cp = calibration.color_params
        self.depth_K = [[dp.fx, 0, dp.cx], [0, dp.fy, dp.cy], [0, 0, 1]]
        self.color_K = [[cp.fx, 0, cp.cx], [0, cp.fy, cp.cy], [0, 0, 1]]
        cw, ch = self.COLOR_RESOLUTIONS[self.device_config.color_resolution]
        dw, dh = self.DEPTH_MODES[self.device_config.depth_mode]
        self.color_W, self.color_H = cw, ch
        self.depth_W, self.depth_H = dw, dh
        self.depth_pinhole = self.build_pinhole_intrinsics(dw, dh, self.depth_K)
        self.color_pinhole = self.build_pinhole_intrinsics(cw, ch, self.color_K)

    def get_color(self, i=None):
        import cv2

        if self.last_color is None:
            logging.warning("No color image captured yet.")
            return None
        color = cv2.cvtColor(self.last_color[..., :3], cv2.COLOR_BGR2RGB)
        return cv2.resize(color, (self.color_W, self.color_H), interpolation=cv2.INTER_NEAREST)

    def get_depth(self, i=None):
        import cv2

        if self.last_depth is None:
            logging.warning("No depth image captured yet.")
            return None
        depth = self.last_depth.astype(np.float32) / 1e3
        depth = cv2.resize(depth, (self.color_W, self.color_H), interpolation=cv2.INTER_NEAREST)
        depth[(depth < 0.001) | (depth >= self.zfar)] = 0
        return depth

    def get_source(self, i=None):
        from .mesh_io import PointCloud

        if self.last_points is None:
            logging.warning("No point cloud captured yet.")
            return None
        return PointCloud(self.last_points)

    def capture_frame(self):
        capture = self.device.update()
        ret_depth, depth_image = capture.get_depth_image()
        ret_color, color_image = capture.get_color_image()
        ret_points, points = capture.get_pointcloud()
        while not ret_color or not ret_depth or not ret_points:
            logging.error("Failed to get image or point cloud.")
            capture = self.device.update()
            ret_depth, depth_image = capture.get_depth_image()
            ret_color, color_image = capture.get_color_image()
            ret_points, points = capture.get_pointcloud()
        return color_image, depth_image, points

    def capture_new_background(self):
        from .mesh_io import PointCloud, save_point_cloud

        logging.info("Please make sure the scene is empty.")
        self.countdown(5, message="Capturing background in")
        _, _, points = self.capture_frame()
        background = PointCloud(points)
        save_path = f"{self.base_dir}/background/box.ply"
        os.makedirs(os.path.dirname(save_path), exist_ok=True)
        save_point_cloud(save_path, background)
        logging.info(f"Background point cloud captured and saved to {save_path}")
        logging.info("Please put the object in the Box.")
        self.countdown(5, message="Capturing object in")
        return background

    def countdown(self, seconds, message=""):
        for i in range(seconds, 0, -1):
            print(f"{message} {i} seconds...")
            time.sleep(1)
        print("Capturing now...")

    def save_intrinsics(self, save_dir):
        intrinsics = {
            "depth": {
                "fx": self.depth_K[0][0], "fy": self.depth_K[1][1],
                "cx": self.depth_K[0][2], "cy": self.depth_K[1][2],
                "width": self.depth_W, "height": self.depth_H,
            },
            "color": {
                "fx": self.color_K[0][0], "fy": self.color_K[1][1],
                "cx": self.color_K[0][2], "cy": self.color_K[1][2],
                "width": self.color_W, "height": self.color_H,
            },
        }
        path = os.path.join(save_dir, "camera_intrinsics.json")
        with open(path, "w") as f:
            json.dump(intrinsics, f, indent=4)
        logging.info(f"Intrinsic parameters saved to {path}")

    def save_frame(self, color_image, depth_image, point_cloud, save_dir, frame_id):
        import cv2

        from .mesh_io import PointCloud, save_point_cloud

        # the Kinect frame is BGRA and cv2.imwrite expects BGR on disk — a
        # BGR2RGB here would persist channel-swapped PNGs that every replay
        # reader (imread + [..., ::-1]) then decodes wrong
        if color_image.ndim == 3 and color_image.shape[2] == 4:
            color_image = cv2.cvtColor(color_image, cv2.COLOR_BGRA2BGR)
        cv2.imwrite(os.path.join(save_dir, f"rgb_{frame_id:03d}.png"), color_image)
        cv2.imwrite(os.path.join(save_dir, f"depth_{frame_id:03d}.png"), depth_image)
        save_point_cloud(os.path.join(save_dir, f"cloud_{frame_id:03d}.ply"),
                         PointCloud(point_cloud))


class YcbineoatReader(KinectReader):
    """Live variant with a Gaussian dummy heatmap
    (reference datareader.py:795-926)."""

    def get_heatmap(self, color, max_intensity=1.0, sigma=50):
        import cv2

        image_shape = color.shape[:2]
        heatmap = np.zeros(image_shape)
        cy, cx = image_shape[0] // 2, image_shape[1] // 2
        heatmap[cy, cx] = max_intensity
        heatmap = cv2.GaussianBlur(heatmap, (0, 0), sigma)
        return heatmap / np.max(heatmap)
