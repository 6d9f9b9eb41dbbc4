"""Functional Azure-Kinect toolkit (calibration, capture campaigns).

Mirrors the reference `src/kinect.py` (functional, non-class API: init :12-32,
extrinsics/intrinsics fetch+save :34-124, capture/save frames :211-255,
background capture :257-278, dataset capture campaign :329-405, continuous
capture :407-428, __main__ calibration dump :430-452).  All entry points
require pykinect_azure and degrade with a clear error on TPU hosts where no
camera exists; file outputs follow the scene contract of io/readers.py.
"""
from __future__ import annotations

import json
import logging
import os
import time

import numpy as np


def _pykinect():
    try:
        import pykinect_azure as pykinect
    except ImportError as e:
        raise RuntimeError(
            "Azure-Kinect capture requires pykinect_azure; offline scenes do not"
        ) from e
    pykinect.initialize_libraries()
    return pykinect


def initialize_kinect():
    """Start the device with the reference configuration (BGRA32 / 720P /
    NFOV_2X2BINNED, src/kinect.py:12-32)."""
    pykinect = _pykinect()
    device_config = pykinect.default_configuration
    device_config.color_format = pykinect.K4A_IMAGE_FORMAT_COLOR_BGRA32
    device_config.color_resolution = pykinect.K4A_COLOR_RESOLUTION_720P
    device_config.depth_mode = pykinect.K4A_DEPTH_MODE_NFOV_2X2BINNED
    device = pykinect.start_device(config=device_config)
    time.sleep(1)
    return device, device_config


def get_extrinsics(device, device_config):
    """color<->depth extrinsics from calibration (src/kinect.py:34-76)."""
    calib = device.get_calibration(device_config.depth_mode, device_config.color_resolution)
    ext_cd = calib.color_calibration.extrinsics
    R = np.array(ext_cd.rotation).reshape(3, 3)
    t = np.array(ext_cd.translation).reshape(3)
    color_to_depth = np.eye(4)
    color_to_depth[:3, :3] = R
    color_to_depth[:3, 3] = t
    return color_to_depth, np.linalg.inv(color_to_depth)


def save_extrinsics(base_dir, color_to_depth, depth_to_color):
    """configs/camera_extrinsics.json writer (src/kinect.py:78-99)."""
    data = {
        "color_to_depth": {
            "rotation_matrix": np.asarray(color_to_depth)[:3, :3].tolist(),
            "translation_vector": [np.asarray(color_to_depth)[:3, 3].tolist()],
        },
        "depth_to_color": {
            "rotation_matrix": np.asarray(depth_to_color)[:3, :3].tolist(),
            "translation_vector": [np.asarray(depth_to_color)[:3, 3].tolist()],
        },
    }
    os.makedirs(f"{base_dir}/configs", exist_ok=True)
    path = f"{base_dir}/configs/camera_extrinsics.json"
    with open(path, "w") as f:
        json.dump(data, f, indent=4)
    logging.info(f"Extrinsic parameters saved to {path}")
    return path


def get_intrinsics(device, device_config):
    """(color_K, depth_K) 3x3 (src/kinect.py:101-124)."""
    calib = device.get_calibration(device_config.depth_mode, device_config.color_resolution)
    cp, dp = calib.color_params, calib.depth_params
    color_K = np.array([[cp.fx, 0, cp.cx], [0, cp.fy, cp.cy], [0, 0, 1]])
    depth_K = np.array([[dp.fx, 0, dp.cx], [0, dp.fy, dp.cy], [0, 0, 1]])
    return color_K, depth_K


def save_intrinsics(base_dir, color_K, depth_K, color_wh=(1280, 720), depth_wh=(320, 288)):
    data = {
        "color": {"fx": color_K[0][0], "fy": color_K[1][1], "cx": color_K[0][2],
                  "cy": color_K[1][2], "width": color_wh[0], "height": color_wh[1]},
        "depth": {"fx": depth_K[0][0], "fy": depth_K[1][1], "cx": depth_K[0][2],
                  "cy": depth_K[1][2], "width": depth_wh[0], "height": depth_wh[1]},
    }
    os.makedirs(f"{base_dir}/configs", exist_ok=True)
    path = f"{base_dir}/configs/camera_intrinsics.json"
    with open(path, "w") as f:
        json.dump(data, f, indent=4)
    logging.info(f"Intrinsic parameters saved to {path}")
    return path


def capture_frame(device):
    """Retry-until-success frame grab (src/kinect.py:211-237)."""
    capture = device.update()
    ret_d, depth = capture.get_depth_image()
    ret_c, color = capture.get_color_image()
    ret_p, points = capture.get_pointcloud()
    while not (ret_c and ret_d and ret_p):
        logging.error("Failed to get image or point cloud.")
        capture = device.update()
        ret_d, depth = capture.get_depth_image()
        ret_c, color = capture.get_color_image()
        ret_p, points = capture.get_pointcloud()
    return color, depth, points


def save_frame(save_dir, color, depth, points, frame_id):
    """rgb/depth/pcd triplet writer matching the scene contract
    (src/kinect.py:239-255)."""
    import cv2

    from .mesh_io import PointCloud, save_point_cloud

    os.makedirs(f"{save_dir}/rgb", exist_ok=True)
    os.makedirs(f"{save_dir}/depth", exist_ok=True)
    os.makedirs(f"{save_dir}/pcd", exist_ok=True)
    cv2.imwrite(f"{save_dir}/rgb/rgb_{frame_id:04d}.png", color[..., :3])
    cv2.imwrite(f"{save_dir}/depth/depth_{frame_id:04d}.png", depth.astype(np.uint16))
    save_point_cloud(f"{save_dir}/pcd/cloud_{frame_id:04d}.ply", PointCloud(points))


def capture_background(device, base_dir, countdown=5):
    """Empty-scene background capture with countdown (src/kinect.py:257-278)."""
    from .mesh_io import PointCloud, save_point_cloud

    logging.info("Please make sure the scene is empty.")
    for i in range(countdown, 0, -1):
        print(f"Capturing background in {i} seconds...")
        time.sleep(1)
    _, _, points = capture_frame(device)
    os.makedirs(f"{base_dir}/background", exist_ok=True)
    path = f"{base_dir}/background/box.ply"
    save_point_cloud(path, PointCloud(points))
    logging.info(f"Background saved to {path}")
    return path


def continuous_capture(base_dir, n_frames=100, interval_s=0.0):
    """Continuous frame capture campaign (src/kinect.py:407-428)."""
    device, device_config = initialize_kinect()
    color_K, depth_K = get_intrinsics(device, device_config)
    save_intrinsics(base_dir, color_K.tolist(), depth_K.tolist())
    for i in range(n_frames):
        color, depth, points = capture_frame(device)
        save_frame(base_dir, color, depth, points, i)
        if interval_s:
            time.sleep(interval_s)
    device.stop_cameras()
    device.close()


def dump_calibration(base_dir="."):
    """__main__-style calibration dump (src/kinect.py:430-452)."""
    device, device_config = initialize_kinect()
    color_K, depth_K = get_intrinsics(device, device_config)
    save_intrinsics(base_dir, color_K.tolist(), depth_K.tolist())
    c2d, d2c = get_extrinsics(device, device_config)
    save_extrinsics(base_dir, c2d, d2c)
    device.stop_cameras()
    device.close()


def display_color_image(color_image):
    """Live RGB feed window (src/kinect.py:292-295); needs a display."""
    import cv2

    cv2.imshow("Live RGB Feed", color_image[..., :3])
    cv2.waitKey(1)


def display_depth_image(depth_image):
    """(src/kinect.py:297-300)"""
    import cv2

    cv2.imshow("Depth Image", depth_image)
    cv2.waitKey(1)


def countdown(seconds, message="Resuming in"):
    """(src/kinect.py:322-327)"""
    for i in range(seconds, 0, -1):
        logging.info(f"{message} {i} seconds...")
        time.sleep(1)


def handle_pause(frame_count, start_frame, interval, dim_frame, dim_interval):
    """Dim-light pause cadence during capture campaigns (src/kinect.py:329-339)."""
    if (frame_count - start_frame + 1) % dim_frame == 0:
        logging.info("DIM LIGHT - pausing...")
        countdown(dim_interval, message="Resuming in")
    else:
        countdown(interval, message="Next capture in")


def get_last_frame_id(save_dir):
    """Largest saved rgb frame id, -1 when none (src/kinect.py:167-183).
    Checks both the flat layout the reference campaign writes (rgb_*.png)
    and this framework's scene layout (rgb/rgb_*.png)."""
    import glob

    files = sorted(glob.glob(f"{save_dir}/rgb_*.png")) + sorted(
        glob.glob(f"{save_dir}/rgb/rgb_*.png")
    )
    if not files:
        return -1
    stem = os.path.splitext(os.path.basename(files[-1]))[0]
    return int(stem.split("_")[-1])


def save_info_json(save_dir, color_k_matrix):
    """Per-frame K table info.json for the PVNet conversion tooling
    (src/kinect.py:185-209)."""
    import glob

    files = sorted(glob.glob(f"{save_dir}/rgb_*.png")) + sorted(
        glob.glob(f"{save_dir}/rgb/rgb_*.png")
    )
    info = {
        os.path.basename(f): {"K": np.asarray(color_k_matrix).tolist()} for f in files
    }
    path = os.path.join(save_dir, "info.json")
    with open(path, "w") as f:
        json.dump(info, f, indent=2)
    return path


def capture_save(device, base_dir, frame_count=1, show=False):
    """Capture one frame and persist it (src/kinect.py:341-359)."""
    color, depth, points = capture_frame(device)
    if color is None or depth is None or points is None:
        logging.error("Failed to capture image or point cloud.")
        return False
    if show:
        display_color_image(color)
    save_frame(base_dir, color, depth, points, frame_count)
    return True


def pvnet_data_capture(device, device_config, save_dir, total_captures, interval=0,
                       dim_light_frame=10, dim_interval=0, show=False):
    """Dataset capture campaign for PVNet-style training data
    (src/kinect.py:362-405): save calibration, resume from the last saved
    frame id, capture with dim-light pauses, then write the per-frame K table.
    """
    c2d, d2c = get_extrinsics(device, device_config)
    save_extrinsics(save_dir, c2d, d2c)
    color_K, depth_K = get_intrinsics(device, device_config)
    save_intrinsics(save_dir, color_K.tolist(), depth_K.tolist())

    logging.info("Starting data capture...")
    start_frame = get_last_frame_id(save_dir) + 1
    for frame_count in range(start_frame, start_frame + total_captures):
        color, depth, points = capture_frame(device)
        save_frame(save_dir, color, depth, points, frame_count)
        logging.info(f"Captured and saved frame {frame_count}/{start_frame + total_captures - 1}")
        if show:
            display_color_image(color)
        handle_pause(frame_count, start_frame, interval, dim_light_frame, dim_interval)
    save_info_json(save_dir, color_K)
    logging.info("Data capture complete.")


if __name__ == "__main__":
    import sys

    dump_calibration(sys.argv[1] if len(sys.argv) > 1 else ".")
